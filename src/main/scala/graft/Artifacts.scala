package graft

/** Root directory for persisted, corpus-fingerprint-keyed artifacts
  * (trained BPE dictionary, IVF centroids, zone-map layout, the
  * library-schema oracle parquet) and the Spark warehouse dir.
  *
  * Derived at class-load from the JVM working directory (sbt forks
  * mains and tests in the project base dir) with a `graft.artifact.root`
  * system-property / `GRAFT_ARTIFACT_ROOT` env override, so a checkout
  * at any path works — the oracle SQL strings interpolate these
  * constants from the SAME JVM that writes the artifacts, so engine
  * and oracle can never disagree on the location.
  *
  * The artifacts themselves are written EAGERLY by the op that owns
  * them, hive-partitioned by a corpus fingerprint; an oracle read
  * against a fingerprint partition Spark has not materialized fails in
  * DuckDB with its "no files found" error — by design, the loud
  * failure mode for an out-of-order run.
  */
object Artifacts {
  val Root: String = sys.props
    .get("graft.artifact.root")
    .orElse(sys.env.get("GRAFT_ARTIFACT_ROOT"))
    .getOrElse(sys.props("user.dir") + "/target")

  /** True iff a previous write of `path` COMPLETED (its `_SUCCESS`
    * marker exists) — the skip-if-present gate for byte-deterministic,
    * fingerprint-keyed artifacts: content for a given partition never
    * changes, so re-writing is pure waste, while a torn write (no
    * marker) must rebuild. */
  def ready(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val hp = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(hp)
  }

  /** The shared content-fingerprint fold: Σ term over `df` carried in
    * DECIMAL(38,0) (a raw BIGINT sum of hash-sized terms overflows,
    * which ANSI mode — Spark 4's default — turns into a job failure),
    * folded mod 10¹⁵ to a long driver-side. `term` must be
    * non-negative so the modulus agrees with any SQL mirror's `%`.
    * Empty input folds to 0. One definition — the fingerprint
    * consumers (graph artifact, zonemap layout, their specs) must not
    * drift apart on the modulus or the null handling. */
  def decFp(df: org.apache.spark.sql.DataFrame, term: org.apache.spark.sql.Column): Long = {
    import org.apache.spark.sql.functions.sum
    val d = df.agg(sum(term.cast("decimal(38,0)"))).head().getDecimal(0)
    if (d == null) 0L
    else d.remainder(new java.math.BigDecimal(1000000000000000L)).longValueExact()
  }
}
