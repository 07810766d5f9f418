package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Order-independent content fingerprint of a DataFrame.
  *
  * Each row hashes to one xxhash64 over all columns; the per-row hashes
  * fold with a wrapping sum, so the result is invariant to row order and
  * partitioning — a re-run on a different cluster layout produces the
  * same value iff the content is identical. This is the mechanism behind
  * SURVEY §5.5's "same seed ⇒ identical dataset hash" contract for the
  * seeded generators ([[graft.gen.LibraryGen]]), pinned by
  * `LibraryGoldenHashSpec`.
  *
  * Scale posture: a single map-side hash + one scalar aggregate — no
  * shuffle wider than the final 1-row reduce.
  */
object Fingerprint {

  /** (rowCount, contentHash). Column order matters (it changes the
    * per-row hash), row order does not. Each column contributes an
    * is-null sentinel alongside its value: xxhash64 skips null inputs,
    * so without the sentinel (a=1, b=null) and (a=null, b=1) would hash
    * identically and a value-shifted-between-columns bug would slip the
    * pin. The per-row hashes sum as decimal(38,0) (a plain long sum
    * would trip ANSI overflow) and wrap to a stable Long driver-side. */
  def tableHash(df: DataFrame): (Long, Long) = {
    val sentinelled = df.columns.toIndexedSeq.flatMap(c => Seq(isnull(col(c)), col(c)))
    val h = df
      .select(xxhash64(sentinelled: _*).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .agg(count(lit(1)).as("n"), coalesce(sum("h"), lit(java.math.BigDecimal.ZERO)).as("fold"))
      .head()
    val fold = h.getDecimal(1).toBigInteger.mod(java.math.BigInteger.ONE.shiftLeft(63)).longValueExact()
    (h.getLong(0), fold)
  }
}
