package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-guarded candidate-pair generation for the blocked dedup family.
  *
  * A blocked self-join (`a.key = b.key AND a.id < b.id`) concentrates an
  * entire block into one task, where the quadratic verify (Levenshtein,
  * Jaccard, signature agreement) runs. Crawl corpora make this a real
  * hazard: boilerplate openings put millions of documents into ONE
  * prefix/band block — at 100 TB that task is a straggler or an OOM.
  *
  * The guard is a deterministic triangular sub-split. Each block of size
  * n is hash-partitioned into g = ⌈n / cap⌉ sub-groups; every unordered
  * sub-group pair (u ≤ v) becomes its own join cell, so a block
  * contributes g(g+1)/2 independently-schedulable cells of ≤ ~cap² pairs
  * instead of one n²/2 monolith. Pair completeness is preserved exactly:
  * a pair with sub-groups (s_x ≤ s_y) appears in cell (s_x, s_y) and in
  * no other, diagonal cells dedup by id order, and off-diagonal pairs are
  * id-normalized on output — so the emitted pair SET is identical to the
  * naive join's (asserted by BlockedPairsSpec), only its task layout
  * changes. Blocks under the cap reduce to g = 1 with the same join
  * volume as the unguarded path — the guard costs one count aggregation
  * on the (tiny) block-key table.
  */
object BlockedPairs {

  /** All unordered within-block pairs of `df` rows, as two structs
    * `a` / `b` carrying every input column, with `a.<idCol> < b.<idCol>`
    * guaranteed and per-cell pair counts bounded by ~`cap`².
    *
    * @param df     one row per item: the block key column(s), an id, and
    *               whatever payload the verify stage needs
    * @param keyCols block key column names
    * @param idCol  unique orderable id column name
    * @param cap    target sub-group size (pairs-per-cell bound ≈ cap²)
    */
  def pairs(df: DataFrame, keyCols: Seq[String], idCol: String, cap: Int): DataFrame = {
    require(cap >= 1, "cap must be positive")
    val keys: Seq[Column] = keyCols.map(col)
    val counts = df.groupBy(keys: _*).agg(count(lit(1)).as("__n"))
    // co-partitioned join on the block key (same shuffle the self-join
    // needs anyway); g and the hash sub-group are deterministic
    val withSg = df.join(counts, keyCols)
      .withColumn("__g", ceil(col("__n") / lit(cap)).cast("int"))
      .withColumn("__sg", pmod(xxhash64(col(idCol)), col("__g")).cast("int"))
    val payload = struct(df.columns.map(col): _*)
    // a row in sub-group s joins as LEFT of cells (s, v ≥ s) and as RIGHT
    // of cells (u ≤ s, s): every cell (u, v) pairs sub-group u against v
    val left = withSg.select(
      keys :+ col("__sg").as("__u")
        :+ explode(sequence(col("__sg"), col("__g") - 1)).as("__v")
        :+ payload.as("a"): _*)
    val right = withSg.select(
      keys :+ explode(sequence(lit(0), col("__sg"))).as("__u")
        :+ col("__sg").as("__v")
        :+ payload.as("b"): _*)
    val aId = col(s"a.$idCol")
    val bId = col(s"b.$idCol")
    left.join(right, keyCols ++ Seq("__u", "__v"))
      // diagonal cells see both orderings (and self-pairs): keep a < b.
      // off-diagonal cells see each pair exactly once, in arbitrary id
      // order: keep it and normalize below.
      .filter(col("__u") < col("__v") || aId < bId)
      .select(
        when(aId < bId, col("a")).otherwise(col("b")).as("a"),
        when(aId < bId, col("b")).otherwise(col("a")).as("b"))
  }

  /** Default sub-group size: 4k ⇒ ≤ ~16M pairs per cell — sized so one
    * cell's verify stays a minutes-not-hours task even with an expensive
    * per-pair check. */
  val DefaultCap = 4096
}
