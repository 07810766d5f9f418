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
    * per-row hash), row order does not. The per-row hashes sum as
    * decimal(38,0) (a plain long sum would trip ANSI overflow) and wrap
    * to a stable Long driver-side. */
  def tableHash(df: DataFrame): (Long, Long) = {
    val h = df
      .select(xxhash64(df.columns.map(col).toIndexedSeq: _*).cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
      .agg(count(lit(1)).as("n"), coalesce(sum("h"), lit(java.math.BigDecimal.ZERO)).as("fold"))
      .head()
    val fold = h.getDecimal(1).toBigInteger.mod(java.math.BigInteger.ONE.shiftLeft(63)).longValueExact()
    (h.getLong(0), fold)
  }
}
