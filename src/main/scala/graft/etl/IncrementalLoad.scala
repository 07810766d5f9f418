package graft.etl

import graft.gen.LibraryTables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental / subsequent DW refresh (ref 07_SubsequentLoading.sql) —
  * idempotent by construction:
  *
  *  - dims: SCD2 apply for changed attributes (procedures :27-169),
  *    insert-missing for genuinely new business keys;
  *  - facts: MERGE-when-not-matched on the fact grain (:331-355, :407-431)
  *    via anti-join append — replaying the same batch is a no-op.
  *
  * At scale the anti-join is the only cost over the delta: the existing
  * fact is probed on its (partitioned) grain key, the delta broadcasts.
  */
object IncrementalLoad {

  /** Refresh the DW with a new batch of OLTP rows (which may overlap rows
    * already loaded — the reference's re-runnable contract). */
  def apply(spark: SparkSession, dw: DwTables, batch: LibraryTables, asOf: String): DwTables = {
    // dims: new members appear, existing members' tracked attrs go SCD2
    // (ref 06_Type2_DimMembers.sql:4-117 — close the current version,
    // open a new one with a fresh surrogate key).
    val dimMembersNew = {
      val tracked = Seq("member_name", "member_gender", "member_age", "age_band",
        "member_state", "member_city", "expire_date")
      val incoming = InitialLoad.dimMembers(batch.members, asOf)
        .drop("member_key") // surrogates assigned below for new versions/keys
      val existingKeys = dw.dimMembers.select("member_id").distinct()
      val newRows  = incoming.join(existingKeys, Seq("member_id"), "left_anti")
      val chgRows  = incoming.join(existingKeys, Seq("member_id"), "left_semi")
      // SCD2 over existing keys; the differs-check inside applyTagged keeps
      // unchanged members as single untouched rows.
      val scd2d = Scd2.applyTagged(dw.dimMembers, chgRows, Seq("member_id"), tracked, asOf)
      val kept  = scd2d.filter(col(Scd2.ActionCol) =!= "open").drop(Scd2.ActionCol)
      // fresh surrogate keys for new current versions AND brand-new members
      // in one dense block above the current max (dim-sized window — the
      // documented surrogate-key pattern, InitialLoad scaladoc).
      val maxKey = dw.dimMembers.agg(max(col("member_key"))).first().getLong(0)
      val toKey = scd2d.filter(col(Scd2.ActionCol) === "open").drop(Scd2.ActionCol)
        .drop("member_key")
        .unionByName(newRows.select(kept.columns.filter(_ != "member_key").map(col).toIndexedSeq: _*))
      val keyed = toKey.withColumn("member_key",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("member_id"), col("effective_date"))).cast("long") + maxKey)
      kept.unionByName(keyed.select(dw.dimMembers.columns.map(col).toIndexedSeq: _*))
    }

    // facts: anti-join append on the fact grain
    val factSalesNew = MergeUpsert.insertMissing(
      dw.factSales,
      InitialLoad.factSales(batch.salesDetails, batch.salesOrders, dw.dimBook, dimMembersNew),
      Seq("order_id", "line_no"))
    val factBorrowingNew = MergeUpsert.insertMissing(
      dw.factBorrowing,
      InitialLoad.factBorrowing(batch.borrowedBooks, batch.bookCopies, dw.dimBook, dimMembersNew, asOf),
      Seq("date_key", "member_key", "book_key"))
    val factPurchaseNew = MergeUpsert.insertMissing(
      dw.factPurchase,
      InitialLoad.factPurchase(batch.purchaseDetails, batch.purchaseOrders, batch.bookTitles, dw.dimBook, dw.dimSuppliers),
      Seq("po_id", "line_no"))

    dw.copy(
      dimMembers = dimMembersNew,
      factSales = factSalesNew,
      factBorrowing = factBorrowingNew,
      factPurchase = factPurchaseNew)
  }
}
