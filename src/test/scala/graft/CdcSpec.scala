package graft

import org.apache.spark.sql.functions._
import graft.etl.Cdc

/** CDC changelog apply: the latest-seq-wins/delete-tombstone contract,
  * out-of-order tombstone arrival through the store, and replay safety.
  */
class CdcSpec extends SparkSpec {

  test("cdc apply: deletes erase, updates win, untouched keys pass through") {
    val base = Tables.orders(spark, tiny)
      .selectExpr("o_orderkey", "o_orderstatus").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = Cdc.cdcApply(spark, tiny).collect()
      .map(r => r.getAs[Long]("o_orderkey") -> r.getAs[String]("o_orderstatus"))
      .toMap
    assert(out.keySet == base.keySet.filter(_ % 10 != 1), "deleted keys gone")
    out.foreach { case (k, st) =>
      if (k % 10 == 0) assert(st == "X", s"key $k must carry the update")
      else assert(st == base(k), s"key $k must be untouched")
    }
  }

  test("cdc store: tombstone-first arrival and batch replays leave state ≡ batch apply") {
    val dir = java.nio.file.Files.createTempDirectory("cdc_store_spec").toString
    val log = Cdc.changelog(spark, tiny)
    val late = log.filter(col("seq") === 2)  // updates + tombstones FIRST
    val early = log.filter(col("seq") === 1) // inserts second
    Cdc.cdcApplyBatch(spark, dir, late, 0L)
    Cdc.cdcApplyBatch(spark, dir, early, 1L)
    val served = Cdc.cdcReadState(spark, dir).collect().toSeq
    // at-least-once: replaying both batches must change nothing
    Cdc.cdcApplyBatch(spark, dir, late, 0L)
    Cdc.cdcApplyBatch(spark, dir, early, 1L)
    assert(Cdc.cdcReadState(spark, dir).collect().toSeq == served)
    assert(served == Cdc.cdcApply(spark, tiny).collect().toSeq)
  }
}
