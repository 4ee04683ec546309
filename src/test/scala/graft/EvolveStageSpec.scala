package graft

import org.apache.spark.sql.functions._
import graft.etl.EvolveStage

/** Schema-evolution read invariants. The oracle gate (q_evolve_schema)
  * pins the end result; these pin the mechanism — the two read paths
  * agree, null-fill lands on exactly the old generation, and pushdown
  * still works through the contract-schema read.
  */
class EvolveStageSpec extends SparkSpec {

  test("contract-schema read == mergeSchema read (the footer sweep buys nothing)") {
    val dir = EvolveStage.stage(spark, tiny)
    val a = EvolveStage.readEvolved(spark, dir)
    val b = EvolveStage.readMerged(spark, dir)
    assert(a.schema === b.schema)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("null-fill lands on exactly the gen1 rows, and only on the absent columns") {
    val dir = EvolveStage.stage(spark, tiny)
    val df = EvolveStage.readEvolved(spark, dir).cache()
    try {
      assert(df.filter("doc_id % 2 = 0 AND (source IS NOT NULL OR n_chars IS NOT NULL)")
        .count() === 0, "gen1 rows must null-fill the columns they never wrote")
      assert(df.filter("doc_id % 2 <> 0 AND (source IS NULL OR n_chars IS NULL)")
        .count() === 0, "gen2 rows must arrive complete")
      assert(df.filter("text IS NULL OR lang IS NULL").count() === 0,
        "shared columns must survive both generations")
      assert(df.count() === Tables.documents(spark, tiny).count())
    } finally df.unpersist(): Unit
  }

  test("predicate pushdown reaches the scan through the contract-schema read") {
    val dir = EvolveStage.stage(spark, tiny)
    val plan = EvolveStage.readEvolved(spark, dir)
      .filter(col("doc_id") > 100L).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(doc_id), GreaterThan(doc_id,100)]"),
      s"expected the doc_id predicate pushed to parquet, got:\n$plan")
  }
}
