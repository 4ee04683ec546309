package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.window.WindowExec
import graft.sim.EmbeddingOps

/** Plan-shape guard for the ANN ranking tails (VERDICT r4/r5 #1): the
  * per-query top-k must be a partial+final aggregate whose state is O(k),
  * never a row_number window — a window shuffles every candidate of a
  * query to one reducer task, which is fatal at corpus scale even though
  * it is invisible at sf0.1. These asserts pin the physical plan so a
  * refactor can't silently reintroduce the single-reducer tail.
  */
class AnnPlanSpec extends SparkSpec {

  private def collectNodes(p: SparkPlan): Seq[SparkPlan] = {
    val self = p match {
      case a: AdaptiveSparkPlanExec => collectNodes(a.executedPlan)
      case other => Seq(other)
    }
    self ++ p.children.flatMap(collectNodes) ++
      p.subqueries.flatMap(collectNodes)
  }

  private def nodes(df: DataFrame): Seq[SparkPlan] =
    collectNodes(df.queryExecution.executedPlan)

  private def windows(df: DataFrame): Seq[SparkPlan] =
    nodes(df).filter(_.isInstanceOf[WindowExec])

  private def aggregates(df: DataFrame): Seq[SparkPlan] = nodes(df).filter {
    case _: HashAggregateExec | _: ObjectHashAggregateExec |
         _: SortAggregateExec => true
    case _ => false
  }

  test("annBruteForce ranks via aggregate, not window") {
    val df = EmbeddingOps.annBruteForce(spark, tiny)
    assert(windows(df).isEmpty,
      "brute-force ANN must not rank via a per-query window")
    assert(aggregates(df).size >= 2, // partial + final
      "expected a partial+final aggregate pair for the top-k tail")
    assert(df.count() === 40) // 8 queries x top-5, still produces rows
  }

  test("annIvfProbe ranks candidates via aggregate; only the bounded routing window remains") {
    val df = EmbeddingOps.annIvfProbe(spark, tiny, 3)
    // Routing ranks #cells candidates per query (corpus-independent) — one
    // window is allowed for that; the corpus-sized candidate tail must not
    // add another.
    assert(windows(df).size <= 1,
      s"IVF plan may keep only the bounded routing window, found ${windows(df).size}")
    assert(aggregates(df).size >= 2,
      "expected a partial+final aggregate pair for the top-k tail")
    assert(df.count() === 40)
  }

  test("tagged top-k aggregator matches window semantics on a hand case") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 1 group, 4 candidates, k=2: ties on score broken by ascending id.
    val ds = Seq((1L, 0.9, 10L, 7L), (1L, 0.9, 3L, 8L),
      (1L, 0.5, 1L, 9L), (1L, 0.99, 5L, 6L))
      .toDF("g", "sim", "id", "tag").as[(Long, Double, Long, Long)]
    val agg = graft.functions.TopKByScoreTagged(2).toColumn
    val out = ds.groupByKey(_._1)
      .mapValues { case (_, s, i, t) => (s, i, t) }
      .agg(agg.name("top")).collect().toMap
    assert(out(1L) === Seq((0.99, 5L, 6L), (0.9, 3L, 8L)))
  }
}
