package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test session (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // bucketed-table specs saveAsTable; keep the warehouse out of the repo
    // and unique per JVM — a reused location with a fresh in-memory catalog
    // makes CREATE TABLE fail on LOCATION_ALREADY_EXISTS
    .config("spark.sql.warehouse.dir",
      s"/tmp/graft_test_wh_${java.lang.ProcessHandle.current().pid()}_${System.nanoTime()}")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val tiny = "/root/testdata/sf0.001"
  val awData = "/root/reference/dags/data"

  /** Full post-AQE plan walk for API-level plan assertions: materialized
    * stages are childless QueryStageExec nodes, so a plain
    * children-recursion stops at every stage boundary — recurse through
    * stage.plan (and the adaptive root's executedPlan) to reach the real
    * operators, instead of matching the rendered plan string, whose shape
    * drifts across Spark versions.
    */
  def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    val through = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case _ => Seq.empty
    }
    p +: (p.children ++ through).flatMap(allNodes)
  }
}
