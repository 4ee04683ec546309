package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so scan
  * pruning (ReadSchema/PushedFilters), join strategies (BroadcastHashJoin
  * vs shuffle), aggregate shape (partial+final) and WholeStageCodegen
  * spans can be audited against the 100 TB design goals.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [query ...]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val which: Seq[String] =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q_filter_project", "star_fato_vendas", "kpi5_top_produtos",
        "q_agg_stats", "q_dedup_minhash_lsh", "q_ann_brute")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    which.foreach { name =>
      println(s"\n========== $name ==========")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
