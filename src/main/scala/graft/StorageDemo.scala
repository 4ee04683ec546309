package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-layout demonstrations for the 100 TB posture:
  *
  *  1. BUCKETED header⨝detail: both sides bucketed+sorted by the order key
  *     → the join plans with NO Exchange on either side (shuffle-free
  *     sort-merge join). At 100 TB this turns the one big shuffle of the
  *     fact build into a metadata-only co-location.
  *  2. PARTITIONED fact: year-partitioned parquet → a year predicate shows
  *     up as PartitionFilters and prunes the scan.
  *
  * Prints the physical plans + observed evidence.
  * Usage: runMain graft.StorageDemo [sfDir]
  */
object StorageDemo {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val wh = s"/tmp/graft_warehouse_${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ to show bucketing
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- 1. bucketed co-located join ---------------------------------
    Tables.orders(spark, dir).write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("orders_b")
    Tables.lineitem(spark, dir).write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("lineitem_b")
    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    println(s"bucketed join: $exchanges shuffle Exchange(s) in the plan " +
      s"(unbucketed would need 2); rows=${joined.count()}")

    // --- 2. partition-pruned fact scan --------------------------------
    val fato = etl.Star.fatoVendas(spark, dir)
      .withColumn("ano", (col("sk_tempo") / 10000).cast("int"))
    fato.write.mode("overwrite").partitionBy("ano").parquet(s"$wh/fato")
    val mat = spark.read.parquet(s"$wh/fato")
    val pruned = mat.filter(col("ano") === 1996)
    val planStr = pruned.queryExecution.executedPlan.toString
    val pf = planStr.indexOf("PartitionFilters")
    val scanLine = if (pf >= 0) planStr.substring(pf).takeWhile(_ != ']') + "]"
                   else "(no PartitionFilters found)"
    println(s"partition pruning: $scanLine")
    println(s"  full=${mat.count()} rows, ano=1996 -> ${pruned.count()} rows")
    spark.stop()
  }
}
