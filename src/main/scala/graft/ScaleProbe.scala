package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicates the sf0.1 sales tables Nx (order keys
  * offset per replica, dimensions unchanged) to ~sf1 size, then times the
  * full star build + KPI suite at both scales. The point is the RATIO: a
  * plan that is linear in the fact and constant in the dims should scale
  * ~Nx on the fact-bound stage and ~1x on dim-bound stages — evidence the
  * partitioning/broadcast choices survive a scale-up.
  *
  * Usage: runMain graft.ScaleProbe [replicas] [workDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 10
    val work = if (args.length > 1) args(1) else "/tmp/graft_scaleprobe"
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def replicate(df: DataFrame, keyCols: Seq[String]): DataFrame = {
      val reps = spark.range(n).select(col("id").as("rep"))
      df.crossJoin(reps).select(
        df.columns.toIndexedSeq.map { c =>
          if (keyCols.contains(c))
            (col(c) + col("rep") * 1000000000L).as(c)
          else col(c)
        }: _*)
    }

    // fact tables replicated with offset order keys; dims copied as-is
    replicate(Tables.orders(spark, src), Seq("o_orderkey"))
      .write.mode("overwrite").parquet(s"$work/orders.parquet")
    replicate(Tables.lineitem(spark, src), Seq("l_orderkey"))
      .write.mode("overwrite").parquet(s"$work/lineitem.parquet")
    Seq("region", "nation", "customer", "supplier", "part").foreach { t =>
      Tables.table(spark, src, t).write.mode("overwrite")
        .parquet(s"$work/$t.parquet")
    }

    def run(dir: String): (Double, Double, Long) = {
      val t0 = System.nanoTime()
      val fato = etl.Star.fatoVendas(spark, dir)
      graft.sink.Sink.parquet(fato, s"$work/dw_${dir.hashCode}/fato")
      val tEtl = (System.nanoTime() - t0) / 1e9
      val rows = spark.read.parquet(s"$work/dw_${dir.hashCode}/fato").count()
      val mat = spark.read.parquet(s"$work/dw_${dir.hashCode}/fato")
      val dimP = etl.Star.dimProduto(spark, dir)
      val t1 = System.nanoTime()
      kpi.Kpis.kpi5TopProdutos(mat, dimP).collect()
      kpi.Kpis.kpi2FaturamentoLiquido(mat).collect()
      val tKpi = (System.nanoTime() - t1) / 1e9
      (tEtl, tKpi, rows)
    }

    val (e1, k1, r1) = run(src)
    val (e2, k2, r2) = run(work)
    println(f"sf0.1 : fact=$r1%,d rows  etl=$e1%.1f s  kpi=$k1%.1f s")
    println(f"x$n%d   : fact=$r2%,d rows  etl=$e2%.1f s  kpi=$k2%.1f s")
    println(f"scale ratio: data=${r2.toDouble / r1}%.1fx  etl=${e2 / e1}%.2fx  kpi=${k2 / k1}%.2fx")
    spark.stop()
  }
}
