package graft

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.etl.Star
import graft.kpi.Kpis

/** Benchmark main — prints ONE JSON line with per-query seconds.
  *
  * Mirrors the reference's lifecycle (BASELINE.md): the ETL builds and
  * SINKS the star once (`etl_star_build`, comparable to the reference's
  * ~19.8 s six-task pipeline), then the KPI suite queries the MATERIALIZED
  * DW (comparable to KPIs.sql against loaded Postgres). Extension
  * operators (dedup/ANN/text/streaming-twin) run self-contained on the raw
  * tables.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val times = mutable.LinkedHashMap.empty[String, Double]
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      try f catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      times(name) = (System.nanoTime() - t0) / 1e9
    }

    val dw = s"/tmp/graft_bench_dw_${System.nanoTime()}"

    // Phase 1 — ETL: build + sink the whole star (reference: 6 DAG tasks).
    time("etl_star_build") {
      graft.sink.Sink.parquet(Star.dimProduto(spark, sfDir), s"$dw/dim_produto")
      graft.sink.Sink.parquet(Star.dimCliente(spark, sfDir), s"$dw/dim_cliente")
      graft.sink.Sink.parquet(Star.dimVendedor(spark, sfDir), s"$dw/dim_vendedor")
      graft.sink.Sink.parquet(Star.dimTempo(spark), s"$dw/dim_tempo")
      graft.sink.Sink.parquet(Star.fatoVendas(spark, sfDir), s"$dw/fato_vendas")
    }

    // Phase 2 — KPI suite over the materialized DW (reference: KPIs.sql).
    val fato = spark.read.parquet(s"$dw/fato_vendas")
    val dimP = spark.read.parquet(s"$dw/dim_produto")
    val dimC = spark.read.parquet(s"$dw/dim_cliente")
    val dimV = spark.read.parquet(s"$dw/dim_vendedor")
    val dimT = spark.read.parquet(s"$dw/dim_tempo")
    val kpis: Seq[(String, () => DataFrame)] = Seq(
      "kpi1" -> (() => Kpis.kpi1FaturamentoBruto(fato)),
      "kpi2" -> (() => Kpis.kpi2FaturamentoLiquido(fato)),
      "kpi3" -> (() => Kpis.kpi3TotalDescontos(fato)),
      "kpi4" -> (() => Kpis.kpi4ItensVendidos(fato)),
      "kpi5" -> (() => Kpis.kpi5TopProdutos(fato, dimP)),
      "kpi6" -> (() => Kpis.kpi6VendasPorCategoria(fato, dimP)),
      "kpi7" -> (() => Kpis.kpi7PorNacao(fato, dimC)),
      "kpi8" -> (() => Kpis.kpi8Sazonalidade(fato, dimT)),
      "kpi9" -> (() => Kpis.kpi9RankingVendedores(fato, dimV)),
      "kpi10" -> (() => Kpis.kpi10TicketMedio(fato)))
    kpis.foreach { case (name, q) => time(name) { q().collect() } }

    // Phase 3 — extension operators, self-contained on the raw tables.
    Seq("q_agg_stats", "q_topk", "q_window_running", "q_semi_anti",
      "q_events_hourly", "q_text_quality", "q_fingerprint",
      "q_dedup_minhash_lsh", "q_dedup_jaccard", "q_ann_brute",
      "q_embed_neardup").foreach { name =>
      time(name) { SparkEntry.queries(name)(spark, sfDir).count() }
    }

    val qs = times.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = times.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
