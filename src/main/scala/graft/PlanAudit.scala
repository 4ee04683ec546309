package graft

import org.apache.spark.sql.SparkSession

/** Prints formatted physical plans for representative queries so scan
  * pruning (ReadSchema/PushedFilters), join strategies (BroadcastHashJoin
  * vs shuffle), aggregate shape (partial+final) and WholeStageCodegen
  * spans can be audited against the 100 TB design goals.
  *
  * Usage:
  *   runMain graft.PlanAudit [sfDir] [query ...]   — whole-lineage plans
  *   runMain graft.PlanAudit --dw [sfDir]          — the Bench phase-2
  *     path: materialize the star to parquet, then explain AND time each
  *     KPI against the parquet-backed DW (dims read back from disk, not
  *     in-plan), which is where join-strategy choices differ from the
  *     whole-lineage path.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dwMode = args.contains("--dw")
    val rest = args.filterNot(_ == "--dw")
    val dir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master(s"local[${if (dwMode) 32 else 8}]")
      .config("spark.sql.shuffle.partitions", if (dwMode) "32" else "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (dwMode) auditDw(spark, dir) else {
      val which: Seq[String] =
        if (rest.length > 1) rest.drop(1).toSeq
        else Seq("q_filter_project", "star_fato_vendas", "kpi5_top_produtos",
          "q_agg_stats", "q_dedup_minhash_lsh", "q_ann_brute")
      which.foreach { name =>
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
      }
    }
    spark.stop()
  }

  /** Mirror of Bench phase 1+2: sink the star, read it back, explain+time. */
  private def auditDw(spark: SparkSession, dir: String): Unit = {
    import graft.etl.Star
    import graft.kpi.Kpis
    import org.apache.spark.sql.functions.col
    val dw = s"/tmp/graft_planaudit_dw_${System.nanoTime()}"
    graft.sink.Sink.parquet(Star.dimProduto(spark, dir), s"$dw/dim_produto")
    graft.sink.Sink.parquet(Star.dimCliente(spark, dir), s"$dw/dim_cliente")
    graft.sink.Sink.parquet(Star.dimVendedor(spark, dir), s"$dw/dim_vendedor")
    graft.sink.Sink.parquet(Star.dimLocalidade(spark, dir), s"$dw/dim_localidade")
    graft.sink.Sink.parquet(Star.dimTempo(spark), s"$dw/dim_tempo")
    val ano = (col("sk_tempo") / 10000).cast("int")
    graft.sink.Sink.parquet(
      Star.fatoVendas(spark, dir).withColumn("ano", ano),
      s"$dw/fato_vendas", partitionBy = Seq("ano"))
    def rd(t: String) = spark.read.parquet(s"$dw/$t")
    val fato = rd("fato_vendas").drop("ano")
    val kpis: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "kpi1" -> Kpis.kpi1FaturamentoBruto(fato),
      "kpi5" -> Kpis.kpi5TopProdutos(fato, rd("dim_produto")),
      "kpi6" -> Kpis.kpi6VendasPorCategoria(fato, rd("dim_produto")),
      "kpi7" -> Kpis.kpi7PorNacao(fato, rd("dim_cliente")),
      "kpi7_pais" -> Kpis.kpi7PorPais(fato, rd("dim_localidade")),
      "kpi8" -> Kpis.kpi8Sazonalidade(fato, rd("dim_tempo")),
      "kpi9" -> Kpis.kpi9RankingVendedores(fato, rd("dim_vendedor")))
    kpis.foreach { case (name, df) =>
      println(s"\n========== DW $name ==========")
      df.explain("formatted")
      (1 to 3).foreach { rep =>
        val t0 = System.nanoTime()
        df.collect()
        println(f"[$name rep $rep] ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
  }
}
