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
  *   runMain graft.PlanAudit --ext [sfDir]         — ASSERTS the
  *     AutoBroadcastBoundedDims rule fires in a session configured like
  *     Bench's — which since r9 is ALSO the Verify gate's configuration
  *     (both install graft.plans.GraftExtensions, so gated plans = bench
  *     plans = deployed plans): a freshly derived bounded dim (no
  *     explicit hint) joined under autoBroadcastJoinThreshold=-1 must
  *     plan a BroadcastHashJoin via the rule, and a corpus-growing dim
  *     must NOT. Exits non-zero on failure.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dwMode = args.contains("--dw")
    val extMode = args.contains("--ext")
    val rest = args.filterNot(a => a == "--dw" || a == "--ext")
    val dir = if (rest.nonEmpty) rest(0) else "/root/testdata/sf0.01"
    val builder = SparkSession.builder()
      .master(s"local[${if (dwMode) 32 else 8}]")
      .config("spark.sql.shuffle.partitions", if (dwMode) "32" else "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    if (extMode) builder.config("spark.sql.extensions", "graft.plans.GraftExtensions")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (extMode) { auditExt(spark, dir); spark.stop(); return }
    if (dwMode) auditDw(spark, dir) else {
      val which: Seq[String] =
        if (rest.length > 1) rest.drop(1).toSeq
        else Seq("q_filter_project", "star_fato_vendas", "kpi5_top_produtos",
          "q_agg_stats", "q_dedup_minhash_lsh", "q_ann_brute")
      which.foreach { name =>
        println(s"\n========== $name ==========")
        SparkEntry.queries(name)(spark, dir).explain("formatted")
        // frame construction executes its barriers eagerly; the plan is
        // printed, so the blocks are dead — release between queries
        Checkpoint.releaseAll()
      }
    }
    spark.stop()
  }

  /** Asserts the shipped optimizer rule influences real plans: with the
    * size heuristic disabled (threshold -1, the stand-in for "derived dim
    * with no usable stats"), an UNHINTED lookup against the derived
    * vendedor dim must still plan a BroadcastHashJoin — attributable only
    * to AutoBroadcastBoundedDims — while the corpus-growing cliente dim
    * must stay on the size-driven (shuffled) path.
    */
  private def auditExt(spark: SparkSession, dir: String): Unit = {
    import graft.etl.Star
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    val l = graft.Tables.lineitem(spark, dir)
    val dv = Star.dimVendedor(spark, dir)
      .select("sk_vendedor", "id_vendedor_original")
    val hinted = l.join(dv, l("l_suppkey") === dv("id_vendedor_original"), "left")
    val hintedPlan = hinted.queryExecution.executedPlan.toString
    val o = graft.Tables.orders(spark, dir)
    val dc = Star.dimCliente(spark, dir)
      .select("sk_cliente", "id_cliente_original")
    val corpus = o.join(dc, o("o_custkey") === dc("id_cliente_original"), "left")
    val corpusPlan = corpus.queryExecution.executedPlan.toString
    // the dims' INTERNAL nation/region joins carry explicit broadcast()
    // hints, so BroadcastHashJoin presence alone can't attribute the rule;
    // the outer lookup is the only join left that COULD sort-merge — its
    // strategy is read off SortMergeJoin presence/absence
    val okBounded = !hintedPlan.contains("SortMergeJoin") &&
      hintedPlan.contains("BroadcastHashJoin")
    val okCorpus = corpusPlan.contains("SortMergeJoin")
    println(s"[ext-audit] derived bounded dim broadcasts via rule: $okBounded")
    println(s"[ext-audit] corpus-growing dim stays shuffled:       $okCorpus")
    if (!okBounded) println(hintedPlan)
    if (!okCorpus) println(corpusPlan)
    if (!(okBounded && okCorpus)) {
      System.err.println("[ext-audit] FAIL")
      spark.stop()
      sys.exit(1)
    }
    println("[ext-audit] PASS")
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
