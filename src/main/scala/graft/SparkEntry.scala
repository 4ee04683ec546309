package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.etl.Star
import graft.kpi.Kpis
import graft.ops.RelationalOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` carries one entry per implemented operator from SURVEY.md §2
  * (plus scale extensions); `oracleSql` holds the DuckDB-equivalent SQL the
  * driver cross-checks against (graft.oracle.OracleSql).
  */
object SparkEntry {

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): KPI-5, the
    * deepest single query — scan → joins → SK build → decimal metrics →
    * grouped agg → top-k (SURVEY.md §7.3).
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Kpis.kpi5TopProdutos(Star.fatoVendas(spark, dir), Star.dimProduto(spark, dir))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = base ++
    graft.text.TextOps.queries ++ graft.text.CurationOps.queries ++
    graft.text.RetrievalOps.queries ++ graft.ops.GraphOps.queries ++
    graft.ops.QualityOps.queries ++
    graft.sim.EmbeddingOps.queries ++
    graft.multimodal.Multimodal.queries ++ graft.etl.Scd.queries ++
    graft.etl.Incremental.queries ++ graft.etl.Cdc.queries

  private def base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // star-schema ETL builds (reference dims + fact, SURVEY §2.1-2.3)
    "star_dim_produto" -> ((s, d) =>
      Star.dimProduto(s, d).orderBy("sk_produto")),
    "star_dim_cliente" -> ((s, d) =>
      Star.dimCliente(s, d).orderBy("sk_cliente")),
    "star_dim_vendedor" -> ((s, d) =>
      Star.dimVendedor(s, d).orderBy("sk_vendedor")),
    "star_dim_localidade" -> ((s, d) =>
      Star.dimLocalidade(s, d).orderBy("sk_localidade")),
    "star_dim_tempo" -> ((s, _) => Star.dimTempo(s).orderBy("sk_tempo")),
    // (orderkey, linenumber) is not unique in the generated lineitem, so
    // order by the full row for a deterministic dump. The fact stores
    // NUMERIC(18,2) money; the dump surfaces it as DOUBLE because DuckDB's
    // pandas bridge lowers DECIMAL to float64 (a decimal-typed dump would
    // compare representations, not values) — the double cast of an exact
    // decimal is bit-identical in both engines.
    "star_fato_vendas" -> ((s, d) =>
      Star.fatoVendas(s, d)
        .withColumn("valor_bruto", col("valor_bruto").cast("double"))
        .withColumn("valor_desconto", col("valor_desconto").cast("double"))
        .withColumn("valor_total", col("valor_total").cast("double"))
        .orderBy("id_pedido", "numero_linha",
        "sk_produto", "sk_vendedor", "qtd_vendida", "valor_bruto",
        "valor_desconto")),
    // decimal fidelity gate: string-cast DECIMAL(18,2) pins value AND
    // scale ("12345.60") identically in Spark and DuckDB
    "star_fato_vendas_dec" -> ((s, d) =>
      Star.fatoVendas(s, d)
        .withColumn("valor_bruto", col("valor_bruto").cast("string"))
        .withColumn("valor_desconto", col("valor_desconto").cast("string"))
        .withColumn("valor_total", col("valor_total").cast("string"))
        .orderBy("id_pedido", "numero_linha",
        "sk_produto", "sk_vendedor", "qtd_vendida", "valor_bruto",
        "valor_desconto")),
    // the fact build ingesting the reference's PRIMARY input format
    // (S1, dags/etl_dim_produto.py:14-16): all 7 sales tables staged as
    // real CSV — header, quoted fields, explicit \N nulls, µs
    // timestamps — then the identical star build. The oracle reads the
    // original PARQUET, so a hash match proves the CSV scan is lossless
    // end to end, not just test-asserted.
    "star_fato_vendas_csv" -> ((s, d) =>
      Star.fatoVendas(s, graft.etl.CsvStage.stage(s, d))
        .withColumn("valor_bruto", col("valor_bruto").cast("double"))
        .withColumn("valor_desconto", col("valor_desconto").cast("double"))
        .withColumn("valor_total", col("valor_total").cast("double"))
        .orderBy("id_pedido", "numero_linha",
        "sk_produto", "sk_vendedor", "qtd_vendida", "valor_bruto",
        "valor_desconto")),
    // the DIRTY twin (r13 verdict item 6): same build over a staging
    // with 6 injected malformed lines, PERMISSIVE + corrupt-capture —
    // the parquet oracle hash proves exactly the bad lines rejected
    "star_fato_vendas_csv_dirty" ->
      ((s, d) => graft.etl.CsvStage.dirtyFatoQuery(s, d)),
    "q_csv_dirty_audit" ->
      ((s, d) => graft.etl.CsvStage.dirtyAuditQuery(s, d)),
    // JSONL corpus ingestion (the LLM-data interchange format): the
    // documents table staged as nested gzipped .jsonl shards, read back
    // schema-directed (never inferred) and flattened — the parquet
    // oracle hash proves the round trip lossless. Plus the dirty twin
    // (6 injected malformed lines under PERMISSIVE + corrupt-capture)
    // and its reject audit.
    "q_ingest_jsonl" ->
      ((s, d) => graft.etl.JsonlStage.ingestQuery(s, d)),
    "q_ingest_jsonl_dirty" ->
      ((s, d) => graft.etl.JsonlStage.dirtyIngestQuery(s, d)),
    "q_jsonl_dirty_audit" ->
      ((s, d) => graft.etl.JsonlStage.dirtyAuditQuery(s, d)),
    // the streamed twin: one micro-batch per arriving shard, identical
    // flatten kernel, same parquet oracle
    "q_ingest_jsonl_stream" ->
      ((s, d) => graft.streaming.Streams.ingestJsonlStreamed(s, d)),
    // ORC interop gated: documents staged as multi-shard ORC, read back
    // through the native ORC source — the parquet oracle hash proves
    // the columnar round trip lossless
    "q_ingest_orc" ->
      ((s, d) => graft.etl.OrcStage.ingestQuery(s, d)),
    // the streamed twin: one micro-batch per ORC shard, same oracle
    "q_ingest_orc_stream" ->
      ((s, d) => graft.streaming.Streams.ingestOrcStreamed(s, d)),
    // schema evolution across parquet shard generations: contract-schema
    // read (no footer sweep) null-fills the columns old writers lacked
    "q_evolve_schema" ->
      ((s, d) => graft.etl.EvolveStage.evolveQuery(s, d)),
    "q_evolve_schema_stream" ->
      ((s, d) => graft.streaming.Streams.evolveSchemaStreamed(s, d)),
    // the 10-KPI analytical surface (SURVEY §2.4-2.5)
    "kpi1_faturamento_bruto" -> ((s, d) =>
      Kpis.kpi1FaturamentoBruto(Star.fatoVendas(s, d))),
    "kpi2_faturamento_liquido" -> ((s, d) =>
      Kpis.kpi2FaturamentoLiquido(Star.fatoVendas(s, d))),
    "kpi3_total_descontos" -> ((s, d) =>
      Kpis.kpi3TotalDescontos(Star.fatoVendas(s, d))),
    "kpi4_itens_vendidos" -> ((s, d) =>
      Kpis.kpi4ItensVendidos(Star.fatoVendas(s, d))),
    "kpi5_top_produtos" -> ((s, d) =>
      Kpis.kpi5TopProdutos(Star.fatoVendas(s, d), Star.dimProduto(s, d))),
    "kpi6_vendas_categoria" -> ((s, d) =>
      Kpis.kpi6VendasPorCategoria(Star.fatoVendas(s, d), Star.dimProduto(s, d))),
    "kpi7_vendas_pais" -> ((s, d) =>
      Kpis.kpi7PorPais(Star.fatoVendas(s, d), Star.dimLocalidade(s, d))),
    "kpi7_vendas_nacao" -> ((s, d) =>
      Kpis.kpi7PorNacao(Star.fatoVendas(s, d), Star.dimCliente(s, d))),
    "kpi8_sazonalidade" -> ((s, d) =>
      Kpis.kpi8Sazonalidade(Star.fatoVendas(s, d), Star.dimTempo(s))),
    "kpi9_ranking_vendedores" -> ((s, d) =>
      Kpis.kpi9RankingVendedores(Star.fatoVendas(s, d), Star.dimVendedor(s, d))),
    "kpi10_ticket_medio" -> ((s, d) =>
      Kpis.kpi10TicketMedio(Star.fatoVendas(s, d))),
    // operator micro-suite (remaining SURVEY §2 rows + extensions)
    "q_filter_project" -> (RelationalOps.filterProject _),
    "q_conditional" -> (RelationalOps.conditionalColumns _),
    "q_dedup_keepfirst" -> (RelationalOps.dedupKeepFirst _),
    "q_topk" -> (RelationalOps.topKOrders _),
    "q_window_running" -> (RelationalOps.windowRunning _),
    "q_window_analytics" -> (RelationalOps.windowAnalytics _),
    "q_semi_anti" -> (RelationalOps.semiAntiJoin _),
    "q_set_ops" -> (RelationalOps.setOps _),
    "q_agg_stats" -> (RelationalOps.aggStats _),
    "q_string_ops" -> (RelationalOps.stringOps _),
    "q_date_ops" -> (RelationalOps.dateOps _),
    "q_json_extract" -> (RelationalOps.jsonExtract _),
    "q_events_hourly" -> (RelationalOps.eventsHourly _),
    // composed TPC-H-shaped analytics over the sales tables
    "q_shipping_priority" -> (RelationalOps.shippingPriority _),
    "q_regional_volume" -> (RelationalOps.regionalVolume _),
    // overlapping 1h/15min sliding-window rollup
    "q_events_sliding" -> (RelationalOps.eventsSliding _),
    // the watermarked streaming form: append mode finalizes every real
    // window once the sentinel advances the watermark; same oracle
    "q_events_sliding_stream" ->
      (graft.streaming.Streams.eventsSlidingStreamed _),
    // idempotent ingest: at-least-once re-sends deduped by keyed state
    "q_dedup_events_stream" ->
      (graft.streaming.Streams.dedupEventsStreamed _),
    // strict-order conversion funnel (view → click → purchase)
    "q_funnel" -> (RelationalOps.funnelSteps _),
    // the stateful streamed twin: watermark-gated per-user buffer folded
    // in event-time order into the three monotone marks; same oracle
    "q_funnel_stream" -> (graft.streaming.Streams.funnelStreamed _),
    "q_percentiles" -> (RelationalOps.percentiles _),
    "q_scalar_subquery" -> (RelationalOps.scalarSubquery _),
    "q_pivot" -> (RelationalOps.pivotEvents _),
    "q_unpivot" -> (RelationalOps.unpivotEvents _),
    "q_rollup" -> (RelationalOps.rollupRevenue _),
    "q_cube" -> (RelationalOps.cubeRevenue _),
    "q_grouping_sets" -> (RelationalOps.groupingSets _),
    "q_distinct_stats" -> (RelationalOps.distinctStats _),
    "q_asof_join" -> (RelationalOps.asofAttribution _),
    "q_sessionize" -> (RelationalOps.sessionizeBatch _),
    // the built-in session_window form — same sessions, same oracle
    "q_sessionize_native" -> (RelationalOps.sessionizeNative _),
    // the STREAMED sessionizer (file source → flatMapGroupsWithState →
    // parquet sink under Trigger.AvailableNow), gated against the same
    // oracle as the batch twin
    "q_sessionize_stream" -> (graft.streaming.Streams.sessionizeStreamed _),
    // the NATIVE streaming form: the same session_window aggregation as
    // q_sessionize_native under a watermark in append mode — zero custom
    // state code; sentinel-flushed; same oracle
    "q_sessionize_window_stream" ->
      (graft.streaming.Streams.sessionizeWindowStreamed _),
    // the streamed INNER interval join (stream-stream, both sides
    // watermarked), gated against a plain batch interval-join oracle
    "q_attribution_stream" -> (graft.streaming.Streams.attributionStreamed _),
    // the LEFT OUTER form: unmatched purchases emit null-click rows once
    // the watermark proves no match can arrive (sentinel-flushed)
    "q_attribution_stream_outer" ->
      (graft.streaming.Streams.attributionStreamedOuter _),
    // the FULL OUTER form: unmatched rows flush in BOTH directions once
    // the other side's watermark proves no match can arrive
    "q_attribution_stream_full" ->
      (graft.streaming.Streams.attributionStreamedFull _),
    // streamed MinHash-LSH dedup: per-band stateful index, pairs emitted
    // incrementally as the later doc arrives; two-file staging forces
    // cross-batch pairs through state; same oracle as the batch form
    "q_dedup_minhash_stream" ->
      (graft.streaming.Streams.dedupMinhashStreamed _),
    // streamed multimodal decode: payload micro-batches through the
    // SAME real-WAV codec kernel as the batch gate; stateless decode ⇒
    // stream ≡ batch row-for-row; same oracle as q_multimodal_decode_wav
    "q_multimodal_decode_wav_stream" ->
      (graft.streaming.Streams.multimodalDecodeWavStreamed _),
    // streamed perceptual-hash: image micro-batches through the SAME
    // real-PNG ingest + decode + aHash kernel as q_multimodal_phash;
    // stateless hash ⇒ stream ≡ batch; bands-only oracle
    "q_multimodal_phash_stream" ->
      (graft.streaming.Streams.multimodalPhashStreamed _),
    // the leakage-safe split maintained under arrivals: the streamed band
    // index accumulates near-dup edges, components + the shared hash-split
    // tail close the assignment; same oracle as the batch form
    "q_split_leakage_safe_stream" ->
      (graft.streaming.Streams.splitLeakageSafeStreamed _),
    // streamed VERIFIED near-dup: SimHash64 band state carries the BIGINT
    // signature, exact hamming checked at emission — only true near-dups
    // leave the operator; same oracle as the batch q_dedup_simhash64
    "q_dedup_simhash_stream" ->
      (graft.streaming.Streams.dedupSimhashStreamed _),
    // streamed prefix-filtered SSJoin: per-prefix-shingle state index,
    // exact Jaccard verified at emission; same oracle as the batch form
    "q_dedup_jaccard_stream" ->
      ((s: SparkSession, d: String) =>
        graft.streaming.Streams.dedupJaccardStreamed(s, d)),
    // streamed exact-substring dedup: per-window-hash ownership state
    // emits every non-first occurrence as a cut position, with
    // retroactive transfer when an earlier occurrence arrives late;
    // converges to q_passage_clean's cut relation
    "q_dedup_passage_stream" ->
      (graft.streaming.Streams.dedupPassageStreamed _),
    // the composed curation pass as a stream: shared signal projections,
    // keep-min dedup through ownership state with retroactive release,
    // per-lang rollup over net claims; same oracle as q_corpus_curate
    "q_corpus_curate_stream" ->
      (graft.streaming.Streams.corpusCurateStreamed _),
    // the incremental fact load as a Structured Streaming job: staged
    // order slices arrive one micro-batch each, stream-static fact
    // derivation, parquet APPEND into the year-partitioned DW; same
    // oracle as the one-shot rebuild
    "q_fact_incremental_stream" ->
      (graft.streaming.Streams.factIncrementalStreamed _),
    "q_salted_agg" -> (RelationalOps.saltedAgg _),
    // bin-blocked range join (equi-join on fixed-width time bins) vs
    // DuckDB's native IEJoin — two different algorithms, same answer
    "q_range_join" -> (RelationalOps.rangeJoinBinned _),
    // salted (key, salt) skew join, row-identical to the plain join
    "q_skew_join_salted" -> (RelationalOps.skewJoinSalted _),
    // the optimizer-owned twin: no salt, AQE skew-split handles hot keys
    "q_skew_join_aqe" -> (RelationalOps.skewJoinAqe _),
    // sketch-detected hot keys: only keys the Misra-Gries summary flags
    // get the 16-way salt; same plain-join oracle (salting is a cost
    // device, never a semantics device)
    "q_skew_join_salted_adaptive" -> (RelationalOps.skewJoinSaltedAdaptive _),
    "q_bloom_semijoin" -> (RelationalOps.bloomSemiJoin _),
    // mergeable count-min sketch, cells only (production form — no exact
    // truth in-plan); oracle rebuilds the identical cell matrix
    "q_sketch_countmin" -> (RelationalOps.countMinCells _),
    // column-level profile (nulls/distincts/min/max in one scan)
    "q_profile_orders" -> (RelationalOps.profileOrders _),
    // mergeable equi-width histogram cells (the quantile-family sketch)
    "q_sketch_histogram" -> (RelationalOps.histogramCells _),
    // the cell table maintained per micro-batch by additive merge
    "q_sketch_histogram_stream" ->
      (graft.streaming.Streams.histogramStreamed _),
    "q_sql_frontend" -> (RelationalOps.sqlFrontend _))

  def oracleSql: Map[String, String] = graft.oracle.OracleSql.all ++
    graft.text.TextOps.oracle ++ graft.text.CurationOps.oracle ++
    graft.text.RetrievalOps.oracle ++ graft.ops.GraphOps.oracle ++
    graft.ops.QualityOps.oracle ++
    graft.sim.EmbeddingOps.oracle ++
    graft.multimodal.Multimodal.oracle ++ graft.etl.Scd.oracle ++
    graft.etl.Cdc.oracle
}
