package graft.oracle

/** DuckDB-dialect oracle SQL for every entry in SparkEntry.queries.
  *
  * Each statement is semantically equivalent ANSI SQL over the same parquet
  * tables, engineered for BIT-EXACT equality with the Spark result:
  *   - money math in exact DECIMAL, cast to DOUBLE only at the end
  *     (order-independent, so distributed vs single-node sums agree);
  *   - explicit CASTs pin result dtypes (DuckDB SUM(int)→HUGEINT etc.);
  *   - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *     replace-all semantics;
  *   - every query has a deterministic total ORDER BY.
  */
object OracleSql {

  /** Shared star-schema CTE block (the testdata mirror of the reference DW;
    * see graft.etl.Star).
    */
  val starCte: String = """
dim_produto AS (
  SELECT CAST(row_number() OVER (ORDER BY p_partkey) AS INTEGER) AS sk_produto,
         CAST(p_partkey AS BIGINT) AS id_produto_original,
         p_name AS nome_produto,
         coalesce(p_brand, 'N/A') AS marca,
         coalesce(p_type, 'Sem Categoria') AS categoria,
         CAST(p_size AS INTEGER) AS tamanho
  FROM part
),
dim_cliente AS (
  SELECT CAST(row_number() OVER (ORDER BY id_cliente_original) AS INTEGER) AS sk_cliente, *
  FROM (
    SELECT CAST(c_custkey AS BIGINT) AS id_cliente_original,
           trim(c_name) AS nome_cliente,
           CASE WHEN c_acctbal < 0 THEN 'Devedor' ELSE 'Regular' END AS tipo_cliente,
           coalesce(n_name, 'Não Informado') AS nacao,
           coalesce(r_name, 'Não Informado') AS regiao,
           coalesce(c_mktsegment, 'N/A') AS segmento
    FROM customer
    LEFT JOIN nation ON c_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
  )
),
dim_vendedor AS (
  SELECT CAST(row_number() OVER (ORDER BY id_vendedor_original) AS INTEGER) AS sk_vendedor, *
  FROM (
    SELECT CAST(s_suppkey AS BIGINT) AS id_vendedor_original,
           trim(regexp_replace(s_name, '  +', ' ', 'g')) AS nome_vendedor,
           coalesce(n_name, 'Não Informado') AS nacao
    FROM supplier
    LEFT JOIN nation ON s_nationkey = n_nationkey
  )
),
dim_localidade AS (
  SELECT CAST(row_number() OVER (ORDER BY id_localidade_original) AS INTEGER) AS sk_localidade, *
  FROM (
    SELECT CAST(s_suppkey AS BIGINT) AS id_localidade_original,
           coalesce(n_name, 'Não Informado') AS pais,
           coalesce(r_name, 'Não Informado') AS regiao
    FROM supplier
    LEFT JOIN nation ON s_nationkey = n_nationkey
    LEFT JOIN region ON n_regionkey = r_regionkey
  )
),
dim_tempo AS (
  SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INTEGER) AS sk_tempo,
         d AS data_completa,
         CAST(year(d) AS INTEGER) AS ano,
         CAST(month(d) AS INTEGER) AS mes,
         CASE CAST(month(d) AS INTEGER)
           WHEN 1 THEN 'Janeiro' WHEN 2 THEN 'Fevereiro' WHEN 3 THEN 'Março'
           WHEN 4 THEN 'Abril' WHEN 5 THEN 'Maio' WHEN 6 THEN 'Junho'
           WHEN 7 THEN 'Julho' WHEN 8 THEN 'Agosto' WHEN 9 THEN 'Setembro'
           WHEN 10 THEN 'Outubro' WHEN 11 THEN 'Novembro' WHEN 12 THEN 'Dezembro'
         END AS nome_mes,
         CAST(quarter(d) AS INTEGER) AS trimestre,
         CASE WHEN month(d) <= 6 THEN 1 ELSE 2 END AS semestre
  FROM (SELECT CAST(unnest(generate_series(DATE '1995-01-01', DATE '2001-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
),
fato AS (
  SELECT CAST(l.l_orderkey AS BIGINT) AS id_pedido,
         CAST(l.l_linenumber AS INTEGER) AS numero_linha,
         dp.sk_produto AS sk_produto,
         dc.sk_cliente AS sk_cliente,
         dv.sk_vendedor AS sk_vendedor,
         dl.sk_localidade AS sk_localidade,
         CAST(year(o.o_orderdate)*10000 + month(o.o_orderdate)*100 + day(o.o_orderdate) AS INTEGER) AS sk_tempo,
         CAST(l.l_quantity AS INTEGER) AS qtd_vendida,
         -- NUMERIC(18,2) money surface (reference DDL); round() reproduces
         -- Spark's HALF_UP scale reduction — DuckDB's bare decimal→decimal
         -- cast TRUNCATES, so the cast alone would diverge on scale-4 ties
         CAST(l.l_extendedprice AS DECIMAL(18,2)) AS valor_bruto,
         CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(l.l_discount AS DECIMAL(4,2)), 2) AS DECIMAL(18,2)) AS valor_desconto,
         CAST(round(CAST(l.l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))), 2) AS DECIMAL(18,2)) AS valor_total
  FROM orders o
  JOIN lineitem l ON o.o_orderkey = l.l_orderkey
  LEFT JOIN dim_produto dp ON l.l_partkey = dp.id_produto_original
  LEFT JOIN dim_cliente dc ON o.o_custkey = dc.id_cliente_original
  LEFT JOIN dim_vendedor dv ON l.l_suppkey = dv.id_vendedor_original
  LEFT JOIN dim_localidade dl ON l.l_suppkey = dl.id_localidade_original
  WHERE dp.sk_produto IS NOT NULL AND dc.sk_cliente IS NOT NULL
)"""

  private def withStar(sql: String): String = s"WITH $starCte\n$sql"

  /** Decimal-exact SUM of a money column, surfaced as DOUBLE. */
  private def sumd(c: String) =
    s"CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE)"

  /** kpi6, shared verbatim with the incrementally-maintained view gates
    * (q_kpi_incremental and its streamed twin): one recompute truth for
    * the one-shot and maintained forms.
    */
  private lazy val kpi6Sql: String = withStar(
    s"""SELECT p.categoria, ${sumd("f.valor_total")} AS total_vendas,
       COUNT(*) AS quantidade_vendas
FROM fato f JOIN dim_produto p ON f.sk_produto = p.sk_produto
GROUP BY p.categoria
ORDER BY total_vendas DESC, categoria""")

  private val funnelSql: String =
    """WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
       WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT e.user_id, MIN(e.ts) AS t_click FROM events e
      JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t_view GROUP BY e.user_id),
p AS (SELECT e.user_id, MIN(e.ts) AS t_compra FROM events e
      JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click GROUP BY e.user_id)
SELECT v.user_id, v.t_view, c.t_click, p.t_compra,
       CASE WHEN p.t_compra IS NOT NULL THEN 1 ELSE 0 END AS converteu
FROM v LEFT JOIN c ON v.user_id = c.user_id
       LEFT JOIN p ON v.user_id = p.user_id
ORDER BY v.user_id"""

  /** Shared by q_sessionize AND q_sessionize_native — the built-in
    * session_window form produces byte-identical sessions to the
    * lag/cumsum form (both split strictly PAST the 30-min gap;
    * boundary pinned by SessionWindowSpec).
    */
  private val sessionizeSql: String =
    """WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS quebra
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(quebra) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS sessao
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(sessao AS INTEGER) AS sessao,
       COUNT(*) AS n_eventos,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS inicio,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS fim,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS valor
FROM sess
GROUP BY user_id, sessao
ORDER BY user_id, sessao"""

  val all: Map[String, String] = Map(
    "q_sessionize_native" -> sessionizeSql,
    // the streaming session_window aggregation finalizes exactly the
    // batch sessions once the sentinel advances the watermark
    "q_sessionize_window_stream" -> sessionizeSql,
    // ------------------------------------------------ star-schema builds
    "star_dim_produto" -> withStar(
      "SELECT * FROM dim_produto ORDER BY sk_produto"),
    "star_dim_cliente" -> withStar(
      "SELECT * FROM dim_cliente ORDER BY sk_cliente"),
    "star_dim_vendedor" -> withStar(
      "SELECT * FROM dim_vendedor ORDER BY sk_vendedor"),
    "star_dim_localidade" -> withStar(
      "SELECT * FROM dim_localidade ORDER BY sk_localidade"),
    "star_dim_tempo" -> withStar(
      "SELECT * FROM dim_tempo ORDER BY sk_tempo"),
    // money columns surfaced as DOUBLE for the cross-engine value compare
    // (DuckDB's pandas bridge lowers DECIMAL to float64, so a decimal-typed
    // dump compares representation, not value; the double cast of an exact
    // decimal is bit-identical in both engines). star_fato_vendas_dec below
    // gates the decimal surface itself via scale-pinned strings.
    "star_fato_vendas" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    // the CSV-ingest twin: the engine builds from staged CSV while THIS
    // oracle still reads the parquet originals — the hash meet is the
    // lossless-round-trip proof for the reference's primary input format
    "star_fato_vendas_csv" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    // the dirty-ingest twin: the engine reads a staging with 6 injected
    // malformed lines under PERMISSIVE + corrupt-capture; this oracle
    // reads the clean parquet — a hash meet proves the rejects were
    // EXACTLY the injected lines (nothing real lost, nothing bad kept)
    "star_fato_vendas_csv_dirty" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    // reject audit: 6 injected corrupt lines, survivors = the clean table
    "q_csv_dirty_audit" ->
      """SELECT 'lineitem' AS tabela, CAST(6 AS BIGINT) AS corrotas,
CAST(COUNT(*) AS BIGINT) AS sobreviventes FROM lineitem""",
    // JSONL ingest: the engine reads nested gzipped .jsonl shards, this
    // oracle reads the original parquet — a hash meet proves the round
    // trip (JSON escaping, nested meta, explicit-schema read) lossless
    "q_ingest_jsonl" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
CAST(n_chars AS BIGINT) AS n_chars FROM documents ORDER BY doc_id""",
    // the dirty twin: survivors of the PERMISSIVE read must be EXACTLY
    // the clean table (every injected malformation rejected, no phantom
    // null-filled rows admitted)
    "q_ingest_jsonl_dirty" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
CAST(n_chars AS BIGINT) AS n_chars FROM documents ORDER BY doc_id""",
    "q_jsonl_dirty_audit" ->
      """SELECT 'documents' AS tabela, CAST(6 AS BIGINT) AS corrotas,
CAST(COUNT(*) AS BIGINT) AS sobreviventes FROM documents""",
    "q_ingest_jsonl_stream" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
CAST(n_chars AS BIGINT) AS n_chars FROM documents ORDER BY doc_id""",
    // ORC round trip: the engine reads the ORC staging, this oracle the
    // original parquet — a hash meet proves the interop lossless
    "q_ingest_orc" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
CAST(n_chars AS BIGINT) AS n_chars FROM documents ORDER BY doc_id""",
    // the shard-per-micro-batch stream lands the identical rows
    "q_ingest_orc_stream" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang, source,
CAST(n_chars AS BIGINT) AS n_chars FROM documents ORDER BY doc_id""",
    // schema evolution: even doc_ids were written by the gen1 producer
    // (no source/n_chars yet) — the unified read must null-fill exactly
    // those, and only those
    "q_evolve_schema" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang,
CASE WHEN doc_id % 2 = 0 THEN NULL ELSE source END AS source,
CASE WHEN doc_id % 2 = 0 THEN NULL
     ELSE CAST(n_chars AS BIGINT) END AS n_chars
FROM documents ORDER BY doc_id""",
    // the same contract-schema null-fill under streaming shard arrival
    "q_evolve_schema_stream" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, text, lang,
CASE WHEN doc_id % 2 = 0 THEN NULL ELSE source END AS source,
CASE WHEN doc_id % 2 = 0 THEN NULL
     ELSE CAST(n_chars AS BIGINT) END AS n_chars
FROM documents ORDER BY doc_id""",
    // incremental lifecycle gates (batch twin + the Structured Streaming
    // form): historical load + increment append must equal the full
    // rebuild — the oracle IS the full build
    "q_fact_incremental_stream" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    "q_fact_incremental" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    // the backfilled DW must equal the one-shot rebuild row-for-row
    "q_fact_backfill" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS DOUBLE) AS valor_bruto,
CAST(valor_desconto AS DOUBLE) AS valor_desconto,
CAST(valor_total AS DOUBLE) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),
    // decimal fidelity gate: VARCHAR of a DECIMAL(18,2) pins value AND
    // scale ("12345.60") identically in Spark and DuckDB
    "star_fato_vendas_dec" -> withStar(
      """SELECT id_pedido, numero_linha, sk_produto, sk_cliente, sk_vendedor,
sk_localidade, sk_tempo, qtd_vendida,
CAST(valor_bruto AS VARCHAR) AS valor_bruto,
CAST(valor_desconto AS VARCHAR) AS valor_desconto,
CAST(valor_total AS VARCHAR) AS valor_total
FROM fato ORDER BY id_pedido, numero_linha, sk_produto,
sk_vendedor, qtd_vendida, valor_bruto, valor_desconto"""),

    // ------------------------------------------------ the 10 KPIs
    "kpi1_faturamento_bruto" -> withStar(
      s"SELECT ${sumd("valor_bruto")} AS faturamento_bruto FROM fato"),
    "kpi2_faturamento_liquido" -> withStar(
      s"SELECT ${sumd("valor_total")} AS faturamento_liquido FROM fato"),
    "kpi3_total_descontos" -> withStar(
      s"SELECT ${sumd("valor_desconto")} AS total_descontos FROM fato"),
    "kpi4_itens_vendidos" -> withStar(
      "SELECT CAST(SUM(CAST(qtd_vendida AS BIGINT)) AS BIGINT) AS total_itens_vendidos FROM fato"),
    "kpi5_top_produtos" -> withStar(
      s"""SELECT p.nome_produto, ${sumd("f.valor_total")} AS total_vendas
FROM fato f JOIN dim_produto p ON f.sk_produto = p.sk_produto
GROUP BY p.nome_produto
ORDER BY total_vendas DESC, nome_produto
LIMIT 5"""),
    "kpi6_vendas_categoria" -> kpi6Sql,
    // the incrementally-maintained materialized view (batch + streamed
    // twins) must land on the one-shot aggregate — decimal partial sums
    // are associative, so the gate is bit-exact, not approximate
    "q_kpi_incremental" -> kpi6Sql,
    "q_kpi_incremental_stream" -> kpi6Sql,
    "kpi7_vendas_pais" -> withStar(
      s"""SELECT l.pais, ${sumd("f.valor_total")} AS total_vendas
FROM fato f JOIN dim_localidade l ON f.sk_localidade = l.sk_localidade
GROUP BY l.pais
ORDER BY total_vendas DESC, pais"""),
    "kpi7_vendas_nacao" -> withStar(
      s"""SELECT c.nacao, ${sumd("f.valor_total")} AS total_vendas
FROM fato f JOIN dim_cliente c ON f.sk_cliente = c.sk_cliente
GROUP BY c.nacao
ORDER BY total_vendas DESC, nacao"""),
    "kpi8_sazonalidade" -> withStar(
      s"""SELECT t.ano, t.mes, t.nome_mes, ${sumd("f.valor_total")} AS total_vendas
FROM fato f JOIN dim_tempo t ON f.sk_tempo = t.sk_tempo
GROUP BY t.ano, t.mes, t.nome_mes
ORDER BY t.ano, t.mes"""),
    "kpi9_ranking_vendedores" -> withStar(
      s"""SELECT v.nome_vendedor, ${sumd("f.valor_total")} AS total_gerado
FROM fato f JOIN dim_vendedor v ON f.sk_vendedor = v.sk_vendedor
WHERE v.nome_vendedor IS NOT NULL
GROUP BY v.nome_vendedor
ORDER BY total_gerado DESC, nome_vendedor
LIMIT 10"""),
    "kpi10_ticket_medio" -> withStar(
      s"""SELECT ${sumd("valor_total")} / CAST(COUNT(*) AS DOUBLE) AS ticket_medio_item
FROM fato"""),

    // ------------------------------------------------ operator micro-suite
    "q_filter_project" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       CAST(l_linenumber AS INTEGER) AS l_linenumber,
       CAST(l_quantity AS INTEGER) AS qtd,
       l_returnflag AS flag
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1997-01-01' AND l_discount > 0.05
ORDER BY l_orderkey, l_linenumber""",
    "q_conditional" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
       CASE WHEN trim(c_name) = '' THEN 'Cliente Corporativo / Loja' ELSE trim(c_name) END AS nome,
       CASE WHEN c_nationkey IS NOT NULL THEN 'Individual' ELSE 'Store' END AS tipo,
       CASE WHEN c_acctbal < 0 THEN 'devedor' WHEN c_acctbal < 5000 THEN 'regular' ELSE 'vip' END AS faixa
FROM customer
ORDER BY c_custkey""",
    "q_dedup_keepfirst" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(event_id AS BIGINT) AS first_event_id,
       event_type AS first_event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn FROM events)
WHERE rn = 1
ORDER BY user_id""",
    "q_topk" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders
ORDER BY total DESC, o_orderkey
LIMIT 20""",
    "q_window_running" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS preco,
       CAST(row_number() OVER w AS INTEGER) AS n_pedido,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS acumulado
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey""",
    "q_window_analytics" ->
      """SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS preco,
       lead(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 1) OVER wd AS preco_proximo,
       CAST(rank() OVER wm AS INTEGER) AS rk_mes,
       CAST(dense_rank() OVER wm AS INTEGER) AS drk_mes,
       CAST(ntile(4) OVER wd AS INTEGER) AS quartil,
       first_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS primeiro_preco,
       last_value(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ultimo_preco
FROM orders
WINDOW wd AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wm AS (PARTITION BY o_custkey ORDER BY month(o_orderdate))
ORDER BY o_custkey, o_orderkey""",
    "q_semi_anti" ->
      """SELECT CAST(c_custkey AS BIGINT) AS c_custkey, status FROM (
  SELECT c_custkey, 'com_pedido' AS status FROM customer c
  WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  UNION ALL
  SELECT c_custkey, 'sem_pedido' AS status FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
ORDER BY c_custkey""",
    "q_set_ops" ->
      """WITH custn AS (SELECT n_name FROM customer JOIN nation ON c_nationkey = n_nationkey),
     suppn AS (SELECT n_name FROM supplier JOIN nation ON s_nationkey = n_nationkey)
SELECT n_name, op FROM (
  SELECT DISTINCT n_name, 'union' AS op FROM (SELECT * FROM custn UNION SELECT * FROM suppn)
  UNION ALL
  SELECT n_name, 'intersect' AS op FROM (SELECT * FROM custn INTERSECT SELECT * FROM suppn)
  UNION ALL
  SELECT n_name, 'except' AS op FROM (SELECT * FROM custn EXCEPT SELECT * FROM suppn))
ORDER BY op, n_name""",
    "q_agg_stats" ->
      """SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
    "q_string_ops" ->
      """SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey,
       concat_ws(' ', trim(s_name), 'T') AS etiqueta,
       upper(s_name) AS maiuscula,
       lower(s_name) AS minuscula,
       substring(s_name, 1, 8) AS prefixo,
       CAST(length(s_name) AS INTEGER) AS tam,
       trim(regexp_replace(s_name, '[0-9]+', '#', 'g')) AS mascarado
FROM supplier
ORDER BY s_suppkey""",
    "q_date_ops" ->
      """SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS ano,
       CAST(month(o_orderdate) AS INTEGER) AS mes,
       CAST(day(o_orderdate) AS INTEGER) AS dia,
       CAST(quarter(o_orderdate) AS INTEGER) AS trimestre,
       CASE WHEN month(o_orderdate) <= 6 THEN 1 ELSE 2 END AS semestre,
       CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS INTEGER) AS sk_tempo,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS mes_ref,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS prazo
FROM orders
ORDER BY o_orderkey""",
    "q_json_extract" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
ORDER BY event_id""",
    "q_percentiles" ->
      """SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50,
       quantile_cont(l_extendedprice, 0.9) AS p90,
       quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS q25
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag""",
    "q_scalar_subquery" ->
      """SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, n.n_name,
       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS saldo
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
      (SELECT COUNT(*) FROM customer c2
       WHERE c2.c_nationkey = c.c_nationkey) >
      (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
       WHERE c3.c_nationkey = c.c_nationkey)
ORDER BY c_custkey""",
    "q_pivot" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id,
       COUNT(*) FILTER (WHERE event_type = 'click') AS click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS error,
       COUNT(*) FILTER (WHERE event_type = 'view') AS view,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS signup
FROM events
GROUP BY user_id
ORDER BY user_id""",
    // unpivot round-trip of q_pivot: melt the wide matrix back to sparse
    // long rows — in DuckDB the original grouped count IS that shape
    "q_unpivot" ->
      """SELECT CAST(user_id AS BIGINT) AS user_id, event_type,
       COUNT(*) AS n
FROM events
WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
GROUP BY user_id, event_type
ORDER BY user_id, event_type""",
    "q_rollup" ->
      """SELECT coalesce(n_name, 'TOTAL') AS nacao,
       coalesce(c_mktsegment, 'TOTAL') AS segmento,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS receita,
       COUNT(*) AS n_pedidos
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP(n_name, c_mktsegment)
ORDER BY nacao, segmento""",
    "q_grouping_sets" ->
      """SELECT coalesce(n_name, 'TOTAL') AS nacao,
       coalesce(c_mktsegment, 'TOTAL') AS segmento,
       coalesce(o_orderpriority, 'TOTAL') AS prioridade,
       CAST(GROUPING(n_name, c_mktsegment, o_orderpriority) AS INTEGER) AS gid,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS receita,
       COUNT(*) AS n_pedidos
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (o_orderpriority))
ORDER BY gid, nacao, segmento, prioridade""",
    "q_cube" ->
      """SELECT coalesce(n_name, 'TOTAL') AS nacao,
       coalesce(c_mktsegment, 'TOTAL') AS segmento,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS receita,
       COUNT(*) AS n_pedidos
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY CUBE(n_name, c_mktsegment)
ORDER BY nacao, segmento""",
    "q_distinct_stats" ->
      """SELECT o_orderpriority,
       COUNT(DISTINCT o_custkey) AS clientes_distintos,
       COUNT(DISTINCT o_orderdate) AS datas_distintas,
       COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority""",
    "q_asof_join" ->
      """SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_compra,
       CAST(c.event_id AS BIGINT) AS click_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts > c.ts
ORDER BY purchase_id""",
    "q_sessionize" -> sessionizeSql,
    // the streamed inner interval join must emit exactly the pairs a
    // batch interval join computes (Streams.attributionStreamed)
    "q_attribution_stream" ->
      """SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(c.event_id AS BIGINT) AS click_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_compra,
       strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS ts_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id""",
    // LEFT OUTER: every purchase row survives; unmatched ones carry the
    // null sentinels (click_id -1, 1900-01-01) both engines coalesce to
    "q_attribution_stream_outer" ->
      """SELECT CAST(p.event_id AS BIGINT) AS purchase_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       COALESCE(CAST(c.event_id AS BIGINT), -1) AS click_id,
       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_compra,
       COALESCE(strftime(c.ts, '%Y-%m-%d %H:%M:%S'), '1900-01-01 00:00:00') AS ts_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id""",
    // the FULL OUTER streamed interval join: both directions of
    // unmatched row must flush (Streams.attributionStreamedFull)
    "q_attribution_stream_full" ->
      """SELECT COALESCE(CAST(p.event_id AS BIGINT), -1) AS purchase_id,
       CAST(COALESCE(p.user_id, c.user_id) AS BIGINT) AS user_id,
       COALESCE(CAST(c.event_id AS BIGINT), -1) AS click_id,
       COALESCE(strftime(p.ts, '%Y-%m-%d %H:%M:%S'), '1900-01-01 00:00:00') AS ts_compra,
       COALESCE(strftime(c.ts, '%Y-%m-%d %H:%M:%S'), '1900-01-01 00:00:00') AS ts_click
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
FULL OUTER JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
ORDER BY purchase_id, click_id""",
    // the streamed sessionizer is gated against the SAME oracle as its
    // batch twin: the stream must converge to the batch answer once the
    // watermark passes every event (Streams.sessionizeStreamed)
    "q_sessionize_stream" ->
      """WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS quebra
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT *, SUM(quebra) OVER (PARTITION BY user_id ORDER BY ts, event_id
    ROWS UNBOUNDED PRECEDING) AS sessao
  FROM marked
)
SELECT CAST(user_id AS BIGINT) AS user_id, CAST(sessao AS INTEGER) AS sessao,
       COUNT(*) AS n_eventos,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS inicio,
       strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS fim,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS valor
FROM sess
GROUP BY user_id, sessao
ORDER BY user_id, sessao""",
    "q_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_valor
FROM events
GROUP BY event_type
ORDER BY event_type""",
    // generated from the same column spec as the Spark query (one source)
    "q_profile_orders" -> graft.ops.RelationalOps.profileOrdersOracle,
    "q_sql_frontend" ->
      """WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
  FROM orders GROUP BY o_custkey
)
SELECT n_name, CAST(SUM(r) AS DOUBLE) AS receita, COUNT(*) AS n_clientes
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN rev ON rev.o_custkey = c_custkey
GROUP BY n_name
ORDER BY receita DESC, n_name""",
    "q_events_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hora,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_valor
FROM events
GROUP BY 1, 2
ORDER BY hora, event_type""",
    // TPC-H Q3 shape: exact-decimal revenue, deterministic top-10
    "q_shipping_priority" ->
      """SELECT l_orderkey,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS receita,
  strftime(o_orderdate, '%Y-%m-%d') AS data_pedido, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1996-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1996-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY receita DESC, data_pedido, l_orderkey LIMIT 10""",
    // TPC-H Q5 shape: local (customer-nation = supplier-nation) volume
    "q_regional_volume" ->
      """SELECT n_name,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
           (CAST(1 AS DECIMAL(9,4)) - CAST(l_discount AS DECIMAL(9,4)))) AS DOUBLE) AS receita
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name ORDER BY receita DESC, n_name""",
    // sliding windows: every event belongs to exactly 4 of the
    // epoch-aligned 15-minute-grid 1-hour windows — k=0..3 steps back
    "q_events_sliding" ->
      """WITH w AS (
  SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS inicio,
         strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS fim,
         event_type, value
  FROM (SELECT e.event_type, e.value,
               time_bucket(INTERVAL '15 minutes', e.ts) - g.k * INTERVAL '15 minutes' AS ws,
               e.ts
        FROM events e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) g)
  WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR)
SELECT inicio, fim, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_valor
FROM w GROUP BY inicio, fim, event_type
ORDER BY inicio, event_type""",
    // idempotent ingest dedup: the stream received the corpus plus a
    // verbatim re-send of every 7th event — correct keyed dedup makes
    // the output the original table exactly
    "q_dedup_events_stream" ->
      """SELECT CAST(event_id AS BIGINT) AS event_id, ts,
       CAST(user_id AS BIGINT) AS user_id, event_type,
       CAST(value AS DOUBLE) AS value
FROM events ORDER BY event_id""",
    // the watermarked streamed form finalizes the identical windows
    "q_events_sliding_stream" ->
      """WITH w AS (
  SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS inicio,
         strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS fim,
         event_type, value
  FROM (SELECT e.event_type, e.value,
               time_bucket(INTERVAL '15 minutes', e.ts) - g.k * INTERVAL '15 minutes' AS ws,
               e.ts
        FROM events e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS k) g)
  WHERE ts >= ws AND ts < ws + INTERVAL 1 HOUR)
SELECT inicio, fim, event_type, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_valor
FROM w GROUP BY inicio, fim, event_type
ORDER BY inicio, event_type""",
    // strict-order funnel: each stage's min is bounded below by the
    // previous stage's timestamp, so out-of-order events never count
    "q_funnel" -> funnelSql,
    // the stateful streamed twin converges to the same relation
    "q_funnel_stream" -> funnelSql,
    // the Spark side bins both relations on fixed-width time bins and
    // equi-joins; DuckDB answers the same query with its native IEJoin
    // inequality join — two different algorithms that must agree
    "q_range_join" ->
      """WITH j AS (SELECT event_id AS janela_id, ts AS lo, ts + INTERVAL 1 HOUR AS hi
           FROM events WHERE event_type = 'purchase' AND value >= 150)
SELECT CAST(j.janela_id AS BIGINT) AS janela_id,
       COUNT(*) AS n_eventos,
       CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS soma_valor
FROM events e JOIN j ON e.ts >= j.lo AND e.ts < j.hi
GROUP BY 1
ORDER BY janela_id""",
    // the salted (key, salt) join must be row-identical to this plain join
    "q_skew_join_salted" ->
      """WITH d AS (SELECT event_type, COUNT(*) AS n_tipo,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_tipo
           FROM events GROUP BY event_type)
SELECT CAST(e.event_id AS BIGINT) AS event_id, e.event_type, d.n_tipo, d.soma_tipo,
       CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) / d.soma_tipo AS fracao
FROM events e JOIN d USING (event_type)
ORDER BY event_id""",
    // the AQE skew twin is the same plain join — manual salt and
    // optimizer skew-split are both pure cost devices
    "q_skew_join_aqe" ->
      """WITH d AS (SELECT event_type, COUNT(*) AS n_tipo,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_tipo
           FROM events GROUP BY event_type)
SELECT CAST(e.event_id AS BIGINT) AS event_id, e.event_type, d.n_tipo, d.soma_tipo,
       CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) / d.soma_tipo AS fracao
FROM events e JOIN d USING (event_type)
ORDER BY event_id""",
    // the adaptively-salted join (Misra-Gries-detected hot keys) is the
    // same plain join — detection is a cost device too
    "q_skew_join_salted_adaptive" ->
      """WITH d AS (SELECT event_type, COUNT(*) AS n_tipo,
                  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS soma_tipo
           FROM events GROUP BY event_type)
SELECT CAST(e.event_id AS BIGINT) AS event_id, e.event_type, d.n_tipo, d.soma_tipo,
       CAST(CAST(e.value AS DECIMAL(18,2)) AS DOUBLE) / d.soma_tipo AS fracao
FROM events e JOIN d USING (event_type)
ORDER BY event_id""",
    // the bloom-pruned semi join must equal the plain semi join — the
    // bloom is a cost device, never a semantics device
    "q_bloom_semijoin" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
       COUNT(*) AS n_linhas,
       CAST(SUM(CAST(l_quantity AS INTEGER)) AS BIGINT) AS qtd_total
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderstatus = 'F' AND o.o_totalprice > 250000)
GROUP BY l_orderkey
ORDER BY l_orderkey""",
    // rebuilds the IDENTICAL d=4 × w=64 count-min sketch (same md5-halves
    // (h1 + i·h2) mod p hash family) and reads the same MIN-over-rows
    // estimates — sketch content and estimates gate bit-exactly
    "q_sketch_countmin" ->
      """WITH h AS (SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 1000000007 AS h1,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 17, 15))::BIGINT % 1000000007 AS h2
      FROM events),
rows_ AS (SELECT CAST(unnest([0, 1, 2, 3]) AS INTEGER) AS i),
pr AS (SELECT i, ((h1 + i * h2) % 1000000007) % 64 AS bucket
       FROM h CROSS JOIN rows_)
SELECT i, bucket, CAST(COUNT(*) AS BIGINT) AS c
FROM pr GROUP BY i, bucket
ORDER BY i, bucket""",
    "q_sketch_histogram" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM (
  SELECT CAST(least(CAST(floor((l_extendedprice - mn) * CAST(64 AS DOUBLE) / (mx - mn)) AS INTEGER), 63) AS INTEGER) AS bin
  FROM lineitem, mm)
GROUP BY bin ORDER BY bin""",
    // the streamed additive merge converges to the same cell table
    "q_sketch_histogram_stream" ->
      """WITH mm AS (SELECT min(l_extendedprice) AS mn, max(l_extendedprice) AS mx FROM lineitem)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS c FROM (
  SELECT CAST(least(CAST(floor((l_extendedprice - mn) * CAST(64 AS DOUBLE) / (mx - mn)) AS INTEGER), 63) AS INTEGER) AS bin
  FROM lineitem, mm)
GROUP BY bin ORDER BY bin""")
}
