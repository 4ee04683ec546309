package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Checkpoint.BarrierOps

/** Graph-shaped analytics over the events stream: weighted PageRank on
  * the page-transition graph, and per-day HLL distinct-user registers.
  *
  * Why PageRank in a training-data engine: link-graph centrality is the
  * standard source-quality PRIOR for web-crawl corpora (OPIC/harmonic
  * centrality in CommonCrawl ranking, quality-weighted sampling by
  * domain rank) — the curation funnel consumes it exactly like the
  * unigram-fluency prior. Here the graph is the user click-transition
  * graph (page k_i → k_{i+1} per user in event-time order), PageRank
  * weighted by transition counts.
  *
  * Scale shape: edges come from one per-user event-time sort (a window
  * lead — the same shuffle sessionization already pays), then grouped to
  * (src, dst, w). Each of the 5 fixed iterations is one equi-join of the
  * rank vector against the edge list + one grouped fold, shuffling on
  * dst — O(edges) per iteration, never all-pairs, with an eager barrier
  * per iteration so plan depth stays O(1) (same device as the min-label
  * components loop). Node count enters only as a scalar aggregate.
  *
  * Cross-engine exactness: every per-node sum (incoming contributions,
  * dangling mass) is folded LEFT-TO-RIGHT in a pinned order (sort_array
  * → aggregate vs list(… ORDER BY) → list_sum — the proven fold pair);
  * all other arithmetic is correctly-rounded double ops spelled
  * identically in both dialects, so the 5-iteration ranks hash-match
  * bit-exactly.
  */
object GraphOps {

  private val D = "CAST(0.85 AS DOUBLE)"
  private val ITERS = 5

  /** The (src, dst, w) transition edges + the node universe. */
  private def transitionEdges(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val ev = graft.Tables.events(s, d)
      .selectExpr("user_id", "event_id", "ts",
        "CAST(get_json_object(props, '$.k') AS INT) AS page")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = ev
      .withColumn("dst", lead("page", 1).over(w))
      .filter(col("dst").isNotNull)
      .groupBy(col("page").as("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
      .barrier() // feeds out-weights, the node set, and every iteration
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .barrier()
    (edges, nodes)
  }

  /** Weighted PageRank, damping 0.85, 5 fixed iterations, dangling mass
    * redistributed uniformly. Returns (node, r) with the exact
    * 5-iteration rank.
    */
  def pagerank(s: SparkSession, d: String): DataFrame = {
    val (edges, nodes) = transitionEdges(s, d)
    val outw = edges.groupBy("src").agg(sum("w").as("ow")).barrier()
    val nn = nodes.agg(count(lit(1)).as("n"))
    var r = nodes.crossJoin(broadcast(nn))
      .selectExpr("node", "CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS r")
      .barrier()
    for (_ <- 1 to ITERS) {
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outw, Seq("src"))
        .selectExpr("dst AS node", "src",
          "(r * CAST(w AS DOUBLE)) / CAST(ow AS DOUBLE) AS c")
        .groupBy("node")
        .agg(sort_array(collect_list(struct(col("src"), col("c")))).as("cs"))
        .selectExpr("node",
          "aggregate(transform(cs, p -> p.c), CAST(0 AS DOUBLE), (s, v) -> s + v) AS cin")
      // dangling mass: rank sitting on nodes with no out-edges, folded
      // in node order; empty set folds to 0 in both engines
      val dang = r.join(outw.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(sort_array(collect_list(struct(col("node"), col("r")))).as("ds"))
        .selectExpr(
          "aggregate(transform(ds, p -> p.r), CAST(0 AS DOUBLE), (s, v) -> s + v) AS dm")
      // truncate lineage (plan stays O(1) per iteration) and rotate:
      // the superseded iteration's blocks are dead once the new
      // checkpoint has materialized from them
      r = graft.Checkpoint.barrierReplacing(nodes
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nn)).crossJoin(broadcast(dang))
        .selectExpr("node",
          s"CAST(0.15 AS DOUBLE) / CAST(n AS DOUBLE) + $D * " +
            "(coalesce(cin, CAST(0 AS DOUBLE)) + dm / CAST(n AS DOUBLE)) AS r"),
        r)
    }
    graft.Checkpoint.release(outw) // fed the iterations only
    r.orderBy("node")
  }

  /** PERSONALIZED PageRank: the restart vector is the purchase
    * distribution over pages (p(page) = purchases on page / total
    * purchases) instead of uniform — "centrality as seen from
    * conversion", the topic-conditioned source prior (rank pages by how
    * reachable they are FROM the pages users actually buy on). Same
    * 5-iteration power method, r₀ = p, teleport AND dangling mass
    * redistribute by p: r' = 0.15·p + 0.85·(in + dm·p). Mass is still
    * conserved (Σp = 1). Kept as its own loop rather than a
    * parametrization of [[pagerank]]: the uniform form's base term is
    * spelled 0.15/n while this one is 0.15·p, and collapsing them would
    * change one side's floating-op order — the gates pin bits, not just
    * math.
    */
  def pagerankPersonalized(s: SparkSession, d: String): DataFrame = {
    val (edges, nodes) = transitionEdges(s, d)
    val outw = edges.groupBy("src").agg(sum("w").as("ow")).barrier()
    val buys = graft.Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .selectExpr("CAST(get_json_object(props, '$.k') AS INT) AS node")
      .groupBy("node").agg(count(lit(1)).as("cnt"))
    val total = buys.agg(sum("cnt").as("total"))
    val pvec = nodes.join(buys, Seq("node"), "left")
      .crossJoin(broadcast(total))
      .selectExpr("node",
        "coalesce(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), CAST(0 AS DOUBLE)) AS p")
      .barrier() // feeds r0, every teleport term, and the dangling term
    var r = pvec.selectExpr("node", "p AS r")
    for (_ <- 1 to ITERS) {
      val contrib = edges
        .join(r.withColumnRenamed("node", "src"), Seq("src"))
        .join(outw, Seq("src"))
        .selectExpr("dst AS node", "src",
          "(r * CAST(w AS DOUBLE)) / CAST(ow AS DOUBLE) AS c")
        .groupBy("node")
        .agg(sort_array(collect_list(struct(col("src"), col("c")))).as("cs"))
        .selectExpr("node",
          "aggregate(transform(cs, p -> p.c), CAST(0 AS DOUBLE), (s, v) -> s + v) AS cin")
      val dang = r.join(outw.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(sort_array(collect_list(struct(col("node"), col("r")))).as("ds"))
        .selectExpr(
          "aggregate(transform(ds, p -> p.r), CAST(0 AS DOUBLE), (s, v) -> s + v) AS dm")
      // rotate superseded iterations (see pagerank)
      r = graft.Checkpoint.barrierReplacing(pvec
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dang))
        .selectExpr("node",
          s"CAST(0.15 AS DOUBLE) * p + $D * " +
            "(coalesce(cin, CAST(0 AS DOUBLE)) + dm * p) AS r"),
        r)
    }
    graft.Checkpoint.release(outw)
    graft.Checkpoint.release(pvec)
    r.orderBy("node")
  }

  private def pagerankPersonalizedOracle: String = {
    val base = s"""ev AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(json_extract_string(props, '$$.k') AS INTEGER) AS page
  FROM events),
seq AS (
  SELECT page AS src,
         lead(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev),
edges AS (
  SELECT src, dst, count(*) AS w FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
buys AS (SELECT page AS node, count(*) AS cnt FROM ev
         WHERE event_type = 'purchase' GROUP BY 1),
tot AS (SELECT sum(cnt) AS total FROM buys),
pvec AS (
  SELECT n.node,
         coalesce(CAST(b.cnt AS DOUBLE) / CAST(t.total AS DOUBLE), CAST(0 AS DOUBLE)) AS p
  FROM nodes n LEFT JOIN buys b ON n.node = b.node, tot t),
r0 AS (SELECT node, p AS r FROM pvec)"""
    val iters = (1 to ITERS).map { i =>
      val prev = s"r${i - 1}"
      s"""c$i AS (
  SELECT e.dst AS node,
         list_sum(list((r.r * CAST(e.w AS DOUBLE)) / CAST(o.ow AS DOUBLE)
                       ORDER BY e.src)) AS cin
  FROM edges e JOIN $prev r ON e.src = r.node JOIN outw o ON e.src = o.src
  GROUP BY 1),
d$i AS (
  SELECT coalesce(list_sum(list(r.r ORDER BY r.node)), CAST(0 AS DOUBLE)) AS dm
  FROM $prev r LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
r$i AS (
  SELECT v.node,
         CAST(0.15 AS DOUBLE) * v.p + $D *
           (coalesce(c.cin, CAST(0 AS DOUBLE)) + d$i.dm * v.p) AS r
  FROM pvec v LEFT JOIN c$i c ON v.node = c.node, d$i)"""
    }.mkString(",\n")
    s"WITH $base,\n$iters\nSELECT node, r FROM r$ITERS ORDER BY node"
  }

  private def pagerankOracle: String = {
    val base = s"""ev AS (
  SELECT user_id, event_id, ts,
         CAST(json_extract_string(props, '$$.k') AS INTEGER) AS page
  FROM events),
seq AS (
  SELECT page AS src,
         lead(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev),
edges AS (
  SELECT src, dst, count(*) AS w FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1),
r0 AS (SELECT node, CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) AS r FROM nodes, nn)"""
    val iters = (1 to ITERS).map { i =>
      val p = s"r${i - 1}"
      s"""c$i AS (
  SELECT e.dst AS node,
         list_sum(list((r.r * CAST(e.w AS DOUBLE)) / CAST(o.ow AS DOUBLE)
                       ORDER BY e.src)) AS cin
  FROM edges e JOIN $p r ON e.src = r.node JOIN outw o ON e.src = o.src
  GROUP BY 1),
d$i AS (
  SELECT coalesce(list_sum(list(r.r ORDER BY r.node)), CAST(0 AS DOUBLE)) AS dm
  FROM $p r LEFT JOIN outw o ON r.node = o.src WHERE o.src IS NULL),
r$i AS (
  SELECT n.node,
         CAST(0.15 AS DOUBLE) / CAST(nn.n AS DOUBLE) + $D *
           (coalesce(c.cin, CAST(0 AS DOUBLE)) + d$i.dm / CAST(nn.n AS DOUBLE)) AS r
  FROM nodes n LEFT JOIN c$i c ON n.node = c.node, nn, d$i)"""
    }.mkString(",\n")
    s"WITH $base,\n$iters\nSELECT node, r FROM r$ITERS ORDER BY node"
  }

  // ---------------------------------------------------- path mining

  /** Frequent-journey mining: the top-20 3-step event-type paths across
    * all users — the sequential-pattern complement of the fixed-pattern
    * funnel (funnelSteps asks "how many users did view→click→purchase";
    * this asks "WHICH 3-step paths happen most"). Scale shape: the same
    * per-user event-time sort the sessionizer pays (one shuffle on
    * user_id), two intra-partition leads, then a grouped count over a
    * key space bounded by |event_types|³ — the top-k is
    * TakeOrderedAndProject over ≤ 125 rows, never a global sort of the
    * events.
    */
  def pathMining(s: SparkSession, d: String): DataFrame =
    pathCounts(graft.Tables.events(s, d))
      .orderBy(desc("n"), asc("caminho"))
      .limit(20)

  /** The (caminho, n) counts over any USER-COMPLETE events slice — the
    * kernel shared by the one-shot gate and the streamed twin. The
    * shard unit must be the user: a 3-gram spans consecutive events of
    * one user, so any split that keeps each user whole makes the
    * per-slice counts ADD to the global counts; a time split would cut
    * paths at batch boundaries.
    */
  private[graft] def pathCounts(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead("event_type", 1).over(w))
      .withColumn("e3", lead("event_type", 2).over(w))
      .filter(col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("caminho"))
      .groupBy("caminho").agg(count(lit(1)).as("n"))
  }

  /** One streamed micro-batch of path-count maintenance, EXACTLY-ONCE:
    * the batch's counts ADD onto the committed counts (the harness
    * stages user-complete batches — see [[pathCounts]]). Top-20
    * resolution happens at read, so the maintained state keeps ALL
    * paths (≤ |event_types|³ rows) and the served answer is
    * bit-identical to the one-shot scan.
    */
  private[graft] def pathApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "paths_b", batchId) { prior =>
      val partial = pathCounts(batch)
      prior.fold(partial)(p => partial.unionByName(p)
        .groupBy("caminho").agg(sum("n").as("n")))
    }

  /** Read-time top-20 over the maintained counts. */
  private[graft] def pathReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"path state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir")
      .selectExpr("caminho", "CAST(n AS BIGINT) AS n")
      .orderBy(desc("n"), asc("caminho")).limit(20)
  }

  private def pathMiningOracle: String =
    """WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
  FROM events)
SELECT e1 || '>' || e2 || '>' || e3 AS caminho, count(*) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY 1 ORDER BY n DESC, caminho LIMIT 20"""

  // ------------------------------------------- engagement prior (join)

  /** Engagement-weighted curation prior: per-page conversion evidence
    * (purchases and total value from the events stream) joined onto the
    * documents served from that page — the behavioral quality signal a
    * crawl pipeline derives from click logs ("pages users buy from host
    * better training text than pages they bounce off"). The testdata has
    * no real doc↔page foreign key, so the linkage is the documented
    * stand-in doc_id % 100 = page (the props.k domain); the join shape
    * is the real thing: the event side aggregates to ≤ |pages| rows
    * FIRST and broadcasts onto the corpus — the corpus is never
    * shuffled, which is the only join order that survives 100 TB of
    * documents.
    *
    * The per-page value sum is folded in (ts, event_id) order via the
    * pinned-fold pair, so the double is bit-exact cross-engine. Honest
    * scale caveat: that fold collects one list per page, and a page's
    * purchase count is unbounded — at 100 TB the swap is a plain
    * sum(value) (order-free, loses only last-ulp cross-engine equality)
    * or an exact decimal sum; the join shape is unchanged either way.
    */
  def engagementPrior(s: SparkSession, d: String): DataFrame = {
    val byPage = graft.Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .selectExpr("CAST(get_json_object(props, '$.k') AS INT) AS pagina",
        "ts", "event_id", "value")
      .groupBy("pagina")
      .agg(count(lit(1)).as("n_compras"),
        sort_array(collect_list(struct(col("ts"), col("event_id"), col("value"))))
          .as("vs"))
      .selectExpr("pagina", "n_compras",
        "aggregate(transform(vs, p -> p.value), CAST(0 AS DOUBLE), (s, v) -> s + v) AS valor_compras")
    graft.Tables.documents(s, d)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "lang",
        "CAST(doc_id % 100 AS INT) AS pagina")
      .join(broadcast(byPage), Seq("pagina"), "left")
      .na.fill(0L, Seq("n_compras")).na.fill(0.0, Seq("valor_compras"))
      .select("doc_id", "lang", "pagina", "n_compras", "valor_compras")
      .orderBy("doc_id")
  }

  private def engagementOracle: String =
    """WITH byp AS (
  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS pagina,
         count(*) AS n_compras,
         list_sum(list(value ORDER BY ts, event_id)) AS valor_compras
  FROM events WHERE event_type = 'purchase' GROUP BY 1)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang,
       CAST(d.doc_id % 100 AS INTEGER) AS pagina,
       coalesce(b.n_compras, 0) AS n_compras,
       coalesce(b.valor_compras, CAST(0 AS DOUBLE)) AS valor_compras
FROM documents d LEFT JOIN byp b ON d.doc_id % 100 = b.pagina
ORDER BY doc_id"""

  // ------------------------------------------------- grouped HLL sketch

  private val hllBucketDiv = 4503599627370496L // 2^52: 8 bucket + 52 rank bits

  /** HLL registers per (day, bucket) — distinct users per day as a
    * MERGEABLE sketch table, the grouped form of the corpus-wide HLL in
    * CurationOps: m = 256 buckets from the top 8 bits of the 60-bit user
    * hash, register = MAX leading-zero rank of the low 52 bits. MAX is
    * idempotent/associative/commutative, so the per-day distinct-user
    * surface needs NO distinct shuffle — a partial+final HashAggregate
    * emitting ≤ 256 rows per day regardless of event volume, and any two
    * days (or any two corpus slices of the same day) merge by bucket-wise
    * MAX. This is the daily-active-users surface at 100 TB: the sketch
    * table is O(days × 256), queries over arbitrary date ranges merge
    * registers instead of rescanning events.
    */
  def hllGroupedDaily(s: SparkSession, d: String): DataFrame =
    hllGroupedRegisters(graft.Tables.events(s, d)).orderBy("dia", "balde")

  /** The (dia, balde, registro) derivation over any events batch — one
    * kernel for the one-shot gate and the streamed per-batch MAX-merge,
    * so the two forms cannot drift. The day key is string-pinned: a DATE
    * column round-trips differently through the two engines' pandas
    * bridges (datetime.date vs datetime64), so the gate pins the ISO
    * rendering both spell identically.
    */
  private[graft] def hllGroupedRegisters(events: DataFrame): DataFrame =
    events
      .selectExpr("CAST(CAST(ts AS DATE) AS STRING) AS dia",
        "CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT) AS h")
      .selectExpr("dia",
        s"CAST(h div $hllBucketDiv AS INT) AS balde",
        s"h % $hllBucketDiv AS resto")
      .selectExpr("dia", "balde",
        "CAST(53 - length(regexp_replace(bin(resto), '^0+', '')) AS INT) AS rho")
      .groupBy("dia", "balde").agg(max(col("rho")).as("registro"))

  /** One streamed micro-batch of grouped-register maintenance,
    * EXACTLY-ONCE under graft.etl.StoreCommit: the batch's (dia, balde)
    * partial registers MAX-merge into the committed table (MAX is
    * idempotent/associative/commutative, so the maintained state is
    * bit-identical to the one-shot scan regardless of how arrivals
    * split across batches). State is O(days × 256) rows.
    */
  private[graft] def hllGroupedApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "regs_b", batchId) { prior =>
      val partial = hllGroupedRegisters(batch)
      prior.fold(partial)(p => partial.unionByName(p)
        .groupBy("dia", "balde").agg(max(col("registro")).as("registro")))
    }

  /** The committed grouped-register table. */
  private[graft] def hllGroupedReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"grouped HLL state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir")
  }

  /** Range-merged distinct-user registers: MAX-merge the per-day tables
    * across the first week — the read path the sketch table exists FOR
    * (distinct users over an arbitrary date range WITHOUT rescanning
    * events: merge ≤ range × 256 register rows instead). The cutoff is
    * data-derived (min day + 6) so the query is scale-factor-agnostic;
    * ISO string compare IS date compare.
    */
  def hllRangeMerge(s: SparkSession, d: String): DataFrame = {
    val regs = hllGroupedRegisters(graft.Tables.events(s, d)).barrier()
    val cut = regs.agg(min("dia").as("d0"))
      .selectExpr("CAST(date_add(CAST(d0 AS DATE), 6) AS STRING) AS corte")
    regs.crossJoin(broadcast(cut))
      .filter(col("dia") <= col("corte"))
      .groupBy("balde").agg(max(col("registro")).as("registro"))
      .orderBy("balde")
  }

  private def hllRangeOracle: String =
    s"""WITH hs AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dia,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events),
regs AS (
  SELECT dia, CAST(h // $hllBucketDiv AS INTEGER) AS balde,
         MAX(CAST(53 - length(regexp_replace(bin(h % $hllBucketDiv), '^0+', '')) AS INTEGER)) AS registro
  FROM hs GROUP BY 1, 2),
corte AS (SELECT CAST(CAST(MIN(dia) AS DATE) + 6 AS VARCHAR) AS c FROM regs)
SELECT balde, MAX(registro) AS registro
FROM regs, corte WHERE dia <= corte.c
GROUP BY balde ORDER BY balde"""

  private def hllGroupedOracle: String =
    s"""WITH hs AS (
  SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS dia,
         ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events)
SELECT dia, balde, registro FROM (
  SELECT dia, CAST(h // $hllBucketDiv AS INTEGER) AS balde,
         MAX(CAST(53 - length(regexp_replace(bin(h % $hllBucketDiv), '^0+', '')) AS INTEGER)) AS registro
  FROM hs GROUP BY 1, 2)
ORDER BY dia, balde"""

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // weighted PageRank over the user page-transition graph
    "q_pagerank" -> (pagerank _),
    // the purchase-conditioned restart vector (personalized PageRank)
    "q_pagerank_personalized" -> (pagerankPersonalized _),
    // per-day distinct-user HLL register table (mergeable DAU sketch)
    "q_sketch_hll_grouped" -> (hllGroupedDaily _),
    // the table maintained per micro-batch by (dia, balde)-wise MAX
    "q_sketch_hll_grouped_stream" ->
      (graft.streaming.Streams.hllGroupedStreamed _),
    // the read path the sketch exists for: merge a week of registers
    "q_sketch_hll_range" -> (hllRangeMerge _),
    // top-20 3-step event-type journeys (sequential-pattern mining)
    "q_path_mining" -> (pathMining _),
    // the counts maintained under USER-complete arrivals; top-20 at read
    "q_path_mining_stream" ->
      (graft.streaming.Streams.pathMiningStreamed _),
    // per-page purchase evidence broadcast onto the corpus
    "q_engagement_prior" -> (engagementPrior _))

  val oracle: Map[String, String] = Map(
    "q_pagerank" -> pagerankOracle,
    "q_pagerank_personalized" -> pagerankPersonalizedOracle,
    "q_sketch_hll_grouped" -> hllGroupedOracle,
    // the streamed MAX-merge converges to the same register table
    "q_sketch_hll_grouped_stream" -> hllGroupedOracle,
    "q_sketch_hll_range" -> hllRangeOracle,
    "q_path_mining" -> pathMiningOracle,
    // user-complete batch counts add to the one-shot counts
    "q_path_mining_stream" -> pathMiningOracle,
    "q_engagement_prior" -> engagementOracle)
}
