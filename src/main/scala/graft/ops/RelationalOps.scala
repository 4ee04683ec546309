package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** One query per operator family from SURVEY.md §2 that isn't already
  * exercised by the star/KPI pipeline — filters, conditional projection,
  * keyed dedup, top-k, windows, semi/anti joins, set ops, string/date/JSON
  * scalar functions, and the batch twin of the streaming hourly rollup.
  *
  * Every function is a pure DataFrame transform with a deterministic total
  * ordering (driver hashes rows; grouped/joined output order is otherwise
  * partition-dependent).
  */
object RelationalOps {

  /** P1/P5 — projection + predicate; both reach the parquet scan
    * (PushedFilters / narrow ReadSchema in the formatted plan).
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") > 0.05)
      .select(col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_linenumber").cast("int").as("l_linenumber"),
        col("l_quantity").cast("int").as("qtd"),
        col("l_returnflag").as("flag"))
      .orderBy("l_orderkey", "l_linenumber")

  /** P6/F4 — conditional overwrite + null-test categorical (no UDF). */
  def conditionalColumns(spark: SparkSession, dir: String): DataFrame =
    customer(spark, dir)
      .select(
        col("c_custkey").cast("long").as("c_custkey"),
        when(trim(col("c_name")) === "", lit("Cliente Corporativo / Loja"))
          .otherwise(trim(col("c_name"))).as("nome"),
        when(col("c_nationkey").isNotNull, lit("Individual"))
          .otherwise(lit("Store")).as("tipo"),
        when(col("c_acctbal") < 0, lit("devedor"))
          .when(col("c_acctbal") < 5000, lit("regular"))
          .otherwise(lit("vip")).as("faixa"))
      .orderBy("c_custkey")

  /** D1 — keep-FIRST dedup by key, made deterministic: the reference's
    * pandas drop_duplicates keeps the first row in file order
    * (etl_dim_cliente.py:47); Spark's dropDuplicates keeps an arbitrary
    * row, so we pin "first" with row_number over an explicit ordering —
    * here: each user's earliest event.
    */
  def dedupKeepFirst(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("first_event_id"),
        col("event_type").as("first_event_type"))
      .orderBy("user_id")
  }

  /** §2.5 — sort + limit top-k; Spark plans TakeOrderedAndProject
    * (per-partition heap + driver merge — no global sort at any scale).
    */
  def topKOrders(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").cast("double")
          .as("total"))
      .orderBy(desc("total"), asc("o_orderkey"))
      .limit(20)

  /** Window functions (capability extension; reference expresses ranking as
    * agg→sort→limit): rank + running total per customer.
    */
  def windowRunning(spark: SparkSession, dir: String): DataFrame = {
    val byCust = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("preco"),
        row_number().over(byCust).as("n_pedido"),
        sum(col("o_totalprice").cast("decimal(18,2)")).over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("acumulado"))
      .withColumn("preco", col("preco").cast("double"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** The remaining analytic-window family in one query: lead (next order's
    * price), rank + dense_rank over a deliberately NON-unique key (order
    * month — rank values are functions of the key values, so ties don't
    * break determinism), ntile quartiles over the unique per-customer
    * order, and first/last_value with an explicit ROWS frame. Every window
    * here partitions by customer — per-partition row counts are bounded by
    * a customer's order history, not the corpus.
    */
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val byDate = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val byMonth = Window.partitionBy("o_custkey")
      .orderBy(month(col("o_orderdate")))
    val dec = col("o_totalprice").cast("decimal(18,2)")
    orders(spark, dir)
      .select(col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_orderdate"), dec.as("preco"),
        lead(dec.cast("double"), 1).over(byDate).as("preco_proximo"),
        rank().over(byMonth).cast("int").as("rk_mes"),
        dense_rank().over(byMonth).cast("int").as("drk_mes"),
        ntile(4).over(byDate).cast("int").as("quartil"),
        first(dec.cast("double")).over(
          byDate.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("primeiro_preco"),
        last(dec.cast("double")).over(
          byDate.rowsBetween(Window.currentRow, Window.unboundedFollowing))
          .as("ultimo_preco"))
      .withColumn("preco", col("preco").cast("double"))
      .drop("o_orderdate")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Semi/anti joins (EXISTS / NOT EXISTS): customers with ≥1 order vs
    * customers with none. Anti/semi never widen rows — cheaper than a join
    * + distinct at scale.
    */
  def semiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val o = orders(spark, dir).select(col("o_custkey"))
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), lit("com_pedido").as("status"))
    val noO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), lit("sem_pedido").as("status"))
    withO.unionAll(noO)
      .select(col("c_custkey").cast("long").as("c_custkey"), col("status"))
      .orderBy("c_custkey")
  }

  /** Set operations (extension; none in the reference §2.5): nations that
    * have customers ∪/∩/− nations that have suppliers.
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val n = nation(spark, dir)
    val custN = customer(spark, dir)
      .join(n, col("c_nationkey") === col("n_nationkey")).select("n_name")
    val suppN = supplier(spark, dir)
      .join(n, col("s_nationkey") === col("n_nationkey")).select("n_name")
    val u = custN.union(suppN).distinct()
      .select(col("n_name"), lit("union").as("op"))
    val i = custN.intersect(suppN)
      .select(col("n_name"), lit("intersect").as("op"))
    val e = custN.except(suppN)
      .select(col("n_name"), lit("except").as("op"))
    u.unionAll(i).unionAll(e).orderBy("op", "n_name")
  }

  /** TPC-H Q1-shaped multi-aggregate (partial+final HashAggregate with
    * map-side combine; exact decimal sums).
    */
  def aggStats(spark: SparkSession, dir: String): DataFrame = {
    val ep = col("l_extendedprice").cast("decimal(18,2)")
    val disc = col("l_discount").cast("decimal(4,2)")
    val one = lit("1.00").cast("decimal(3,2)")
    lineitem(spark, dir)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(ep).cast("double").as("sum_base_price"),
        sum(ep * (one - disc)).cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** F1-F3-style string kernel: concat, trim, case, substring, regexp. */
  def stringOps(spark: SparkSession, dir: String): DataFrame =
    supplier(spark, dir)
      .select(
        col("s_suppkey").cast("long").as("s_suppkey"),
        concat_ws(" ", trim(col("s_name")), lit("T")).as("etiqueta"),
        upper(col("s_name")).as("maiuscula"),
        lower(col("s_name")).as("minuscula"),
        substring(col("s_name"), 1, 8).as("prefixo"),
        length(col("s_name")).as("tam"),
        trim(regexp_replace(col("s_name"), "[0-9]+", "#")).as("mascarado"))
      .orderBy("s_suppkey")

  /** F5-F9-style date kernel: parts, trunc, smart key, add/diff. */
  def dateOps(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        year(col("o_orderdate")).as("ano"),
        month(col("o_orderdate")).as("mes"),
        dayofmonth(col("o_orderdate")).as("dia"),
        quarter(col("o_orderdate")).as("trimestre"),
        when(month(col("o_orderdate")) <= 6, 1).otherwise(2).as("semestre"),
        graft.etl.Star.smartDateKey(col("o_orderdate")).as("sk_tempo"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mes_ref"),
        date_add(col("o_orderdate").cast("date"), 30).as("prazo"))
      .orderBy("o_orderkey")

  /** JSON field extraction from the events.props payload (extension —
    * training-data pipelines live on semi-structured columns).
    */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(
        col("event_id").cast("long").as("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Batch sessionization via window analytics (lag + cumulative sum) —
    * the set-based twin of the stateful streaming sessionizer
    * (graft.streaming.Streams.sessionize): a session break is a >30-min
    * gap; session ids are running counts of breaks per user.
    */
  def sessionizeBatch(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapUs = 30L * 60 * 1000000
    events(spark, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("quebra",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1).otherwise(0))
      .withColumn("sessao", sum(col("quebra")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id").cast("long").as("user_id"), col("sessao").cast("int").as("sessao"))
      .agg(count(lit(1)).as("n_eventos"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("inicio"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("fim"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("valor"))
      .orderBy("user_id", "sessao")
  }

  /** The NATIVE twin of [[sessionizeBatch]]: Spark's built-in
    * `session_window` aggregation instead of the hand-rolled lag/cumsum
    * — the "compose existing ops" preference made concrete, and the
    * form that also runs UNCHANGED as a streaming aggregation (the
    * lag/cumsum form can't — analytic windows aren't streamable).
    * Boundary semantics verified empirically (SessionWindowSpec): an
    * event exactly 30:00.000000 after the last MERGES and 30:00.000001
    * SPLITS — i.e. session_window's split predicate is `gap > 30min`,
    * identical to the lag form's, so both gate against the SAME
    * oracle. Plan shape: one
    * shuffle on user_id; the per-user session ordinal is a second
    * window pass over the already-reduced session rows (|sessions| ≪
    * |events|), not over the event stream.
    */
  def sessionizeNative(spark: SparkSession, dir: String): DataFrame = {
    val sessions = events(spark, dir)
      .groupBy(col("user_id").cast("long").as("user_id"),
        session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_eventos"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("inicio"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("fim"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("valor"))
    val bySessionStart = Window.partitionBy("user_id").orderBy(col("sw.start"))
    sessions
      .withColumn("sessao", row_number().over(bySessionStart).cast("int"))
      .select("user_id", "sessao", "n_eventos", "inicio", "fim", "valor")
      .orderBy("user_id", "sessao")
  }

  /** Salted two-phase aggregation — the skew pattern: event_type has only
    * a handful of hot keys, so phase 1 spreads each key over 16 salt
    * shards (shuffle is uniform), phase 2 merges the 16 partials per key.
    * Results are identical to a direct groupBy (exact decimal sums).
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .withColumn("salt", pmod(col("event_id"), lit(16)))
      .groupBy("event_type", "salt")
      .agg(count(lit(1)).as("n_p"),
        sum(col("value").cast("decimal(18,2)")).as("soma_p"))
      .groupBy("event_type")
      .agg(sum("n_p").as("n"),
        sum("soma_p").cast("double").as("soma_valor"))
      .orderBy("event_type")

  /** SQL-frontend entry point (SURVEY §3.3): the same engine surface via
    * spark.sql over registered views — multi-CTE revenue-by-nation.
    */
  def sqlFrontend(spark: SparkSession, dir: String): DataFrame = {
    Seq("customer", "nation", "orders").foreach { t =>
      table(spark, dir, t).createOrReplaceTempView(t)
    }
    spark.sql(
      """WITH rev AS (
        |  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS r
        |  FROM orders GROUP BY o_custkey
        |)
        |SELECT n_name, CAST(SUM(r) AS DOUBLE) AS receita,
        |       COUNT(*) AS n_clientes
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN rev ON rev.o_custkey = c_custkey
        |GROUP BY n_name
        |ORDER BY receita DESC, n_name""".stripMargin)
  }

  /** Exact percentiles (extension): continuous-interpolation median/p90 —
    * Spark `percentile` and DuckDB `quantile_cont` share the linear
    * interpolation definition, verified bit-exact.
    */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.9)").as("p90"),
        expr("percentile(CAST(l_quantity AS BIGINT), 0.25)").as("q25"))
      .orderBy("l_returnflag")

  /** Correlated scalar subquery (extension): customers above their own
    * nation's average balance. The comparison is cross-multiplied
    * (balance × count > sum) so it stays in exact decimal/integer math —
    * no engine-specific decimal-division scale rules.
    */
  def scalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    customer(spark, dir).createOrReplaceTempView("customer")
    nation(spark, dir).createOrReplaceTempView("nation")
    spark.sql(
      """SELECT CAST(c.c_custkey AS BIGINT) AS c_custkey, n.n_name,
        |       CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS saldo
        |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) *
        |      (SELECT COUNT(*) FROM customer c2
        |       WHERE c2.c_nationkey = c.c_nationkey) >
        |      (SELECT SUM(CAST(c3.c_acctbal AS DECIMAL(18,2))) FROM customer c3
        |       WHERE c3.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
  }

  /** Pivot/crosstab (extension): per-user event-type counts as columns.
    * The value list is explicit, so the output schema is static and
    * oracle-comparable (and Spark skips the extra distinct-values job).
    */
  def pivotEvents(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("user_id").cast("long").as("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .count()
      .na.fill(0L)
      .orderBy("user_id")

  /** UNPIVOT — the inverse of [[pivotEvents]]: melts the wide per-type
    * count matrix back to long (user_id, event_type, n) rows via stack()
    * (codegen'd generator — one pass, no joins). Zero-count cells are
    * dropped so the round trip reproduces the original sparse shape.
    */
  def unpivotEvents(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val stackArgs = types.map(t => s"'$t', `$t`").mkString(", ")
    pivotEvents(spark, dir)
      .selectExpr("user_id",
        s"stack(${types.length}, $stackArgs) AS (event_type, n)")
      .filter(col("n") > 0)
      .orderBy("user_id", "event_type")
  }

  /** ROLLUP aggregation (extension; none in the reference): revenue at
    * (nation, segment), (nation), and grand-total levels in one pass —
    * Spark expands grouping sets in a single shuffle. Null grouping keys
    * are labeled so ordering is engine-independent.
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val o = orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("receita"),
        count(lit(1)).as("n_pedidos"))
      .select(coalesce(col("n_name"), lit("TOTAL")).as("nacao"),
        coalesce(col("c_mktsegment"), lit("TOTAL")).as("segmento"),
        col("receita"), col("n_pedidos"))
      .orderBy("nacao", "segmento")
  }

  /** Explicit GROUPING SETS — the general form behind ROLLUP/CUBE: an
    * arbitrary set list ((nation, segment), (nation), (orderpriority))
    * none of the shorthands can express, disambiguated by grouping_id()
    * (a real NULL in a grouping column vs a superaggregate NULL are
    * different rows — COALESCE alone cannot tell them apart).
    */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val o = orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .createOrReplaceTempView("gs_src")
    spark.sql(
      """SELECT coalesce(n_name, 'TOTAL') AS nacao,
        |       coalesce(c_mktsegment, 'TOTAL') AS segmento,
        |       coalesce(o_orderpriority, 'TOTAL') AS prioridade,
        |       CAST(grouping_id(n_name, c_mktsegment, o_orderpriority) AS INTEGER) AS gid,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS receita,
        |       COUNT(*) AS n_pedidos
        |FROM gs_src
        |GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), (o_orderpriority))
        |ORDER BY gid, nacao, segmento, prioridade""".stripMargin)
  }

  /** CUBE aggregation — completes the grouping-set family next to
    * [[rollupRevenue]]: all four level combinations ((nation, segment),
    * (nation), (segment), ()) in the same single-shuffle expansion; the
    * segment-only slice is the one ROLLUP cannot produce.
    */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir)
    val n = nation(spark, dir)
    val o = orders(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .cube(col("n_name"), col("c_mktsegment"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
        .as("receita"),
        count(lit(1)).as("n_pedidos"))
      .select(coalesce(col("n_name"), lit("TOTAL")).as("nacao"),
        coalesce(col("c_mktsegment"), lit("TOTAL")).as("segmento"),
        col("receita"), col("n_pedidos"))
      .orderBy("nacao", "segmento")
  }

  /** Exact distinct-count statistics (A-family extension): per order
    * priority, how many distinct customers and order dates.
    */
  def distinctStats(spark: SparkSession, dir: String): DataFrame =
    orders(spark, dir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("clientes_distintos"),
        countDistinct(col("o_orderdate")).as("datas_distintas"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** AS-OF join (the classic operator Spark lacks natively), composed from
    * built-ins per the custom-operator preference order (SURVEY §4.3(a)):
    * for each purchase event, the user's most recent STRICTLY-PRIOR click
    * — one pass: tag clicks, carry the last non-null tag forward with a
    * preceding-rows window, then keep purchases. No join at all on the
    * Spark side; the oracle cross-checks against DuckDB's NATIVE ASOF JOIN,
    * so two entirely different algorithms must agree.
    *
    * Boundary note: "strictly prior" is row-order-based here ((ts,
    * event_id) preceding rows) vs timestamp-based (`p.ts > c.ts`) in the
    * oracle — they can differ only when a click and a purchase share the
    * exact same microsecond, which has measure zero in event data (and
    * does not occur in the generated corpus at any scale factor).
    */
  def asofAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events(spark, dir)
      .withColumn("click_id",
        when(col("event_type") === "click", col("event_id")))
      .withColumn("ultimo_click_id",
        last(col("click_id"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").cast("long").as("purchase_id"),
        col("user_id").cast("long").as("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_compra"),
        col("ultimo_click_id").cast("long").as("click_id"))
      .orderBy("purchase_id")
  }

  /** Hourly rollup over the events table — the batch twin of the
    * Structured Streaming job in graft.streaming (same logical plan; the
    * stream adds a watermark).
    */
  def eventsHourly(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_format(date_trunc("hour", col("ts")),
        "yyyy-MM-dd HH:mm:ss").as("hora"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_valor"))
      .orderBy("hora", "event_type")

  /** Exact line revenue: DECIMAL(18,2) price × DECIMAL(9,4) discount
    * complement — the product and its sum stay exact rationals in both
    * engines (cast to double only at presentation), so the composed
    * analytics below gate bit-exactly despite double source columns.
    */
  private val receita =
    (col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1).cast("decimal(9,4)") - col("l_discount").cast("decimal(9,4)")))

  /** TPC-H Q3-shaped composed analytics (shipping priority): top-10
    * unshipped-revenue orders for one market segment at a cutoff date.
    * Three-table join with BOTH date filters pushed to their scans, one
    * grouped exact-decimal sum, and the top-10 via TakeOrderedAndProject
    * (orderBy+limit — never a global sort). The segment filter prunes
    * the customer side before the join.
    */
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val c = customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(spark, dir).filter(col("o_orderdate") < "1996-03-15")
    val l = lineitem(spark, dir).filter(col("l_shipdate") > "1996-03-15")
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum(receita).cast("double").as("receita"))
      .select(col("l_orderkey"), col("receita"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("data_pedido"),
        col("o_orderpriority"))
      .orderBy(desc("receita"), asc("data_pedido"), asc("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped composed analytics (regional volume): revenue by
    * nation for one region-year, where supplier and customer share the
    * nation (the "local volume" condition). Six-table join: region and
    * nation are tiny (broadcast), the c⋈o⋈l spine shuffles on its keys,
    * and the locality condition (c_nationkey = s_nationkey) rides the
    * supplier join. One grouped exact-decimal sum, nation-bounded
    * output.
    */
  def regionalVolume(spark: SparkSession, dir: String): DataFrame = {
    val n = nation(spark, dir)
    val r = region(spark, dir).filter(col("r_name") === "ASIA")
    val o = orders(spark, dir)
      .filter(col("o_orderdate") >= "1996-01-01" &&
        col("o_orderdate") < "1997-01-01")
    customer(spark, dir)
      .join(o, col("c_custkey") === col("o_custkey"))
      .join(lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .join(supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("n_name")
      .agg(sum(receita).cast("double").as("receita"))
      .orderBy(desc("receita"), asc("n_name"))
  }

  /** SLIDING-window rollup (1-hour windows every 15 minutes): the
    * standard overlapping-window aggregate — each event lands in exactly
    * 4 windows, so the explode factor is the overlap ratio (a constant),
    * and the aggregation stays one map-combinable groupBy on
    * (window, type). Spark's `window()` generator handles the explode;
    * the oracle reproduces the epoch-aligned 15-minute grid by explicit
    * arithmetic. Money sums ride DECIMAL(18,2), cast to double only at
    * the edge (the repo-wide decimal discipline).
    */
  def eventsSliding(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_valor"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("inicio"),
        date_format(col("window.end"), "yyyy-MM-dd HH:mm:ss").as("fim"),
        col("event_type"), col("n"), col("soma_valor"))
      .orderBy("inicio", "event_type")

  /** Strict-order funnel analysis (view → click → purchase): per user,
    * the earliest view, the earliest click AFTER that view, the earliest
    * purchase AFTER that click — the conversion-path primitive every
    * event pipeline reports on, with strict ordering so a click that
    * precedes the first view can never count. Three grouped mins chained
    * by equi-joins on user_id: after the first groupBy every later stage
    * reuses the same hash partitioning (co-partitioned joins, map-side
    * combinable mins) — no window, no per-user sort, no cross join, the
    * shape that holds at any event volume.
    */
  def funnelSteps(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t_view"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("ts") > col("t_view"))
      .groupBy("user_id").agg(min("ts").as("t_click"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("ts") > col("t_click"))
      .groupBy("user_id").agg(min("ts").as("t_compra"))
    v.join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .selectExpr("user_id", "t_view", "t_click", "t_compra",
        "CASE WHEN t_compra IS NOT NULL THEN 1 ELSE 0 END AS converteu")
      .orderBy("user_id")
  }

  /** Bin-blocked RANGE join (extension — the join shape OSS Spark has no
    * native strategy for): every event falling inside each "flash promo"
    * window `[ts, ts+1h)` opened by a high-value purchase, aggregated per
    * window. A naive `points.join(windows, lo <= ts && ts < hi)` has no
    * equi-key, so Spark plans BroadcastNestedLoopJoin — O(points ×
    * windows) compares, the classic 100 TB killer. Blocking both sides on
    * fixed-width time bins (width = the max window length, so a window
    * spans at most 2 bins and a point exactly 1) turns it into an
    * EQUI-join on the bin id: the shuffle moves each point once and each
    * window ≤ 2×, and the residual range predicate runs only on
    * bin-collocated pairs. A qualifying (point, window) pair meets in
    * exactly the point's bin, so no post-join dedup is needed. Bin ids
    * use integer `div` (not `/`): epoch micros near 2^50 lose boundary
    * exactness under double division. The DuckDB oracle computes the same
    * join with its native IEJoin inequality-join operator — two entirely
    * different algorithms that must agree bit-exactly.
    */
  def rangeJoinBinned(spark: SparkSession, dir: String): DataFrame = {
    val binUs = 3600L * 1000000L // bin width == window width (1 hour)
    val ev = events(spark, dir).select(
      col("event_id").cast("long").as("event_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"), col("value"))
    val wins = ev.filter(col("event_type") === "purchase" && col("value") >= 150)
      .select(col("event_id").as("janela_id"), col("ts_us").as("lo_us"),
        (col("ts_us") + binUs).as("hi_us"))
    // [lo, hi) spans bins lo div W .. (hi-1) div W — ≤ 2 when hi-lo ≤ W
    val winBins = wins.withColumn("bin",
      explode(sequence(expr(s"lo_us div $binUs"), expr(s"(hi_us - 1) div $binUs"))))
    val pts = ev.select(col("event_id").as("ponto_id"), col("ts_us"), col("value"))
      .withColumn("bin", expr(s"ts_us div $binUs"))
    pts.join(winBins, Seq("bin"))
      .filter(col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))
      .groupBy("janela_id")
      .agg(count(lit(1)).as("n_eventos"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_valor"))
      .orderBy("janela_id")
  }

  /** Runtime-filter (Bloom) join pruning (extension) — the 100 TB pattern
    * where a selective build-side predicate prunes the FACT SCAN before
    * the join shuffle ever runs, wired from the same machinery Spark's
    * AQE InjectRuntimeFilter rule uses, here made explicit and gated:
    *
    *  1. a distributed `BloomFilterAggregate` over xxhash64 of the
    *     filtered build keys — a partial/final TypedImperativeAggregate,
    *     so build rows never leave their executors; only the merged
    *     ~KB-scale bloom binary reaches the driver (O(1) rows, the same
    *     contract as Spark's own runtime-filter scalar subquery);
    *  2. the probe side is pre-filtered with
    *     `BloomFilterMightContain(lit(bloom), xxhash64(key))` — a codegen
    *     predicate evaluated at the scan, before any exchange, so at scale
    *     ~84% of the fact (here) is dropped without being shuffled;
    *  3. an exact left-semi join over the survivors removes the bloom's
    *     false positives.
    *
    * The bloom changes the plan's COST, never its answer: the result is
    * exactly the plain semi join, which is what the DuckDB oracle runs
    * (no bloom at all) — any false-negative bug in the wiring would
    * surface as a hash mismatch.
    */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.graftshim.Shim.{toColumn, toExpr}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val build = orders(spark, dir)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000)
      .select(col("o_orderkey"))
    val bloomBytes = build
      .select(toColumn(new BloomFilterAggregate(
        new XxHash64(Seq(toExpr(col("o_orderkey")))), 100000L)
        .toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
    val pruned = lineitem(spark, dir).filter(toColumn(BloomFilterMightContain(
      Literal(bloomBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(toExpr(col("l_orderkey")))))))
    pruned
      .join(build, pruned("l_orderkey") === build("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey").cast("long").as("l_orderkey"))
      .agg(count(lit(1)).as("n_linhas"),
        sum(col("l_quantity").cast("int")).cast("long").as("qtd_total"))
      .orderBy("l_orderkey")
  }

  /** Salted SKEW join (extension): when the fact side hashes to a handful
    * of hot keys — here event_type, 5 values over the whole corpus — a
    * plain shuffled equi-join lands every hot key's rows on ONE reducer,
    * and one straggler partition carries 1/5th of the corpus no matter how
    * many executors exist. Salting composes the key with a uniform shard
    * id on the fact side (`pmod(event_id, 16)`) and EXPLODES the dim side
    * over all 16 shard ids, so the equi-join on (key, salt) spreads each
    * hot key across 16 reducers. The result is row-identical to the
    * unsalted join (SkewJoinSpec asserts it, plus the (key, salt) shuffle
    * key in the plan). The merge hint stands in for "dim too large to
    * broadcast": at toy scale Spark would otherwise broadcast the 5-row
    * dim and hide the skew entirely — the salt targets the shuffled-join
    * regime where both sides exceed the broadcast threshold.
    */
  def skewJoinSalted(spark: SparkSession, dir: String): DataFrame = {
    val shards = 16
    val ev = events(spark, dir).select(
      col("event_id").cast("long").as("event_id"),
      col("event_type"), col("value"))
    val dim = ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_tipo"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_tipo"))
      .withColumn("salt", explode(sequence(lit(0), lit(shards - 1))))
    val fato = ev.withColumn("salt",
      pmod(col("event_id"), lit(shards)).cast("int"))
    fato.join(dim.hint("merge"), Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"), col("n_tipo"), col("soma_tipo"),
        (col("value").cast("decimal(18,2)").cast("double") / col("soma_tipo"))
          .as("fracao"))
      .orderBy("event_id")
  }

  /** The AQE twin of [[skewJoinSalted]]: the SAME skewed workload with no
    * manual salt at all — a plain shuffled equi-join, letting Spark's
    * adaptive skew-join optimization own the hot keys. At runtime AQE
    * measures the post-shuffle map output, and any reducer partition
    * exceeding `spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes`
    * (and factor × median) is split into multiple tasks that each join a
    * slice of the hot key's rows against the full matching build rows —
    * semantically identical, so this gates against the SAME oracle as the
    * salted form.
    *
    * The crossover, documented from both forms: manual salting buys a
    * FIXED 16× spread paid on every row of both sides (dim exploded 16×,
    * an extra salt column through the shuffle) whether or not skew
    * exists; AQE's split is free when the data isn't skewed, adapts the
    * spread to the observed partition sizes, and needs no knowledge of
    * which keys are hot — at 100 TB the optimizer-owned form is the
    * default, and hand salting remains only for engines/paths without
    * runtime re-planning (e.g. inside a single un-reshuffled stage).
    * ScaleOpsSpec pins the plan evidence: with the skew thresholds
    * lowered to toy scale, the executed SortMergeJoin reports skew=true
    * with more join tasks than shuffle partitions.
    */
  def skewJoinAqe(spark: SparkSession, dir: String): DataFrame =
    skewJoinAqeOf(events(spark, dir))

  /** [[skewJoinAqe]] over an arbitrary events relation — the spec feeds a
    * multi-file copy so the scan yields several map tasks (AQE splits a
    * skewed reducer partition at MAPPER granularity; a single-row-group
    * toy file is one mapper and therefore unsplittable, a constraint that
    * vanishes at real scale where scans are thousands of tasks).
    */
  private[graft] def skewJoinAqeOf(ev0: DataFrame): DataFrame = {
    val ev = skewEvents(ev0)
    skewJoinPlain(ev, skewDim(ev))
  }

  private[graft] def skewEvents(ev0: DataFrame): DataFrame =
    ev0.select(col("event_id").cast("long").as("event_id"),
      col("event_type"), col("value"))

  private[graft] def skewDim(ev: DataFrame): DataFrame =
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_tipo"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("soma_tipo"))

  /** The unsalted join itself. Note for the plan evidence: AQE's
    * OptimizeSkewedJoin only matches the canonical
    * SMJ(sort+shuffle, sort+shuffle) shape, so a dim whose AGGREGATE sits
    * in the same plan (as in the self-contained gated form) is not
    * eligible — at scale the dim is a materialized table and the pattern
    * matches, which is what the spec reproduces by writing the dim out
    * and joining the read-back.
    */
  private[graft] def skewJoinPlain(ev: DataFrame, dim: DataFrame): DataFrame =
    // merge hint as in the salted form: the 5-row dim would broadcast at
    // toy scale and hide the skew regime being demonstrated
    ev.join(dim.hint("merge"), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("n_tipo"), col("soma_tipo"),
        (col("value").cast("decimal(18,2)").cast("double") / col("soma_tipo"))
          .as("fracao"))
      .orderBy("event_id")

  /** Adaptive skew salting — [[skewJoinSalted]] with the hot-key set
    * DETECTED instead of assumed: a Misra-Gries summary
    * ([[graft.functions.MisraGries]], O(k) state, one bounded aggregate
    * over the fact side — never an exact per-key pre-aggregation) flags
    * keys whose estimated share reaches 5%, and ONLY those keys get the
    * 16-way salt: the dim side explodes hot keys over all shard ids and
    * keeps cold keys at a single salt-0 row, the fact side shards hot
    * keys by `pmod(event_id, 16)` and leaves cold keys at salt 0.
    *
    * Cost posture at 100 TB: uniform salting pays the dim×16 explode
    * and the widened shuffle key on EVERY row whether or not skew
    * exists; the adaptive form confines that cost to the hot set (the
    * summary pass is one O(k)-state aggregate, the class of pass a
    * pipeline often already runs for stats). Detection is a COST
    * device, never a semantics device: salting is row-identity-
    * preserving for any hot-key classification, so correctness cannot
    * depend on the sketch — the gate pins the result against the same
    * plain-join oracle as the uniform-salt form. The MG bound makes the
    * flagging one-sided-certain: a key at share ≥ 1/20 + 1/(k+1)
    * (≈6.5% at k=64) can never be missed; below that the undercount may
    * leave a borderline key unsalted, which AQE's runtime skew split
    * still catches downstream.
    */
  def skewJoinSaltedAdaptive(spark: SparkSession, dir: String): DataFrame =
    skewJoinSaltedAdaptiveOf(skewEvents(events(spark, dir)))

  private[graft] def skewJoinSaltedAdaptiveOf(ev: DataFrame): DataFrame = {
    val shards = 16
    val hot = detectHotKeys(ev, "event_type", 64, 20)
    val isHot =
      if (hot.isEmpty) lit(false) else col("event_type").isInCollection(hot)
    val dim = skewDim(ev).withColumn("salt",
      explode(when(isHot, sequence(lit(0), lit(shards - 1)))
        .otherwise(array(lit(0)))))
    val fato = ev.withColumn("salt",
      when(isHot, pmod(col("event_id"), lit(shards)).cast("int"))
        .otherwise(lit(0)))
    fato.join(dim.hint("merge"), Seq("event_type", "salt"))
      .select(col("event_id"), col("event_type"), col("n_tipo"), col("soma_tipo"),
        (col("value").cast("decimal(18,2)").cast("double") / col("soma_tipo"))
          .as("fracao"))
      .orderBy("event_id")
  }

  /** Keys whose Misra-Gries-estimated count reaches n/shareDen, from one
    * bounded-state pass (summary + exact n in the same aggregate). The
    * estimate only undercounts (by ≤ n/(k+1)), so the flag set is a
    * SUBSET of keys at share ≥ 1/shareDen and certainly contains every
    * key at share ≥ 1/shareDen + 1/(k+1). Sorted for determinism.
    */
  private[graft] def detectHotKeys(df: DataFrame, keyCol: String, k: Int,
      shareDen: Int): Seq[String] = {
    val row = df.select(col(keyCol).cast("string").as("k"))
      .agg(graft.functions.MisraGries.udafCol(k)(col("k")).as("mg"),
        count(lit(1)).as("n")).head()
    val n = row.getLong(1)
    row.getMap[String, Long](0)
      .collect { case (key, c) if c * shareDen >= n => key }.toSeq.sorted
  }

  /** Count-min sketch, PRODUCTION FORM (extension — the mergeable
    * frequency sketch a streaming or 100 TB pipeline uses when exact
    * per-key counts don't fit): d=4 hash rows × w=64 buckets, built
    * directly from the event stream with NO exact per-key aggregation
    * anywhere in the plan — the whole point of a sketch is that the exact
    * counts don't exist. Each event contributes one increment per hash
    * row; the d×w cell matrix is a plain partial+final grouped COUNT over
    * 256 distinct (i, bucket) keys, so the map-side combine reduces any
    * partition to ≤256 rows — mergeable across executors, micro-batches,
    * and days by construction. The hash family is the engine's standard
    * md5-halves (h1 + i·h2) mod p (the TextExprs.hashHalf layout), so the
    * DuckDB oracle rebuilds the IDENTICAL cell matrix bit-exactly.
    *
    * Estimation (min over a key's d cells) and error measurement against
    * exact truth are HARNESS work — [[countMinErrorProbe]], exercised by
    * ScaleOpsSpec — because a production sketch never computes the truth
    * it exists to avoid.
    */
  def countMinCells(spark: SparkSession, dir: String): DataFrame = {
    val (d, w, p) = (4, 64, 1000000007L)
    events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"))
      .withColumn("h", md5(col("user_id").cast("string")))
      .withColumn("h1", expr(s"CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) % $p"))
      .withColumn("h2", expr(s"CAST(conv(substring(h, 17, 15), 16, 10) AS BIGINT) % $p"))
      .withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", expr(s"((h1 + i * h2) % $p) % $w"))
      .groupBy("i", "bucket").agg(count(lit(1)).as("c"))
      .orderBy("i", "bucket")
  }

  /** Equi-width histogram sketch over l_extendedprice — the QUANTILE
    * member of the sketch family (KMV distinct / HLL distinct / count-min
    * frequency / Misra-Gries heavy hitters / this): 64 fixed-width bins
    * between the exact min and max, cells are plain integer counts —
    * idempotent-free but ASSOCIATIVE, so cells from any corpus split or
    * any day merge by addition (the property a 100 TB profile needs:
    * maintain per-partition histograms, add them at read). Quantile
    * estimation (walk the cumulative counts; error ≤ one bin width) is
    * HARNESS work in ScaleOpsSpec-style fashion — the production sketch
    * never computes the exact truth it exists to avoid.
    *
    * Cross-engine exactness: the bin index is floor((x−min)·64/(max−min))
    * clamped to 63 — three correctly-rounded double ops in one pinned
    * order, then an exact floor; min/max are exact scans. (Spelled as
    * ·64/range, NOT /width, so there is exactly one division.)
    */
  def histogramCells(spark: SparkSession, dir: String): DataFrame = {
    val b = lineitem(spark, dir).select(col("l_extendedprice").as("x"))
    val mm = b.agg(min("x").as("mn"), max("x").as("mx"))
    b.crossJoin(broadcast(mm))
      .selectExpr(
        "least(CAST(floor((x - mn) * CAST(64 AS DOUBLE) / (mx - mn)) AS INT), 63) AS bin")
      .groupBy("bin").agg(count(lit(1)).as("c"))
      .orderBy("bin")
  }

  /** One streamed micro-batch of histogram maintenance, EXACTLY-ONCE:
    * the batch's cells ADD onto the committed cells (integer addition —
    * associative, so the maintained table is bit-identical to the
    * one-shot scan under any batch split). `mn`/`mx` are the sketch's
    * CONFIG — fixed at stream start like any production histogram's
    * bounds — passed in so every batch bins identically.
    */
  private[graft] def histogramApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, mn: Double, mx: Double, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "hist_b", batchId) { prior =>
      val partial = batch
        .selectExpr(
          s"least(CAST(floor((l_extendedprice - CAST('$mn' AS DOUBLE)) * CAST(64 AS DOUBLE) / " +
            s"(CAST('$mx' AS DOUBLE) - CAST('$mn' AS DOUBLE))) AS INT), 63) AS bin")
        .groupBy("bin").agg(count(lit(1)).as("c"))
      prior.fold(partial)(p => partial.unionByName(p)
        .groupBy("bin").agg(sum("c").as("c")))
    }

  /** The committed cell table. */
  private[graft] def histogramReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"histogram state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir")
      .selectExpr("bin", "CAST(c AS BIGINT) AS c").orderBy("bin")
  }

  /** Test-harness twin of [[countMinCells]]: per-user exact count,
    * sketch estimate (min over the key's d buckets), and the
    * overestimation — the error probe that validates the sketch's bounds
    * at test scale. NOT gated and NOT benched: the exact-truth side is
    * measurement apparatus a production sketch drops.
    */
  def countMinErrorProbe(spark: SparkSession, dir: String): DataFrame = {
    val (d, w, p) = (4, 64, 1000000007L)
    val keyed = events(spark, dir)
      .select(col("user_id").cast("long").as("user_id"))
      .groupBy("user_id").agg(count(lit(1)).as("n_true"))
      .withColumn("h", md5(col("user_id").cast("string")))
      .withColumn("h1", expr(s"CAST(conv(substring(h, 1, 15), 16, 10) AS BIGINT) % $p"))
      .withColumn("h2", expr(s"CAST(conv(substring(h, 17, 15), 16, 10) AS BIGINT) % $p"))
      .withColumn("i", explode(sequence(lit(0), lit(d - 1))))
      .withColumn("bucket", expr(s"((h1 + i * h2) % $p) % $w"))
    val cells = keyed.groupBy("i", "bucket").agg(sum("n_true").as("c"))
    keyed.join(cells, Seq("i", "bucket"))
      .groupBy("user_id", "n_true")
      .agg(min("c").as("n_est"))
      .select(col("user_id"), col("n_true"), col("n_est"),
        (col("n_est") - col("n_true")).as("superestimativa"))
      .orderBy("user_id")
  }

  /** Column-level data profile (extension — the data-quality scan run
    * before any table is admitted to a pipeline): per column, null count,
    * exact distinct count, and min/max (numerics in DOUBLE slots to avoid
    * cross-engine float formatting; strings/timestamps in text slots).
    * One aggregate pass over the table — Spark plans the multi-DISTINCT
    * via Expand, still a single scan — then a stack() to long form.
    * The testdata carries no nulls, so two columns get deterministic
    * planted nulls first (same device as the PII redaction gate).
    * The DuckDB oracle is generated from the SAME column spec below.
    */
  private val profileCols: Seq[(String, String)] = Seq(
    "o_orderkey" -> "num", "o_custkey" -> "num", "o_totalprice" -> "num",
    "o_orderstatus" -> "str", "o_orderpriority" -> "str",
    "o_orderdate" -> "date")

  private val profileBaseCols = Seq(
    "o_orderkey", "o_custkey",
    "CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_totalprice END AS o_totalprice",
    "o_orderstatus",
    "CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS o_orderpriority",
    "o_orderdate")

  def profileOrders(spark: SparkSession, dir: String): DataFrame = {
    val base = orders(spark, dir).selectExpr(profileBaseCols: _*)
    val aggs = Seq("COUNT(*) AS n_total") ++ profileCols.flatMap { case (c, kind) =>
      Seq(s"COUNT($c) AS cnt_$c", s"COUNT(DISTINCT $c) AS nd_$c") ++ (kind match {
        case "num" =>
          Seq(s"CAST(MIN($c) AS DOUBLE) AS mn_$c", s"CAST(MAX($c) AS DOUBLE) AS mx_$c")
        case "str" => Seq(s"MIN($c) AS mn_$c", s"MAX($c) AS mx_$c")
        case _ =>
          Seq(s"CAST(MIN($c) AS STRING) AS mn_$c", s"CAST(MAX($c) AS STRING) AS mx_$c")
      })
    }
    val wide = base.groupBy().agg(
      expr(aggs.head), aggs.tail.map(expr): _*)
    val flat = profileCols.map { case (c, kind) =>
      val slots = kind match {
        case "num" => s"mn_$c, mx_$c, CAST(NULL AS STRING), CAST(NULL AS STRING)"
        case _ => s"CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), mn_$c, mx_$c"
      }
      s"'$c', n_total - cnt_$c, nd_$c, $slots"
    }.mkString(", ")
    wide.selectExpr(s"stack(${profileCols.size}, $flat)")
      .toDF("coluna", "n_nulos", "n_distintos",
        "min_num", "max_num", "min_texto", "max_texto")
      .orderBy("coluna")
  }

  /** DuckDB twin of [[profileOrders]], generated from the same spec. */
  val profileOrdersOracle: String = {
    val selects = profileCols.map { case (c, kind) =>
      val slots = kind match {
        case "num" =>
          s"CAST(MIN($c) AS DOUBLE) AS min_num, CAST(MAX($c) AS DOUBLE) AS max_num, " +
            "CAST(NULL AS VARCHAR) AS min_texto, CAST(NULL AS VARCHAR) AS max_texto"
        case "str" =>
          "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
            s"MIN($c) AS min_texto, MAX($c) AS max_texto"
        case _ =>
          "CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num, " +
            s"CAST(MIN($c) AS VARCHAR) AS min_texto, CAST(MAX($c) AS VARCHAR) AS max_texto"
      }
      s"""SELECT '$c' AS coluna, COUNT(*) - COUNT($c) AS n_nulos,
  COUNT(DISTINCT $c) AS n_distintos, $slots FROM base"""
    }
    val baseDuck = profileBaseCols.mkString(", ")
    s"""WITH base AS (SELECT $baseDuck FROM orders)
${selects.mkString("\nUNION ALL\n")}
ORDER BY coluna"""
  }
}
