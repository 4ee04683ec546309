package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.customer

/** Slowly-changing-dimension maintenance — the incremental alternative to
  * the reference's truncate-and-reload (S5). The reference rebuilds every
  * dimension from scratch each run (e.g. dags/etl_dim_produto.py:52
  * TRUNCATE ... RESTART IDENTITY); at 100 TB a dimension reload is a
  * merge, not a rewrite:
  *
  *  - Type 1 (overwrite): changed attributes replace the stored row —
  *    one anti-join (kept rows) + the update set. No history.
  *  - Type 2 (versioned): changed rows CLOSE their current version
  *    (valid_to stamped, flag dropped) and open a new one; unchanged and
  *    brand-new keys pass through. History is append-only.
  *
  * Both are expressed as key-partitioned joins (anti/left) — no full
  * rewrite of the unchanged majority, which is the point at scale: the
  * shuffle is bounded by |dim| + |updates|, and with both sides bucketed
  * by the business key it is a zero-exchange sort-merge join.
  *
  * The demo update set is derived DETERMINISTICALLY from the same
  * snapshot (every 7th customer changes segment, every 13th is brand
  * new), so the DuckDB oracle reproduces the whole merge bit-exactly.
  */
object Scd {

  /** Open-version sentinel (classic DW practice; also keeps the oracle
    * compare free of NULL-date representation differences between the
    * two engines' pandas bridges).
    */
  private val OpenEnd = "9999-12-31"

  /** Current dimension snapshot: the customer business surface. */
  private def snapshot(s: SparkSession, d: String): DataFrame =
    customer(s, d).select(
      col("c_custkey").cast("long").as("id_cliente"),
      trim(col("c_name")).as("nome"),
      coalesce(col("c_mktsegment"), lit("N/A")).as("segmento"))

  /** Deterministic incremental batch: every 7th key changes segment;
    * every 13th key arrives as a NEW customer; every 17th key (excluding
    * %7 overlaps — update keys must be unique) NULLs its name, so the
    * kernel's null-safe change detection (`<=>` / IS DISTINCT FROM) is
    * exercised by gated data, not just asserted — under three-valued
    * `<>` these rows would silently not version. New keys are -(key+1) —
    * strictly negative, so guaranteed disjoint from the (non-negative)
    * business-key domain at every scale factor, unlike an additive
    * offset, which a large enough key domain would eventually collide
    * with (and unlike bare negation, which maps key 0 to itself).
    */
  private def updates(s: SparkSession, d: String): DataFrame = {
    val base = snapshot(s, d)
    val changed = base.filter(col("id_cliente") % 7 === 0)
      .withColumn("segmento", lit("ATUALIZADO"))
    val fresh = base.filter(col("id_cliente") % 13 === 0)
      .select((-(col("id_cliente") + 1)).as("id_cliente"),
        concat(lit("Novo "), col("nome")).as("nome"),
        lit("NOVO").as("segmento"))
    val nulled = base.filter(
        col("id_cliente") % 17 === 0 && col("id_cliente") % 7 =!= 0)
      .withColumn("nome", lit(null).cast("string"))
    changed.unionByName(fresh).unionByName(nulled)
  }

  /** Type 1 merge: updates win, unmatched dimension rows survive. */
  def scd1(s: SparkSession, d: String): DataFrame = {
    val dim = snapshot(s, d)
    val up = updates(s, d)
    up.unionByName(dim.join(up, Seq("id_cliente"), "left_anti"))
      .orderBy("id_cliente")
  }

  /** The initial version table: every snapshot row open since the epoch
    * version date. This is the state a versioned dimension starts from.
    */
  private[graft] def initialVersions(s: SparkSession, d: String): DataFrame =
    snapshot(s, d)
      .withColumn("valid_from", lit("1995-01-01").cast("date"))
      .withColumn("valid_to", lit(OpenEnd).cast("date"))
      .withColumn("vigente", lit(true))

  /** The deterministic update batch, exposed for the streamed form's
    * staging (changed and brand-new rows carry DISJOINT key sets by
    * construction, so any batch split of them merges to the same table).
    */
  private[graft] def updateBatch(s: SparkSession, d: String): DataFrame =
    updates(s, d)

  /** The SCD2 MERGE KERNEL over a version table — the incremental
    * apply a versioned dimension runs per load: among the CURRENT
    * (vigente) versions, keys whose update differs are closed
    * (valid_to = loadDate) and reopened with the new attributes;
    * unmatched/unchanged current rows pass through; update keys with no
    * current version open as brand-new; history (non-vigente) rows are
    * untouched. Both the one-shot gate (q_scd2_apply) and the streamed
    * foreachBatch upsert (q_scd2_stream) run THIS kernel, so the two
    * forms cannot drift.
    *
    * Scale shape: one key-partitioned left join of current versions
    * against the update batch + one anti join — the shuffle is bounded
    * by |current| + |updates|, history rows are never rewritten (in a
    * real DW the non-vigente majority would live in separate partitions
    * and skip the scan entirely — the same partition discipline as the
    * incremental fact).
    */
  private[graft] def scd2Merge(cur: DataFrame, up: DataFrame,
      loadDate: String): DataFrame =
    scd2MergeOn(cur, up, "id_cliente", Seq("nome", "segmento"), loadDate)

  /** The kernel generalized over an arbitrary business key + attribute
    * set, so ANY dimension gets the versioned-merge story — the
    * AdventureWorks dim_cliente path reuses it on the reference's own
    * CSVs (AwEtl.dimClienteScd2). `cur` must carry (key, attrs*,
    * valid_from, valid_to, vigente); `up` carries (key, attrs*).
    * Attribute change detection is NULL-SAFE (`<=>`), so a null→value
    * transition versions correctly instead of vanishing into a
    * three-valued-logic false.
    */
  private[graft] def scd2MergeOn(cur: DataFrame, up: DataFrame, key: String,
      attrs: Seq[String], loadDate: String): DataFrame = {
    val history = cur.filter(!col("vigente"))
    val current = cur.filter(col("vigente"))
    // a literal match flag marks join hits — attribute null-tests cannot
    // (a legitimately-null update attribute would read as "no match")
    val joined = current.alias("d")
      .join(up.withColumn("_upd", lit(1)).alias("u"), Seq(key), "left")
    val differs = attrs.map(a => !(col(s"u.$a") <=> col(s"d.$a")))
      .reduce(_ || _)
    val changed = joined.filter(col("u._upd").isNotNull && differs)
    val closed = changed.select(col(key) +:
      attrs.map(a => col(s"d.$a").as(a)) :+
      col("d.valid_from").as("valid_from") :+
      lit(loadDate).cast("date").as("valid_to") :+
      lit(false).as("vigente"): _*)
    val reopened = changed.select(col(key) +:
      attrs.map(a => col(s"u.$a").as(a)) :+
      lit(loadDate).cast("date").as("valid_from") :+
      lit(OpenEnd).cast("date").as("valid_to") :+
      lit(true).as("vigente"): _*)
    val untouched = joined.filter(col("u._upd").isNull || !differs)
      .select(col(key) +:
        attrs.map(a => col(s"d.$a").as(a)) :+
        col("d.valid_from").as("valid_from") :+
        col("d.valid_to").as("valid_to") :+
        col("d.vigente").as("vigente"): _*)
    val brandNew = up.join(current, Seq(key), "left_anti")
      .select(col(key) +: attrs.map(col) :+
        lit(loadDate).cast("date").as("valid_from") :+
        lit(OpenEnd).cast("date").as("valid_to") :+
        lit(true).as("vigente"): _*)
    history.unionByName(closed).unionByName(reopened)
      .unionByName(untouched).unionByName(brandNew)
  }

  /** Type 2 apply at a fixed load date: emits the full post-merge version
    * table — closed old versions of changed keys, open new versions
    * (changed + brand-new), and untouched current rows. One invocation of
    * [[scd2Merge]] over the initial version table.
    */
  def scd2(s: SparkSession, d: String, loadDate: String = "1999-01-01"): DataFrame =
    scd2Merge(initialVersions(s, d), updates(s, d), loadDate)
      .orderBy("id_cliente", "valid_from", "vigente")

  // ---------------------------------------------- versioned state store
  // The persisted form of the version table for INCREMENTAL maintenance,
  // laid out for EXACTLY-ONCE batch applies under foreachBatch replay
  // (Structured Streaming redelivers an uncommitted batch after a
  // restart — the at-least-once hole the r10 store had):
  //
  //   stateDir/_committed        "<currentDir>\t<lastBatchId>", atomic
  //   stateDir/current_init      the initial open version table
  //   stateDir/current_b<id>     the current set after batch <id>
  //   stateDir/hist_b<id>        versions CLOSED by batch <id> (immutable)
  //
  // A batch apply reads ONLY the committed current dir (history is not
  // even listed — stronger than the old cur-partition pruning), stages
  // its closed rows and new current set into per-batch dirs in overwrite
  // mode, then atomically advances the pointer (StoreCommit). A replayed
  // batch is either skipped (id <= watermark) or re-staged into its own
  // dirs idempotently — history can never double-append, the failure
  // VERDICT r10 called out. History dirs, once committed, are never
  // read, rewritten, or touched by later batches — per-batch cost stays
  // O(|current| + |updates|), not O(|dim| including all history), which
  // is the point of SCD2 at 100 TB: the version table's history dwarfs
  // its current set after years of loads. ScdPitSpec pins the history
  // immutability, the replay skip, and the crash-window replay.

  /** Initialize the store with the initial version table (all rows
    * open). Wipes any previous store at the path first: init means THIS
    * is the state, not a union with a previous run's history.
    */
  private[graft] def initStateStore(s: SparkSession, d: String,
      stateDir: String): Unit = {
    StoreCommit.wipe(stateDir)
    initialVersions(s, d)
      .write.mode("overwrite").parquet(s"$stateDir/current_init")
    StoreCommit.commit(stateDir, "current_init", -1L)
  }

  /** Apply one update batch to the store via [[scd2Merge]], exactly
    * once: a batch at or below the committed high-watermark is a replay
    * of an already-applied batch and is skipped outright; otherwise the
    * apply stages per-batch dirs and commits. `batchId` must be strictly
    * monotonic across batches (Structured Streaming's foreachBatch ids
    * are; batch callers number their applies explicitly).
    */
  private[graft] def applyBatchToStore(s: SparkSession, stateDir: String,
      batch: DataFrame, loadDate: String, batchId: Long): Unit = {
    val (curDir, last) = StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"state store not initialized: $stateDir"))
    if (batchId <= last) return // replay of a committed batch
    stageBatch(s, stateDir, curDir, batch, loadDate, batchId)
    StoreCommit.commit(stateDir, s"current_b$batchId", batchId)
    StoreCommit.cleanupStale(stateDir, "current_")
  }

  /** The two data writes of one batch apply WITHOUT the commit — the
    * crash window a replay must absorb (exposed so ScdPitSpec can forge
    * a crashed half-applied batch). Both writes land in per-batch dirs
    * in overwrite mode: re-staging the same batch over the same
    * committed state is deterministic and replaces partial files instead
    * of appending beside them. The merge is materialized through a
    * checkpoint barrier so it computes once for both writes.
    */
  private[graft] def stageBatch(s: SparkSession, stateDir: String,
      curDir: String, batch: DataFrame, loadDate: String, batchId: Long): Unit = {
    val current = s.read.parquet(s"$stateDir/$curDir")
    val merged = graft.Checkpoint.barrier(scd2Merge(current, batch, loadDate))
    merged.filter(!col("vigente"))
      .write.mode("overwrite").parquet(s"$stateDir/hist_b$batchId")
    merged.filter(col("vigente"))
      .write.mode("overwrite").parquet(s"$stateDir/current_b$batchId")
  }

  /** The full version table (history ∪ current) read back from the store
    * in the canonical column order. Only history dirs at or below the
    * committed watermark are unioned — staging left by a crashed
    * in-flight batch is invisible until that batch commits.
    */
  private[graft] def readStateStore(s: SparkSession, stateDir: String): DataFrame = {
    val (curDir, last) = StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"state store not initialized: $stateDir"))
    val hist = Option(new java.io.File(stateDir).listFiles())
      .getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("hist_b") &&
        f.getName.stripPrefix("hist_b").toLong <= last)
      .map(_.getName).sorted
    s.read.parquet((curDir +: hist.toSeq).map(n => s"$stateDir/$n"): _*)
      .select("id_cliente", "nome", "segmento", "valid_from", "valid_to",
        "vigente")
  }

  /** Load date for the point-in-time gate: MID order-date domain
    * (TPC-H orders span 1992-1998), so a changed customer's orders
    * genuinely split across its two versions — dates before the change
    * resolve to the closed version, dates after to the reopened one.
    */
  private[graft] val PitLoadDate = "1996-06-01"

  /** POINT-IN-TIME fact⟕dimension join (extension — the temporal lookup
    * every versioned DW and feature store needs): each order resolves
    * the customer-dimension VERSION that was valid on its order date —
    * `id equal AND valid_from <= date < valid_to` — never the merely
    * current row. Orders predating the dimension's first version
    * (1992-1994 here) surface explicitly as 'SEM_VERSAO' rather than
    * silently matching something.
    *
    * Scale shape: an EQUI-join on the customer key with the date-range
    * predicate as a residual filter — the shuffle is keyed exactly like
    * any fact⨝dim lookup (versions of one key are co-located; a key's
    * version count is small and its intervals partition time, so each
    * probe row matches ≤ 1 version and the residual scan is O(versions
    * per key)). No interval blocking needed: this is the
    * temporal-dimension case, not the arbitrary-interval case
    * (q_range_join covers that).
    */
  /** The PIT resolve kernel: every column of `o` (which must carry
    * `id_cliente` and `data_pedido`), plus the version attributes valid at
    * the row's date. Shared by the one-shot gate and the incremental
    * lifecycle so the two forms cannot drift.
    */
  private[graft] def pitResolve(o: DataFrame, versions: DataFrame): DataFrame = {
    val oa = o.alias("o")
    val v = versions.alias("v")
    oa.join(v,
        col("o.id_cliente") === col("v.id_cliente") &&
          col("o.data_pedido") >= col("v.valid_from") &&
          col("o.data_pedido") < col("v.valid_to"),
        "left")
      .select(o.columns.map(c => col(s"o.$c")) :+
        coalesce(col("v.segmento"), lit("SEM_VERSAO")).as("segmento") :+
        col("v.valid_from").as("versao_desde"): _*)
  }

  def factScd2PointInTime(s: SparkSession, d: String): DataFrame = {
    val o = graft.Tables.orders(s, d).select(
      col("o_orderkey").cast("long").as("id_pedido"),
      col("o_custkey").cast("long").as("id_cliente"),
      col("o_orderdate").as("data_pedido"))
    pitResolve(o, scd2(s, d, PitLoadDate)).orderBy("id_pedido")
  }

  /** The COMPOSED maintenance lifecycle — SCD2 dimension batches and
    * incremental fact loads working together, which is the production
    * shape the two r9 pieces stopped short of (and what replaces the
    * reference's truncate-reload at scale, dags/etl_fato_vendas.py
    * S5): fact increments resolve attributes against the VERSIONED
    * dimension valid at each order date while SCD2 batches maintain it
    * between loads.
    *
    *   1. the partitioned state store is initialized with the open
    *      version table;
    *   2. fact load 1 PIT-resolves the pre-cut orders against that state
    *      and sinks them (overwrite — the historical load);
    *   3. the SCD2 update batch applies at the cut date
    *      ([[applyBatchToStore]]: closed rows staged into the batch's
    *      immutable history dir, the current pointer atomically advanced);
    *   4. fact load 2 PIT-resolves the post-cut orders against the
    *      UPDATED store and appends.
    *
    * The gate's contract: the read-back incremental fact hash-matches a
    * one-shot oracle rebuild (PIT join of ALL orders against the final
    * version table). That equality is not an accident of the data — a
    * version closed at the cut date carries the same attributes over
    * [valid_from, cut) that the open version carried when load 1 ran, so
    * per-load resolution against the store-as-of-load-time equals
    * end-state PIT resolution. Every step is a key-partitioned join or a
    * partition-local write; nothing rescans the historical fact or the
    * dimension history.
    */
  def factScd2Lifecycle(s: SparkSession, d: String): DataFrame = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    val base = s"${System.getProperty("java.io.tmpdir")}/graft_scd2_life_$h"
    val state = s"$base/state"
    val fact = s"$base/fato"
    initStateStore(s, d, state)
    def ordersSlice(pred: org.apache.spark.sql.Column): DataFrame =
      graft.Tables.orders(s, d).filter(pred).select(
        col("o_orderkey").cast("long").as("id_pedido"),
        col("o_custkey").cast("long").as("id_cliente"),
        col("o_orderdate").as("data_pedido"),
        col("o_totalprice").cast("double").as("valor_pedido"))
    pitResolve(ordersSlice(col("o_orderdate") < lit(PitLoadDate)),
        readStateStore(s, state))
      .write.mode("overwrite").parquet(fact)
    applyBatchToStore(s, state, updateBatch(s, d), PitLoadDate, batchId = 0L)
    pitResolve(ordersSlice(col("o_orderdate") >= lit(PitLoadDate)),
        readStateStore(s, state))
      .write.mode("append").parquet(fact)
    s.read.parquet(fact)
      .select("id_pedido", "id_cliente", "data_pedido", "valor_pedido",
        "segmento", "versao_desde")
      .orderBy("id_pedido")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_scd1_merge" -> (scd1 _),
    "q_scd2_apply" -> ((s: SparkSession, d: String) => scd2(s, d)),
    // the foreachBatch streaming upsert, same merge kernel + same oracle
    "q_scd2_stream" -> (graft.streaming.Streams.scd2Streamed _),
    "q_scd2_pit_join" -> (factScd2PointInTime _),
    // the composed lifecycle: incremental fact loads PIT-resolving
    // against the SCD2-maintained partitioned store; oracle = one-shot
    // rebuild against the final version table
    "q_fact_scd2_lifecycle" -> (factScd2Lifecycle _),
    // the same loop as ONE stream: fact micro-batches with the dim merge
    // landing between them; same oracle
    "q_fact_scd2_lifecycle_stream" ->
      (graft.streaming.Streams.factScd2LifecycleStreamed _))

  /** Shared oracle CTEs mirroring snapshot + deterministic updates. */
  private val ctes =
    """dim AS (
  SELECT CAST(c_custkey AS BIGINT) AS id_cliente, trim(c_name) AS nome,
         coalesce(c_mktsegment, 'N/A') AS segmento
  FROM customer),
up AS (
  SELECT id_cliente, nome, 'ATUALIZADO' AS segmento FROM dim WHERE id_cliente % 7 = 0
  UNION ALL
  SELECT -(id_cliente + 1), 'Novo ' || nome, 'NOVO' FROM dim WHERE id_cliente % 13 = 0
  UNION ALL
  SELECT id_cliente, CAST(NULL AS VARCHAR), segmento FROM dim
  WHERE id_cliente % 17 = 0 AND id_cliente % 7 <> 0)"""

  /** One-shot SCD2 oracle — shared by the batch gate and the streamed
    * foreachBatch upsert, which must converge to the identical table.
    */
  private lazy val scd2ApplyOracle: String =
    s"""WITH $ctes,
dimv AS (SELECT *, DATE '1995-01-01' AS valid_from FROM dim),
changed AS (
  SELECT d.id_cliente, d.nome AS nome_d, d.segmento AS seg_d, d.valid_from,
         u.nome AS nome_u, u.segmento AS seg_u
  FROM dimv d JOIN up u USING (id_cliente)
  WHERE u.segmento IS DISTINCT FROM d.segmento OR u.nome IS DISTINCT FROM d.nome)
SELECT id_cliente, nome, segmento, valid_from, valid_to, vigente FROM (
  SELECT id_cliente, nome_d AS nome, seg_d AS segmento, valid_from,
         DATE '1999-01-01' AS valid_to, false AS vigente FROM changed
  UNION ALL
  SELECT id_cliente, nome_u, seg_u, DATE '1999-01-01', DATE '9999-12-31', true FROM changed
  UNION ALL
  SELECT d.id_cliente, d.nome, d.segmento, d.valid_from, DATE '9999-12-31', true
  FROM dimv d LEFT JOIN up u USING (id_cliente)
  WHERE u.id_cliente IS NULL OR (u.segmento IS NOT DISTINCT FROM d.segmento AND u.nome IS NOT DISTINCT FROM d.nome)
  UNION ALL
  SELECT u.id_cliente, u.nome, u.segmento, DATE '1999-01-01', DATE '9999-12-31', true
  FROM up u WHERE NOT EXISTS (SELECT 1 FROM dimv d WHERE d.id_cliente = u.id_cliente))
ORDER BY id_cliente, valid_from, vigente"""

  /** One-shot rebuild both lifecycle forms (batch and streamed) must
    * land on exactly: PIT join of ALL orders (with the fact measure)
    * against the final post-merge version table.
    */
  private lazy val factScd2LifecycleOracle: String =
    s"""WITH $ctes,
dimv AS (SELECT *, DATE '1995-01-01' AS valid_from FROM dim),
changed AS (
  SELECT d.id_cliente, d.nome AS nome_d, d.segmento AS seg_d, d.valid_from,
         u.nome AS nome_u, u.segmento AS seg_u
  FROM dimv d JOIN up u USING (id_cliente)
  WHERE u.segmento IS DISTINCT FROM d.segmento OR u.nome IS DISTINCT FROM d.nome),
versions AS (
  SELECT id_cliente, nome_d AS nome, seg_d AS segmento, valid_from,
         DATE '1996-06-01' AS valid_to FROM changed
  UNION ALL
  SELECT id_cliente, nome_u, seg_u, DATE '1996-06-01', DATE '9999-12-31' FROM changed
  UNION ALL
  SELECT d.id_cliente, d.nome, d.segmento, d.valid_from, DATE '9999-12-31'
  FROM dimv d LEFT JOIN up u USING (id_cliente)
  WHERE u.id_cliente IS NULL OR (u.segmento IS NOT DISTINCT FROM d.segmento AND u.nome IS NOT DISTINCT FROM d.nome)
  UNION ALL
  SELECT u.id_cliente, u.nome, u.segmento, DATE '1996-06-01', DATE '9999-12-31'
  FROM up u WHERE NOT EXISTS (SELECT 1 FROM dimv d WHERE d.id_cliente = u.id_cliente))
SELECT CAST(o.o_orderkey AS BIGINT) AS id_pedido,
       CAST(o.o_custkey AS BIGINT) AS id_cliente,
       o.o_orderdate AS data_pedido,
       CAST(o.o_totalprice AS DOUBLE) AS valor_pedido,
       coalesce(v.segmento, 'SEM_VERSAO') AS segmento,
       v.valid_from AS versao_desde
FROM orders o LEFT JOIN versions v
  ON o.o_custkey = v.id_cliente
 AND o.o_orderdate >= v.valid_from AND o.o_orderdate < v.valid_to
ORDER BY id_pedido"""

  val oracle: Map[String, String] = Map(
    "q_scd1_merge" ->
      s"""WITH $ctes
SELECT * FROM up
UNION ALL
SELECT d.* FROM dim d WHERE NOT EXISTS (SELECT 1 FROM up u WHERE u.id_cliente = d.id_cliente)
ORDER BY id_cliente""",
    // the streamed upsert converges to the same one-shot version table
    "q_scd2_stream" -> scd2ApplyOracle,
    "q_scd2_apply" -> scd2ApplyOracle,
    // one-shot rebuild the incremental lifecycle must land on exactly:
    // PIT join of ALL orders (with the fact measure) against the final
    // post-merge version table
    "q_fact_scd2_lifecycle" -> factScd2LifecycleOracle,
    // the streamed loop (dim merge between fact micro-batches) converges
    // to the same one-shot rebuild
    "q_fact_scd2_lifecycle_stream" -> factScd2LifecycleOracle,
    "q_scd2_pit_join" ->
      s"""WITH $ctes,
dimv AS (SELECT *, DATE '1995-01-01' AS valid_from FROM dim),
changed AS (
  SELECT d.id_cliente, d.nome AS nome_d, d.segmento AS seg_d, d.valid_from,
         u.nome AS nome_u, u.segmento AS seg_u
  FROM dimv d JOIN up u USING (id_cliente)
  WHERE u.segmento IS DISTINCT FROM d.segmento OR u.nome IS DISTINCT FROM d.nome),
versions AS (
  SELECT id_cliente, nome_d AS nome, seg_d AS segmento, valid_from,
         DATE '1996-06-01' AS valid_to FROM changed
  UNION ALL
  SELECT id_cliente, nome_u, seg_u, DATE '1996-06-01', DATE '9999-12-31' FROM changed
  UNION ALL
  SELECT d.id_cliente, d.nome, d.segmento, d.valid_from, DATE '9999-12-31'
  FROM dimv d LEFT JOIN up u USING (id_cliente)
  WHERE u.id_cliente IS NULL OR (u.segmento IS NOT DISTINCT FROM d.segmento AND u.nome IS NOT DISTINCT FROM d.nome)
  UNION ALL
  SELECT u.id_cliente, u.nome, u.segmento, DATE '1996-06-01', DATE '9999-12-31'
  FROM up u WHERE NOT EXISTS (SELECT 1 FROM dimv d WHERE d.id_cliente = u.id_cliente))
SELECT CAST(o.o_orderkey AS BIGINT) AS id_pedido,
       CAST(o.o_custkey AS BIGINT) AS id_cliente,
       o.o_orderdate AS data_pedido,
       coalesce(v.segmento, 'SEM_VERSAO') AS segmento,
       v.valid_from AS versao_desde
FROM orders o LEFT JOIN versions v
  ON o.o_custkey = v.id_cliente
 AND o.o_orderdate >= v.valid_from AND o.o_orderdate < v.valid_to
ORDER BY id_pedido""")
}
