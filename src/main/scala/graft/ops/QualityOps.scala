package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Data-release quality gates and the remaining curation-adjacent
  * relational devices: a declarative constraint suite (the check a
  * pipeline runs before promoting a snapshot — cf. the reference's
  * implicit trust in its CSV inputs, SURVEY §2.1, made explicit),
  * per-entity time-grid resampling with forward fill, degree-oriented
  * triangle counting on the page-transition graph, blocked fuzzy
  * entity matching, and deterministic hash-priority weighted sampling.
  *
  * Scale shapes:
  *   - constraint suite: every table-local rule family is ONE scan
  *     (a multi-aggregate fold unpivoted by `stack`); referential
  *     rules are anti-joins on the key (broadcast when the dim is
  *     bounded, shuffle otherwise) — never a row-wise rule loop.
  *   - gap-fill: the grid is `explode(sequence(...))` per entity (no
  *     driver-side calendar), observations reduce to one row per
  *     (entity, grid cell) BEFORE the join, and the fill is a single
  *     per-entity window pass.
  *   - triangles: edges oriented low-degree → high-degree so every
  *     wedge is enumerated at its minimum-degree vertex — the classic
  *     bound (sum of squared out-degrees ≤ m^1.5) that keeps hub
  *     vertices from exploding the wedge join at web scale.
  *   - fuzzy match: levenshtein only WITHIN (block, length-band)
  *     equi-join groups — all-pairs never materializes.
  *   - weighted sample: priority = hash/weight per row, then a
  *     TakeOrderedAndProject top-k — O(k) memory per partition, no
  *     global sort, reproducible across engines and runs.
  */
object QualityOps {

  // ---------------------------------------------------------------- dq

  /** Declarative constraint suite over the sales tables: primary-key
    * uniqueness, domain membership, range, and referential integrity,
    * each reported as (rule, checked, violations, passed). Local rules
    * per table fold in one scan; FK rules are key anti-joins.
    */
  def dqChecks(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    val li = lineitem(s, d)
    val c = customer(s, d)

    // ONE scan per child table: the FK check is a LEFT join against the
    // parent's DISTINCT key set (distinct, not trust: a parent with a
    // duplicated key — the very defect the suite detects — would
    // otherwise fan the child out and corrupt every row-local count;
    // EXISTS semantics are what an FK check means anyway). With the
    // join provably 1:≤1, count(*) stays the child cardinality and
    // every row-local rule folds unchanged into the post-join
    // aggregate — local rules and the FK null-count come out of the
    // same pass, then unpivot by stack. customer is a bounded dim →
    // broadcast; orders grows with the fact → shuffle join (AQE-owned),
    // bloom-prefiltered at 100 TB.
    val oRules = o.join(broadcast(c.select(col("c_custkey")).distinct()),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_pk"),
        coalesce(sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L)
          .otherwise(0L)), lit(0L)).as("v_status"),
        coalesce(sum(when(col("o_totalprice").isNull ||
          col("o_totalprice") <= 0, 1L).otherwise(0L)), lit(0L)).as("v_price"),
        coalesce(sum(when(col("c_custkey").isNull, 1L).otherwise(0L)),
          lit(0L)).as("v_fk"))
      .selectExpr("""stack(4,
        'orders.pk_unique',           n, v_pk,
        'orders.status_domain',       n, v_status,
        'orders.totalprice_positive', n, v_price,
        'orders.fk_customer',         n, v_fk)
        AS (rule, checked, violations)""")

    val liRules = li.join(o.select(col("o_orderkey")).distinct(),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(
        count(lit(1)).as("n"),
        coalesce(sum(when(col("l_quantity").isNull ||
          col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
          .otherwise(0L)), lit(0L)).as("v_qty"),
        coalesce(sum(when(col("l_discount") > 0.08, 1L)
          .otherwise(0L)), lit(0L)).as("v_disc"),
        coalesce(sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)),
          lit(0L)).as("v_fk"))
      .selectExpr("""stack(3,
        'lineitem.quantity_range',   n, v_qty,
        'lineitem.discount_le_8pct', n, v_disc,
        'lineitem.fk_orders',        n, v_fk)
        AS (rule, checked, violations)""")

    oRules.unionByName(liRules)
      .select(col("rule"),
        col("checked").cast("long").as("checked"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0).as("passed"))
      .orderBy("rule")
  }

  /** The events-side constraint suite (domain / range / payload-shape
    * rules only — all row-local, so the streamed twin's per-batch
    * counts ADD exactly). Two rules genuinely fire on the generated
    * data ('error' events exist; value has a tail past 450) — the gate
    * pins nonzero violation counts, not just a wall of zeros.
    */
  def dqEvents(s: SparkSession, d: String): DataFrame =
    dqEventsPartial(events(s, d))
      .select(col("rule"), col("checked"), col("violations"),
        (col("violations") === 0).as("passed"))
      .orderBy("rule")

  /** One-scan partial rule counts for a slice of events (additive). */
  private[graft] def dqEventsPartial(ev: DataFrame): DataFrame =
    ev.agg(
      count(lit(1)).as("n"),
      coalesce(sum(when(
        !col("event_type").isin("view", "click", "purchase", "signup"), 1L)
        .otherwise(0L)), lit(0L)).as("v_type"),
      coalesce(sum(when(col("value").isNull ||
        col("value") < 0 || col("value") > 450, 1L)
        .otherwise(0L)), lit(0L)).as("v_value"),
      // try_cast, not cast: this rule COUNTS malformed payloads, so a
      // non-numeric props value must register as a violation (null) —
      // under ANSI mode a strict cast would instead abort the whole scan
      // on exactly the dirty row the rule exists to detect
      coalesce(sum(when(
        expr("try_cast(get_json_object(props, '$.k') AS int)").isNull ||
          expr("try_cast(get_json_object(props, '$.k') AS int)") < 0 ||
          expr("try_cast(get_json_object(props, '$.k') AS int)") > 99, 1L)
        .otherwise(0L)), lit(0L)).as("v_props"))
      .selectExpr("""stack(3,
        'events.type_no_error', n, v_type,
        'events.value_range',   n, v_value,
        'events.props_key_domain', n, v_props)
        AS (rule, checked, violations)""")
      .select(col("rule"), col("checked").cast("long").as("checked"),
        col("violations").cast("long").as("violations"))

  /** Streamed-twin batch step: fold a micro-batch's partial counts into
    * the committed rule table by per-rule SUM (exactly-once via the
    * shared StoreCommit.applyOnce skeleton).
    */
  private[graft] def dqApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "dq_b", batchId) { prior =>
      val partial = dqEventsPartial(batch)
      prior.fold(partial)(p => partial.unionByName(p).groupBy("rule")
        .agg(sum("checked").as("checked"), sum("violations").as("violations")))
    }

  /** Read path of the maintained rule table. */
  private[graft] def dqReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"dq state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir")
      .select(col("rule"), col("checked").cast("long").as("checked"),
        col("violations").cast("long").as("violations"),
        (col("violations") === 0).as("passed"))
      .orderBy("rule")
  }

  // ----------------------------------------------------------- gapfill

  /** Per-user hourly resample of the event stream with forward fill:
    * every hour between a user's first and last event gets a row; the
    * carried value is the user's latest observation at or before that
    * hour (latest = max (ts, event_id) — pinned, not arbitrary).
    * The standard feature-engineering densification for training on
    * regularly-sampled sequences.
    */
  def timeGapfill(s: SparkSession, d: String): DataFrame =
    gapfillOf(events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("value")))
      .orderBy("user_id", "hora")

  /** The fill over an arbitrary event slice — every step is per-user
    * local, so USER-complete slices produce exactly their users' rows
    * of the whole-table answer (the streamed twin's additivity unit).
    */
  private[graft] def gapfillOf(evIn: DataFrame): DataFrame = {
    val ev = evIn.withColumn("hora", date_trunc("hour", col("ts")))
    // one row per (user, hour): the in-hour latest observation
    val wObs = Window.partitionBy("user_id", "hora")
      .orderBy(col("ts").desc, col("event_id").desc)
    val obs = ev.withColumn("rn", row_number().over(wObs))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("hora"), col("value").as("valor_obs"))
    // per-user dense hour grid, generated in-plan (no driver calendar)
    val grid = ev.groupBy("user_id")
      .agg(min("hora").as("h0"), max("hora").as("h1"))
      .select(col("user_id"), explode(
        sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hora"))
    val wFill = Window.partitionBy("user_id").orderBy("hora")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("user_id", "hora"), "left")
      .select(col("user_id"), col("hora"),
        last(col("valor_obs"), ignoreNulls = true).over(wFill).as("valor"),
        col("valor_obs").isNotNull.as("observado"))
  }

  /** Streamed-twin batch step: a USER-complete micro-batch's fill rows
    * ARE their users' final rows — append them to the committed store
    * (exactly-once), no merge needed.
    */
  private[graft] def gapfillApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "gf_b", batchId) { prior =>
      val partial = gapfillOf(batch)
      prior.fold(partial)(partial.unionByName(_))
    }

  private[graft] def gapfillReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"gapfill state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir").orderBy("user_id", "hora")
  }

  // --------------------------------------------------------- triangles

  /** Degree-oriented triangle count on the undirected page-transition
    * graph, plus the wedge count and global clustering coefficient.
    * Each edge is oriented from its lower-(degree, id) endpoint, so
    * wedges are enumerated only at a triangle's minimum-degree vertex
    * — the bound that survives power-law hubs at crawl scale.
    */
  def triangleCount(s: SparkSession, d: String): DataFrame =
    triangleCensus(transitionEdgesOf(events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("props"))))

  /** Canonical undirected transition edges of an event slice — a
    * transition spans one user's consecutive events, so USER-complete
    * slices contribute their exact edge sets (the streamed twin's
    * accumulation unit; the global set is the distinct union).
    */
  private[graft] def transitionEdgesOf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev.selectExpr("user_id", "ts", "event_id",
      // try_cast: a malformed props payload is a NON-edge (dropped by the
      // null filters below), not a reason to abort the census batch
      "TRY_CAST(get_json_object(props, '$.k') AS INT) AS page")
      .withColumn("dst", lead("page", 1).over(w))
      .filter(col("dst").isNotNull && col("dst") =!= col("page"))
      .select(least(col("page"), col("dst")).as("a"),
        greatest(col("page"), col("dst")).as("b"))
      .distinct()
  }

  /** Streamed-twin batch step: distinct-union the batch's edges into
    * the committed edge store (exactly-once); the census runs at read.
    * State is O(|edge universe|), not O(events) — the whole point of
    * maintaining the graph instead of the event log.
    */
  private[graft] def triangleApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "tri_b", batchId) { prior =>
      val partial = transitionEdgesOf(batch)
      prior.fold(partial)(p => partial.unionByName(p).distinct())
    }

  private[graft] def triangleReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"triangle state not initialized: $stateDir"))
    triangleCensus(s.read.parquet(s"$stateDir/$dir"))
  }

  /** The census over an arbitrary canonical (a < b, distinct) edge set
    * — split out so the oriented algorithm is property-testable on
    * generated graphs, not just the one events-derived instance.
    */
  private[graft] def triangleCensus(e0: DataFrame): DataFrame = {
    // the canonical edge set feeds FIVE subtrees (both degree
    // projections, the orientation join-back, the closing join, the edge
    // count) — materialized once so the window+distinct derivation
    // behind it runs once
    val e = graft.Checkpoint.barrier(e0)
    val deg = e.select(col("a").as("n"))
      .unionByName(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    // orient low (deg, id) -> high (deg, id); materialized — the wedge
    // self-join otherwise re-runs the two degree joins per side
    val ed = graft.Checkpoint.barrier(e
      .join(deg.select(col("n").as("a"), col("dg").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("dg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v")))
    // wedges at the orientation source; close against the canonical set
    val wedgePairs = ed.as("e1").join(ed.as("e2"),
        col("e1.u") === col("e2.u") && col("e1.v") < col("e2.v"))
      .select(col("e1.v").as("x"), col("e2.v").as("y"))
    val tri = wedgePairs.join(e,
        col("x") === col("a") && col("y") === col("b"))
      .agg(count(lit(1)).as("triangles"))
    val edgeN = e.agg(count(lit(1)).as("edges"))
    val wedgeN = deg.agg(coalesce(sum(col("dg") * (col("dg") - 1) / 2),
      lit(0L)).cast("long").as("wedges"))
    edgeN.crossJoin(wedgeN).crossJoin(tri)
      .select(col("edges").cast("long").as("edges"), col("wedges"),
        col("triangles").cast("long").as("triangles"),
        (lit(3.0) * col("triangles").cast("double") /
          col("wedges").cast("double")).as("cc_global"))
  }

  // ------------------------------------------------------- fuzzy match

  /** Blocked fuzzy entity matching: candidate duplicate customer pairs
    * within a (nation, name-length) block at Levenshtein distance ≤ 2.
    * The entity-resolution primitive — blocking keys make the
    * quadratic comparison local to each block.
    *
    * GATE-ONLY since r14 (the oracle-comparison form): the deployment
    * default is [[fuzzyMatchDeleteNbr]], which produces the identical
    * pair set with an entropy-independent candidate cost and won at
    * every measured scale (3.2 vs 7.2 s at sf0.1; 8.0× vs 52.9× growth
    * at 10× — SCALE_VERIFY_r13.md). Compose new consumers against the
    * delete-neighborhood form; keep this one for the three-algorithm
    * equivalence gate.
    */
  def fuzzyMatch(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      trim(col("c_name")).as("nome"),
      col("c_nationkey").cast("int").as("bloco"))
      .withColumn("blen", length(col("nome")))
    // the length BAND |Δlen| ≤ 2 is a sound filter (levenshtein ≥ length
    // difference), not a narrowing — insertion/deletion near-dups stay
    // reachable; the banded (threshold) distance runs INSIDE the join
    // condition — O(t·len) early-exit DP per candidate, evaluated during
    // the hash probe so rejected pairs never materialize (measured
    // 15.6 s → 9.3 s at sf0.1 vs the unbounded form); the exact distance
    // is recomputed only for the ~3% survivors. Past ~10⁴-member blocks
    // the upgrade is [[fuzzyMatchEdJoin]]'s q-gram prefix filter (NOT
    // PassJoin segments, which degenerate to all-pairs under shared
    // name prefixes — every string's aligned "Customer#…" segment is
    // identical).
    c.as("x").join(c.as("y"),
        col("x.bloco") === col("y.bloco") &&
          abs(col("x.blen") - col("y.blen")) <= 2 &&
          col("x.id") < col("y.id") &&
          levenshtein(col("x.nome"), col("y.nome"), 2) >= 0)
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        levenshtein(col("x.nome"), col("y.nome")).cast("int").as("dist"))
      .orderBy("id_a", "id_b")
  }

  /** The sub-quadratic fuzzy match: Ed-Join-style q-gram PREFIX filter.
    * τ edits destroy at most q·τ positional q-grams, so two strings
    * within edit distance τ share a gram among each one's q·τ+1 grams
    * rarest under a fixed global order (Xiao, Wang, Lin — Ed-Join,
    * 2008; the edit-distance analog of the Jaccard SSJoin prefix
    * filter already shipped in TextOps). With q=2, τ=2 the signature
    * is 5 grams per name; candidates are signature-gram equi-join
    * collisions (content join is a sound superset of the positional
    * theorem), verified by the same banded DP. This replaces the
    * block-quadratic comparison with rarity-driven candidates — the
    * digit positions that actually distinguish names carry the rare
    * grams, so shared prefixes contribute nothing. Same oracle as
    * [[fuzzyMatch]] — identical answer, different algorithm.
    *
    * MEASURED crossover (honesty over marketing): on the synthetic
    * name domain — 9 digits over a shared literal prefix — the gram
    * alphabet is so small that even the rarest grams carry df ≈ 10³,
    * the signature join prunes almost nothing, and the block-quadratic
    * DP wins (9.7 s vs 18.8 s at sf0.1). The prefix filter is the
    * asymptotic path for realistic name entropy (its candidates track
    * rare-gram collisions, not block size²); both forms stay gated so
    * the choice is a measured swap, not a rewrite.
    */
  def fuzzyMatchEdJoin(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      trim(col("c_name")).as("nome"),
      col("c_nationkey").cast("int").as("bloco"))
      .withColumn("blen", length(col("nome")))
    // the prefix theorem needs >= q·τ+1 grams to guarantee a surviving
    // signature gram; strings with fewer (length <= q·τ+1 = 5) take the
    // SHORT path below — exactly how Ed-Join treats them. Names of
    // length < 2 have no bigrams at all (and sequence(1, 0) would
    // count DOWN in Spark, fabricating junk grams), so gram generation
    // is also gated on length >= 2.
    val long = c.filter(col("blen") > 5)
    val short = c.filter(col("blen") <= 5)
    val grams = long.filter(col("blen") >= 2)
      .selectExpr("id", "nome", "bloco", "blen",
        """explode(transform(sequence(1, length(nome) - 1),
           i -> struct(substring(nome, i, 2) AS g, i AS pos))) AS gp""")
      .select(col("id"), col("nome"), col("bloco"), col("blen"),
        col("gp.g").as("g"), col("gp.pos").as("pos"))
    // global rarity order (df asc, gram, position) — both sides of a
    // near-dup pair rank their grams under the SAME order, which is
    // what the prefix theorem needs
    val freq = grams.groupBy("g").agg(count(lit(1)).as("df"))
    // materialized: the signature projection (gram explode + df join +
    // rarity window) otherwise re-runs once per self-join side
    val sig = graft.Checkpoint.barrier(grams.join(freq, Seq("g"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("id").orderBy("df", "g", "pos")))
      .filter(col("rn") <= 5)) // q·τ + 1
    val gramCand = sig.as("x").join(sig.as("y"),
        col("x.g") === col("y.g") &&
          col("x.bloco") === col("y.bloco") &&
          abs(col("x.blen") - col("y.blen")) <= 2 &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        col("x.nome").as("na"), col("y.nome").as("nb"))
    // short names are few and carry no signature guarantee: pair each
    // against its whole block (both orders, so short×long pairs keep
    // id_a < id_b canonical) — the bounded completion Ed-Join specifies
    val shortCand = short.as("x").join(c.as("y"),
        col("x.bloco") === col("y.bloco") &&
          abs(col("x.blen") - col("y.blen")) <= 2 &&
          col("x.id") =!= col("y.id"))
      .select(least(col("x.id"), col("y.id")).as("id_a"),
        greatest(col("x.id"), col("y.id")).as("id_b"),
        when(col("x.id") < col("y.id"), col("x.nome"))
          .otherwise(col("y.nome")).as("na"),
        when(col("x.id") < col("y.id"), col("y.nome"))
          .otherwise(col("x.nome")).as("nb"))
    gramCand.unionByName(shortCand).distinct()
      .withColumn("dist", levenshtein(col("na"), col("nb"), 2).cast("int"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy("id_a", "id_b")
  }

  /** The scale form that WINS on the low-entropy name domain: a
    * deletion-neighborhood join (the SymSpell device, itself the FastSS
    * candidate scheme — Bocek et al. 2007 — distributed). Soundness: if
    * ed(a,b) ≤ τ, fix one optimal alignment and delete from `a` the
    * characters it substitutes-or-deletes and from `b` the characters
    * it substitutes-or-inserts — at most τ deletions per side yield the
    * SAME string, so every true pair collides on a shared member of
    * D≤τ(a) ∩ D≤τ(b). Candidates are therefore equi-join collisions on
    * (bloco, deletion-variant); the banded DP verifies survivors exactly
    * as [[fuzzyMatch]] does — identical answer, different candidate
    * generator.
    *
    * Why THIS filter survives the domain that defeats Ed-Join
    * ([[fuzzyMatchEdJoin]]'s measured loss): a deletion variant keeps
    * every character except the deleted ≤2, so the variant key retains
    * the FULL discriminating digit suffix (7+ digits ≈ 10⁷ key entropy)
    * no matter how flat the gram distribution is — rarity of individual
    * grams is irrelevant. Cost model: O(n·L²/2) variant rows
    * (L = name length; L = 18 → 172 variants/row — a constant-factor
    * key amplification on the NAME column only, not the full row),
    * shuffled by (bloco, variant); per-key bucket size stays O(1) except
    * on genuine near-dup clusters, so candidates track TRUE PAIRS, not
    * block². At 100× data the join is still a linear-cost hash join —
    * versus the blocked DP whose (nation × length) blocks grow 100× and
    * probes 10⁴×. Applicability boundary (why the suite keeps all three
    * forms): D≤2 is O(L²) per string, the right trade for short entity
    * keys (names, SKUs, ids; L ≲ 48 and τ ≤ 2) — for long strings or
    * larger τ the q-gram prefix filter's O(q·τ+1) signature wins back.
    */
  def fuzzyMatchDeleteNbr(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).select(
      col("c_custkey").cast("long").as("id"),
      trim(col("c_name")).as("nome"),
      col("c_nationkey").cast("int").as("bloco"))
    // variant keys from the native kernel: D≤2 as 64-bit HASHES — one
    // tight pass per row instead of a transform/flatten HOF stack, and
    // the self-join shuffles (bloco, int64) keys with NO name payload
    // (names re-join onto the ~|true pairs| candidate set afterwards,
    // which at 100 TB beats dragging an L-char string through an
    // L²/2-amplified shuffle). Hash collisions only add candidates; the
    // DP verify removes them.
    // NOT barriered (measured r21): the self-join's sides do each re-run
    // the variant kernel, but the kernel is a tight native pass that
    // streams straight into the join exchange — materializing the
    // L²/2-amplified rows cost ~1.2× MORE task time than recomputing
    val vars = c.select(col("id"), col("bloco"),
      explode(graft.functions.GraftFunctions
        .deletion_neighborhood(col("nome"), 2)).as("v"))
    // |Δlen| ≤ 2 needs no explicit band: variant equality (modulo hash
    // collision) forces len(a) − da = len(b) − db with da, db ∈ [0, 2]
    val cand = vars.as("x").join(vars.as("y"),
        col("x.bloco") === col("y.bloco") && col("x.v") === col("y.v") &&
          col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .distinct()
    // banded DP verify: variant collision admits pairs up to ed 4
    // (τ deletions each side), the threshold-2 DP keeps the true ones
    // and its in-band return value IS the exact distance
    cand
      .join(c.select(col("id").as("id_a"), col("nome").as("na")), Seq("id_a"))
      .join(c.select(col("id").as("id_b"), col("nome").as("nb")), Seq("id_b"))
      .withColumn("dist", levenshtein(col("na"), col("nb"), 2))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist").cast("int").as("dist"))
      .orderBy("id_a", "id_b")
  }

  // --------------------------------------------------- weighted sample

  /** Deterministic weighted sampling: per-doc priority = hash / weight
    * (weight = n_chars), keep the k smallest. Longer documents are
    * proportionally likelier to survive; the md5-derived hash makes the
    * draw reproducible across engines, runs, and partitionings — the
    * property ad-hoc rand() sampling can't give a released corpus.
    * Executes as TakeOrderedAndProject: O(k) per partition, no global
    * sort.
    */
  def weightedSample(s: SparkSession, d: String): DataFrame =
    wsTopK(wsPriorities(documents(s, d)))

  private val WS_K = 100

  /** Row-local hash priority for a doc slice — the 60-bit hash comes
    * from the shared TextExprs pair so the Spark and DuckDB spellings
    * cannot drift independently.
    */
  private[graft] def wsPriorities(docs: DataFrame): DataFrame = {
    val h = graft.text.TextExprs.hash60("CAST(doc_id AS STRING)")
    // greatest(n_chars, 1): an empty doc must not divide by zero — the
    // null/±inf priority would sort differently in the two engines
    // (Spark nulls-first vs DuckDB nulls-last), silently corrupting the
    // reproducible-sample contract. The guard is identical in the oracle.
    docs.selectExpr("doc_id", "n_chars",
      s"CAST(${h.spark} AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS prioridade")
  }

  private[graft] def wsTopK(pri: DataFrame): DataFrame =
    pri.orderBy("prioridade", "doc_id").limit(WS_K)

  /** Streamed-twin batch step: the top-k is mergeable (priority is
    * row-local), so fold the batch's candidate top-k into the committed
    * k-row store and re-truncate — never more than 2k rows in flight.
    */
  private[graft] def wsApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit =
    graft.etl.StoreCommit.applyOnce(s, stateDir, "ws_b", batchId) { prior =>
      val partial = wsTopK(wsPriorities(batch))
      prior.fold(partial)(p => wsTopK(partial.unionByName(p)))
    }

  private[graft] def wsReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"ws state not initialized: $stateDir"))
    s.read.parquet(s"$stateDir/$dir").orderBy("prioridade", "doc_id")
  }

  // -------------------------------------------------------- table diff

  /** Snapshot diff — the data-regression primitive: given two versions
    * of a table, emit every added / removed / changed row. Here the two
    * versions are derived deterministically from orders (old: keys
    * ∤10; new: keys ∤1000+1, with a price restatement on keys ÷7), so
    * all three classes are nonempty and the gate pins each. One
    * full-outer shuffle join on the key; change detection is null-safe
    * column compare (at 100 TB you'd first reduce the non-key columns
    * to one digest per side inside Spark — same plan shape, narrower
    * exchange).
    */
  /** The two deterministically-derived snapshot versions of orders the
    * diff/roundtrip gates run on (old: keys ∤10; new: keys ∤1000+1 with
    * a price restatement on keys ÷7) — all three change classes
    * nonempty by construction.
    */
  private[graft] def snapshots(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      col("o_orderstatus").as("status"), col("o_totalprice").as("price"))
    val old = o.filter(col("k") % 10 =!= 0)
    val neu = o.filter(col("k") % 1000 =!= 1)
      .withColumn("price", when(col("k") % 7 === 0,
        col("price") * lit(1.1).cast("double")).otherwise(col("price")))
    (old, neu)
  }

  def tableDiff(s: SparkSession, d: String): DataFrame = {
    val (old0, neu0) = snapshots(s, d)
    val old = old0.select(col("k").as("ka"), col("status").as("status_old"),
      col("price").as("price_old"))
    val neu = neu0.select(col("k").as("kb"), col("status").as("status_new"),
      col("price").as("price_new"))
    old.join(neu, col("ka") === col("kb"), "full_outer")
      .withColumn("change",
        when(col("ka").isNull, "added")
          .when(col("kb").isNull, "removed")
          .when(!(col("status_old") <=> col("status_new")) ||
            !(col("price_old") <=> col("price_new")), "changed")
          .otherwise("unchanged"))
      .filter(col("change") =!= "unchanged")
      .select(coalesce(col("ka"), col("kb")).as("o_orderkey"),
        col("change"), col("status_old"), col("status_new"),
        col("price_old"), col("price_new"))
      .orderBy("o_orderkey")
  }

  /** The diff→apply ROUNDTRIP: [[tableDiff]]'s output, read as a
    * changelog (added→I, changed→U carrying the new row, removed→D
    * tombstone), applied onto the old snapshot must reconstruct the new
    * snapshot EXACTLY — the algebraic contract that makes a diff usable
    * as an incremental transport (ship the changelog, not the table).
    * The oracle computes the new snapshot directly, so the gate pins
    * apply(old, diff(old, new)) == new cross-engine. Apply is one
    * anti-join (untouched keys) + a union of the changelog's I/U rows —
    * O(|old| + |Δ|), never a rebuild.
    */
  def diffApplyRoundtrip(s: SparkSession, d: String): DataFrame = {
    val (old, _) = snapshots(s, d)
    val log = tableDiff(s, d).select(col("o_orderkey").as("k"),
      when(col("change") === "added", "I")
        .when(col("change") === "removed", "D").otherwise("U").as("op"),
      col("status_new").as("status"), col("price_new").as("price"))
    old.join(log.select("k"), Seq("k"), "left_anti")
      .unionByName(log.filter(col("op") =!= "D").drop("op"))
      .select(col("k").as("o_orderkey"), col("status"), col("price"))
      .orderBy("o_orderkey")
  }

  // -------------------------------------------------------- phrase PMI

  private val PMI_MIN_COUNT = 5
  private val PMI_TOPK = 50

  /** Collocation mining (word2phrase-style): top-k adjacent bigrams by
    * pointwise mutual information, PMI spelled as the exact rational
    * n_ab·N / (n_a·n_b) — integer products then ONE correctly-rounded
    * double division, so scores gate bit-exactly (log-PMI is monotone
    * in this ratio, so the ranking is identical). Bigrams derive
    * array-locally (zip the token array with its own tail — no
    * per-token window shuffle); the min-count filter runs BEFORE the
    * unigram joins, and candidate bigrams after it are vocabulary-
    * bounded, not corpus-bounded.
    */
  def phrasePmi(s: SparkSession, d: String): DataFrame = {
    val counts = pmiCounts(documents(s, d))
    pmiRank(counts._1, counts._2)
  }

  /** (unigram counts, bigram counts ≥ min support) for a doc slice —
    * both are doc-local, so counts ADD under doc-complete sharding.
    * The bigram min-count filter must NOT run here (a bigram can cross
    * the threshold only after merging slices) — it runs at rank time.
    */
  private[graft] def pmiCounts(docs: DataFrame): (DataFrame, DataFrame) = {
    import graft.text.TextExprs
    val t = TextExprs.tokens("lower(text)")
    val base = docs.selectExpr(s"${t.spark} AS toks")
    val uni = base.selectExpr("explode(toks) AS w")
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val bi = base.filter(size(col("toks")) >= 2)
      .selectExpr("""explode(zip_with(
          slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1),
          (a, b) -> struct(a AS w1, b AS w2))) AS p""")
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).as("n_ab"))
    (uni, bi)
  }

  /** Rank merged counts: min-support filter, unigram joins, rational
    * PMI, deterministic top-k.
    */
  private[graft] def pmiRank(uni: DataFrame, bi: DataFrame): DataFrame = {
    val nTotal = uni.agg(sum("n_w").as("nn"))
    bi.filter(col("n_ab") >= PMI_MIN_COUNT)
      .join(uni.select(col("w").as("w1"), col("n_w").as("n_a")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("n_w").as("n_b")), Seq("w2"))
      .crossJoin(broadcast(nTotal))
      .selectExpr("w1", "w2", "CAST(n_ab AS BIGINT) AS n_ab",
        "CAST(n_a AS BIGINT) AS n_a", "CAST(n_b AS BIGINT) AS n_b",
        "CAST(n_ab * nn AS DOUBLE) / CAST(n_a * n_b AS DOUBLE) AS score")
      .orderBy(desc("score"), asc("w1"), asc("w2")).limit(PMI_TOPK)
  }

  /** Streamed-twin batch step: fold a doc-complete micro-batch's
    * unigram + bigram counts into the committed pair of count tables
    * (both live under one commit pointer — one atomic state version).
    */
  private[graft] def pmiApplyBatch(s: SparkSession, stateDir: String,
      batch: DataFrame, batchId: Long): Unit = {
    import graft.etl.StoreCommit
    val prior = StoreCommit.committed(stateDir)
    if (prior.exists(_._2 >= batchId)) return
    val (uni, bi) = pmiCounts(batch)
    val (mUni, mBi) = prior match {
      case Some((dir, _)) =>
        (uni.unionByName(s.read.parquet(s"$stateDir/$dir/uni"))
          .groupBy("w").agg(sum("n_w").as("n_w")),
          bi.unionByName(s.read.parquet(s"$stateDir/$dir/bi"))
            .groupBy("w1", "w2").agg(sum("n_ab").as("n_ab")))
      case None => (uni, bi)
    }
    mUni.write.mode("overwrite").parquet(s"$stateDir/pmi_b$batchId/uni")
    mBi.write.mode("overwrite").parquet(s"$stateDir/pmi_b$batchId/bi")
    StoreCommit.commit(stateDir, s"pmi_b$batchId", batchId)
    StoreCommit.cleanupStale(stateDir, "pmi_b")
  }

  /** Read path: rank the maintained counts (same top-k as the scan). */
  private[graft] def pmiReadState(s: SparkSession, stateDir: String): DataFrame = {
    val (dir, _) = graft.etl.StoreCommit.committed(stateDir).getOrElse(
      throw new IllegalStateException(s"pmi state not initialized: $stateDir"))
    pmiRank(s.read.parquet(s"$stateDir/$dir/uni"),
      s.read.parquet(s"$stateDir/$dir/bi"))
  }

  // --------------------------------------------------------- BPE merges

  private val BPE_ROUNDS = 5
  private val BPE_SEP = "\u0001"

  /** On-engine BPE merge induction at word granularity: BPE_ROUNDS
    * iterations of (count adjacent symbol pairs over the corpus → take
    * the most frequent, ties by pair ascending → greedily merge its
    * non-overlapping occurrences left-to-right). The tokenizer-training
    * primitive — each round is ONE corpus-wide pair-count groupBy and
    * one windowed merge pass (no string rewriting; the merge is a
    * positional accept/drop computed with the same window device in
    * both engines, so the gate pins all five merge decisions).
    *
    * Greedy left-to-right spelled as windows: only a pair with
    * simbolo_a == simbolo_b can have OVERLAPPING matches (match at p
    * and p+1 forces t[p+1] to be both y and x), and those overlaps form
    * runs of consecutive matched positions — greedy accepts ranks
    * 1,3,5,… within each run; for a≠b every run has length 1 and all
    * matches merge. The argmax pair is a 1-row driver collect per round
    * (bounded, like the Lloyd rounds); each round ends at a barrier so
    * plan depth stays O(1) across iterations.
    */
  def bpeMerges(s: SparkSession, d: String): DataFrame =
    bpeRoundsOf(s, documents(s, d).selectExpr("doc_id AS did",
      """posexplode(split(trim(lower(text)), '\\s+')) AS (pos, t)"""))

  /** CHARACTER-level BPE within word boundaries — the real tokenizer
    * algorithm: symbols start as single characters, the sequence unit
    * is the word (merges never cross a word boundary, exactly as in
    * Sennrich-style BPE), and the same five merge rounds run on the
    * character pair counts. The symbolization mirrors the oracle's
    * substring-by-position spelling so both engines see identical
    * initial symbols.
    */
  def bpeMergesChar(s: SparkSession, d: String): DataFrame =
    bpeRoundsOf(s, documents(s, d)
      .selectExpr("doc_id",
        """posexplode(split(trim(lower(text)), '\\s+')) AS (wi, wd)""")
      // empty words (whitespace-only docs) must drop BEFORE the char
      // explode: Spark's sequence(1, 0) counts DOWN ([1, 0]) and would
      // fabricate two empty symbols the oracle's generate_series(1, 0)
      // (empty) never sees
      .filter(length(col("wd")) > 0)
      .selectExpr(
        "concat(CAST(doc_id AS STRING), ':', CAST(wi AS STRING)) AS did",
        "wd", "explode(sequence(1, length(wd))) AS i")
      .selectExpr("did", "CAST(i AS BIGINT) AS pos",
        "substring(wd, i, 1) AS t"))

  /** The shared round engine over an initial (did, pos, t) symbol
    * table: BPE_ROUNDS iterations of pair-count argmax + windowed
    * greedy merge.
    */
  private def bpeRoundsOf(s: SparkSession, tk0: DataFrame): DataFrame =
    bpeLoop(s, tk0)._1

  /** The ENCODE closing the train→apply loop: the symbol vocabulary
    * after the five learned word-level merges — top-20 symbols by
    * corpus count (merged symbols displayed with '+' between parts).
    * The same rounds run; only the read-out differs, so the gate pins
    * that applying the merges produces exactly the tokenization the
    * training rounds left behind.
    */
  def bpeVocab(s: SparkSession, d: String): DataFrame = {
    val (_, tk) = bpeLoop(s, documents(s, d).selectExpr("doc_id AS did",
      """posexplode(split(trim(lower(text)), '\\s+')) AS (pos, t)"""))
    tk.select(replace(col("t"), lit(BPE_SEP), lit("+")).as("simbolo"))
      .groupBy("simbolo").agg(count(lit(1)).cast("long").as("n"))
      .orderBy(desc("n"), asc("simbolo")).limit(20)
  }

  private def bpeLoop(s: SparkSession, tk0: DataFrame): (DataFrame, DataFrame) = {
    import graft.Checkpoint.BarrierOps
    val w = Window.partitionBy("did").orderBy("pos")
    var tk = tk0.barrier()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (r <- 1 to BPE_ROUNDS if !exhausted) {
      val topOpt = tk.withColumn("b", lead("t", 1).over(w))
        .filter(col("b").isNotNull)
        .groupBy(col("t").as("a"), col("b")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("a"), asc("b")).limit(1).collect().headOption
      if (topOpt.isEmpty) {
        // no adjacent pairs remain (every sequence merged to one
        // symbol): stop with the merges learned so far instead of
        // crashing — a corpus with < BPE_ROUNDS viable rounds is legal
        exhausted = true
      } else {
      val top = topOpt.get
      val (x, y, n) = (top.getString(0), top.getString(1), top.getLong(2))
      merges += ((r, x, y, n))
      val m = tk.withColumn("mt",
        col("t") === lit(x) && lead("t", 1).over(w) === lit(y))
      val accept = m.filter(col("mt"))
        .withColumn("grp", col("pos") - row_number().over(w))
        .withColumn("rk", row_number().over(
          Window.partitionBy("did", "grp").orderBy("pos")))
        .filter(col("rk") % 2 === 1)
        .select(col("did"), col("pos"))
        .barrier()
      // the new round's token table is checkpointed FROM the old round's
      // blocks and the accept list; both are dead once it materializes
      tk = graft.Checkpoint.barrierReplacing(m
        .join(accept.withColumn("isacc", lit(true)), Seq("did", "pos"), "left")
        .join(accept.select(col("did"), (col("pos") + 1).as("pos"))
          .withColumn("isprev", lit(true)), Seq("did", "pos"), "left")
        .filter(col("isprev").isNull)
        .withColumn("t", when(col("isacc"),
          concat(col("t"), lit(BPE_SEP), lit(y))).otherwise(col("t")))
        .withColumn("pos", row_number().over(w))
        .select("did", "pos", "t"),
        tk)
      graft.Checkpoint.release(accept)
      }
    }
    val s2 = s
    import s2.implicits._
    val mergeDf = merges.toSeq.toDF("rodada", "simbolo_a", "simbolo_b", "n")
      .select(col("rodada").cast("int").as("rodada"),
        col("simbolo_a"), col("simbolo_b"), col("n").cast("long").as("n"))
      .orderBy("rodada")
    (mergeDf, tk)
  }

  /** Per-document token counts UNDER the trained tokenizer — the
    * token-budget read-out a data-mix planner prices corpora with:
    * the five learned merges applied to every document, then a
    * per-doc token count and distinct-symbol count. `q_text_tokens`
    * counts whitespace tokens; this counts what the trained BPE
    * actually emits, which is the number that matters when the budget
    * is model-context tokens. Same rounds, different read-out — the
    * gate pins that applying the merges yields exactly the
    * tokenization training left behind, at document granularity.
    */
  def bpeEncode(s: SparkSession, d: String): DataFrame = {
    val (_, tk) = bpeLoop(s, documents(s, d).selectExpr("doc_id AS did",
      """posexplode(split(trim(lower(text)), '\\s+')) AS (pos, t)"""))
    tk.groupBy("did")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        countDistinct(col("t")).cast("long").as("n_simbolos"))
      .selectExpr("CAST(did AS BIGINT) AS did", "n_tokens", "n_simbolos")
      .orderBy("did")
  }

  /** The oracle unrolls the same BPE_ROUNDS rounds as CTE blocks — the
    * identical window device, so every merge decision (argmax pair AND
    * the greedy accept set feeding the next round's counts) gates
    * bit-exactly. Every CTE is `AS MATERIALIZED`: each round references
    * the previous round's tables ~3×, so inlined CTEs recompute the
    * whole chain combinatorially (the un-hinted form ran minutes;
    * materialized, 0.24 s at sf0.01).
    */
  private def bpeOracle: String = bpeOracleFrom(bpeWordHead)

  private def bpeWordHead: String =
    """WITH tk1 AS MATERIALIZED (
  SELECT did, CAST(i AS BIGINT) AS pos, toks[i] AS t
  FROM (SELECT doc_id AS did,
               string_split_regex(trim(lower(text)), '\s+') AS toks
        FROM documents),
       unnest(generate_series(1, len(toks))) AS u(i))"""

  private def bpeOracleChar: String = bpeOracleFrom(
    """WITH w AS MATERIALIZED (
  SELECT doc_id, wi, words[wi] AS wd
  FROM (SELECT doc_id,
               string_split_regex(trim(lower(text)), '\s+') AS words
        FROM documents),
       unnest(generate_series(1, len(words))) AS u(wi)),
tk1 AS MATERIALIZED (
  SELECT CAST(doc_id AS VARCHAR) || ':' || CAST(wi AS VARCHAR) AS did,
         CAST(i AS BIGINT) AS pos, substring(wd, i, 1) AS t
  FROM w, unnest(generate_series(1, length(wd))) AS u2(i))""")

  private def bpeOracleFrom(head: String): String = {
    val tail = (1 to BPE_ROUNDS).map { r =>
      s"""SELECT CAST($r AS INTEGER) AS rodada, a AS simbolo_a,
       b AS simbolo_b, CAST(n AS BIGINT) AS n FROM best$r"""
    }.mkString("\nUNION ALL\n")
    s"${bpeCtePrefix(head)}\n$tail\nORDER BY rodada"
  }

  /** The shared CTE chain (tk1 head + BPE_ROUNDS unrolled rounds) WITHOUT
    * a final SELECT — the structural seam both read-outs compose on, so
    * neither has to locate the other's tail by string search (a reformat
    * of the merge tail can no longer break the vocab oracle).
    */
  private def bpeCtePrefix(head: String): String = {
    val rounds = (1 to BPE_ROUNDS).map { r =>
      s""", best$r AS MATERIALIZED (
  SELECT a, b, count(*) AS n FROM (
    SELECT did, t AS a, lead(t) OVER (PARTITION BY did ORDER BY pos) AS b
    FROM tk$r)
  WHERE b IS NOT NULL GROUP BY a, b ORDER BY n DESC, a, b LIMIT 1),
m$r AS MATERIALIZED (
  SELECT did, pos, t,
         coalesce(t = (SELECT a FROM best$r) AND
           lead(t) OVER (PARTITION BY did ORDER BY pos) =
             (SELECT b FROM best$r), false) AS mt
  FROM tk$r),
acc$r AS MATERIALIZED (
  SELECT did, pos FROM (
    SELECT did, pos,
           row_number() OVER (PARTITION BY did, grp ORDER BY pos) AS rk
    FROM (SELECT did, pos,
                 pos - row_number() OVER (PARTITION BY did ORDER BY pos) AS grp
          FROM m$r WHERE mt))
  WHERE rk % 2 = 1),
tk${r + 1} AS MATERIALIZED (
  SELECT m.did,
         row_number() OVER (PARTITION BY m.did ORDER BY m.pos) AS pos,
         CASE WHEN a.pos IS NOT NULL
              THEN m.t || chr(1) || (SELECT b FROM best$r)
              ELSE m.t END AS t
  FROM m$r m
  LEFT JOIN acc$r a ON a.did = m.did AND a.pos = m.pos
  LEFT JOIN acc$r p ON p.did = m.did AND p.pos = m.pos - 1
  WHERE p.pos IS NULL)"""
    }.mkString("")
    s"$head$rounds"
  }

  /** The encode read-out: same unrolled rounds (composed via
    * [[bpeCtePrefix]], not by slicing [[bpeOracle]]'s text), final
    * tokenization's top-20 symbol counts instead of the merge table.
    */
  private def bpeVocabOracle: String =
    s"""${bpeCtePrefix(bpeWordHead)}
SELECT simbolo, CAST(count(*) AS BIGINT) AS n FROM (
  SELECT replace(t, chr(1), '+') AS simbolo FROM tk${BPE_ROUNDS + 1})
GROUP BY simbolo ORDER BY n DESC, simbolo LIMIT 20"""

  /** The per-document encode read-out off the same unrolled chain. */
  private def bpeEncodeOracle: String =
    s"""${bpeCtePrefix(bpeWordHead)}
SELECT CAST(did AS BIGINT) AS did, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT t) AS BIGINT) AS n_simbolos
FROM tk${BPE_ROUNDS + 1} GROUP BY did ORDER BY did"""

  // ----------------------------------------------------------- oracles

  private val dqChecksOracle: String =
    """SELECT rule, checked, violations, violations = 0 AS passed FROM (
  SELECT 'orders.pk_unique' AS rule,
         (SELECT count(*) FROM orders) AS checked,
         (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) AS violations
  UNION ALL
  SELECT 'orders.status_domain',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders WHERE o_orderstatus NOT IN ('O','F','P'))
  UNION ALL
  SELECT 'orders.totalprice_positive',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders
          WHERE o_totalprice IS NULL OR o_totalprice <= 0)
  UNION ALL
  SELECT 'orders.fk_customer',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o WHERE NOT EXISTS
            (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
  UNION ALL
  SELECT 'lineitem.quantity_range',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem
          WHERE l_quantity IS NULL OR l_quantity < 1 OR l_quantity > 50)
  UNION ALL
  SELECT 'lineitem.discount_le_8pct',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem WHERE l_discount > 0.08)
  UNION ALL
  SELECT 'lineitem.fk_orders',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
            (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)))
ORDER BY rule"""

  private val dqEventsOracle: String =
    """SELECT rule, checked, violations, violations = 0 AS passed FROM (
  SELECT 'events.type_no_error' AS rule,
         (SELECT count(*) FROM events) AS checked,
         (SELECT count(*) FROM events
          WHERE event_type NOT IN ('view','click','purchase','signup')) AS violations
  UNION ALL
  SELECT 'events.value_range',
         (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE value IS NULL OR value < 0 OR value > 450)
  UNION ALL
  SELECT 'events.props_key_domain',
         (SELECT count(*) FROM events),
         (SELECT count(*) FROM events
          WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
             OR TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) < 0
             OR TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) > 99))
ORDER BY rule"""

  private val gapfillOracle: String =
    """WITH ev AS (
  SELECT user_id, ts, event_id, value, date_trunc('hour', ts) AS hora
  FROM events),
obs AS (
  SELECT user_id, hora, value AS valor_obs FROM (
    SELECT user_id, hora, value,
           row_number() OVER (PARTITION BY user_id, hora
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM ev) WHERE rn = 1),
grid AS (
  SELECT user_id,
         unnest(generate_series(min(hora), max(hora), INTERVAL 1 HOUR)) AS hora
  FROM ev GROUP BY user_id)
SELECT g.user_id, g.hora,
       last_value(o.valor_obs IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.hora
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS valor,
       o.valor_obs IS NOT NULL AS observado
FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.hora = o.hora
ORDER BY g.user_id, g.hora"""

  private val triangleOracle: String =
    """WITH ev AS (
  SELECT user_id, ts, event_id,
         TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS page
  FROM events),
tr AS (
  SELECT page AS src,
         lead(page) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM ev),
e AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM tr WHERE dst IS NOT NULL AND src <> dst),
deg AS (
  SELECT n, count(*) AS dg FROM (
    SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY n),
tri AS (
  SELECT count(*) AS t
  FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
            JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
SELECT CAST((SELECT count(*) FROM e) AS BIGINT) AS edges,
       CAST((SELECT sum(dg * (dg - 1) // 2) FROM deg) AS BIGINT) AS wedges,
       CAST((SELECT t FROM tri) AS BIGINT) AS triangles,
       3.0 * CAST((SELECT t FROM tri) AS DOUBLE)
         / CAST((SELECT sum(dg * (dg - 1) // 2) FROM deg) AS DOUBLE) AS cc_global"""

  private val fuzzyOracle: String =
    """WITH c AS (
  SELECT CAST(c_custkey AS BIGINT) AS id, trim(c_name) AS nome,
         CAST(c_nationkey AS INTEGER) AS bloco,
         length(trim(c_name)) AS blen
  FROM customer)
SELECT x.id AS id_a, y.id AS id_b,
       CAST(levenshtein(x.nome, y.nome) AS INTEGER) AS dist
FROM c x JOIN c y
  ON x.bloco = y.bloco AND abs(x.blen - y.blen) <= 2 AND x.id < y.id
 AND levenshtein(x.nome, y.nome) <= 2
ORDER BY id_a, id_b"""

  private val weightedSampleOracle: String = {
    val h = graft.text.TextExprs.hash60("CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, n_chars,
       CAST(${h.duck} AS DOUBLE) / CAST(greatest(n_chars, 1) AS DOUBLE) AS prioridade
FROM documents ORDER BY prioridade, doc_id LIMIT 100"""
  }

  private val tableDiffOracle: String =
    """WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status,
         o_totalprice AS price
  FROM orders),
old AS (
  SELECT k AS ka, status AS status_old, price AS price_old
  FROM o WHERE k % 10 <> 0),
neu AS (
  SELECT k AS kb, status AS status_new,
         CASE WHEN k % 7 = 0 THEN price * CAST(1.1 AS DOUBLE)
              ELSE price END AS price_new
  FROM o WHERE k % 1000 <> 1),
j AS (
  SELECT coalesce(ka, kb) AS o_orderkey,
         CASE WHEN ka IS NULL THEN 'added'
              WHEN kb IS NULL THEN 'removed'
              WHEN status_old IS DISTINCT FROM status_new
                OR price_old IS DISTINCT FROM price_new THEN 'changed'
              ELSE 'unchanged' END AS change,
         status_old, status_new, price_old, price_new
  FROM old FULL OUTER JOIN neu ON ka = kb)
SELECT * FROM j WHERE change <> 'unchanged' ORDER BY o_orderkey"""

  private val diffRoundtripOracle: String =
    """WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k, o_orderstatus AS status,
         o_totalprice AS price
  FROM orders)
SELECT k AS o_orderkey, status,
       CASE WHEN k % 7 = 0 THEN price * CAST(1.1 AS DOUBLE)
            ELSE price END AS price
FROM o WHERE k % 1000 <> 1 ORDER BY o_orderkey"""

  private val phrasePmiOracle: String =
    s"""WITH base AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS toks FROM documents),
uni AS (
  SELECT w, count(*) AS n_w FROM (SELECT unnest(toks) AS w FROM base)
  GROUP BY w),
nt AS (SELECT CAST(sum(n_w) AS BIGINT) AS nn FROM uni),
bi AS (
  SELECT p[1] AS w1, p[2] AS w2, count(*) AS n_ab FROM (
    SELECT unnest(list_transform(range(1, len(toks)),
                                 i -> [toks[i], toks[i + 1]])) AS p
    FROM base WHERE len(toks) >= 2)
  GROUP BY 1, 2 HAVING count(*) >= $PMI_MIN_COUNT)
SELECT w1, w2, CAST(n_ab AS BIGINT) AS n_ab,
       CAST(ua.n_w AS BIGINT) AS n_a, CAST(ub.n_w AS BIGINT) AS n_b,
       CAST(n_ab * nn AS DOUBLE) / CAST(ua.n_w * ub.n_w AS DOUBLE) AS score
FROM bi JOIN uni ua ON ua.w = bi.w1 JOIN uni ub ON ub.w = bi.w2, nt
ORDER BY score DESC, w1, w2 LIMIT $PMI_TOPK"""

  // ------------------------------------------------------ registration

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // declarative constraint suite over the star inputs (PK/domain/
    // range/FK), one scan per table-local family + key anti-joins
    "q_dq_checks" -> (dqChecks _),
    // the events-side (row-local) rule suite — two rules genuinely fire
    "q_dq_events" -> (dqEvents _),
    // the rule table maintained additively per micro-batch
    "q_dq_events_stream" ->
      (graft.streaming.Streams.dqEventsStreamed _),
    // per-user hourly resample + forward fill (sequence densification)
    "q_time_gapfill" -> (timeGapfill _),
    // the fill maintained under USER-complete arrivals (append store)
    "q_time_gapfill_stream" ->
      (graft.streaming.Streams.timeGapfillStreamed _),
    // degree-oriented triangle census of the page-transition graph
    "q_triangle_count" -> (triangleCount _),
    // the edge set maintained under arrivals; census at read
    "q_triangle_count_stream" ->
      (graft.streaming.Streams.triangleStreamed _),
    // blocked Levenshtein entity matching (nation × name-length blocks)
    "q_fuzzy_match" -> (fuzzyMatch _),
    // the sub-quadratic path: Ed-Join q-gram prefix filter, same answer
    "q_fuzzy_match_edjoin" -> (fuzzyMatchEdJoin _),
    // the deletion-neighborhood path: entropy-independent candidates,
    // same answer — the form that wins on low-entropy name domains
    "q_fuzzy_match_delnbr" -> (fuzzyMatchDeleteNbr _),
    // reproducible hash-priority weighted sample of the corpus
    "q_weighted_sample" -> (weightedSample _),
    // the sample maintained under arrivals (mergeable top-k store)
    "q_weighted_sample_stream" ->
      (graft.streaming.Streams.weightedSampleStreamed _),
    // snapshot diff: added/removed/changed rows between table versions
    "q_table_diff" -> (tableDiff _),
    // the diff applied as a changelog reconstructs the new snapshot
    "q_diff_apply_roundtrip" -> (diffApplyRoundtrip _),
    // top-k adjacent-bigram collocations by rational PMI
    "q_phrase_pmi" -> (phrasePmi _),
    // word-level BPE merge induction: 5 corpus-wide merge rounds
    "q_bpe_merges" -> (bpeMerges _),
    // the real tokenizer form: char-level symbols, word-bounded merges
    "q_bpe_merges_char" -> (bpeMergesChar _),
    // the encode step: post-merge symbol vocabulary, top-20 by count
    "q_bpe_vocab" -> (bpeVocab _),
    // the encode at document granularity: per-doc token counts under
    // the trained merges — the model-context token budget read-out
    "q_bpe_encode" -> (bpeEncode _),
    // the PMI count tables maintained under doc-complete arrivals
    "q_phrase_pmi_stream" ->
      (graft.streaming.Streams.phrasePmiStreamed _))

  val oracle: Map[String, String] = Map(
    "q_dq_checks" -> dqChecksOracle,
    "q_dq_events" -> dqEventsOracle,
    // per-batch counts are additive → the stream converges to the scan
    "q_dq_events_stream" -> dqEventsOracle,
    "q_time_gapfill" -> gapfillOracle,
    // user-complete slices append to exactly the one-shot rows
    "q_time_gapfill_stream" -> gapfillOracle,
    "q_triangle_count" -> triangleOracle,
    // the accumulated edge set censuses to the one-shot answer
    "q_triangle_count_stream" -> triangleOracle,
    "q_fuzzy_match" -> fuzzyOracle,
    // the prefix-filtered algorithm must produce the identical pair set
    "q_fuzzy_match_edjoin" -> fuzzyOracle,
    // so must the deletion-neighborhood algorithm
    "q_fuzzy_match_delnbr" -> fuzzyOracle,
    "q_weighted_sample" -> weightedSampleOracle,
    // merged per-batch top-k recovers the global top-k exactly
    "q_weighted_sample_stream" -> weightedSampleOracle,
    "q_table_diff" -> tableDiffOracle,
    // the oracle computes the new snapshot directly — the gate pins
    // apply(old, diff(old, new)) == new
    "q_diff_apply_roundtrip" -> diffRoundtripOracle,
    "q_phrase_pmi" -> phrasePmiOracle,
    // the unrolled 5-round CTE twin pins every merge decision
    "q_bpe_merges" -> bpeOracle,
    "q_bpe_merges_char" -> bpeOracleChar,
    "q_bpe_vocab" -> bpeVocabOracle,
    // same chain, per-doc counts — pins the applied tokenization
    "q_bpe_encode" -> bpeEncodeOracle,
    // doc-complete batch counts add → the stream ranks identically
    "q_phrase_pmi_stream" -> phrasePmiOracle)
}
