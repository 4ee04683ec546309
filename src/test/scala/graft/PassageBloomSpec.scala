package graft

import org.apache.spark.sql.functions._
import graft.ops.RelationalOps
import graft.text.TextOps
import graft.sim.EmbeddingOps

/** Round-8 additions: exact substring (passage) dedup, the Gopher-rule
  * quality gate, Bloom runtime-filter join pruning, and SemDeDup. Values
  * are driver-gated against DuckDB (q_dedup_passage / q_quality_gopher /
  * q_bloom_semijoin / q_semdedup); these specs pin what the gate can't
  * see — agreement with an independent in-JVM brute force, internal
  * consistency of the rule columns, the plan shape that makes the bloom
  * worth having, and cluster accounting.
  */
class PassageBloomSpec extends SparkSpec {

  private val K = 8

  test("passage dedup agrees with an in-JVM brute force over raw window strings") {
    val docs = Tables.documents(spark, tiny)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+")).toMap
    // brute force: count RAW window strings (no hashing at all — md5 in
    // the operator must be injective here for the two to agree)
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, toks) <- docs; i <- 0 to toks.length - K)
      occ.updateWith(toks.slice(i, i + K).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expected = docs.toSeq.sortBy(_._1).flatMap { case (id, toks) =>
      val flagged = (0 to toks.length - K)
        .filter(i => occ(toks.slice(i, i + K).mkString(" ")) >= 2)
        .map(_ + 1) // 1-based
      val spans = flagged.foldLeft(Vector.empty[Vector[Int]]) { (acc, p) =>
        if (acc.nonEmpty && p - acc.last.last <= K) acc.init :+ (acc.last :+ p)
        else acc :+ Vector(p)
      }
      spans.zipWithIndex.map { case (ps, i) =>
        (id, i + 1, ps.head, ps.last + K - 1, ps.size.toLong)
      }
    }
    val got = TextOps.passageDedup(spark, tiny, K).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .toSeq
    assert(got == expected)
    assert(got.nonEmpty, "tiny corpus was expected to contain duplicated passages")
  }

  test("passage clean: untouched docs pass through; fully-covered near-copies are fully cut") {
    // sf0.01: the smallest corpus that carries exact-duplicate documents
    val sf = "/root/testdata/sf0.01"
    val docs = Tables.documents(spark, sf)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1).trim.split("\\s+").toSeq).toMap
    val rows = TextOps.passageClean(spark, sf, K).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getString(3))).toMap
    assert(rows.keySet == docs.keySet)
    rows.foreach { case (id, (n, kept, txt)) =>
      assert(n == docs(id).length && kept <= n)
      if (kept == n) // uncut docs must reproduce their tokens verbatim
        assert(txt == docs(id).mkString(" "), s"doc $id changed without cuts")
      assert(txt.isEmpty == (kept == 0))
    }
    assert(rows.values.exists(v => v._2 < v._1), "tiny corpus should have cuts")
    assert(rows.values.exists(v => v._2 == v._1), "and untouched docs")
    // ownership invariant, brute-forced: a doc is fully cut IFF it owns
    // none of its windows (every window has an earlier (doc, pos)
    // occurrence) and its windows tile the whole doc
    val firstOcc = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, toks) <- docs.toSeq.sortBy(_._1); i <- 0 to toks.length - K) {
      val w = toks.slice(i, i + K).mkString(" ")
      if (!firstOcc.contains(w)) firstOcc(w) = (id, i)
    }
    val fullyCut = rows.filter { case (_, (n, kept, _)) => kept == 0 && n >= K }
    assert(fullyCut.nonEmpty, "sf0.01 should contain fully-covered near-copies")
    fullyCut.keys.foreach { id =>
      val toks = docs(id)
      (0 to toks.length - K).foreach { i =>
        assert(firstOcc(toks.slice(i, i + K).mkString(" ")) != ((id, i)),
          s"fully-cut doc $id unexpectedly owns its window at $i")
      }
    }
  }

  test("gopher gate: composite decision is the AND of its rule columns") {
    val rows = TextOps.qualityGopher(spark, tiny).collect()
    val ruleCols = Seq("r_n_tokens", "r_tam_medio", "r_alfa", "r_stopwords", "r_digitos")
    rows.foreach { r =>
      val verdicts = ruleCols.map(c => r.getAs[Int](c))
      assert(verdicts.forall(v => v == 0 || v == 1))
      val expected = if (verdicts.forall(_ == 1)) "mantem" else "descarta"
      assert(r.getAs[String]("decisao") == expected, s"row $r")
      // signal/rule consistency, recomputed from the returned signals
      assert((r.getAs[Int]("n_tokens") >= 15 && r.getAs[Int]("n_tokens") <= 10000)
        == (r.getAs[Int]("r_n_tokens") == 1))
      assert((r.getAs[Int]("n_stopwords") >= 2) == (r.getAs[Int]("r_stopwords") == 1))
    }
    val kept = rows.count(_.getAs[String]("decisao") == "mantem")
    assert(kept > 0 && kept < rows.length,
      s"gate must discriminate on this corpus (kept $kept/${rows.length})")
  }

  test("bloom semijoin equals the plain semi join and plans the might_contain prefilter") {
    val result = RelationalOps.bloomSemiJoin(spark, tiny)
    val build = Tables.orders(spark, tiny)
      .filter(col("o_orderstatus") === "F" && col("o_totalprice") > 250000)
      .select(col("o_orderkey"))
    val li = Tables.lineitem(spark, tiny)
    val plain = li.join(build, li("l_orderkey") === build("o_orderkey"), "left_semi")
      .groupBy(col("l_orderkey").cast("long").as("l_orderkey"))
      .agg(count(lit(1)).as("n_linhas"),
        sum(col("l_quantity").cast("int")).cast("long").as("qtd_total"))
      .orderBy("l_orderkey")
    assert(result.collect().toSeq == plain.collect().toSeq)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"probe side must carry the bloom prefilter at the scan:\n$plan")
  }

  test("semdedup: survivors + absorbed reconcile to the corpus; absorbers have pairs") {
    val sd = EmbeddingOps.semDedup(spark, tiny).collect()
    val total = Tables.embeddings(spark, tiny).count()
    assert(sd.map(r => 1L + r.getAs[Long]("n_absorvidos")).sum == total,
      "every vector must be accounted for exactly once across clusters")
    val pairs = EmbeddingOps.queries("q_embed_neardup_indexed")(spark, tiny)
      .select("vec_a", "vec_b").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    sd.filter(_.getAs[Long]("n_absorvidos") > 0).foreach { r =>
      assert(pairs.contains(r.getAs[Long]("vec_id")),
        s"absorber ${r.getAs[Long]("vec_id")} never appears in a near-dup pair")
    }
    // survivors are component minima: no survivor may appear as the
    // GREATER side of a pair whose partner is also a survivor in the same
    // component — cheap necessary condition: dropped set and survivor set
    // partition the corpus
    assert(sd.map(_.getAs[Long]("vec_id")).distinct.length == sd.length)
  }

  test("connected components: driver union-find and distributed loop agree") {
    import spark.implicits._
    // chain + triangle + singleton-free pair mix, ids deliberately
    // out of order so union-by-min ordering actually gets exercised
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 1L), // chain with min 1
      (20L, 22L), (22L, 21L), (20L, 21L), // triangle, min 20
      (40L, 41L)).toDF("doc_a", "doc_b")
    def run(): Seq[(Long, Long)] = graft.text.TextOps.componentsOf(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    val viaDriver = run() // default threshold → driver route
    spark.conf.set("graft.cc.collectMaxEdges", "0")
    val viaLoop = try run() finally spark.conf.unset("graft.cc.collectMaxEdges")
    assert(viaDriver == viaLoop)
    assert(viaDriver == Seq(1L -> 1L, 3L -> 1L, 5L -> 1L, 9L -> 1L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 40L -> 40L, 41L -> 40L))
  }
}
