package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.text.TextExprs

/** Native Catalyst expressions: SQL registration, codegen execution, and
  * bit-equality with the composed-built-in template forms they replace.
  */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("minhashes == template (h1 + i*h2) mod p form, via SQL and Column API") {
    GraftFunctions.register(spark)
    val docs = Tables.documents(spark, tiny).limit(50)
    val T = TextExprs.tokens("text")
    val hs = docs.selectExpr("doc_id", s"${TextExprs.md5List(TextExprs.shingles3(T).spark).spark} AS hs")
    val native = hs.selectExpr("doc_id", "minhashes(hs, 8) AS mh")
    val template = hs
      .selectExpr("doc_id",
        s"${TextExprs.hashHalf("hs", 1).spark} AS a1",
        s"${TextExprs.hashHalf("hs", 17).spark} AS a2")
      .selectExpr("doc_id", (0 until 8).map(i =>
        TextExprs.minhash("a1", "a2", i).spark).mkString("array(", ",", ") AS mh"))
    val diff = native.as("n").join(template.as("t"), "doc_id")
      .filter($"n.mh" =!= $"t.mh")
    assert(diff.count() === 0)
  }

  test("simhash64 kernel == hex-digit/shift SQL template, bit-exact BIGINT") {
    GraftFunctions.register(spark)
    val T = TextExprs.tokens("text")
    val docs = Tables.documents(spark, tiny).limit(50)
      .selectExpr("doc_id", s"${T.spark} AS toks")
    val both = docs
      .selectExpr("doc_id", "toks",
        "transform(toks, x -> md5(x)) AS hl", "size(toks) AS nt")
      .selectExpr("doc_id", "simhash64(toks) AS native",
        s"${TextExprs.simhash64FromHashes("hl", "nt").spark} AS template")
    assert(both.schema("native").dataType.typeName === "long")
    assert(both.filter($"native" =!= $"template").count() === 0)
    // signatures actually populate the full 64-bit space (some negative =
    // sign bit set, and more distinct values than any 16-bit key space)
    assert(both.filter($"native" < 0L).count() > 0)
  }

  test("simhash64 band join finds exactly the brute-force hamming<=3 pairs") {
    val banded = graft.text.TextOps.simhashPairs64(spark, tiny)
      .select("doc_a", "doc_b", "hamming")
    val sigs = Tables.documents(spark, tiny)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id",
        s"simhash64(${TextExprs.tokens("text").spark}) AS sig")
    val a = sigs.toDF("doc_a", "sig_a")
    val b = sigs.toDF("doc_b", "sig_b")
    val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
      .filter($"hamming" <= 3)
      .select("doc_a", "doc_b", "hamming")
    assert(banded.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(banded).count() === 0)
    assert(brute.count() > 0) // tiny corpus has seeded near-dups
  }

  test("simhash64 banding generalizes: 6 bands find exactly the hamming<=5 pairs") {
    val banded = graft.text.TextOps.simhashPairs64(spark, tiny, maxHamming = 5)
      .select("doc_a", "doc_b", "hamming")
    val sigs = Tables.documents(spark, tiny)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id",
        s"simhash64(${TextExprs.tokens("text").spark}) AS sig")
    val a = sigs.toDF("doc_a", "sig_a")
    val b = sigs.toDF("doc_b", "sig_b")
    val brute = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .withColumn("hamming", expr("CAST(bit_count(sig_a ^ sig_b) AS INT)"))
      .filter($"hamming" <= 5)
      .select("doc_a", "doc_b", "hamming")
    assert(banded.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(banded).count() === 0)
    assert(brute.count() > 0)
  }

  test("sorted_inter_count == filter/contains interCount template") {
    GraftFunctions.register(spark)
    val T = TextExprs.tokens("text")
    val docs = Tables.documents(spark, tiny).limit(40)
      .selectExpr("doc_id", s"shingle_hashes(${T.spark}, 3) AS shd")
    val a = docs.toDF("ia", "sa")
    val b = docs.toDF("ib", "sb")
    val both = a.crossJoin(b).filter($"ia" < $"ib")
      .withColumn("native", GraftFunctions.sorted_inter_count($"sa", $"sb"))
      .withColumn("template", expr(TextExprs.interCount("sa", "sb").spark))
    assert(both.filter($"native" =!= $"template").count() === 0)
    assert(both.filter($"native" > 0).count() > 0)
  }

  test("prefix-filtered jaccardPairs == brute-force block-pairs jaccard") {
    GraftFunctions.register(spark)
    val T = TextExprs.tokens("text")
    val pruned = graft.text.TextOps.jaccardPairs(spark, tiny)
    val base = Tables.documents(spark, tiny).selectExpr(
      "CAST(doc_id AS BIGINT) AS doc_id", "lang", s"${T.spark} AS toks")
      .selectExpr("doc_id", "lang", "shingle_hashes(toks, 3) AS shd",
        "CAST(floor(size(toks) / 20) AS INT) AS bucket")
      .withColumn("n", size($"shd"))
    val a = base.toDF("doc_a", "lang", "sa", "bucket", "n_a")
    val b = base.toDF("doc_b", "lang", "sb", "bucket", "n_b")
    val brute = a.join(b, Seq("lang", "bucket")).filter($"doc_a" < $"doc_b")
      .withColumn("inter",
        GraftFunctions.sorted_inter_count($"sa", $"sb").cast("long"))
      .withColumn("jaccard", $"inter".cast("double") /
        ($"n_a" + $"n_b" - $"inter").cast("double"))
      .filter($"jaccard" >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
    assert(pruned.exceptAll(brute).count() === 0)
    assert(brute.exceptAll(pruned).count() === 0)
    assert(brute.count() > 0)
  }

  test("cosine_sim == aggregate/zip_with dot-product form, bit-exact") {
    val e = Tables.embeddings(spark, tiny).limit(30)
      .selectExpr("vec_id", "embedding")
    val a = e.toDF("ia", "ea")
    val b = e.toDF("ib", "eb")
    val both = a.crossJoin(b).filter($"ia" < $"ib")
      .withColumn("native", GraftFunctions.cosine_sim($"ea", $"eb"))
      .withColumn("template",
        expr(TextExprs.dot("ea", "eb", 64).spark) /
          (sqrt(expr(TextExprs.dot("ea", "ea", 64).spark)) *
            sqrt(expr(TextExprs.dot("eb", "eb", 64).spark))))
    assert(both.filter($"native" =!= $"template").count() === 0)
  }

  test("SparkSessionExtensions injection exposes the functions in a fresh session") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // materialize the shared session first
    // getOrCreate returns the existing default session (ignoring
    // extensions), so clear it to force a NEW session on the same
    // SparkContext — and restore afterwards; never stop() here, that would
    // kill the context under the other suites.
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      val r = s2.sql(
        "SELECT element_at(minhashes(array(md5('a'), md5('b')), 2), 1) AS m, " +
          "cosine_sim(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c")
        .head()
      assert(r.getAs[Long]("m") > 0L)
      assert(math.abs(r.getAs[Double]("c") - 1.0) < 1e-12)
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }

  test("type checking rejects wrong inputs") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(err.getMessage.toLowerCase.contains("cosine_sim"))
  }

  test("l2_sq rejects length-mismatched vectors instead of reading garbage") {
    // ArrayData element reads are unchecked — before the guard, a 3-elem
    // vs 4-elem pair returned a plausible-but-wrong distance
    GraftFunctions.register(spark)
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    val err = intercept[Exception] {
      spark.sql("""SELECT l2_sq(
        array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT)),
        array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))""").collect()
    }
    assert(messages(err).contains("length mismatch"), messages(err))
  }

  test("l2_sq rejects null elements instead of reading garbage") {
    GraftFunctions.register(spark)
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    val err = intercept[Exception] {
      spark.sql("""SELECT l2_sq(
        array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)),
        array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)))""").collect()
    }
    assert(messages(err).contains("null element"), messages(err))
  }
}
