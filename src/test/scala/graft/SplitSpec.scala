package graft

import org.apache.spark.sql.functions._
import graft.text.TextOps

/** Invariants of the leakage-safe split that the row-hash oracle gate
  * can't express directly: cluster atomicity (the whole point), coverage,
  * determinism, and rough hash-uniformity of the proportions.
  */
class SplitSpec extends SparkSpec {

  private lazy val split = TextOps.splitLeakageSafe(spark, tiny).cache()

  test("every document is assigned to exactly one split") {
    val n = Tables.documents(spark, tiny).count()
    assert(split.count() === n)
    assert(split.select("doc_id").distinct().count() === n)
    assert(split.filter(!col("split").isin("train", "val", "test")).count() === 0)
  }

  test("no near-dup cluster straddles two splits — the leakage guarantee") {
    val straddling = split.groupBy("cluster")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddling.count() === 0)
    // and the guarantee is non-vacuous: at least one multi-doc cluster
    // exists in the corpus, so doc-level splitting COULD have leaked
    val multi = split.groupBy("cluster").count().filter(col("count") > 1)
    assert(multi.count() > 0, "corpus has no near-dup clusters; test is vacuous")
  }

  test("split is deterministic across invocations") {
    assert(TextOps.splitLeakageSafe(spark, tiny).collect() === split.collect())
  }

  test("proportions are hash-uniform-ish (train dominates, all non-empty)") {
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.6, s"train share too low: $counts")
    assert(counts.getOrElse("val", 0L) > 0 && counts.getOrElse("test", 0L) > 0,
      s"empty eval split: $counts")
  }
}
