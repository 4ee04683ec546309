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

  test("streamed split (incremental band index) converges to the batch assignment") {
    assert(graft.streaming.Streams.splitLeakageSafeStreamed(spark, tiny)
      .collect() === split.collect())
  }

  // ---- shuffle-to-shards (the reproducible training-order layout) ----

  private lazy val shards = graft.text.CurationOps.shuffleShards(spark, tiny).cache()

  test("shuffle covers every doc once, shards balanced by hash uniformity") {
    val n = Tables.documents(spark, tiny).count()
    assert(shards.count() === n)
    assert(shards.select("doc_id").distinct().count() === n)
    val sizes = shards.groupBy("shard").count().collect().map(_.getLong(1))
    assert(sizes.length === 8)
    // binomial(500, 1/8): mean 62.5, sd ~7.4 — 3.5 sd bounds
    assert(sizes.forall(c => c > 36 && c < 89), s"unbalanced: ${sizes.toSeq}")
  }

  test("positions are contiguous 0..size-1 within every shard") {
    import org.apache.spark.sql.functions._
    val bad = shards.groupBy("shard").agg(
      min("pos").as("mn"), max("pos").as("mx"), count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
    assert(bad.count() === 0)
  }

  test("shard order is shuffled, not id order, and fully deterministic") {
    import org.apache.spark.sql.functions._
    // within a shard, pos order must not be doc_id order (that would mean
    // the \"shuffle\" preserved ingest order) — count order inversions
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("pos")
    val inversions = shards.withColumn("prev_id", lag("doc_id", 1).over(w))
      .filter(col("prev_id") > col("doc_id")).count()
    assert(inversions > 0, "per-shard order degenerated to id order")
    assert(graft.text.CurationOps.shuffleShards(spark, tiny).collect()
      === shards.collect())
  }
}
