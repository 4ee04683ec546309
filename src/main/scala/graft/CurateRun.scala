package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.text.{CurationOps, TextOps}

/** End-to-end corpus-build CLI — the curation twin of `graft.etl.aw.AwRun`:
  * composes the driver-gated curation operators into the staged recipe a
  * training-data pipeline actually runs, prints the keep/drop funnel, and
  * writes the final cleaned corpus as language-partitioned parquet.
  *
  * Every stage IS one of the gated queries — this main only composes and
  * counts, so its correctness rests entirely on the per-operator DuckDB
  * gates:
  *
  *   1. rule gates: quality verdict (q_text_quality), Gopher battery
  *      (q_quality_gopher), repetition rules (q_text_repetition),
  *      language-ID agreement (q_lang_id), vocab coverage (q_vocab_oov);
  *   2. dedup: exact keep-one (q_dedup_exact), near-dup
  *      keep-one-per-cluster (q_dedup_canonical);
  *   3. leakage: eval-split contamination drop (q_decontaminate);
  *   4. passage cleaning (q_passage_clean) rewrites the survivors' text,
  *      dropping any doc whose text was fully duplicated elsewhere.
  *
  * Usage: runMain graft.CurateRun [sfDir] [outDir]
  */
object CurateRun {

  /** The staged funnel: returns (stage name, docs surviving) in order,
    * with the final corpus written to `out`. Shared by main and the spec.
    */
  def run(spark: SparkSession, dir: String, out: String): Seq[(String, Long)] = {
    val docs = Tables.documents(spark, dir)
      .selectExpr("CAST(doc_id AS BIGINT) AS doc_id", "lang", "source")
    val cleaned = TextOps.passageClean(spark, dir)
      .select("doc_id", "n_mantidos", "texto_limpo")

    val funnel = Seq.newBuilder[(String, Long)]
    var kept = docs.select("doc_id")
    def stage(name: String)(step: DataFrame => DataFrame): Unit = {
      kept = step(kept)
      funnel += name -> kept.count()
    }
    def semi(sig: DataFrame) =
      (k: DataFrame) => k.join(sig.select("doc_id"), Seq("doc_id"), "left_semi")

    funnel += "ingest" -> kept.count()
    stage("quality boa")(semi(TextOps.textQuality(spark, dir)
      .where("qualidade = 'boa'")))
    stage("gopher mantem")(semi(TextOps.qualityGopher(spark, dir)
      .where("decisao = 'mantem'")))
    stage("not repetitive")(semi(CurationOps.textRepetition(spark, dir)
      .where("repetitivo = 0")))
    stage("lang-id agrees")(semi(TextOps.langId(spark, dir)
      .where("acerto = 1")))
    stage("vocab coverage")(semi(CurationOps.vocabOov(spark, dir)
      .where("taxa_oov <= 0.5")))
    stage("exact keeper")(semi(TextOps.dedupExact(spark, dir)
      .selectExpr("doc_mantido AS doc_id")))
    stage("near-dup canonical")(semi(TextOps.dedupCanonical(spark, dir)))
    stage("not contaminated")(k => k.join(
      CurationOps.decontaminate(spark, dir).where("contaminado = 1")
        .select("doc_id"),
      Seq("doc_id"), "left_anti"))
    stage("passage-clean nonempty")(semi(cleaned.where("n_mantidos > 0")))

    docs.join(kept, Seq("doc_id"), "left_semi")
      .join(cleaned, Seq("doc_id"))
      .selectExpr("doc_id", "lang", "source", "texto_limpo",
        "n_mantidos AS n_tokens")
      .write.mode("overwrite").partitionBy("lang").parquet(out)
    funnel.result()
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1)
              else s"/tmp/graft_corpus_${System.nanoTime()}"
    val spark = SparkSession.builder()
      .master("local[*]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val funnel = run(spark, dir, out)
    funnel.foreach { case (name, n) => println(f"$name%-24s $n%8d docs") }
    val roll = spark.read.parquet(out)
      .groupBy("lang").agg(count(lit(1)).as("docs"),
        sum("n_tokens").as("tokens"))
      .orderBy("lang").collect()
    println("final corpus by language:")
    roll.foreach(r => println(f"  ${r.getString(0)}%-4s ${r.getLong(1)}%7d docs ${r.getLong(2)}%10d tokens"))
    println(f"corpus written to $out in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
