package graft.sim

import org.apache.spark.sql.SparkSession

/** Replica-diversified embedding staging — the r20 finding: the Nx
  * replica stager gives documents a per-replica token prefix so
  * replicas are mutually dissimilar, but replicated EMBEDDINGS
  * verbatim. At 1000× every vector carries 999 exact duplicates, so
  * (a) brute "truth" degenerates to "find 5 exact copies of the
  * query" and (b) every node's kNN top-R saturates with its own
  * duplicate family — the graph decomposes into family cliques with
  * no cross-family edges at ANY degree (measured: recall@5 0.875 at
  * 2M, flat in probe width p=8→64 AND in degree R=8→14; RoutedMissDiag
  * classifies all misses as own-cell walk misses on duplicate ids).
  * No index structure can be judged on that corpus.
  *
  * This main writes a sibling staging whose replica embeddings go
  * through a per-replica ORTHOGONAL transform — index rotation by
  * `rep` plus deterministic sign flips. Orthogonal ⇒ norms and all
  * WITHIN-replica distances are preserved exactly (each replica is an
  * isometric copy of the sf0.1 point cloud), while cross-replica
  * similarities randomize — the embedding analog of the documents'
  * bijective token prefix. Replica 0 stays verbatim, so the demo
  * queries (vec_id < 8) are unchanged. The sign pattern is
  * xxhash64(rep, i) parity — per-replica DISTINCT with overwhelming
  * probability, so no residual exact-duplicate families survive (the
  * first cut used a parity-coupled sign that repeated every 64 reps
  * and left families of ~16 > R — measured as the same clique
  * pathology; SCALE_VERIFY_r20.md part 2). Non-embedding tables are
  * not rewritten: pass --link to symlink them from the source
  * staging.
  *
  * Usage: `tools/run.sh graft.sim.DiversifyStage <srcDir> <outDir> [--link]`
  */
object DiversifyStage {
  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val link = args.contains("--link")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(out).mkdirs()
    val dim = 64
    // rep = vec_id / 1e9 (the stager's id offset); i is 1-based
    val rot = s"1 + pmod(i - 1 + CAST(rep AS INT), $dim)"
    val sign = "CASE WHEN pmod(xxhash64(rep, i), 2) = 0 " +
      "THEN CAST(-1.0 AS FLOAT) ELSE CAST(1.0 AS FLOAT) END"
    graft.Tables.embeddings(spark, src)
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding", "label",
        "CAST(vec_id DIV 1000000000 AS INT) AS rep")
      .selectExpr("vec_id",
        s"""CASE WHEN rep = 0 THEN embedding
            ELSE transform(sequence(1, $dim),
              i -> CAST(element_at(embedding, $rot) * ($sign) AS FLOAT))
            END AS embedding""",
        "label")
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    if (link) {
      val srcRoot = new java.io.File(src)
      Option(srcRoot.listFiles()).getOrElse(Array.empty[java.io.File])
        .filter(f => f.getName.endsWith(".parquet") &&
          f.getName != "embeddings.parquet")
        .foreach { f =>
          val t = java.nio.file.Paths.get(s"$out/${f.getName}")
          if (!java.nio.file.Files.exists(t))
            java.nio.file.Files.createSymbolicLink(t, f.toPath.toAbsolutePath)
        }
    }
    println(s"[diversify] staged $out from $src")
    spark.stop()
  }
}
