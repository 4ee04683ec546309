package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-21 groundwork for the round-22 xcell-build cut (VERDICT r20
  * #4): at 200k vectors / 50 cells, (1) split the xcell adjacency cost
  * between the own-cell block and the cross-cell closure, and (2)
  * measure how much of the cross-cell candidate volume a per-source
  * centroid-distance upper bound could prune EXACTLY (keep cell B for
  * source u only if the best possible cosine in B can beat u's R-th
  * best own-cell sim).
  *
  * Bound (direction space, valid for raw-norm cosine): with unit
  * vectors, cos(u,v) = 1 - ||u^ - v^||^2 / 2 and
  * ||u^ - v^|| >= ||u^ - m^_B|| - radius_B where m^_B is cell B's
  * normalized centroid and radius_B = max_{v in B} ||v^ - m^_B||.
  * Keep B iff ub >= theta_u (>= for tie safety).
  */
object XcellScaleProfile {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[xsp] $name%-46s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 100
    val work = s"/tmp/xsp_${reps}x"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // diversified replica staging (the DiversifyStage transform inline)
    val dim = 64
    val rot = s"1 + pmod(i - 1 + CAST(rep AS INT), $dim)"
    val sign = "CASE WHEN pmod(xxhash64(rep, i), 2) = 0 " +
      "THEN CAST(-1.0 AS FLOAT) ELSE CAST(1.0 AS FLOAT) END"
    t(s"stage ${reps}x diversified embeddings") {
      graft.Tables.embeddings(spark, "/root/testdata/sf0.1")
        .crossJoin(spark.range(reps).select(col("id").as("rep")))
        .selectExpr("vec_id + rep * 1000000000 AS vec_id", "label",
          s"""CASE WHEN rep = 0 THEN embedding
              ELSE transform(sequence(1, $dim),
                i -> CAST(element_at(embedding, $rot) * ($sign) AS FLOAT))
              END AS embedding""")
        .write.mode("overwrite").parquet(s"$work/embeddings.parquet")
    }
    val base = spark.read.parquet(s"$work/embeddings.parquet")
      .selectExpr("CAST(vec_id AS BIGINT) AS vec_id", "embedding")
    val n = base.count()
    val k = math.max(8, math.ceil(n.toDouble / 4000L).toInt)
    println(s"[xsp] n=$n cells=$k graphR=${EmbeddingOps.graphR(k)}")

    val cents = t("kmeans centroids") {
      val c = EmbeddingOps.kmeansCentroidsOf(base, k); c.count(); c }
    val asg = t("assign + barrier") {
      graft.Checkpoint.barrier(EmbeddingOps.assignCells(spark, base, cents)) }
    val cedges = t("centroid edges") {
      val e = graft.Checkpoint.barrier(EmbeddingOps.centroidEdgesOf(cents))
      e.count(); e }

    // candidate volumes
    val sizes = asg.groupBy("cell").agg(count(lit(1)).as("m"))
    val own = sizes.selectExpr("sum(m * m) AS v").first().getLong(0)
    val cross = cedges.select(col("src").as("cell"), col("dst"))
      .join(sizes, Seq("cell"))
      .join(sizes.select(col("cell").as("dst"), col("m").as("md")), Seq("dst"))
      .selectExpr("sum(m * md) AS v").first().getLong(0)
    println(s"[xsp] candidate volume: own-cell pairs=$own cross-cell pairs=$cross (${cross.toDouble / own}%x own)")

    // adjacency timings (count = full materialization through topEdges)
    t("own-cell adjacency (graphEdgesOf)") {
      EmbeddingOps.graphEdgesOf(spark, asg, k).count() }
    t("xcell adjacency (graphEdgesXcellOf)") {
      EmbeddingOps.graphEdgesXcellOf(spark, asg, cedges, k).count() }

    // ---- prune potential of the centroid bound ----
    val r = EmbeddingOps.graphR(k)
    val nrm = "sqrt(aggregate(embedding, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x))"
    val unitAsg = graft.Checkpoint.barrier(asg.selectExpr("vec_id", "cell",
      s"transform(embedding, x -> CAST(x AS DOUBLE) / $nrm) AS u"))
    val cnrm = "sqrt(aggregate(centroid, 0D, (a, x) -> a + CAST(x AS DOUBLE) * x))"
    val unitCents = cents.selectExpr("cell",
      s"transform(centroid, x -> CAST(x AS DOUBLE) / $cnrm) AS cm")
    val dexpr = "sqrt(aggregate(zip_with(u, cm, (a, b) -> (a - b) * (a - b)), 0D, (a, x) -> a + x))"
    val memb = unitAsg.join(unitCents, Seq("cell"))
      .selectExpr("vec_id", "cell", "u", s"$dexpr AS dc")
    val radii = graft.Checkpoint.barrier(
      memb.groupBy("cell").agg(max("dc").as("radius")))
    // theta_u: R-th best own-cell cosine (window over own-cell pairs)
    import org.apache.spark.sql.expressions.Window
    val a = asg.select(col("cell"), col("vec_id").as("src"), col("embedding").as("se"))
    val b = asg.select(col("cell"), col("vec_id").as("dst"), col("embedding").as("de"))
    val ownPairs = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
      .select(col("src"), graft.functions.GraftFunctions
        .cosine_sim(col("se"), col("de")).as("sim"))
    val w = Window.partitionBy("src").orderBy(col("sim").desc)
    val theta = t("theta (own-cell R-th sim)") {
      val th = graft.Checkpoint.barrier(ownPairs
        .withColumn("rk", row_number().over(w)).filter(col("rk") === r)
        .select(col("src"), col("sim").as("theta")))
      th.count(); th }
    // ub(u, B) for adjacent cells B; prunable iff ub < theta_u
    val srcCell = memb.select(col("vec_id").as("src"), col("cell").as("a_cell"), col("u"))
    val adj = cedges.select(col("src").as("a_cell"), col("dst").as("b_cell"))
    val ucB = unitCents.select(col("cell").as("b_cell"), col("cm"))
    val dB = "sqrt(aggregate(zip_with(u, cm, (a, b) -> (a - b) * (a - b)), 0D, (a, x) -> a + x))"
    val ub = srcCell.join(adj, Seq("a_cell")).join(broadcast(ucB), Seq("b_cell"))
      .join(broadcast(radii.select(col("cell").as("b_cell"), col("radius"))), Seq("b_cell"))
      .selectExpr("src", "b_cell",
        s"1D - pow(greatest(0D, $dB - radius), 2) / 2D AS ub")
      .join(theta, Seq("src"), "left")
    val agg2 = t("prune-potential aggregation") {
      ub.join(sizes.select(col("cell").as("b_cell"), col("m").as("mb")), Seq("b_cell"))
        .selectExpr(
          "count(1) AS src_cell_pairs",
          "sum(CASE WHEN theta IS NOT NULL AND ub < theta THEN 1 ELSE 0 END) AS pruned_pairs",
          "sum(mb) AS cross_vol",
          "sum(CASE WHEN theta IS NOT NULL AND ub < theta THEN mb ELSE 0 END) AS pruned_vol")
        .first() }
    println(s"[xsp] (src,adjCell) pairs=${agg2.getLong(0)} pruned=${agg2.getLong(1)} " +
      s"cross candidate vol=${agg2.getLong(2)} pruned vol=${agg2.getLong(3)} " +
      f"(${agg2.getLong(3).toDouble / agg2.getLong(2) * 100}%.1f%% prunable)")
    spark.stop()
  }
}
