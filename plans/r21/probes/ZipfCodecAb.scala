package graft.text

import org.apache.spark.sql.SparkSession

/** Same-process A/B of the parquet codec for the bm25 zipf staging
  * (guide §6: measure zstd vs default snappy on staged intermediates).
  * Alternates codec per rep so ambient drift cancels.
  */
object ZipfCodecAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions("/root/testdata/sf0.1", 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def rm(p: String): Unit = { def r(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(r)); f.delete(): Unit }
      r(new java.io.File(p)) }
    def duSize(p: String): Long = { def s(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(s).sum).getOrElse(0L) else f.length()
      s(new java.io.File(p)) }
    val (n, l, v) = RetrievalOps.ZipfBench
    (1 to 2).foreach { rep =>
      Seq("snappy", "zstd").foreach { codec =>
        spark.conf.set("spark.sql.parquet.compression.codec", codec)
        val zdir = s"/tmp/zipf_codec_${codec}_$rep"
        val t0 = System.nanoTime()
        RetrievalOps.buildBm25ZipfIndex(spark, n, l, v, zdir)
        RetrievalOps.zipfQueriesOfDf(
          spark.read.parquet(s"$zdir/termmeta").select("term", "df"))
          .coalesce(1).write.mode("overwrite").parquet(s"$zdir/queries")
        val stageSec = (System.nanoTime() - t0) / 1e9
        val bytes = duSize(zdir)
        // serve read-back cost under the codec
        val t1 = System.nanoTime()
        RetrievalOps.bm25ZipfWandServed(spark, zdir).count()
        val serveSec = (System.nanoTime() - t1) / 1e9
        println(f"[codec] rep$rep $codec%-6s stage=$stageSec%7.2f s serve=$serveSec%6.2f s bytes=${bytes / 1e6}%8.1f MB")
        rm(zdir)
      }
    }
    spark.stop()
  }
}
