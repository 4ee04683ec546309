package graft.sim
import org.apache.spark.sql.SparkSession
// args: <outDir> <suffix> <sfDir> <q1,q2,...> — writes
// <outDir>/<query>_<suffix>.txt with the formatted physical plan.
object PlanDump {
  def main(args: Array[String]): Unit = {
    val out = args(0); val suffix = args(1); val sfDir = args(2)
    val names = args(3).split(",").toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        graft.Tuning.sessionShufflePartitions(sfDir, 32).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/${q}_$suffix.txt"),
        s"========== $q ==========\n" + plan)
      println(s"[plan] wrote ${q}_$suffix.txt")
    }
    spark.stop()
  }
}
