package graft.sink

import org.apache.spark.sql.DataFrame

/** DW sinks (SURVEY.md §2.1 S4-S6).
  *
  * The reference's TRUNCATE+append idempotent full refresh
  * (dags/etl_dim_produto.py:50-59) maps to mode("overwrite"); its manual
  * chunksize=5000 batching (dags/etl_fato_vendas.py:121) is subsumed by
  * partitioned writes (and `batchsize` on JDBC).
  */
object Sink {

  /** Native sink: parquet overwrite, optionally partitioned — for the fact
    * table partition by a date-derived column (e.g. ano) so KPI scans
    * prune partitions the way the reference's fact indexes served lookups.
    */
  def parquet(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Reference-compatible sink: JDBC truncate+append (S5). `truncate=true`
    * preserves the target DDL like the reference's TRUNCATE ... CASCADE.
    */
  def jdbc(df: DataFrame, url: String, table: String,
           props: java.util.Properties, batchSize: Int = 5000): Unit =
    df.write.mode("overwrite")
      .option("truncate", "true")
      .option("batchsize", batchSize.toString)
      .jdbc(url, table, props)
}
