package graft

import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Pins the loader contract: every event-time/date column the engine relies
  * on is TimestampType after loading, regardless of how the generator wrote
  * it (nanos-as-long, timestamp[us] with or without isAdjustedToUTC). A
  * generator change that breaks this must fail HERE, loudly, not as five
  * scattered DATATYPE_MISMATCH / watermark analysis errors downstream
  * (the round-11 regression).
  */
class TablesSchemaSpec extends SparkSpec {
  private val expected = Seq(
    ("events",   Tables.events _,   "ts"),
    ("orders",   Tables.orders _,   "o_orderdate"),
    ("lineitem", Tables.lineitem _, "l_shipdate"))

  for ((name, loader, col) <- expected)
    test(s"$name.$col loads as TimestampType") {
      val dt = loader(spark, tiny).schema(col).dataType
      assert(dt == TimestampType, s"$name.$col is $dt, expected TimestampType")
    }

  test("no loader column is TIMESTAMP_NTZ") {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables; f <- Tables.table(spark, tiny, t).schema.fields)
      assert(f.dataType != TimestampNTZType, s"$t.${f.name} is TIMESTAMP_NTZ")
  }
}
