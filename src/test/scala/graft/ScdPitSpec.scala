package graft

import graft.etl.Scd

/** The point-in-time SCD2 lookup: version resolution by order date, the
  * explicit pre-history sentinel, and the plan shape (equi-join on the
  * key, range as residual — never a nested loop).
  */
class ScdPitSpec extends SparkSpec {

  test("PIT join resolves exactly the version valid at each order date") {
    val pit = Scd.factScd2PointInTime(spark, tiny).collect()
    // intervals of one key partition time -> each order matches <= 1
    // version, and the left join keeps unmatched: exactly one row/order
    assert(pit.length.toLong === Tables.orders(spark, tiny).count())
    // o_orderdate surfaces as DATE or TIMESTAMP_NTZ depending on the
    // generated parquet's physical type — normalize to LocalDate
    def day(v: Any): java.time.LocalDate = v match {
      case d: java.sql.Date => d.toLocalDate
      case t: java.sql.Timestamp => t.toLocalDateTime.toLocalDate
      case ldt: java.time.LocalDateTime => ldt.toLocalDate
      case ld: java.time.LocalDate => ld
      case other => fail(s"unexpected date type: ${other.getClass}")
    }
    val first = java.time.LocalDate.parse("1995-01-01")
    val cut = java.time.LocalDate.parse("1996-06-01")
    pit.foreach { r =>
      val dt = day(r.getAs[Any]("data_pedido"))
      val seg = r.getAs[String]("segmento")
      val cust = r.getAs[Long]("id_cliente")
      if (dt.isBefore(first))
        assert(seg === "SEM_VERSAO", s"pre-history order must be explicit: $r")
      else if (cust % 7 == 0 && !dt.isBefore(cut))
        assert(seg === "ATUALIZADO",
          s"changed customer after the load date must see the new version: $r")
      else
        assert(seg != "ATUALIZADO" && seg != "SEM_VERSAO",
          s"unchanged span must resolve the original segment: $r")
    }
    // both regimes actually occur for changed customers (the load date
    // sits mid-domain, so the version split is exercised, not vacuous)
    val changed = pit.filter(_.getAs[Long]("id_cliente") % 7 == 0)
      .filter(r => !day(r.getAs[Any]("data_pedido")).isBefore(first))
    assert(changed.exists(_.getAs[String]("segmento") == "ATUALIZADO"))
    assert(changed.exists(_.getAs[String]("segmento") != "ATUALIZADO"))
  }

  test("PIT join plans as an equi-join with a residual range, not a nested loop") {
    val plan = Scd.factScd2PointInTime(spark, tiny)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"temporal lookup must shuffle on the customer key only:\n$plan")
  }
}
