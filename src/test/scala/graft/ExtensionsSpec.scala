package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.etl.Star

/** The SparkSessionExtensions surface: AutoBroadcastBoundedDims must turn
  * an unhinted lookup join against a conf-listed bounded dim into a
  * broadcast join even when the size heuristic can't (threshold -1 stands
  * in for "derived dim with no usable stats"), must leave unlisted
  * corpus-growing dims on the size-driven path, and must not change
  * results.
  */
class ExtensionsSpec extends SparkSpec {

  private def withExtSession[T](f: SparkSession => T): T = {
    // a second session over the SAME SparkContext, with the extension
    // installed the way a deployment would (builder-level registration);
    // never .stop() it — that would stop the shared context
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try f(s2)
    finally {
      prevActive.foreach(SparkSession.setActiveSession)
      prevDefault.foreach(SparkSession.setDefaultSession)
    }
  }

  test("auto-broadcast rule: listed dim flips to broadcast; unlisted stays shuffled") {
    withExtSession { s2 =>
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      try {
        // join-free dim sides so every BroadcastHashJoin in the plans
        // below is attributable to the rule under test
        val fact = graft.Tables.lineitem(s2, tiny)
        def dimP(s: org.apache.spark.sql.SparkSession) =
          graft.Tables.part(s, tiny).selectExpr(
            "p_partkey AS id_produto_original", "p_name AS nome_produto")
        val dimC = graft.Tables.customer(s2, tiny).selectExpr(
          "c_custkey AS id_cliente_original", "c_name AS nome_cliente")
        // listed marker (id_produto_original): the rule must inject the
        // hint the author did not write
        val viaRule = fact.join(dimP(s2),
          fact("l_partkey") === col("id_produto_original"), "left")
        assert(viaRule.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "listed bounded dim must be broadcast by the rule")
        // unlisted marker (id_cliente_original is corpus-growing): must
        // honor the conf and shuffle
        val orders = graft.Tables.orders(s2, tiny)
        val unlisted = orders.join(dimC,
          orders("o_custkey") === dimC("id_cliente_original"), "left")
        assert(!unlisted.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "unlisted corpus-sized dim must stay on the size-driven path")
        // the FACT side never gets hinted even after it carries the
        // marker column from an earlier lookup (provenance guard: the
        // marker must be a key of THIS join's condition)
        val twoHop = viaRule.join(dimC,
          viaRule("l_suppkey") === dimC("id_cliente_original"), "left")
        val broadcasts = "BroadcastHashJoin".r
          .findAllIn(twoHop.queryExecution.executedPlan.toString).length
        assert(broadcasts === 1,
          s"only the produto lookup may broadcast, found $broadcasts")
        // results identical to the un-extended session
        val got = viaRule.select("l_orderkey", "l_linenumber", "nome_produto")
        val factP = graft.Tables.lineitem(spark, tiny)
        val dimPP = dimP(spark)
        val want = factP.join(dimPP,
          factP("l_partkey") === dimPP("id_produto_original"), "left")
          .select("l_orderkey", "l_linenumber", "nome_produto")
        assert(got.exceptAll(want).count() === 0)
        assert(want.exceptAll(got).count() === 0)
      } finally {
        s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s2.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        s2.conf.unset("spark.sql.adaptive.enabled")
      }
    }
  }

  test("one-stop extensions class exposes the native functions as builtins") {
    withExtSession { s2 =>
      val r = s2.sql(
        "SELECT simhash64(array('a', 'b')) AS s, " +
          "sorted_inter_count(array(1L, 2L), array(2L, 3L)) AS c, " +
          "element_at(minhashes(array(md5('a')), 2), 1) AS m").head()
      assert(r.getAs[Long]("s") !== 0L)
      assert(r.getAs[Int]("c") === 1)
      assert(r.getAs[Long]("m") > 0L)
    }
  }

  test("auto-broadcast rule: size guard refuses an oversized marker-bearing side") {
    withExtSession { s2 =>
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      // a join-free side's size estimate is credible; force the guard to
      // treat ANY such side as oversized — a mislabeled corpus-scale scan
      // carrying the marker name must stay un-hinted
      s2.conf.set("graft.autobroadcast.maxBytes", "1")
      try {
        val fact = graft.Tables.lineitem(s2, tiny)
        val mislabeled = graft.Tables.part(s2, tiny).selectExpr(
          "p_partkey AS id_produto_original", "p_name AS nome_produto")
        val joined = fact.join(mislabeled,
          fact("l_partkey") === col("id_produto_original"), "left")
        assert(!joined.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "guard must refuse a credible-stats side over maxBytes")
      } finally {
        s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s2.conf.unset("spark.sql.adaptive.enabled")
        s2.conf.unset("graft.autobroadcast.maxBytes")
      }
    }
  }

  test("auto-broadcast rule: marker list is conf-driven and can be emptied") {
    withExtSession { s2 =>
      s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s2.conf.set("spark.sql.adaptive.enabled", "false")
      s2.conf.set("graft.autobroadcast.cols", "")
      try {
        val fact = graft.Tables.lineitem(s2, tiny)
        val dimP = Star.dimProduto(s2, tiny)
          .select("sk_produto", "id_produto_original")
        val joined = fact.join(dimP,
          fact("l_partkey") === dimP("id_produto_original"), "left")
        assert(!joined.queryExecution.executedPlan.toString
          .contains("BroadcastHashJoin"),
          "emptied marker list must disable the rule")
      } finally {
        s2.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        s2.conf.unset("spark.sql.adaptive.enabled")
        s2.conf.unset("graft.autobroadcast.cols")
      }
    }
  }
}
