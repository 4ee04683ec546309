package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Incremental star maintenance — the lifecycle extension past the
  * reference's truncate-and-reload (S5, dags/etl_fato_vendas.py:110-121):
  * instead of rebuilding the whole fact each run, load the historical
  * fact ONCE and APPEND each new batch into the year-partitioned DW.
  *
  * The contract that makes this safe is gated bit-exactly: a fact built
  * as (historical load) + (increment append) must equal the full rebuild
  * row-for-row — q_fact_incremental runs the split lifecycle against the
  * SAME DuckDB oracle as star_fato_vendas (one full build). Fact rows
  * are per-order-line and every surrogate key is a deterministic
  * function of the dimension snapshot, so the union of two disjoint
  * order-date slices is exactly the full build; nothing about the split
  * leaks into the output.
  *
  * Scale shape: the increment pass joins ONLY the new orders (the
  * header-side date filter is pushed to the scan) and appends files to
  * the partitions its years touch — the historical majority of the DW is
  * never read, shuffled, or rewritten. IncrementalSpec pins that: the
  * pre-cut year partitions' file listing is byte-identical before and
  * after the append. At 100 TB this is the difference between a daily
  * load costing O(day) and costing O(history).
  */
object Incremental {

  /** Order-date boundary between the "historical" load and the
    * "incremental" batch. Mid-corpus for the TPC-H date domain
    * (1992-1998), so both slices are non-trivial at every sf.
    */
  private val cut = "1996-01-01"

  private def dwDir(d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(12)
    s"${System.getProperty("java.io.tmpdir")}/graft_fact_incr_$h"
  }

  /** The split lifecycle, returning the read-back fact in the
    * star_fato_vendas presentation form (doubles for the money columns,
    * full deterministic order). Each invocation runs the whole cycle —
    * overwrite with the historical slice, append the increment — so the
    * gate exercises both writer modes every time and a rerun can never
    * double-append.
    */
  def factIncremental(s: SparkSession, d: String): DataFrame = {
    val dw = buildSplit(s, d)
    s.read.parquet(dw).drop("ano")
      .withColumn("valor_bruto", col("valor_bruto").cast("double"))
      .withColumn("valor_desconto", col("valor_desconto").cast("double"))
      .withColumn("valor_total", col("valor_total").cast("double"))
      .select("id_pedido", "numero_linha", "sk_produto", "sk_cliente",
        "sk_vendedor", "sk_localidade", "sk_tempo", "qtd_vendida",
        "valor_bruto", "valor_desconto", "valor_total")
      .orderBy("id_pedido", "numero_linha", "sk_produto", "sk_vendedor",
        "qtd_vendida", "valor_bruto", "valor_desconto")
  }

  /** Runs historical overwrite + increment append; returns the DW path.
    * Exposed for the spec, which also inspects the partition layout
    * between the two phases.
    *
    * The dimensions are maintained SEPARATELY and both fact passes join
    * against the READ-BACK SK maps — the production shape: an increment
    * load looks dimension keys up in the DW it is appending to (the
    * reference's own SK-map read-back, dags/etl_fato_vendas.py:21-24),
    * it does not re-derive the dimensional model per batch. [[ensureDims]]
    * sinks them once per (dataset, fingerprint) and serves read-backs
    * thereafter — the dim-refresh cadence is the source data's, not the
    * fact batches'.
    */
  private[graft] def buildSplit(s: SparkSession, d: String): String = {
    val dw = dwDir(d)
    val dims = ensureDims(s, d)
    writeSlice(s, d, col("o_orderdate") < lit(cut), s"$dw/fato", "overwrite", dims)
    writeSlice(s, d, col("o_orderdate") >= lit(cut), s"$dw/fato", "append", dims)
    s"$dw/fato"
  }

  /** md5 over every source file's (path, length, mtime) — regenerated
    * testdata can never be served stale SK maps.
    */
  private def dirFingerprint(d: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(d))
      .map(f => s"${f.getPath}:${f.length}:${f.lastModified}").mkString("|")
    java.security.MessageDigest.getInstance("MD5")
      .digest(sig.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build-once stored SK maps (staleness-fingerprinted, the same
    * discipline as the ANN auto-indexes): sink on first use or when the
    * source data changed, serve parquet read-backs after.
    */
  private[graft] def ensureDims(s: SparkSession, d: String): Seq[DataFrame] =
    writeDims(s, d, s"${dwDir(d)}/dims", onlyIfStale = true)

  /** Sink the four SK maps; return them read back from parquet.
    *
    * Staleness is tracked by ONE fixed marker file whose CONTENT is the
    * source fingerprint (compared, and overwritten on rebuild) — a
    * fingerprint-NAMED marker would accrete one file per historical
    * dataset state, and reverting the source to a prior state (preserved
    * lengths/mtimes) would then match the old marker and serve the
    * intervening dataset's stale SK maps.
    */
  private[graft] def writeDims(s: SparkSession, d: String, dimDir: String,
      onlyIfStale: Boolean = false): Seq[DataFrame] = {
    val fp = dirFingerprint(d)
    val marker = new java.io.File(dimDir, "_built")
    val fresh = onlyIfStale && marker.exists() &&
      java.nio.file.Files.readString(marker.toPath).trim == fp
    val dims = Seq(
      "dp" -> Star.dimProduto(s, d).select("sk_produto", "id_produto_original"),
      "dc" -> Star.dimCliente(s, d).select("sk_cliente", "id_cliente_original"),
      "dv" -> Star.dimVendedor(s, d).select("sk_vendedor", "id_vendedor_original"),
      "dl" -> Star.dimLocalidade(s, d).select("sk_localidade", "id_localidade_original"))
    val out = dims.map { case (n, df) =>
      if (!fresh) df.write.mode("overwrite").parquet(s"$dimDir/$n")
      s.read.parquet(s"$dimDir/$n")
    }
    if (!fresh)
      java.nio.file.Files.writeString(marker.toPath, fp): Unit
    out
  }

  private[graft] def writeSlice(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column, dw: String, mode: String,
      dims: Seq[DataFrame]): Unit = {
    val o = Tables.orders(s, d).filter(pred)
    val ano = (col("sk_tempo") / 10000).cast("int")
    val Seq(dp, dc, dv, dl) = dims
    Star.fatoVendasFromDims(o, Tables.lineitem(s, d), dp, dc, dv, dl)
      .withColumn("ano", ano)
      .write.mode(mode).partitionBy("ano").parquet(dw)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_fact_incremental" -> (factIncremental _))
}
