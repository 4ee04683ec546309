package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** CSV staging for the reference's PRIMARY input format.
  *
  * The reference ingests its sources as CSV (`pd.read_csv`,
  * dags/etl_dim_produto.py:14-16 and 12 sibling call sites); the graft
  * testdata ships as parquet. This stage round-trips the sales tables
  * through real CSV files — header row, quoted fields (embedded commas
  * and quotes), an explicit null token distinct from the empty string,
  * microsecond timestamps — so the star build can be oracle-gated END TO
  * END over CSV input: the driver's DuckDB oracle reads the original
  * parquet, the engine reads the staged CSV, and the hashes must meet.
  *
  * Round-trip exactness notes (each one is a way CSV silently corrupts
  * data if defaulted):
  *  - schema is WRITTEN alongside each table and applied on read —
  *    CSV inference would re-guess types nondeterministically (the very
  *    hazard parquet's self-describing schema avoids, Tables.scala:8);
  *  - nullValue is `\N`, not the default empty string, so NULL and ""
  *    stay distinguishable in both directions;
  *  - timestampFormat carries microseconds (the default drops them);
  *  - doubles round-trip via Java's shortest-round-trip toString, which
  *    the schema-directed parse reads back bit-exactly.
  */
object CsvStage {
  private val SalesTables = Seq(
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem")

  private[graft] val Opts = Map(
    "header" -> "true",
    "nullValue" -> "\\N",
    // the writer TRIMS cell whitespace by default — " pad " would come
    // back "pad"; both directions pinned off (CsvStageSpec)
    "ignoreLeadingWhiteSpace" -> "false",
    "ignoreTrailingWhiteSpace" -> "false",
    "timestampFormat" -> "yyyy-MM-dd HH:mm:ss.SSSSSS")

  /** CSV cannot represent a string value EQUAL to the null token (the
    * reader maps the token to null even when quoted — an ambiguity of
    * the format itself, same reason Postgres COPY escapes `\` in text
    * mode). Refuse loudly at stage time rather than corrupt silently.
    */
  private[graft] def assertNoNullToken(df: DataFrame, table: String): Unit = {
    val strCols = df.schema.fields
      .filter(_.dataType == org.apache.spark.sql.types.StringType).map(_.name)
    if (strCols.nonEmpty) {
      import org.apache.spark.sql.functions.{col, lit}
      val clash = df.filter(
        strCols.map(c => col(c) === lit("\\N")).reduce(_ || _)).limit(1)
      require(clash.count() == 0,
        s"$table contains the literal CSV null token \\N — staging would be lossy")
    }
  }

  /** Stage `srcDir`'s sales tables as CSV under a source-keyed temp dir.
    * Idempotent per source CONTENT (a `_STAGED` marker skips re-staging),
    * so gate + bench invocations pay the conversion once. The cache key
    * fingerprints the source parquet files (path + size + mtime) AND the
    * CSV option set — regenerated testdata at the same path, or a change
    * to Opts, lands in a fresh staging dir instead of silently reusing a
    * stale one.
    */
  def stage(s: SparkSession, srcDir: String): String = {
    val (dir, marker) = StageCache.resolve(srcDir,
      Opts.toSeq.sorted.mkString(","), "graft_csv_stage")
    if (!marker.exists()) {
      SalesTables.foreach { t =>
        val df = graft.Tables.table(s, srcDir, t)
        assertNoNullToken(df, t)
        df.write.mode("overwrite").options(Opts).csv(s"$dir/$t.csv")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/$t.schema"),
          df.schema.toDDL.getBytes("UTF-8")): Unit
      }
      marker.createNewFile(): Unit
    }
    dir
  }

  /** Schema-directed CSV read of a staged table — [[graft.Tables.table]]
    * routes here when a dir carries `<name>.csv` instead of parquet.
    */
  def readCsv(s: SparkSession, dir: String, name: String): DataFrame = {
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$name.schema")), "UTF-8")
    s.read.schema(ddl).options(Opts).csv(s"$dir/$name.csv")
  }

  // ------------------------------------------------------ dirty ingest

  /** The number of malformed lines [[stageDirty]] injects — the audit
    * gate's expected reject count.
    */
  private[graft] val NCorrupt = 6

  /** Stage the sales tables as CSV, then CORRUPT the lineitem table with
    * [[NCorrupt]] deterministic malformed lines (wrong arity both ways,
    * unparseable number / timestamp / double) appended as an extra part
    * file. Real CSV ingestion means malformed rows; the clean gate only
    * proves the round trip. The lines are built FROM the staged schema so
    * each one is malformed in exactly one way and everything else parses.
    */
  def stageDirty(s: SparkSession, srcDir: String): String = {
    val clean = stage(s, srcDir)
    val dir = clean + "_dirty"
    val marker = new java.io.File(s"$dir/_STAGED")
    if (!marker.exists()) {
      StageCache.copyTree(clean, dir)
      val ddl = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$clean/lineitem.schema")), "UTF-8")
      val fields = ddl.split(",").map(_.trim.split("\\s+", 2))
      def cell(tp: String): String = tp match {
        case t if t.startsWith("TIMESTAMP") => "2020-01-01 00:00:00.000000"
        case "BIGINT" | "INT"               => "1"
        case "DOUBLE"                       => "1.0"
        case _                              => "zz"
      }
      val full = fields.map(f => cell(f(1)))
      val tsIdx = fields.indexWhere(_(1).startsWith("TIMESTAMP"))
      val numIdx = fields.indexWhere(f => f(1) == "BIGINT" || f(1) == "INT")
      val dblIdx = fields.indexWhere(_(1) == "DOUBLE")
      require(tsIdx >= 0 && numIdx >= 0 && dblIdx >= 0, "lineitem schema shape")
      val corrupt = Seq(
        "x",                                              // arity 1
        "1,2",                                            // arity short
        full.updated(numIdx, "notanumber").mkString(","), // bad integer
        full.updated(tsIdx, "never-oclock").mkString(","),// bad timestamp
        (full :+ "extra").mkString(","),                  // arity long
        full.updated(dblIdx, "12.5abc").mkString(","))    // bad double
      require(corrupt.size == NCorrupt)
      // header=true skips the FIRST line of every part file, so the
      // injected file leads with a dummy header line
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, "lineitem.csv", "zzz-corrupt.csv"),
        (fields.map(_(0)).mkString(",") +: corrupt).mkString("\n")
          .getBytes("UTF-8")): Unit
      marker.createNewFile(): Unit
    }
    dir
  }

  /** PERMISSIVE read of a (possibly corrupted) staged table: the staged
    * schema plus a `_corrupt` capture column — malformed lines land with
    * `_corrupt` = the raw line instead of killing the job or silently
    * passing as null-filled rows.
    */
  def readCsvDirty(s: SparkSession, dir: String, name: String): DataFrame = {
    val ddl = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/$name.schema")), "UTF-8")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      .add("_corrupt", org.apache.spark.sql.types.StringType)
    s.read.schema(schema).options(Opts)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(s"$dir/$name.csv")
  }

  /** The dirty-ingest fact gate: the full star build over the corrupted
    * staging, with survivors (`_corrupt IS NULL`) flowing into the fact
    * and rejects dropped. The oracle reads the ORIGINAL parquet, so a
    * hash match proves the PERMISSIVE read rejected EXACTLY the injected
    * lines — nothing real lost, nothing corrupt admitted.
    */
  def dirtyFatoQuery(s: SparkSession, d: String): DataFrame = {
    val dirty = stageDirty(s, d)
    // the barrier is CORRECTNESS, not tuning: CSV `_corrupt` is judged
    // against the scan's REQUIRED columns only (parser column pruning),
    // so a downstream plan that never reads l_shipdate would let the
    // bad-timestamp line through as a clean row. Materializing the
    // full-width survivor parse forces every column through the parser
    // BEFORE Catalyst prunes for the fact build. (Measured: without it,
    // 3 of the 6 injected lines survive into the fact.)
    val survivors = graft.Checkpoint.barrier(
      readCsvDirty(s, dirty, "lineitem")
        .filter(col("_corrupt").isNull).drop("_corrupt"))
    Star.fatoVendasFrom(s, dirty, graft.Tables.table(s, dirty, "orders"),
      survivors)
      .withColumn("valor_bruto", col("valor_bruto").cast("double"))
      .withColumn("valor_desconto", col("valor_desconto").cast("double"))
      .withColumn("valor_total", col("valor_total").cast("double"))
      .orderBy("id_pedido", "numero_linha", "sk_produto", "sk_vendedor",
        "qtd_vendida", "valor_bruto", "valor_desconto")
  }

  /** The reject-audit gate: corrupt vs surviving row counts from the
    * same PERMISSIVE read. The scan is cached first — Spark disallows a
    * raw-CSV query whose referenced columns are ONLY the corrupt-record
    * column (the documented cache-then-query workaround); at audit scale
    * the cache is O(table); a 100 TB ingest uses badRecordsPath instead
    * of an inline audit.
    */
  def dirtyAuditQuery(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dirty = stageDirty(s, d)
    val raw = readCsvDirty(s, dirty, "lineitem").cache()
    try {
      val corrupt = raw.filter(col("_corrupt").isNotNull).count()
      val good = raw.filter(col("_corrupt").isNull).count()
      Seq(("lineitem", corrupt, good))
        .toDF("tabela", "corrotas", "sobreviventes")
    } finally raw.unpersist(): Unit
  }
}
