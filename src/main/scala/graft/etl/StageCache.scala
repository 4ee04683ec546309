package graft.etl

/** Shared content-fingerprinted staging-cache device for the ingest
  * stages ([[CsvStage]], [[JsonlStage]], [[EvolveStage]]): a staging is
  * keyed by the source parquet files' (name, size, mtime) plus a
  * format-options salt, so regenerated testdata at the same path, or a
  * change to the wire format, lands in a fresh dir instead of silently
  * reusing a stale one — while repeat gate/bench invocations pay the
  * conversion once.
  */
private[etl] object StageCache {

  /** Resolve the cache dir for (`srcDir`, `salt`) under `prefix`, and
    * its `_STAGED` marker. The caller stages iff the marker is absent
    * and creates it when done.
    */
  def resolve(srcDir: String, salt: String,
              prefix: String): (String, java.io.File) = {
    val src = new java.io.File(srcDir)
    val fingerprint = Option(src.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|") +
      "||" + salt
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$srcDir#$fingerprint".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val dir = s"${System.getProperty("java.io.tmpdir")}/${prefix}_$h"
    (dir, new java.io.File(s"$dir/_STAGED"))
  }
}
