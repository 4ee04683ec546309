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

  /** Copy a staged tree (part files + schema sidecars), skipping the
    * `_`-prefixed markers/SUCCESS files — the dirty stagers clone the
    * clean staging before injecting their malformed shard.
    */
  def copyTree(from: String, to: String): Unit = {
    val src = java.nio.file.Paths.get(from)
    val dst = java.nio.file.Paths.get(to)
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(src).iterator().asScala
      .filter(p => !p.getFileName.toString.startsWith("_"))
      .foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else {
          java.nio.file.Files.createDirectories(t.getParent)
          java.nio.file.Files.copy(p, t,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }: Unit
  }

  /** Resolve the cache dir for (`srcDir`, `salt`) under `prefix`, and
    * its `_STAGED` marker. The caller stages iff the marker is absent
    * and creates it when done.
    *
    * The fingerprint walks the WHOLE source tree and hashes every data
    * file's (relative path, size, mtime) — directory-shaped tables
    * (Spark-written datasets) and CSV-routed sources fingerprint their
    * actual content files, not a weak top-level dir entry, so
    * regenerated testdata can never silently reuse a stale staging.
    */
  def resolve(srcDir: String, salt: String,
              prefix: String): (String, java.io.File) = {
    val root = java.nio.file.Paths.get(srcDir)
    import scala.jdk.CollectionConverters._
    // the walk stream is closed (Files.walk javadoc requires it), its
    // contents snapshotted before any stat call, and a file deleted by a
    // concurrent process between the walk and the stat reads as 0:0 —
    // the same don't-throw contract File.length/lastModified gave the
    // pre-tree-walk fingerprint (a changed fingerprint re-stages, which
    // is exactly the safe outcome for a source mutating underfoot)
    val files =
      if (java.nio.file.Files.exists(root)) {
        val w = java.nio.file.Files.walk(root)
        try w.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_)).toVector
        finally w.close()
      } else Vector.empty
    def statOr0(f: java.nio.file.Path => Long, p: java.nio.file.Path): Long =
      try f(p) catch { case _: java.io.IOException => 0L }
    val fingerprint = files
      .map(p => (root.relativize(p).toString, p))
      .sortBy(_._1)
      .map { case (rel, p) =>
        s"$rel:${statOr0(java.nio.file.Files.size, p)}:" +
          s"${statOr0(java.nio.file.Files.getLastModifiedTime(_).toMillis, p)}"
      }.mkString("|") +
      "||" + salt
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$srcDir#$fingerprint".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(12)
    val dir = s"${System.getProperty("java.io.tmpdir")}/${prefix}_$h"
    (dir, new java.io.File(s"$dir/_STAGED"))
  }
}
