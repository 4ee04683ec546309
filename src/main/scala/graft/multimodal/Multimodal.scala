package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery — schema, partition-sized batching, feature
  * vector shape, composition with the similarity operators — is real and
  * tested. The codec behind [[DecodeStub.decode]] really decodes IMAGES
  * (pure-JVM javax.imageio: PNG/JPEG/GIF/BMP); audio/video decode — which
  * has no pure-JVM codec in this container — falls back to a
  * deterministic stand-in so plumbing tests stay reproducible.
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
                             hash: String, width: Int, height: Int)
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Codec: IMAGE decode is REAL — pure-JVM `javax.imageio` (PNG/JPEG/
    * GIF/BMP ship with the JDK, no external deps), returning the actual
    * pixel dimensions. Payloads ImageIO does not recognize (this
    * container's text-derived fixtures; audio/video, which have no
    * pure-JVM codec) fall back to a deterministic stand-in derived from
    * the payload bytes, so plumbing tests stay reproducible. A production
    * build swaps the fallback for JNI audio/video codecs; the signature
    * and per-partition batching around it are unchanged either way.
    */
  object DecodeStub {
    def decode(payload: Array[Byte]): (Int, Int) = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: java.io.IOException => null }
      if (img != null) (img.getWidth, img.getHeight)
      else {
        // non-image payload: deterministic stand-in dimensions
        val h = java.util.Arrays.hashCode(payload)
        (math.abs(h % 1920) + 1, math.abs(h % 1080) + 1)
      }
    }

    /** Fake feature extractor: 16-dim pseudo-embedding from a rolling hash
      * over the payload — shaped exactly like a real vision-encoder output
      * so it composes with graft.sim.EmbeddingOps.
      */
    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val out = new Array[Float](dim)
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) {
        h = 31 * h + payload(i)
        out(i % dim) += (h % 1000) / 1000.0f
        i += 1
      }
      out
    }
  }

  /** Ingest: attach a binary payload column. (Here fabricated from text —
    * UTF-8 bytes — because the testdata has no real media; the column type
    * and downstream plumbing are exactly what real media would use.)
    */
  def ingestFromDocuments(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** Decode + metadata extraction, batched per partition: the codec is
    * invoked inside mapPartitions so per-batch setup cost (a real decoder
    * context) amortizes over the partition — the Scala analog of an
    * Arrow-batched pandas UDF.
    */
  def extractMeta(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition: real impl would open ONE codec context here
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val (w, hgt) = DecodeStub.decode(m.payload)
        md.reset()
        val hash = md.digest(m.payload).map("%02x".format(_)).mkString
        MediaMeta(m.media_id, m.kind, m.payload.length, hash, w, hgt)
      }
    }
  }

  /** Feature extraction → float vectors, ready for EmbeddingOps (ANN /
    * near-dup) downstream.
    */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map(m => MediaFeature(m.media_id, DecodeStub.features(m.payload, dim)))
    }
  }

  /** Frame sampling stub: every k-th fixed-size byte window of the payload
    * (a real impl samples decoded video frames; the exploded row shape —
    * one row per frame, media_id + frame_no + frame bytes — is the real
    * contract).
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 64, every: Int = 4): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, i) if i % every == 0 => (m.media_id, i, chunk)
      }
    }.toDF("media_id", "frame_no", "frame")
  }

  /** Oracle-checkable binary metadata query (the pure-SQL subset of the
    * plumbing: byte length, content hash, magic-prefix hex).
    */
  def metaQuery(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir).selectExpr(
      "CAST(doc_id AS BIGINT) AS media_id",
      "length(CAST(text AS BINARY)) AS n_bytes",
      "md5(CAST(text AS BINARY)) AS hash",
      // first 4 BYTES (8 hex chars of the whole payload) — substring on
      // the hex string, not the text: char-based slicing diverges from
      // byte slicing on multi-byte UTF-8
      "upper(substring(hex(CAST(text AS BINARY)), 1, 8)) AS magic")
      .orderBy("media_id")

  val oracle: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
md5(text) AS hash,
upper(substring(hex(encode(text)), 1, 8)) AS magic
FROM documents ORDER BY media_id""")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (metaQuery _))
}
