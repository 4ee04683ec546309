package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise per partition.
  *
  * The Spark-side machinery — schema, partition-sized batching, feature
  * vector shape, composition with the similarity operators — is real and
  * tested. The codec behind [[DecodeStub.decode]] really decodes IMAGES
  * (pure-JVM javax.imageio: PNG/JPEG/GIF/BMP), [[DecodeStub.decodeAudio]]
  * really decodes AUDIO (pure-JVM javax.sound.sampled: WAV/AIFF/AU RIFF
  * parse + PCM samples), and [[DecodeStub.decodeVideoFrames]] really
  * decodes MULTI-FRAME motion payloads (pure-JVM javax.imageio animated
  * GIF — every frame's raster). H.264-class codecs have no pure-JVM
  * implementation; those payloads fall back to a deterministic stand-in
  * so plumbing tests stay reproducible (a production build swaps in a
  * JNI codec behind the same signature).
  */
object Multimodal {

  final case class Media(media_id: Long, kind: String, payload: Array[Byte])
  final case class MediaMeta(media_id: Long, kind: String, n_bytes: Int,
                             hash: String, width: Int, height: Int)
  final case class MediaFeature(media_id: Long, feature: Array[Float])

  /** Codec: IMAGE decode is REAL — pure-JVM `javax.imageio` (PNG/JPEG/
    * GIF/BMP ship with the JDK, no external deps), returning the actual
    * pixel dimensions. Payloads ImageIO does not recognize (this
    * container's text-derived fixtures; audio — see [[decodeAudio]] —
    * and video, which has no pure-JVM codec) fall back to a deterministic
    * stand-in derived from the payload bytes, so plumbing tests stay
    * reproducible. A production build swaps the video fallback for a JNI
    * codec; the signature and per-partition batching around it are
    * unchanged either way.
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

    /** Deterministic stand-in feature extractor: 16-dim pseudo-embedding,
      * shaped exactly like a real vision-encoder output so it composes
      * with graft.sim.EmbeddingOps. Each byte contributes a
      * position-weighted term `((i+1)·byte) mod 1009` to dimension
      * `i mod dim`; per-dim sums are reduced mod 1000003 so the value is
      * exact in FLOAT at any payload length. Every step is exact integer
      * arithmetic, reproducible in plain SQL — which is what lets the
      * multimodal→ANN composition be DuckDB-oracle-gated end-to-end
      * (q_multimodal_ann) instead of spec-only.
      */
    /** REAL multi-frame (video-class) decode — pure-JVM `javax.imageio`
      * GIF: parses the GIF89a container, returns EVERY frame's decoded
      * raster. Animated GIF is the one genuine multi-frame motion format
      * the JDK can both write and read losslessly (palette-indexed, so
      * ≤256-color content round-trips pixel-exact — probe-verified), which
      * is what lets the frame-sampling contract run over REALLY-decoded
      * video frames; H.264-class codecs remain the documented JNI stub.
      * Returns (width, height, frames as row-major 0-255 gray arrays);
      * None for payloads the GIF reader does not recognize.
      */
    def decodeVideoFrames(payload: Array[Byte])
        : Option[(Int, Int, IndexedSeq[Array[Int]])] =
      try {
        val r = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        r.setInput(javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload)))
        val n = r.getNumImages(true)
        if (n <= 0) None
        else {
          val imgs = (0 until n).map(r.read)
          val (w, h) = (imgs.head.getWidth, imgs.head.getHeight)
          Some((w, h, imgs.map { img =>
            val a = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                a(y * w + x) = img.getRGB(x, y) & 0xff
                x += 1
              }
              y += 1
            }
            a
          }))
        }
      } catch { case _: Exception => None }

    /** REAL audio decode — pure-JVM `javax.sound.sampled` (the WAV/AIFF/AU
      * readers ship with the JDK): parses the RIFF container, returns the
      * actual format (sample rate / channels / bits), frame count, and the
      * decoded PCM samples (signed 16-bit little-endian, the format the
      * synthetic ingest writes). Returns None for payloads the JDK's audio
      * system does not recognize — callers fall back to the deterministic
      * stand-in, exactly like the image path.
      */
    def decodeAudio(payload: Array[Byte])
        : Option[(Int, Int, Int, Long, Array[Int])] =
      try {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val f = ais.getFormat
        val nFrames = ais.getFrameLength
        val bytes = ais.readAllBytes()
        // sample extraction implemented for the PCM_SIGNED 16-bit LE mono
        // layout the ingest produces; other layouts still return format
        // metadata with an empty sample array
        val samples: Array[Int] =
          if (f.getSampleSizeInBits == 16 && f.getChannels == 1 &&
              !f.isBigEndian &&
              f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
            Array.tabulate(bytes.length / 2) { i =>
              ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            }
          else Array.empty[Int]
        Some((f.getSampleRate.toInt, f.getChannels, f.getSampleSizeInBits,
          nFrames, samples))
      } catch {
        case _: javax.sound.sampled.UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }

    def features(payload: Array[Byte], dim: Int = 16): Array[Float] = {
      val acc = new Array[Long](dim)
      var i = 0
      while (i < payload.length) {
        acc(i % dim) += ((i + 1).toLong * (payload(i) & 0xff)) % 1009
        i += 1
      }
      acc.map(a => (a % 1000003L).toFloat)
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

  /** Real-PNG ingest: one genuine PNG per document, synthesized
    * deterministically from doc_id — dimensions `w = 1 + (id·7) mod 48`,
    * `h = 1 + (id·13) mod 32`, gray pixel `g(x,y) = (id·31 + x·17 +
    * y·29) mod 256` packed as RGB `g·0x010101`. Because the payload is a
    * REAL encoder's output (`javax.imageio` PNG, lossless) while the
    * pixel content is pure arithmetic, the DuckDB oracle can predict the
    * DECODED result of every downstream codec step exactly — which is
    * what lets q_multimodal_decode_png / q_multimodal_resize_png put the
    * genuine decode path (not the byte-sampling fallback) under the same
    * hash discipline as everything else. Encode runs per partition,
    * mirroring the batching a real media ingest uses.
    */
  def ingestSyntheticPng(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = (1 + (id * 7) % 48).toInt
        val h = (1 + (id * 13) % 32).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((id * 31 + x * 17 + y * 29) % 256).toInt
            img.setRGB(x, y, g * 0x010101)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Media(id, "image", bos.toByteArray)
      }
    }
  }

  /** Real-WAV ingest: one genuine RIFF/WAVE file per document, synthesized
    * deterministically from doc_id — sample rate from {8000, 10000, 20000}
    * by `doc_id mod 3` (each divides 1 000 000, so duration_us stays exact
    * integer), `n = 50 + (id·11) mod 200` frames of signed 16-bit mono PCM
    * with `s(i) = (id·37 + i·1009) mod 65536 − 32768`. The container is a
    * REAL encoder's output (`javax.sound.sampled.AudioSystem.write`, the
    * JDK's WAVE writer) while the waveform is pure arithmetic, and WAV PCM
    * is lossless — so the DuckDB oracle predicts the DECODED result of
    * every downstream step exactly, the same construction that put the PNG
    * decode path under hash discipline.
    */
  def ingestSyntheticWav(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rate = (id % 3) match {
          case 0 => 8000; case 1 => 10000; case _ => 20000
        }
        val n = (50 + (id * 11) % 200).toInt
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = (((id * 37 + i.toLong * 1009) % 65536) - 32768).toInt
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(
          rate.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        Media(id, "audio", bos.toByteArray)
      }
    }
  }

  /** Real animated-GIF ingest: one genuine GIF89a per document,
    * synthesized deterministically from doc_id — `F = 2 + id mod 6`
    * frames of `w = 8 + (id·5) mod 24` × `h = 4 + (id·3) mod 16` 8-bit
    * gray, pixel `g(f,x,y) = (id·11 + f·7 + x·17 + y·29) mod 256`. The
    * container is a REAL encoder's output (`javax.imageio` GIF sequence
    * writer) and palette-indexed GIF is lossless for gray content, so the
    * oracle predicts every decoded frame exactly — the same construction
    * as the PNG and WAV gates, extended to the multi-frame (video)
    * contract.
    */
  def ingestSyntheticGif(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val frames = (2 + id % 6).toInt
        val w = (8 + (id * 5) % 24).toInt
        val h = (4 + (id * 3) % 16).toInt
        val wr = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        val bos = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
        wr.setOutput(ios)
        wr.prepareWriteSequence(null)
        // interlace OFF: the JDK GIF writer's interlaced (progressive)
        // encoding row-shuffles frames whose height has no full 8-row
        // pass (probe-measured on h=4: decoded rows came back permuted)
        val prm = wr.getDefaultWriteParam
        prm.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
        var f = 0
        while (f < frames) {
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.getRaster().setSample(x, y, 0,
                ((id * 11 + f * 7 + x * 17 + y * 29) % 256).toInt)
              x += 1
            }
            y += 1
          }
          wr.writeToSequence(new javax.imageio.IIOImage(img, null, null), prm)
          f += 1
        }
        wr.endWriteSequence()
        ios.close()
        Media(id, "video", bos.toByteArray)
      }
    }
  }

  /** Genuine multi-frame decode gate: container metadata + an
    * all-frames raster checksum from REAL GIF payloads through the REAL
    * multi-frame ImageIO decode. The magic pins genuine GIF89a bytes;
    * the checksum (position-weighted over every pixel of every frame,
    * mod 1000003) pins the full decoded frame stack.
    */
  def decodeGifQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // eager barrier (r21): the payload table feeds BOTH the decode branch
    // and the magic branch — unbarriered, the per-row codec ENCODE (the
    // dominant cost of this query) ran once per branch; the same
    // materialize-once discipline phashDedupQuery already applies
    val mediaDf = graft.Checkpoint.barrier(
      ingestSyntheticGif(graft.Tables.documents(spark, dir)).toDF())
    val media = mediaDf.as[Media]
    val meta = media.mapPartitions { it =>
      it.flatMap { m =>
        DecodeStub.decodeVideoFrames(m.payload).map { case (w, h, frames) =>
          var acc = 0L
          var f = 0
          while (f < frames.length) {
            val a = frames(f)
            var k = 0
            while (k < a.length) {
              acc = (acc + (f.toLong * w * h + k + 1) * a(k)) % 1000003L
              k += 1
            }
            f += 1
          }
          (m.media_id, frames.length, w, h, acc)
        }
      }
    }.toDF("media_id", "n_frames", "largura", "altura", "checksum")
    meta
      .join(mediaDf.select(col("media_id"),
        upper(substring(hex(col("payload")), 1, 12)).as("magic")),
        Seq("media_id"))
      .selectExpr("media_id", "CAST(n_frames AS INT) AS n_frames",
        "CAST(largura AS INT) AS largura", "CAST(altura AS INT) AS altura",
        "checksum", "magic")
      .orderBy("media_id")
  }

  /** The frame-sampling contract over REALLY-decoded video frames: every
    * 2nd frame of each GIF, one row per kept frame with its own raster
    * checksum — the real-codec upgrade of [[sampleFrames]]'s byte-window
    * stand-in.
    */
  def gifFrameSampleQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    ingestSyntheticGif(graft.Tables.documents(spark, dir))
      .mapPartitions { it =>
        it.flatMap { m =>
          DecodeStub.decodeVideoFrames(m.payload).toSeq.flatMap {
            case (w, h, frames) =>
              frames.zipWithIndex.collect { case (a, f) if f % 2 == 0 =>
                var acc = 0L
                var k = 0
                while (k < a.length) {
                  acc = (acc + (k + 1).toLong * a(k)) % 1000003L
                  k += 1
                }
                (m.media_id, f, w * h, acc)
              }
          }
        }
      }
      .toDF("media_id", "frame_no", "n_px", "checksum")
      .selectExpr("media_id", "CAST(frame_no AS INT) AS frame_no",
        "CAST(n_px AS INT) AS n_px", "checksum")
      .orderBy("media_id", "frame_no")
  }

  /** Position-weighted PCM checksum: `Σ (i+1)·(sᵢ+32768) mod 1000003`
    * over unsigned-shifted samples — exact integer arithmetic at any
    * length, SQL-reproducible, pins the ENTIRE decoded waveform (not
    * just its length) the way the PNG raster checksum pins pixels.
    */
  private def pcmChecksum(samples: Array[Int]): Long = {
    var acc = 0L
    var i = 0
    while (i < samples.length) {
      acc = (acc + (i + 1).toLong * (samples(i) + 32768)) % 1000003L
      i += 1
    }
    acc
  }

  /** Genuine audio-decode gate: format metadata + waveform checksum
    * extracted from REAL WAV payloads through the REAL
    * `javax.sound.sampled` parse. The magic column pins genuine RIFF
    * bytes were produced; rate/frames/checksum pin that the real decode
    * ran — the stand-in could not reproduce the oracle's arithmetic.
    */
  /** The decode applied to a relation of doc ids — ONE partition pass
    * (ingest → real decode → meta + container magic), no self-join, so
    * the identical kernel serves the batch gate and the streamed twin
    * (a stateless per-micro-batch map; a stream-stream join would need
    * watermarks for what a single pass computes for free).
    */
  def decodeWavRows(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    ingestSyntheticWav(docs).mapPartitions { it =>
      // per-partition: one decoder context amortized over the batch
      it.flatMap { m =>
        DecodeStub.decodeAudio(m.payload).map {
          case (rate, ch, bits, nFrames, samples) =>
            (m.media_id, rate, ch, bits, nFrames,
              nFrames * (1000000L / rate), pcmChecksum(samples),
              m.payload.take(4).map("%02X".format(_)).mkString)
        }
      }
    }.toDF("media_id", "sample_rate", "channels", "bits", "n_frames",
      "duration_us", "pcm_checksum", "magic")
  }

  def decodeWavQuery(spark: SparkSession, dir: String): DataFrame =
    decodeWavRows(graft.Tables.documents(spark, dir)).orderBy("media_id")

  /** Windowed-energy gate over the decoded PCM: non-overlapping 32-frame
    * windows, each emitting frame count, integer sum of |sᵢ|, and the
    * position-weighted checksum — the audio analog of the frame-sampling
    * contract (one row per window), over REALLY-decoded samples.
    */
  def wavWindowsQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val win = 32
    ingestSyntheticWav(graft.Tables.documents(spark, dir))
      .mapPartitions { it =>
        it.flatMap { m =>
          DecodeStub.decodeAudio(m.payload).toSeq.flatMap {
            case (_, _, _, _, samples) =>
              samples.grouped(win).zipWithIndex.map { case (w, k) =>
                (m.media_id, k, w.length,
                  w.map(s => math.abs(s).toLong).sum, pcmChecksum(w))
              }
          }
        }
      }
      .toDF("media_id", "window_no", "n_frames", "sum_abs", "checksum")
      .selectExpr("media_id", "CAST(window_no AS INT) AS window_no",
        "CAST(n_frames AS INT) AS n_frames", "sum_abs", "checksum")
      .orderBy("media_id", "window_no")
  }

  /** Genuine-decode gate: metadata extracted from REAL PNG payloads. The
    * magic column pins that real PNG bytes were produced (the 8-byte PNG
    * signature), width/height pin that the real ImageIO decode path ran —
    * the fallback's hash-derived stand-in dimensions could not match the
    * oracle's arithmetic.
    */
  def decodePngQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // eager barrier (r21): decode + magic branches share one encode pass
    val mediaDf = graft.Checkpoint.barrier(
      ingestSyntheticPng(graft.Tables.documents(spark, dir)).toDF())
    extractMeta(mediaDf.as[Media]).toDF()
      .join(mediaDf.select(col("media_id"),
        upper(substring(hex(col("payload")), 1, 16)).as("magic")), Seq("media_id"))
      .selectExpr("media_id", "CAST(width AS INT) AS largura",
        "CAST(height AS INT) AS altura", "magic")
      .orderBy("media_id")
  }

  /** Genuine-resize gate: nearest-neighbor thumbnails over the DECODED
    * raster of real PNGs — every sampled pixel and the checksum are
    * arithmetic in (doc_id, x, y), so the oracle re-derives the resample
    * exactly. PNG is lossless, so decode(encode(pixels)) == pixels and a
    * hash match proves the real resize path end to end.
    */
  def resizePngQuery(spark: SparkSession, dir: String): DataFrame =
    resizeThumbs(ingestSyntheticPng(graft.Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** Near-duplicate PNG corpus for the perceptual-hash dedup family:
    * groups of 4 variants share `gid = id/4` — same dimensions
    * (`w = 1 + (gid·7) mod 48`, `h = 1 + (gid·13) mod 32`) and the same
    * base pattern `(gid·31 + x·17 + y·29) mod 256` — but each variant
    * perturbs every pixel the 8×8 nearest-neighbor sampler does NOT
    * visit by `+v·53 mod 256` (byte-different payloads, perceptually
    * identical thumbnails — the re-encoded/lightly-edited-image case
    * pHash dedup exists for), and variant 3 additionally shifts sampled
    * pixels at `(x·7 + y·11) mod 5 = 0` by +128 (a deterministic small
    * nonzero Hamming distance, exercising the ≤T verify band). Real
    * `javax.imageio` PNG encode per partition, like every codec ingest.
    */
  def ingestSyntheticPngNear(docs: DataFrame): Dataset[Media] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val gid = id / 4
        val v = (id % 4).toInt
        val w = (1 + (gid * 7) % 48).toInt
        val h = (1 + (gid * 13) % 32).toInt
        val sampledX = (0 until 8).map(c => c * w / 8).toSet
        val sampledY = (0 until 8).map(r => r * h / 8).toSet
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = ((gid * 31 + x * 17 + y * 29) % 256).toInt
            val g =
              if (!(sampledX(x) && sampledY(y))) (base + v * 53) % 256
              else if (v == 3 && (x * 7 + y * 11) % 5 == 0) (base + 128) % 256
              else base
            img.setRGB(x, y, g * 0x010101)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Media(id, "image", bos.toByteArray)
      }
    }
  }

  /** The aHash kernel over the REALLY-decoded raster: 8×8 nearest-neighbor
    * sample (the exact-integer `getRGB(c·w/8, r·h/8)` resampler the resize
    * gate pinned), threshold each cell against the thumbnail sum
    * (`64·tₖ > Σt` — strict, exact integers, no division), and pack the 64
    * bits as FOUR 16-bit band values (k = 0..63 → band k/16, offset k mod
    * 16). The bands ARE the LSH scheme: Hamming-close hashes must agree on
    * ≥1 whole band (pigeonhole — ≤3 flipped bits cannot touch all 4), so
    * near-dup search is an equi-join on (band_no, band_val), never
    * all-pairs — and keeping 4×16 bits instead of one packed 64-bit word
    * sidesteps signed-overflow asymmetries between the engines. Returns
    * (media_id, largura, altura, b0..b3); payload column retained upstream.
    */
  def aHashBands(media: Dataset[Media]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
          catch { case _: java.io.IOException => null }
        Option(img).map { im =>
          val (w, h) = (im.getWidth, im.getHeight)
          val t = Array.tabulate(64)(k =>
            im.getRGB((k % 8) * w / 8, (k / 8) * h / 8) & 0xFF)
          val sum = t.foldLeft(0L)(_ + _)
          val bands = Array.fill(4)(0)
          var k = 0
          while (k < 64) {
            if (64L * t(k) > sum) bands(k / 16) |= 1 << (k % 16)
            k += 1
          }
          (m.media_id, w, h, bands(0), bands(1), bands(2), bands(3))
        }
      }
    }.toDF("media_id", "largura", "altura", "b0", "b1", "b2", "b3")
  }

  /** Shared by the batch phash gate and its streamed twin (stateless
    * per-row decode+hash ⇒ stream ≡ batch row-for-row, same oracle).
    */
  def phashRows(docs: DataFrame): DataFrame =
    aHashBands(ingestSyntheticPngNear(docs))

  /** Per-image perceptual-hash gate: genuine PNG payloads → real ImageIO
    * decode → aHash bands. The magic column pins real PNG bytes; the four
    * band values pin every one of the 64 threshold bits against the
    * oracle's arithmetic re-derivation.
    */
  def phashQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // eager barrier (r21): hash + magic branches share one encode pass
    val mediaDf = graft.Checkpoint.barrier(
      ingestSyntheticPngNear(graft.Tables.documents(spark, dir)).toDF())
    aHashBands(mediaDf.as[Media])
      .join(mediaDf.select(col("media_id"),
        upper(substring(hex(col("payload")), 1, 16)).as("magic")), Seq("media_id"))
      .selectExpr("media_id", "CAST(largura AS INT) AS largura",
        "CAST(altura AS INT) AS altura",
        "CAST(b0 AS INT) AS b0", "CAST(b1 AS INT) AS b1",
        "CAST(b2 AS INT) AS b2", "CAST(b3 AS INT) AS b3", "magic")
      .orderBy("media_id")
  }

  private val PHASH_HAMMING_T = 8

  /** Image near-dup dedup over really-decoded pixels — the multimodal
    * analog of the SimHash text family: aHash per image, candidates from
    * an equi-join on exact (band_no, band_val) matches (shuffle on the
    * band key — linear in matches, never all-pairs; the candidate set is
    * the LSH recall contract, shared verbatim by the oracle), then a
    * Hamming ≤ T verify over the four bands (`bit_count(a ^ b)` — native,
    * codegen'd). Flat/low-contrast images hash toward all-zero bands and
    * can inflate one bucket — the classic pHash caveat; at 100 TB that
    * bucket is the salting candidate, and the verify stays cheap because
    * it prices candidates, not the corpus.
    */
  def phashDedupQuery(spark: SparkSession, dir: String): DataFrame = {
    // eager barrier: the hash table (5 ints/image) is read by BOTH sides
    // of the candidate self-join and both wide rejoins — without it the
    // codec ingest (the dominant cost) re-evaluates per branch; with it
    // the corpus is decoded exactly once, which is how a deployment would
    // persist a phash index anyway
    val bands = graft.Checkpoint.barrier(
      phashRows(graft.Tables.documents(spark, dir))
        .select("media_id", "b0", "b1", "b2", "b3"))
    val exploded = bands.selectExpr("media_id",
      "stack(4, 0, b0, 1, b1, 2, b2, 3, b3) AS (band_no, band_val)")
    val cand = exploded.as("a").join(exploded.as("b"),
        col("a.band_no") === col("b.band_no") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("a_id"), col("b.media_id").as("b_id"))
      .distinct()
    cand
      .join(bands.toDF("a_id", "a0", "a1", "a2", "a3"), "a_id")
      .join(bands.toDF("b_id", "c0", "c1", "c2", "c3"), "b_id")
      .selectExpr("a_id", "b_id",
        """CAST(bit_count(a0 ^ c0) + bit_count(a1 ^ c1)
              + bit_count(a2 ^ c2) + bit_count(a3 ^ c3) AS INT) AS hamming""")
      .filter(col("hamming") <= PHASH_HAMMING_T)
      .orderBy("a_id", "b_id")
  }

  /** Image dedup CLUSTERS: connected components over the verified
    * perceptual-hash pairs, through the SAME size-routed machinery as the
    * text families ([[graft.text.TextOps.componentsOf]]: driver union-find
    * under the edge threshold, distributed path-halving label propagation
    * above it) — the image corpus's "which files are the same picture"
    * relation. Oracle: DuckDB RECURSIVE reachability closure over the
    * identically-derived pairs — a different algorithm that must agree.
    */
  def phashClustersQuery(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextOps.componentsOf(
        phashDedupQuery(spark, dir).select("a_id", "b_id"))
      .selectExpr("doc_id AS media_id", "cluster")
      .orderBy("media_id")

  /** END-TO-END image dedup: the surviving corpus after
    * keep-one-per-cluster — canonical (minimum-id) image per perceptual
    * cluster plus every unclustered singleton, with the number of
    * near-dups each survivor absorbed. Same scale shape as the text
    * canonical keep: one left-anti join against the (near-dup-density-
    * bounded) non-canonical set + one absorbed-count join; the corpus is
    * never shuffled on anything but its id.
    */
  def phashCanonicalQuery(spark: SparkSession, dir: String): DataFrame = {
    val clusters = graft.text.TextOps.componentsOf(
      phashDedupQuery(spark, dir).select("a_id", "b_id"))
    val docs = graft.Tables.documents(spark, dir)
      .selectExpr("CAST(doc_id AS BIGINT) AS media_id")
    val dropped = clusters.filter(col("doc_id") =!= col("cluster"))
    val absorbed = clusters.groupBy(col("cluster").as("media_id"))
      .agg((count(lit(1)) - 1).as("n_absorbed"))
    docs.join(dropped.select(col("doc_id").as("media_id")), Seq("media_id"), "left_anti")
      .join(absorbed, Seq("media_id"), "left")
      .na.fill(0, Seq("n_absorbed"))
      .orderBy("media_id")
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
  /** RESIZE: fixed-size nearest-neighbor thumbnails, batch-wise per
    * partition like every codec step. The image path is REAL — direct
    * pixel sampling `getRGB(c·w/tw, r·h/th)` on the decoded image, which
    * IS nearest-neighbor resize as exact integer math (no Graphics2D
    * rendering pipeline, whose interpolation could vary by JVM); the
    * non-image fallback nearest-neighbor-samples the payload BYTES at
    * positions ⌊k·n/(tw·th)⌋ — deterministic, and SQL-reproducible,
    * which is what lets the resize gate be DuckDB-oracled over the
    * text-derived fixtures while MultimodalSpec pins the real-image path
    * on a synthesized PNG. Thumbs travel as a joined string + integer
    * checksum (array cells round-trip differently through the two
    * pandas bridges).
    */
  def resizeThumbs(media: Dataset[Media], tw: Int = 8, th: Int = 8): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions(_.map { m =>
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(m.payload))
        catch { case _: java.io.IOException => null }
      val thumb: Array[Int] =
        if (img != null) {
          val (w, h) = (img.getWidth, img.getHeight)
          Array.tabulate(tw * th) { k =>
            img.getRGB((k % tw) * w / tw, (k / tw) * h / th) & 0xFFFFFF
          }
        } else {
          val n = m.payload.length
          Array.tabulate(tw * th)(k => m.payload(k * n / (tw * th)) & 0xff)
        }
      val checksum = thumb.zipWithIndex
        .foldLeft(0L) { case (acc, (p, k)) => (acc + (k + 1).toLong * p) % 1000003L }
      (m.media_id, tw, th, thumb.mkString("-"), checksum.toInt)
    }).toDF("media_id", "thumb_w", "thumb_h", "thumb", "checksum")
  }

  def resizeQuery(spark: SparkSession, dir: String): DataFrame =
    resizeThumbs(ingestFromDocuments(graft.Tables.documents(spark, dir)))
      .orderBy("media_id")

  /** The frame-sampling contract gated: one row per kept frame
    * (media_id, frame_no, bytes) — frames travel as hex so the compare
    * is byte-for-byte across both pandas bridges.
    */
  def framesQuery(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(ingestFromDocuments(graft.Tables.documents(spark, dir)))
      .selectExpr("media_id", "CAST(frame_no AS INT) AS frame_no",
        "CAST(length(frame) AS INT) AS n_bytes",
        "upper(hex(frame)) AS frame_hex")
      .orderBy("media_id", "frame_no")

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

  private val FEAT_DIM = 16
  private val N_QUERIES = 8 // media_id < 8, mirroring the embeddings convention
  private val TOP_K = 5

  /** The multimodal→ANN composition, oracle-gated end-to-end: ingest
    * binary payloads → [[extractFeatures]] (the per-partition-batched
    * codec stand-in, exact-integer 16-dim vectors) → brute-force cosine
    * top-k over the extracted features, ranked through the same bounded
    * [[graft.functions.TopKByScore]] aggregator tail as the embedding ANN
    * family (partial+final agg, O(k) state — no per-query window reducer).
    */
  def annQuery(spark: SparkSession, dir: String): DataFrame = {
    val media = ingestFromDocuments(graft.Tables.documents(spark, dir))
    val base = extractFeatures(media, FEAT_DIM).toDF("media_id", "feature")
    val q = base.filter(col("media_id") < N_QUERIES).toDF("query_id", "q_f")
    val sims = broadcast(q).crossJoin(base)
      .filter(col("query_id") =!= col("media_id"))
      .select(col("query_id"),
        graft.functions.GraftFunctions.cosine_sim(col("q_f"), col("feature"))
          .as("sim"),
        col("media_id"))
    graft.sim.EmbeddingOps.rankViaTopK(spark, sims)
  }

  /** Audio similarity search over REALLY-decoded PCM, end to end: WAV
    * decode ([[DecodeStub.decodeAudio]], the genuine javax.sound parse) →
    * an 8-dim exact-integer feature vector (dimension `j` accumulates
    * `(i+1)·suᵢ mod 1009` over samples with `i mod 8 = j`, reduced mod
    * 1000003 — the audio twin of [[DecodeStub.features]], exact in FLOAT
    * at any length) → brute-force cosine top-5 through the same bounded
    * [[graft.functions.TopKByScore]] aggregator tail as every ANN family.
    * Because WAV PCM is lossless and the waveform is arithmetic in
    * doc_id, the DuckDB oracle re-derives the vectors, the doubles, and
    * the ranking bit-exactly — a full codec→feature→ANN pipeline under
    * hash discipline.
    */
  def audioAnnQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = ingestSyntheticWav(graft.Tables.documents(spark, dir))
    val base = media.mapPartitions { it =>
      it.flatMap { m =>
        DecodeStub.decodeAudio(m.payload).map {
          case (_, _, _, _, samples) =>
            val acc = new Array[Long](FEAT_DIM_AUDIO)
            var i = 0
            while (i < samples.length) {
              acc(i % FEAT_DIM_AUDIO) +=
                ((i + 1).toLong * (samples(i) + 32768)) % 1009
              i += 1
            }
            (m.media_id, acc.map(a => (a % 1000003L).toFloat))
        }
      }
    }.toDF("media_id", "feature")
      // eager barrier (r21): the feature table is read by the query side
      // AND the corpus side of the crossJoin — unbarriered, the WAV
      // encode+decode+feature pass ran once per side
      .transform(graft.Checkpoint.barrier)
    val q = base.filter(col("media_id") < N_QUERIES).toDF("query_id", "q_f")
    val sims = broadcast(q).crossJoin(base)
      .filter(col("query_id") =!= col("media_id"))
      .select(col("query_id"),
        graft.functions.GraftFunctions.cosine_sim(col("q_f"), col("feature"))
          .as("sim"),
        col("media_id"))
    graft.sim.EmbeddingOps.rankViaTopK(spark, sims)
  }

  private val FEAT_DIM_AUDIO = 8

  /** DuckDB re-derivation of [[DecodeStub.features]] from the raw text
    * bytes: hex-parse each byte, position-weighted term mod 1009 into
    * dimension (i-1) mod 16, per-dim sum reduced mod 1000003 — all exact
    * integers, so the downstream double cosine is bit-identical.
    */
  private def featureCtes: String =
    s"""bytes AS (
  SELECT media_id, i,
         ('0x' || substring(h, 2 * i - 1, 2))::INTEGER AS b
  FROM (SELECT CAST(doc_id AS BIGINT) AS media_id, hex(encode(text)) AS h,
               unnest(generate_series(1, octet_length(encode(text)))) AS i
        FROM documents)
),
feats AS (
  SELECT media_id, (i - 1) % $FEAT_DIM AS dim,
         CAST(SUM((i * b) % 1009) % 1000003 AS DOUBLE) AS f
  FROM bytes GROUP BY media_id, (i - 1) % $FEAT_DIM
),
vecs AS (
  SELECT media_id, list(f ORDER BY dim) AS v FROM feats GROUP BY media_id
),
base AS (
  SELECT media_id, v,
         sqrt(${graft.text.TextExprs.dot("v", "v", FEAT_DIM).duck}) AS nrm
  FROM vecs
)"""

  /** The WAV decode oracle — shared verbatim by the batch gate and its
    * streamed twin (stateless decode: stream ≡ batch row-for-row).
    */
  private val DecodeWavOracle: String =
    """WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CASE CAST(doc_id % 3 AS INTEGER)
           WHEN 0 THEN 8000 WHEN 1 THEN 10000 ELSE 20000 END AS rate,
         CAST(50 + (doc_id * 11) % 200 AS BIGINT) AS n
  FROM documents),
s AS (
  SELECT media_id, i, (media_id * 37 + i * 1009) % 65536 AS su
  FROM p, unnest(generate_series(0, n - 1)) AS t(i)),
ck AS (
  SELECT media_id, CAST(SUM((i + 1) * su) % 1000003 AS BIGINT) AS pcm_checksum
  FROM s GROUP BY media_id)
SELECT p.media_id, CAST(rate AS INTEGER) AS sample_rate,
       1 AS channels, 16 AS bits, n AS n_frames,
       n * (1000000 // rate) AS duration_us,
       ck.pcm_checksum, '52494646' AS magic
FROM p JOIN ck ON p.media_id = ck.media_id ORDER BY p.media_id"""

  /** Shared aHash re-derivation: the near-dup corpus's sampled pixels,
    * thumbnail sum, and the 64 threshold bits — all exact integers, so
    * both phash oracles agree with the real decode bit-for-bit. Only the
    * 64 SAMPLED positions are derived (the unsampled ones exist solely to
    * make payloads differ), keeping the oracle O(64·N).
    */
  private def aHashCtes: String =
    """dims AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(doc_id AS BIGINT) // 4 AS gid,
         CAST(doc_id AS BIGINT) % 4 AS v,
         1 + ((CAST(doc_id AS BIGINT) // 4) * 7) % 48 AS w,
         1 + ((CAST(doc_id AS BIGINT) // 4) * 13) % 32 AS h
  FROM documents),
g AS (
  SELECT media_id, k,
         CASE WHEN v = 3 AND (sx * 7 + sy * 11) % 5 = 0
              THEN ((gid * 31 + sx * 17 + sy * 29) % 256 + 128) % 256
              ELSE (gid * 31 + sx * 17 + sy * 29) % 256 END AS t
  FROM (
    SELECT media_id, gid, v, k,
           ((k % 8) * w) // 8 AS sx, ((k // 8) * h) // 8 AS sy
    FROM dims, unnest(generate_series(0, CAST(63 AS BIGINT))) AS u(k))),
tot AS (SELECT media_id, SUM(t) AS s FROM g GROUP BY media_id),
bits AS MATERIALIZED (
  SELECT g.media_id, k,
         CASE WHEN 64 * t > s THEN 1 ELSE 0 END AS bit
  FROM g JOIN tot ON g.media_id = tot.media_id)"""

  /** [[aHashCtes]] extended through the verified near-dup pair set —
    * shared by the dedup, clusters, and canonical oracles so the pair
    * contract cannot drift between them.
    */
  private def phashPairCtes: String =
    s"""$aHashCtes,
bandsl AS MATERIALIZED (
  SELECT media_id, k // 16 AS band_no,
         CAST(SUM(bit * (1 << CAST(k % 16 AS INTEGER))) AS INTEGER) AS band_val
  FROM bits GROUP BY media_id, k // 16),
cand AS (
  SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id
  FROM bandsl a JOIN bandsl b
    ON a.band_no = b.band_no AND a.band_val = b.band_val
   AND a.media_id < b.media_id),
wide AS MATERIALIZED (
  SELECT media_id,
         MAX(CASE WHEN band_no = 0 THEN band_val END) AS b0,
         MAX(CASE WHEN band_no = 1 THEN band_val END) AS b1,
         MAX(CASE WHEN band_no = 2 THEN band_val END) AS b2,
         MAX(CASE WHEN band_no = 3 THEN band_val END) AS b3
  FROM bandsl GROUP BY media_id),
pares AS MATERIALIZED (
  SELECT * FROM (
    SELECT a_id, b_id,
           CAST(bit_count(xor(wa.b0, wb.b0)) + bit_count(xor(wa.b1, wb.b1))
              + bit_count(xor(wa.b2, wb.b2)) + bit_count(xor(wa.b3, wb.b3)) AS INTEGER) AS hamming
    FROM cand JOIN wide wa ON wa.media_id = a_id JOIN wide wb ON wb.media_id = b_id)
  WHERE hamming <= $PHASH_HAMMING_T)"""

  val oracle: Map[String, String] = Map(
    // the perceptual-hash family: decoded-raster aHash (4×16-bit bands)
    // re-derived arithmetically; the streamed twin answers the SAME
    // oracle (stateless per-row hash ⇒ stream ≡ batch)
    "q_multimodal_phash" ->
      s"""WITH $aHashCtes,
bands AS (
  SELECT media_id,
    CAST(SUM(CASE WHEN k // 16 = 0 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b0,
    CAST(SUM(CASE WHEN k // 16 = 1 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b1,
    CAST(SUM(CASE WHEN k // 16 = 2 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b2,
    CAST(SUM(CASE WHEN k // 16 = 3 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b3
  FROM bits GROUP BY media_id)
SELECT d.media_id, CAST(w AS INTEGER) AS largura, CAST(h AS INTEGER) AS altura,
       b0, b1, b2, b3, '89504E470D0A1A0A' AS magic
FROM bands JOIN dims d ON bands.media_id = d.media_id
ORDER BY d.media_id""",
    // the streamed twin ships the bands (the index-feed payload), no
    // magic column — otherwise the identical re-derivation
    "q_multimodal_phash_stream" ->
      s"""WITH $aHashCtes,
bands AS (
  SELECT media_id,
    CAST(SUM(CASE WHEN k // 16 = 0 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b0,
    CAST(SUM(CASE WHEN k // 16 = 1 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b1,
    CAST(SUM(CASE WHEN k // 16 = 2 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b2,
    CAST(SUM(CASE WHEN k // 16 = 3 THEN bit * (1 << CAST(k % 16 AS INTEGER)) ELSE 0 END) AS INTEGER) AS b3
  FROM bits GROUP BY media_id)
SELECT d.media_id, CAST(w AS INTEGER) AS largura, CAST(h AS INTEGER) AS altura,
       b0, b1, b2, b3
FROM bands JOIN dims d ON bands.media_id = d.media_id
ORDER BY d.media_id""",
    // candidates = exact (band_no, band_val) equi-join — the identical
    // LSH contract as the engine, in an independent engine — then the
    // Hamming ≤ T verify over xor'd bands
    "q_multimodal_phash_dedup" ->
      s"""WITH $phashPairCtes
SELECT a_id, b_id, hamming FROM pares ORDER BY a_id, b_id""",
    // connected components over the verified phash pairs via RECURSIVE
    // reachability closure + per-doc min — must agree with the engine's
    // union-find / label propagation
    "q_multimodal_phash_clusters" ->
      s"""WITH RECURSIVE $phashPairCtes,
edges AS (SELECT a_id AS a, b_id AS b FROM pares
          UNION ALL SELECT b_id, a_id FROM pares),
verts AS (SELECT DISTINCT a AS doc FROM edges),
reach(doc, r) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT reach.doc, e.b FROM reach JOIN edges e ON reach.r = e.a)
SELECT doc AS media_id, CAST(MIN(r) AS BIGINT) AS cluster
FROM reach GROUP BY doc ORDER BY media_id""",
    "q_multimodal_phash_canonical" ->
      s"""WITH RECURSIVE $phashPairCtes,
edges AS (SELECT a_id AS a, b_id AS b FROM pares
          UNION ALL SELECT b_id, a_id FROM pares),
verts AS (SELECT DISTINCT a AS doc FROM edges),
reach(doc, r) AS (
  SELECT doc, doc FROM verts
  UNION
  SELECT reach.doc, e.b FROM reach JOIN edges e ON reach.r = e.a),
labels AS (SELECT doc, MIN(r) AS cluster FROM reach GROUP BY doc)
SELECT CAST(d.doc_id AS BIGINT) AS media_id,
       CAST(coalesce(a.n_absorbed, 0) AS BIGINT) AS n_absorbed
FROM documents d
LEFT JOIN (SELECT cluster, COUNT(*) - 1 AS n_absorbed
           FROM labels GROUP BY cluster) a
  ON d.doc_id = a.cluster
WHERE d.doc_id NOT IN (SELECT doc FROM labels WHERE doc <> cluster)
ORDER BY media_id""",
    // the REAL-decode gates: the engine encodes + decodes genuine PNGs;
    // the oracle predicts the decoded result arithmetically (the pixel
    // field is a pure function of doc_id and PNG is lossless). A match
    // is only possible if the real ImageIO path ran — the non-image
    // fallback's hash dims / byte-sampled thumbs cannot reproduce it.
    "q_multimodal_decode_png" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
CAST(1 + (doc_id * 7) % 48 AS INTEGER) AS largura,
CAST(1 + (doc_id * 13) % 32 AS INTEGER) AS altura,
'89504E470D0A1A0A' AS magic
FROM documents ORDER BY media_id""",
    "q_multimodal_resize_png" ->
      """WITH dims AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(1 + (doc_id * 7) % 48 AS BIGINT) AS w,
         CAST(1 + (doc_id * 13) % 32 AS BIGINT) AS h
  FROM documents),
cells AS (
  SELECT media_id, k,
         ((media_id * 31 + ((k % 8) * w // 8) * 17
                         + ((k // 8) * h // 8) * 29) % 256) * 65793 AS val
  FROM dims, unnest(generate_series(0, CAST(63 AS BIGINT))) AS u(k))
SELECT media_id, 8 AS thumb_w, 8 AS thumb_h,
       string_agg(CAST(val AS VARCHAR), '-' ORDER BY k) AS thumb,
       CAST(SUM((k + 1) * val) % 1000003 AS INTEGER) AS checksum
FROM cells GROUP BY media_id ORDER BY media_id""",
    // the REAL audio-decode gates: the engine encodes + decodes genuine
    // RIFF/WAVE files; the oracle re-derives the decoded format and the
    // waveform arithmetically (the PCM field is a pure function of doc_id
    // and WAV is lossless). s(i) = (id·37 + i·1009) mod 65536 − 32768;
    // the checksum weights the UNSIGNED value s+32768 = that mod term.
    // the streamed twin answers the SAME oracle (stateless decode ⇒
    // stream ≡ batch row-for-row)
    "q_multimodal_decode_wav_stream" -> DecodeWavOracle,
    "q_multimodal_decode_wav" -> DecodeWavOracle,
    "q_multimodal_wav_windows" ->
      """WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(50 + (doc_id * 11) % 200 AS BIGINT) AS n
  FROM documents),
s AS (
  SELECT media_id, i // 32 AS window_no, i % 32 AS pos,
         (media_id * 37 + i * 1009) % 65536 AS su
  FROM p, unnest(generate_series(0, n - 1)) AS t(i))
SELECT media_id, CAST(window_no AS INTEGER) AS window_no,
       CAST(COUNT(*) AS INTEGER) AS n_frames,
       CAST(SUM(ABS(su - 32768)) AS BIGINT) AS sum_abs,
       CAST(SUM((pos + 1) * su) % 1000003 AS BIGINT) AS checksum
FROM s GROUP BY media_id, window_no ORDER BY media_id, window_no""",
    // the REAL multi-frame (video) decode gates: genuine GIF89a
    // containers, genuine multi-frame ImageIO decode; the oracle
    // re-derives every decoded pixel arithmetically (lossless palette
    // round-trip, probe-verified) — g(f,x,y) = (id·11+f·7+x·17+y·29)%256
    "q_multimodal_decode_gif" ->
      """WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(2 + doc_id % 6 AS BIGINT) AS nf,
         CAST(8 + (doc_id * 5) % 24 AS BIGINT) AS w,
         CAST(4 + (doc_id * 3) % 16 AS BIGINT) AS h
  FROM documents),
px AS (
  SELECT media_id, nf, w, h, f, k,
         (media_id * 11 + f * 7 + (k % w) * 17 + (k // w) * 29) % 256 AS g
  FROM p,
       unnest(generate_series(0, nf - 1)) AS tf(f),
       unnest(generate_series(0, w * h - 1)) AS tk(k))
SELECT media_id, CAST(nf AS INTEGER) AS n_frames,
       CAST(w AS INTEGER) AS largura, CAST(h AS INTEGER) AS altura,
       CAST(SUM((f * w * h + k + 1) * g) % 1000003 AS BIGINT) AS checksum,
       '474946383961' AS magic
FROM px GROUP BY media_id, nf, w, h ORDER BY media_id""",
    "q_multimodal_gif_frames" ->
      """WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(2 + doc_id % 6 AS BIGINT) AS nf,
         CAST(8 + (doc_id * 5) % 24 AS BIGINT) AS w,
         CAST(4 + (doc_id * 3) % 16 AS BIGINT) AS h
  FROM documents),
px AS (
  SELECT media_id, w, h, f, k,
         (media_id * 11 + f * 7 + (k % w) * 17 + (k // w) * 29) % 256 AS g
  FROM p,
       unnest(generate_series(0, nf - 1)) AS tf(f),
       unnest(generate_series(0, w * h - 1)) AS tk(k)
  WHERE f % 2 = 0)
SELECT media_id, CAST(f AS INTEGER) AS frame_no,
       CAST(w * h AS INTEGER) AS n_px,
       CAST(SUM((k + 1) * g) % 1000003 AS BIGINT) AS checksum
FROM px GROUP BY media_id, f, w, h ORDER BY media_id, frame_no""",
    // audio codec→feature→ANN, re-derived end to end: the decoded PCM is
    // arithmetic in doc_id (WAV is lossless), features are exact
    // integers, so the double cosine and the ranking are bit-identical
    "q_multimodal_audio_ann" ->
      s"""WITH p AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id,
         CAST(50 + (doc_id * 11) % 200 AS BIGINT) AS n
  FROM documents),
s AS (
  SELECT media_id, i, (media_id * 37 + i * 1009) % 65536 AS su
  FROM p, unnest(generate_series(0, n - 1)) AS t(i)),
feats AS (
  SELECT media_id, i % $FEAT_DIM_AUDIO AS dim,
         CAST(SUM(((i + 1) * su) % 1009) % 1000003 AS DOUBLE) AS f
  FROM s GROUP BY media_id, i % $FEAT_DIM_AUDIO),
vecs AS (
  SELECT media_id, list(f ORDER BY dim) AS v FROM feats GROUP BY media_id),
base AS (
  SELECT media_id, v,
         sqrt(${graft.text.TextExprs.dot("v", "v", FEAT_DIM_AUDIO).duck}) AS nrm
  FROM vecs),
sims AS (
  SELECT q.media_id AS query_id, c.media_id AS vizinho,
         ${graft.text.TextExprs.dot("q.v", "c.v", FEAT_DIM_AUDIO).duck} / (q.nrm * c.nrm) AS sim
  FROM base q CROSS JOIN base c
  WHERE q.media_id < $N_QUERIES AND q.media_id <> c.media_id)
SELECT query_id, vizinho, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vizinho) AS INTEGER) AS rank
  FROM sims)
WHERE rank <= $TOP_K ORDER BY query_id, rank""",
    "q_multimodal_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS media_id,
CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
md5(text) AS hash,
upper(substring(hex(encode(text)), 1, 8)) AS magic
FROM documents ORDER BY media_id""",
    "q_multimodal_ann" ->
      s"""WITH $featureCtes,
sims AS (
  SELECT q.media_id AS query_id, c.media_id AS vizinho,
         ${graft.text.TextExprs.dot("q.v", "c.v", FEAT_DIM).duck} / (q.nrm * c.nrm) AS sim
  FROM base q CROSS JOIN base c
  WHERE q.media_id < $N_QUERIES AND q.media_id <> c.media_id)
SELECT query_id, vizinho, sim, rank FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vizinho) AS INTEGER) AS rank
  FROM sims)
WHERE rank <= $TOP_K ORDER BY query_id, rank""",
    // the byte-window frame sample re-derived on the payload hex: frame
    // k covers hex chars [k·128+1, k·128+128], kept when k % 4 == 0
    "q_multimodal_frames" ->
      """WITH b AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents),
frames AS (
  -- n > 0 guard: DuckDB's // truncates toward zero, so an EMPTY
  -- payload would make (n-1)//64 = 0 and fabricate a phantom frame 0
  -- (Spark's grouped(64) on zero bytes emits nothing)
  SELECT media_id, CAST(k AS INTEGER) AS frame_no,
         substring(h, CAST(k * 128 + 1 AS INTEGER), 128) AS fh
  FROM b, unnest(generate_series(0, CAST((n - 1) // 64 AS BIGINT))) AS t(k)
  WHERE k % 4 = 0 AND n > 0)
SELECT media_id, frame_no, CAST(length(fh) // 2 AS INTEGER) AS n_bytes,
       upper(fh) AS frame_hex
FROM frames ORDER BY media_id, frame_no""",
    // the fixtures are text-derived (non-image), so every row takes the
    // byte-sampling fallback, which this SQL re-derives byte-for-byte
    "q_multimodal_resize" ->
      """WITH bytes AS (
  SELECT CAST(doc_id AS BIGINT) AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents),
thumbs AS (
  SELECT media_id,
         list_transform(range(0, 64), k ->
           ('0x' || substring(h, 2 * CAST(k * n // 64 AS INTEGER) + 1, 2))::INTEGER) AS t
  FROM bytes)
SELECT media_id, 8 AS thumb_w, 8 AS thumb_h,
       array_to_string(t, '-') AS thumb,
       CAST(list_sum(list_transform(range(1, 65), k -> (CAST(k AS BIGINT) * t[k]) % 1000003)) % 1000003 AS INTEGER) AS checksum
FROM thumbs ORDER BY media_id"""
)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta" -> (metaQuery _),
    "q_multimodal_ann" -> (annQuery _),
    // REAL codec path, oracle-gated: genuine PNG payloads, genuine
    // ImageIO decode — dims + signature / resampled raster + checksum
    "q_multimodal_decode_png" -> (decodePngQuery _),
    "q_multimodal_resize_png" -> (resizePngQuery _),
    // image near-dup dedup over really-decoded pixels: aHash bands per
    // image, LSH-banded candidate join, Hamming-verified pairs
    "q_multimodal_phash" -> (phashQuery _),
    "q_multimodal_phash_dedup" -> (phashDedupQuery _),
    "q_multimodal_phash_clusters" -> (phashClustersQuery _),
    "q_multimodal_phash_canonical" -> (phashCanonicalQuery _),
    // REAL audio path, oracle-gated: genuine RIFF/WAVE payloads, genuine
    // javax.sound.sampled decode — format + waveform checksum / windows
    "q_multimodal_decode_wav" -> (decodeWavQuery _),
    "q_multimodal_wav_windows" -> (wavWindowsQuery _),
    // REAL multi-frame (video) path, oracle-gated: genuine GIF89a
    // payloads, genuine multi-frame ImageIO decode — container meta +
    // full frame-stack checksum / every-2nd-frame sampling
    "q_multimodal_decode_gif" -> (decodeGifQuery _),
    "q_multimodal_gif_frames" -> (gifFrameSampleQuery _),
    // the full audio pipeline: real WAV decode → exact-integer features
    // → brute cosine top-k (the similarity-search composition)
    "q_multimodal_audio_ann" -> (audioAnnQuery _),
    // nearest-neighbor thumbnail resize (real pixels for images,
    // byte-sampled stand-in for non-image payloads)
    "q_multimodal_resize" -> (resizeQuery _),
    // every-4th 64-byte frame window, exploded one row per frame
    "q_multimodal_frames" -> (framesQuery _))
}

