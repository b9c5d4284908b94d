package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing — extension tier.
  *
  * Media (image/audio/video) is carried through the pipeline as an opaque
  * `binary` payload column plus a typed metadata struct; decode/feature
  * extraction runs per-partition over iterators so a real decoder slots
  * in without touching the plumbing. The decode step itself is a STUB
  * (this environment ships no image/audio libraries): a deterministic
  * fake that derives features from the bytes. Everything around it —
  * schema, encoders, partition-iterator batching, column pruning — is
  * real and tested.
  *
  * Scale posture: payloads stay distributed (never collected); decode is
  * `mapPartitions` so per-record library-init cost amortizes across a
  * partition (the same shape a Python pipeline gets from mapInPandas);
  * feature output is narrow so downstream shuffles don't carry bytes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, payload: Array[Byte],
                         width: Int, height: Int, format: String)

  case class MediaFeatures(doc_id: Long, n_bytes: Int, checksum: Long,
                           width: Int, height: Int, format: String,
                           frames_sampled: Int)

  /** Wrap a text table as fake media rows: payload = UTF-8 bytes of the
    * text (stands in for encoded image bytes), metadata derived
    * deterministically from the id. */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("doc_id") % 640 + 64).cast("int").as("width"),
      (col("doc_id") % 480 + 48).cast("int").as("height"),
      element_at(typedlit(Seq("jpeg", "png", "webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** STUB decoder: a real implementation would decode `payload` with an
    * imaging library here (one library init per partition, then stream
    * the iterator). The fake derives deterministic features: byte count,
    * additive checksum, and a frame-sample count = one "frame" per 64
    * payload bytes, capped at 8 — exercising exactly the batch shape and
    * signature a real decoder needs. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // (real pipeline: init decoder once per partition here)
      it.map { r =>
        var sum = 0L
        var i = 0
        while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, r.payload.length, sum, r.width, r.height,
          r.format, math.min(8, r.payload.length / 64))
      }
    }
  }

  /** End-to-end fake-media feature table (plumbing demo used by the
    * x_multimodal_features query and MultimodalSpec). */
  def features(spark: SparkSession, docs: DataFrame): DataFrame =
    decodeFeatures(spark, asMediaTable(docs)).toDF()

  /** STUB resize: a real implementation decodes `payload`, resamples to
    * (targetW, targetH) and re-encodes (library init once per partition,
    * stream the iterator). The fake preserves the real contract — output
    * metadata carries the target dims and payload size scales with the
    * pixel-count ratio (bytes cycled deterministically) — so swapping in
    * a real codec changes no schema, partitioning, or downstream code. */
  def resize(spark: SparkSession, media: DataFrame,
             targetW: Int, targetH: Int): DataFrame = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // (real pipeline: init codec once per partition here)
      it.map { r =>
        if (r.payload.isEmpty) r.copy(width = targetW, height = targetH)
        else {
          val ratio = (targetW.toLong * targetH).toDouble / (r.width.toLong * r.height)
          val tlen = math.max(1, math.ceil(r.payload.length * ratio).toInt)
          val out = new Array[Byte](tlen)
          var i = 0
          while (i < tlen) { out(i) = r.payload(i % r.payload.length); i += 1 }
          MediaRecord(r.doc_id, out, targetW, targetH, r.format)
        }
      }
    }.toDF()
  }

  // ------------------------------------------------------------------
  // REAL image path: javax.imageio (ships in the JDK, zero external
  // codecs). Images are generated deterministically — pixel (x,y) of
  // doc d is a pure integer function of (d, x, y) — then PNG-encoded
  // with ImageIO. Because PNG is lossless, `ImageIO.read` must return
  // exactly the generated pixels, so a SQL oracle can replay every
  // decoded statistic arithmetically without any image library: the
  // only way Spark matches the oracle hash is if the real encode →
  // decode roundtrip is bit-exact. Video remains a declared stub above
  // (the JDK ships no video codec); still, the strip sampler below
  // gives the same 1:N explode shape over REALLY-decoded pixel data.
  // ------------------------------------------------------------------

  /** PNG-encoded payload row. */
  case class ImageRow(doc_id: Long, payload: Array[Byte])

  /** Per-image decoded statistics (all oracle-replayable). */
  case class ImageStats(doc_id: Long, width: Int, height: Int,
                        sum_r: Long, sum_g: Long, sum_b: Long)

  /** Generator dims: small (8–31 × 8–23 px) so encode cost stays
    * per-row-trivial while still exercising non-square, per-doc-varying
    * shapes. */
  def genWidth(id: Long): Int = (id % 24 + 8).toInt
  def genHeight(id: Long): Int = (id % 16 + 8).toInt
  /** Deterministic channel values; mirrored verbatim in the oracle SQL. */
  @inline def pixR(id: Long, x: Int, y: Int): Int = ((id * 31 + x * 7 + y * 13) % 256).toInt
  @inline def pixG(id: Long, x: Int, y: Int): Int = ((id * 17 + x * 11 + y * 5) % 256).toInt
  @inline def pixB(id: Long, x: Int, y: Int): Int = ((id * 23 + x * 3 + y * 19) % 256).toInt

  private def encodePng(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(1024)
    if (!javax.imageio.ImageIO.write(img, "png", bos))
      throw new IllegalStateException("no PNG writer available in this JRE")
    bos.toByteArray
  }

  /** Distributed PNG corpus: one real ImageIO-encoded image per doc_id.
    * Payloads are generated inside the partition (never collected). */
  def pngMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache per image
      it.map { id =>
        val w = genWidth(id); val h = genHeight(id)
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              (pixR(id, x, y) << 16) | (pixG(id, x, y) << 8) | pixB(id, x, y))
            x += 1
          }
          y += 1
        }
        ImageRow(id, encodePng(img))
      }
    }.toDF()
  }

  /** REAL decoder: `ImageIO.read` over the PNG payload, per-channel
    * pixel sums. One `setUseCache(false)` init per partition, then the
    * iterator streams — the exact batch shape the stub documented. */
  def decodePng(spark: SparkSession, media: DataFrame): Dataset[ImageStats] = {
    import spark.implicits._
    media.as[ImageRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        if (img == null)
          throw new IllegalStateException(s"undecodable payload for doc ${r.doc_id}")
        val w = img.getWidth; val h = img.getHeight
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        ImageStats(r.doc_id, w, h, sr, sg, sb)
      }
    }
  }

  /** REAL resize: decode PNG, nearest-neighbor resample to
    * (max(1,w/2), max(1,h/2)), re-encode PNG. The resample is an
    * explicit source-index loop (`src = dst * srcDim / dstDim`, integer
    * floor) rather than Graphics2D so the pixel mapping is exactly
    * reproducible by integer SQL — Java2D's filtering pipeline is not
    * contractually deterministic across JVMs. */
  def resizePngHalf(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    media.as[ImageRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        if (src == null)
          throw new IllegalStateException(s"undecodable payload for doc ${r.doc_id}")
        val w = src.getWidth; val h = src.getHeight
        val w2 = math.max(1, w / 2); val h2 = math.max(1, h / 2)
        val dst = new java.awt.image.BufferedImage(
          w2, h2, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y2 = 0
        while (y2 < h2) {
          val sy = y2 * h / h2
          var x2 = 0
          while (x2 < w2) {
            dst.setRGB(x2, y2, src.getRGB(x2 * w / w2, sy))
            x2 += 1
          }
          y2 += 1
        }
        ImageRow(r.doc_id, encodePng(dst))
      }
    }.toDF()
  }

  case class Strip(doc_id: Long, strip_idx: Int, strip_sum: Long)

  /** Strip sampler over REALLY-decoded pixels: split each decoded image
    * into horizontal strips of `stripH` rows, emit every `everyK`-th
    * strip as its own row with the strip's (r+g+b) pixel sum — the 1:N
    * explode a frame-sampling video pipeline produces, but backed by an
    * actual ImageIO decode. Trailing partial strips are dropped (the
    * undecodable-tail contract). */
  def stripSample(spark: SparkSession, media: DataFrame,
                  stripH: Int = 4, everyK: Int = 2): Dataset[Strip] = {
    require(stripH > 0 && everyK > 0, "stripH and everyK must be positive")
    import spark.implicits._
    media.as[ImageRow].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { r =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
        if (img == null)
          throw new IllegalStateException(s"undecodable payload for doc ${r.doc_id}")
        val w = img.getWidth
        val nStrips = img.getHeight / stripH
        (0 until nStrips by everyK).iterator.map { s =>
          var sum = 0L
          var y = s * stripH
          val end = y + stripH
          while (y < end) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          Strip(r.doc_id, s, sum)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // REAL audio path: javax.sound.sampled (JDK-built-in WAV codec, no
  // external libraries, works headless — file-format conversion never
  // touches a sound device). Same proof shape as the PNG path: samples
  // are a pure integer function of (doc_id, i), the WAV container is
  // lossless 16-bit PCM, so `AudioSystem.getAudioInputStream` must
  // return exactly the generated samples and a SQL oracle replays every
  // decoded statistic arithmetically.
  // ------------------------------------------------------------------

  /** Per-doc sample count (100–499) and deterministic 16-bit sample
    * values; mirrored verbatim in the oracle SQL. */
  def genSamples(id: Long): Int = (id % 400 + 100).toInt
  @inline def sampleAt(id: Long, i: Int): Int =
    (((id * 7919L + i * 2654435761L) % 65536L) - 32768L).toInt

  private val WavRate = 8000f
  private def pcmFormat = new javax.sound.sampled.AudioFormat(
    WavRate, 16, 1, true, false) // 16-bit signed mono little-endian

  /** The JDK WAV codec, loaded ONCE per partition through the public
    * `javax.sound.sampled.spi` ServiceLoader interface. Calling the
    * `AudioSystem` facade per row instead re-runs its synchronized
    * provider lookup on EVERY call — measured on this host: 0.11 ms
    * per clip with ZERO thread scaling (32 threads as slow as 1; the
    * 100× scale step caught it as a 311× super-linear ratio), vs
    * 8 µs/clip and linear scaling with the provider cached. Same
    * provider AudioSystem would select; only the lookup is hoisted. */
  private def wavReaderSpi(): javax.sound.sampled.spi.AudioFileReader = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .asScala.find(_.getClass.getName.toLowerCase.contains("wave"))
      .getOrElse(throw new IllegalStateException("no WAV reader SPI in this JRE"))
  }
  private def wavWriterSpi(): javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(throw new IllegalStateException("no WAV writer SPI in this JRE"))
  }

  /** Distributed WAV corpus: one real JDK-codec-encoded clip per
    * doc_id (payloads generated inside the partition, never
    * collected). */
  def wavMediaTable(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      val writer = wavWriterSpi() // codec init once per partition
      it.map { id =>
        val n = genSamples(id)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = sampleAt(id, i)
          pcm(2 * i) = (s & 0xff).toByte        // little-endian lo
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), pcmFormat, n.toLong)
        val bos = new java.io.ByteArrayOutputStream(n * 2 + 64)
        writer.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        ImageRow(id, bos.toByteArray) // same (doc_id, payload) shape
      }
    }.toDF()
  }

  /** Per-clip decoded statistics (all oracle-replayable). */
  case class AudioStats(doc_id: Long, n_samples: Long, sum_amp: Long,
                        sum_abs_amp: Long, peak: Long)

  /** REAL decoder: `AudioSystem.getAudioInputStream` over the WAV
    * payload, 16-bit little-endian PCM reassembled to integer samples,
    * reduced to amplitude statistics. */
  def decodeWav(spark: SparkSession, media: DataFrame): Dataset[AudioStats] = {
    import spark.implicits._
    media.as[ImageRow].mapPartitions { it =>
      val reader = wavReaderSpi() // codec init once per partition
      it.map { r =>
        val ais = reader.getAudioInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian || f.getChannels != 1)
          throw new IllegalStateException(
            s"unexpected decoded format $f for doc ${r.doc_id}")
        val bytes = ais.readAllBytes()
        val n = bytes.length / 2
        var sum = 0L; var sumAbs = 0L; var peak = 0L
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
          sum += s; val a = math.abs(s.toLong)
          sumAbs += a; if (a > peak) peak = a
          i += 1
        }
        AudioStats(r.doc_id, n.toLong, sum, sumAbs, peak)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame_checksum: Long)

  /** STUB frame sampler (video path): emit every `everyK`-th fixed-size
    * "frame" of the payload as its own row — the 1:N explode shape a real
    * video pipeline produces (decode container → sample frames → one
    * feature row per sampled frame). Checksums stand in for per-frame
    * features; trailing partial frames are dropped, as a real sampler
    * drops undecodable tails. */
  def frameSample(spark: SparkSession, media: DataFrame,
                  frameBytes: Int = 64, everyK: Int = 2): Dataset[Frame] = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by everyK).iterator.map { f =>
          var sum = 0L
          var i = f * frameBytes
          val end = i + frameBytes
          while (i < end) { sum += (r.payload(i) & 0xff); i += 1 }
          Frame(r.doc_id, f, sum)
        }
      }
    }
  }
}
