package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One multimodal record: media as an opaque binary column plus typed
  * metadata — the storage model for image/audio/video at 100 TB (payload
  * bytes stay columnar in parquet; partition by `media_type`/date, never
  * by content).
  */
final case class MediaRecord(
    media_id: Long,
    media_type: String,
    payload: Array[Byte],
    meta: Map[String, String])

/** Output of the (stubbed) decode/feature stage. */
final case class MediaFeatures(
    media_id: Long,
    media_type: String,
    byte_len: Int,
    sha_hex: String,
    width: Int,
    height: Int,
    feature: Array[Float])

/** Output of the REAL image-decode stage ([[Multimodal.decodeImages]]).
  * `channels` is the decoded raster's band count (1 = grayscale, 3 =
  * RGB, 4 = +alpha); `pix_sum` sums every sample of every band —
  * the cheap whole-image statistic an ingest pipeline uses for
  * corruption checks and dedup pre-hashing. `decoded=false` rows carry
  * the failure reason in `err` and zeros elsewhere (a 100 TB ingest
  * must quarantine undecodable payloads, not throw on them).
  */
final case class ImageDecoded(
    media_id: Long,
    decoded: Boolean,
    format: String,
    width: Int,
    height: Int,
    channels: Int,
    pix_sum: Long,
    err: String)

/** Multimodal-column plumbing (north-star EXT surface).
  *
  * Decode/feature-extract stages run as `Dataset.mapPartitions` — the
  * Scala analog of `mapInPandas`: per-partition batched processing with
  * a typed row contract. Image decode ([[decodeImages]]) and resize
  * ([[resizePooled]]) are REAL, built on the JDK's `javax.imageio`
  * (PNG/JPEG/BMP/GIF readers ship with the JVM — no added
  * dependencies); [[syntheticImages]] generates oracle-checkable PNG
  * fixtures whose decoded statistics any engine can compute without a
  * codec. Only video frame sampling remains a named stub
  * ([[frameSampleStub]] — the JDK has no video codec).
  */
object Multimodal {

  /** Build a binary media table from the `documents` testdata (UTF-8
    * payloads) so the pipeline is drivable without image files.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      lit("text/plain").as("media_type"),
      col("text").cast("binary").as("payload"),
      map(lit("lang"), col("lang"), lit("source"), col("source")).as("meta"))
      .as[MediaRecord]
  }

  /** Lightweight digest-based features over the raw payload (no codec):
    * byte length, SHA-256, and a tiny deterministic feature vector —
    * the pre-decode fingerprint stage of an ingest pipeline (exact-dup
    * detection before paying for a decode). Runs as mapPartitions with
    * per-partition digest reuse.
    */
  def payloadFeatures(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition setup (digests/codecs are expensive to init — do
      // it once per partition, not per record)
      val digest = MessageDigest.getInstance("SHA-256")
      it.map { r =>
        digest.reset()
        val sha = digest.digest(r.payload)
        val shaHex = sha.map(b => f"$b%02x").mkString
        val w = 1 + (java.lang.Byte.toUnsignedInt(sha(0)) % 64)
        val h = 1 + (java.lang.Byte.toUnsignedInt(sha(1)) % 64)
        val feat = (0 until 8)
          .map(i => java.lang.Byte.toUnsignedInt(sha(i)).toFloat / 255f)
          .toArray
        MediaFeatures(r.media_id, r.media_type, r.payload.length, shaHex, w, h, feat)
      }
    }
  }

  /** Deterministic PNG fixtures keyed by doc_id — the drivable stand-in
    * for an image corpus in this codec-less environment. Every pixel is
    * PURE ARITHMETIC in `doc_id`, so any engine can compute the expected
    * decoded statistics without a codec while WE go through a real PNG
    * encode (here) and a real decode ([[decodeImages]]):
    *
    *   - even doc_id: 16×8 grayscale, sample(i) = (doc_id·31 + i) mod 256
    *   - odd  doc_id:  8×8 RGB, r=(doc_id+i) g=(2·doc_id+i) b=(3·doc_id+i),
    *     each mod 256, i = y·w + x
    *
    * PNG is lossless, so the decoded samples equal the formula exactly —
    * which is what makes the decode stage oracle-checkable end-to-end.
    */
  def syntheticImages(docs: DataFrame): Dataset[MediaRecord] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // no executor tmp files
      it.map { id =>
        val img =
          if (id % 2 == 0) {
            val im = new java.awt.image.BufferedImage(
              16, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val ras = im.getRaster
            var i = 0
            while (i < 16 * 8) {
              ras.setSample(i % 16, i / 16, 0, ((id * 31 + i) % 256).toInt)
              i += 1
            }
            im
          } else {
            val im = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val ras = im.getRaster
            var i = 0
            while (i < 8 * 8) {
              ras.setSample(i % 8, i / 8, 0, ((id + i) % 256).toInt)
              ras.setSample(i % 8, i / 8, 1, ((id * 2 + i) % 256).toInt)
              ras.setSample(i % 8, i / 8, 2, ((id * 3 + i) % 256).toInt)
              i += 1
            }
            im
          }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        MediaRecord(id, "image/png", out.toByteArray,
          Map("synthetic" -> "true"))
      }
    }
  }

  /** REAL image decode via the JDK's ImageIO (PNG/JPEG/BMP/GIF — the
    * formats whose readers ship with the JVM, so this works offline with
    * zero added dependencies). Per-partition batched `mapPartitions` —
    * the exact seam a JNI codec (libjpeg-turbo, ffmpeg) would slot into.
    * Undecodable payloads become quarantine rows (`decoded=false` +
    * reason), never exceptions: at 100 TB some payloads WILL be corrupt
    * and one bad record must not kill a stage.
    */
  def decodeImages(records: Dataset[MediaRecord]): Dataset[ImageDecoded] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false) // in-memory streams only
      it.map { r =>
        try {
          val in = new java.io.ByteArrayInputStream(r.payload)
          val stream = javax.imageio.ImageIO.createImageInputStream(in)
          val readers = javax.imageio.ImageIO.getImageReaders(stream)
          if (!readers.hasNext)
            ImageDecoded(r.media_id, decoded = false, "", 0, 0, 0, 0L,
              "no ImageIO reader for payload")
          else {
            val reader = readers.next()
            try {
              reader.setInput(stream)
              val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
              val img = reader.read(0)
              val ras = img.getRaster
              val (w, h, bands) = (img.getWidth, img.getHeight, ras.getNumBands)
              var sum = 0L
              val row = new Array[Int](w * bands)
              var y = 0
              while (y < h) {
                ras.getPixels(0, y, w, 1, row)
                var i = 0
                while (i < row.length) { sum += row(i); i += 1 }
                y += 1
              }
              ImageDecoded(r.media_id, decoded = true, fmt, w, h, bands, sum, "")
            } finally reader.dispose()
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            ImageDecoded(r.media_id, decoded = false, "", 0, 0, 0, 0L,
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}")
        }
      }
    }
  }

  /** REAL resize by integer average-pooling: decode, floor-average each
    * `(sw/tw)×(sh/th)` block per band, re-encode as PNG. Target dims
    * must divide the source dims — pooling stays exact integer math
    * (deterministic across JVMs, replayable by any engine; a fractional
    * resampler's float rounding is not). Undecodable records pass
    * through unchanged with `resize_err` set in their metadata.
    */
  def resizePooled(records: Dataset[MediaRecord], tw: Int, th: Int): Dataset[MediaRecord] = {
    require(tw > 0 && th > 0, "target dims must be positive")
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { r =>
        try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null)
            r.copy(meta = r.meta + ("resize_err" -> "no ImageIO reader"))
          else if (img.getWidth % tw != 0 || img.getHeight % th != 0)
            r.copy(meta = r.meta + ("resize_err" ->
              s"${img.getWidth}x${img.getHeight} not divisible by ${tw}x$th"))
          else {
            val ras = img.getRaster
            val bands = ras.getNumBands
            val (bw, bh) = (img.getWidth / tw, img.getHeight / th)
            val outType =
              if (bands == 1) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
              else java.awt.image.BufferedImage.TYPE_3BYTE_BGR
            val out = new java.awt.image.BufferedImage(tw, th, outType)
            val ors = out.getRaster
            val outBands = ors.getNumBands
            var y = 0
            while (y < th) {
              var x = 0
              while (x < tw) {
                var b = 0
                while (b < outBands) {
                  var sum = 0L
                  var dy = 0
                  while (dy < bh) {
                    var dx = 0
                    while (dx < bw) {
                      sum += ras.getSample(x * bw + dx, y * bh + dy,
                        math.min(b, bands - 1))
                      dx += 1
                    }
                    dy += 1
                  }
                  ors.setSample(x, y, b, (sum / (bw * bh)).toInt)
                  b += 1
                }
                x += 1
              }
              y += 1
            }
            val buf = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", buf)
            r.copy(payload = buf.toByteArray,
              meta = r.meta ++ Map("width" -> tw.toString,
                "height" -> th.toString, "resized" -> "true"))
          }
        } catch {
          case scala.util.control.NonFatal(e) =>
            r.copy(meta = r.meta + ("resize_err" ->
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage)}"))
        }
      }
    }
  }

  /** STUB frame sampling (the one remaining named stub — the JDK ships
    * no video codec, so this cannot be made real offline): treat the
    * payload as a "video" of fixed-size frames and emit every
    * `stride`-th frame as its own record (id composed as
    * parent*1000+frame). A real ffmpeg-backed sampler slots into the
    * same mapPartitions + flatMap shape.
    */
  def frameSampleStub(
      records: Dataset[MediaRecord],
      frameBytes: Int,
      stride: Int): Dataset[MediaRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).map { f =>
          MediaRecord(
            r.media_id * 1000 + f,
            "frame/stub",
            r.payload.slice(f * frameBytes, (f + 1) * frameBytes),
            r.meta ++ Map("parent_id" -> r.media_id.toString, "frame" -> f.toString))
        }
      }
    }
  }

  /** Join text, embedding and (decoded) media modalities into one row per
    * document — the "multimodal projection" a training pipeline feeds to
    * tokenization. Equi-join on id; Catalyst broadcasts the small side.
    */
  def project(docs: DataFrame, embeddings: DataFrame): DataFrame =
    docs.join(
      embeddings,
      docs("doc_id") === embeddings("vec_id"),
      "inner")
      .select(
        col("doc_id"), col("lang"), col("source"), col("n_chars"),
        col("label"), size(col("embedding")).as("embedding_dim"))

  /** Oracle-checkable binary metadata: byte length + md5 of the payload
    * (the part of the decode stage expressible in any engine).
    */
  def binaryMeta(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      octet_length(col("text").cast("binary")).as("byte_len"),
      md5(col("text").cast("binary")).as("payload_md5"))
}
