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

/** Multimodal-column plumbing (north-star EXT surface).
  *
  * The decode/feature-extract step runs as `Dataset.mapPartitions` — the
  * Scala analog of `mapInPandas`: per-partition batched processing with a
  * typed row contract, which is exactly where a JNI/native image decoder
  * would sit. The image/audio libraries are not in this environment, so
  * [[decodeStub]] is a clearly-marked deterministic fake; the Spark-side
  * plumbing (schema, encoders, partition-level batching, join to text/
  * embedding modalities) is real and tested.
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

  /** STUB decode: a real implementation would call an image/audio codec
    * here (per partition, reusing the decoder across the batch). This
    * fake derives deterministic pseudo-dimensions and a tiny feature
    * vector from the payload bytes so downstream plumbing is exercised
    * honestly.
    */
  def decodeStub(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      // per-partition setup (real codecs are expensive to init — do it
      // once per partition, not per record)
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

  /** STUB resize: a real implementation would decode, scale with a codec
    * and re-encode; the fake deterministically folds the payload into a
    * `w*h` byte grid so output shape/size semantics are honest. Runs as
    * mapPartitions — same plumbing a native resizer would use.
    */
  def resizeStub(records: Dataset[MediaRecord], w: Int, h: Int): Dataset[MediaRecord] = {
    val spark = records.sparkSession
    import spark.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val out = new Array[Byte](w * h)
        if (r.payload.nonEmpty) {
          var i = 0
          while (i < out.length) {
            out(i) = r.payload((i.toLong * r.payload.length / out.length).toInt)
            i += 1
          }
        }
        r.copy(payload = out,
          meta = r.meta ++ Map("width" -> w.toString, "height" -> h.toString,
            "resized" -> "true"))
      }
    }
  }

  /** STUB frame sampling: treat the payload as a "video" of fixed-size
    * frames and emit every `stride`-th frame as its own record (id
    * composed as parent*1000+frame). Real codecs slot into the same
    * mapPartitions + flatMap shape.
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
