package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 scale ops): media treated
  * as opaque `binary` payloads with a typed metadata struct, processed
  * in partition-sized batches.
  *
  * The Spark-side mechanics are real — binary column, metadata schema,
  * typed Dataset, `mapPartitions` batch shape (the Scala analog of
  * mapInPandas batch processing: one iterator per partition, so a real
  * decoder would amortize model/codec init across the partition). The
  * decode itself is a clearly marked deterministic STUB — the image /
  * audio codecs are not in this environment.
  */
object Multimodal {

  /** Typed row after "decoding": metadata + extracted features. */
  case class MediaFeature(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    n_bytes: Int,
    feature: Array[Float],
    checksum: Long)

  /** STUB decoder: stands in for an image/audio decode + feature
    * extraction. Deterministic in the payload bytes so results are
    * reproducible; the real implementation would decode `bytes`
    * according to `format` and run feature extraction here. */
  private def stubDecode(bytes: Array[Byte], nFeatures: Int): (Array[Float], Long) = {
    var h = 0xcbf29ce484222325L // FNV-1a 64
    val feat = new Array[Float](nFeatures)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
      feat(i % nFeatures) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    (feat, h)
  }

  /** m01: documents → synthetic media payloads (binary column +
    * metadata struct) → per-partition batch "decode" → typed feature
    * rows. The payload here is the UTF-8 text standing in for media
    * bytes; metadata is derived deterministically. */
  def m01Multimodal(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      // metadata struct a real ingest would carry alongside the bytes
      when(pmod(col("doc_id"), lit(3)) === 0, "png")
        .when(pmod(col("doc_id"), lit(3)) === 1, "jpeg")
        .otherwise("wav").as("format"),
      (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
      (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"))

    val ds = media.as[(Long, Array[Byte], String, Int, Int)]
    ds.mapPartitions { it =>
      // partition = batch: real decoder/codec state would init once here
      it.map { case (id, bytes, fmt, w, h) =>
        val (feat, sum) = stubDecode(bytes, 8)
        MediaFeature(id, fmt, w, h, bytes.length, feat, sum)
      }
    }.toDF()
      // the extracted feature IS the point of the decode — emit it
      // (mapPartitions is opaque to Catalyst, so a dropped column
      // would still have been computed, as pure waste)
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_bytes"),
        round(element_at(col("feature"), 1).cast("double"), 5).as("f0"),
        round(element_at(col("feature"), 8).cast("double"), 5).as("f7"),
        col("checksum"))
      .orderBy("doc_id")
  }

  /** Typed row after a "resize": new dims + transformed payload size. */
  case class ResizedMedia(doc_id: Long, width: Int, height: Int,
    out_width: Int, out_height: Int, n_bytes_out: Int)

  /** m02: batch resize plumbing — fixed target box, aspect preserved.
    * The arithmetic (real) runs per-row in a partition batch; the
    * pixel resample itself is the stubbed step (payload size scales by
    * area ratio as a stand-in). */
  def m02Resize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val (tw, th) = (32, 32)
    Tables.documents(s, d).select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        (pmod(col("doc_id"), lit(64)) + 16).cast("int").as("width"),
        (pmod(col("doc_id"), lit(48)) + 16).cast("int").as("height"))
      .as[(Long, Array[Byte], Int, Int)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h) =>
          val scale = math.min(tw.toDouble / w, th.toDouble / h)
          val (ow, oh) = (math.max(1, (w * scale).toInt), math.max(1, (h * scale).toInt))
          // STUB: real implementation resamples pixels; size scales by area
          val outBytes = math.max(1, (bytes.length * (ow.toLong * oh) / (w.toLong * h)).toInt)
          ResizedMedia(id, w, h, ow, oh, outBytes)
        }
      }.toDF().orderBy("doc_id")
  }

  /** m03: frame sampling — every `stride`-th fixed-size block of the
    * payload treated as a frame, per-frame checksum emitted (one row
    * per sampled frame: the explode shape a video pipeline produces). */
  def m03FrameSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val frameLen = 64
    val stride = 4
    Tables.documents(s, d).select(
        col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = bytes.length / frameLen
        (0 until nFrames by stride).map { f =>
          var h = 0xcbf29ce484222325L
          var i = f * frameLen
          while (i < (f + 1) * frameLen) {
            h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L
            i += 1
          }
          (id, f, h)
        }
      }.toDF("doc_id", "frame_idx", "frame_checksum")
      .orderBy("doc_id", "frame_idx")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal"   -> (m01Multimodal _),
    "m02_resize"       -> (m02Resize _),
    "m03_frame_sample" -> (m03FrameSample _))

  /** m02's geometry is pure arithmetic over (doc_id, payload length) —
    * double division, truncating casts, integer division — so DuckDB
    * reproduces it bit-for-bit (FLOOR, not CAST-to-INT: DuckDB's int
    * cast rounds, Scala's toInt truncates). m01/m03 stay rows-only
    * (FNV checksums are engine-specific). */
  val oracleSql: Map[String, String] = Map(
    "m02_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(doc_id % 64 + 16 AS INT) AS width,
        |         CAST(doc_id % 48 + 16 AS INT) AS height,
        |         octet_length(encode(text)) AS nb
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, width, height, nb,
        |         LEAST(32.0 / width, 32.0 / height) AS scale
        |  FROM m
        |), o AS (
        |  SELECT doc_id, width, height, nb,
        |         CAST(GREATEST(1, CAST(FLOOR(width * scale) AS INT)) AS INT) AS out_width,
        |         CAST(GREATEST(1, CAST(FLOOR(height * scale) AS INT)) AS INT) AS out_height
        |  FROM s
        |)
        |SELECT doc_id, width, height, out_width, out_height,
        |       CAST(GREATEST(1, nb * (out_width::BIGINT * out_height)
        |                        // (width::BIGINT * height)) AS INT) AS n_bytes_out
        |FROM o ORDER BY doc_id""".stripMargin)
}
