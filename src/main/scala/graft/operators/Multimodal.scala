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
      .select(col("doc_id"), col("format"), col("width"), col("height"),
        col("n_bytes"), col("checksum"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal" -> (m01Multimodal _))

  val oracleSql: Map[String, String] = Map.empty
}
