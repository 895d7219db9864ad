package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded per-partition (SURVEY.md north star "multimodal
  * columns").
  *
  * In a real pipeline the payload column comes from
  * `spark.read.format("binaryFile")` (images/audio/video blobs) or a parquet
  * table with a binary column; here the documents table's text bytes stand
  * in as the payload so the plumbing — schema, typed Dataset hop,
  * mapPartitions batch shape — is real and oracle-checkable while the codec
  * is STUBBED (no image libs in this container).
  *
  * Scale notes: decode runs inside `mapPartitions`, so per-partition codec
  * initialization is amortized across the partition's rows (the pattern a
  * JNI decoder / model session needs); rows never leave their partition — no
  * shuffle. Output is a narrow typed row (id + dims + 8-byte fingerprint),
  * so a 100 TB media scan shuffles kilobytes per task downstream.
  */
object Binary {

  case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  case class Decoded(doc_id: Long, byte_len: Long, width: Long, height: Long, thumb_hash: String)

  /** Attach the opaque payload + media type (the binary-column schema). */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** STUB decode — deterministic fake standing in for a real image codec
    * (`???` replaced by md5-derived dimensions so tests and the DuckDB
    * oracle can verify the plumbing end-to-end). A real implementation
    * initializes the codec once per partition and decodes batch-wise,
    * exactly this shape.
    */
  def decodeStub(rows: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[Decoded] = {
    import spark.implicits._
    rows.mapPartitions { it =>
      // per-partition "codec" init (amortized, like a JNI decoder handle)
      val md = MessageDigest.getInstance("MD5")
      it.map { r =>
        md.reset()
        val hex = md.digest(r.payload).map("%02x".format(_)).mkString
        Decoded(
          r.doc_id,
          r.payload.length.toLong,
          64L + java.lang.Long.parseLong(hex.substring(0, 6), 16) % 448L,
          64L + java.lang.Long.parseLong(hex.substring(6, 12), 16) % 448L,
          hex.substring(0, 8))
      }
    }
  }

  /** End-to-end: documents → payload rows → decoded metadata. */
  def decodedMeta(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    implicit val s: SparkSession = spark
    decodeStub(attachPayload(docs).as[MediaRow]).toDF()
  }
}
