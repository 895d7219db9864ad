package graft.multimodal

import java.io.ByteArrayInputStream
import java.security.MessageDigest

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded per-partition (SURVEY.md north star "multimodal
  * columns").
  *
  * In a real pipeline the payload column comes from
  * `spark.read.format("binaryFile")` (images/audio/video blobs) or a parquet
  * table with a binary column. The IMAGE path is fully real: committed
  * png/jpg/bmp payloads decoded with JDK-builtin `javax.imageio`
  * (`decodeImages`). The audio/video-shaped stages (`resizeStub`,
  * `frameSampleStub`) keep deterministic stand-in codecs (those libs aren't
  * in this container) over the same real plumbing shapes.
  *
  * Scale notes: decode runs inside `mapPartitions`, so per-partition codec
  * initialization is amortized across the partition's rows (the pattern a
  * JNI decoder / model session needs); rows never leave their partition — no
  * shuffle. Output is a narrow typed row (id + dims + 8-byte fingerprint),
  * so a 100 TB media scan shuffles kilobytes per task downstream.
  */
object Binary {

  /** Committed fixture of real encoded images (see tools.GenMediaFixture):
    * (doc_id, payload, exp_width, exp_height, exp_format, exp_pixsum) where
    * the exp_* columns were computed by ROUND-TRIPPING the committed bytes
    * through this same decoder at generation time — so the DuckDB oracle
    * reads expectations while Spark re-derives them from the pixels.
    */
  val MediaFixturePath = "/root/repo/fixtures/media_images.parquet"

  case class ImageRow(doc_id: Long, payload: Array[Byte])
  case class ImageMeta(
      doc_id: Long, byte_len: Long, width: Long, height: Long,
      format: String, pix_sum: Long)

  /** REAL image decode (JDK-builtin `javax.imageio`, zero new deps): true
    * width/height, the container format the reader sniffed from the magic
    * bytes, and a checksum over every decoded RGB sample — proof the pixels,
    * not just the header, were decoded.
    */
  def decodeImage(bytes: Array[Byte]): (Int, Int, String, Long) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader recognizes this payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val fmt = reader.getFormatName.toLowerCase
        val img = reader.read(0)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val rgb = img.getRGB(x, y)
            sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        (img.getWidth, img.getHeight, fmt, sum)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Distributed decode: binary column in, typed metadata out. Decode runs
    * inside `mapPartitions` (rows never leave their partition — no shuffle)
    * and the output is a narrow row, so a 100 TB media scan shuffles only
    * kilobytes per task downstream. ImageIO's reader registry lookup is the
    * per-partition "codec handle" being amortized.
    */
  def decodeImages(spark: SparkSession, media: DataFrame): Dataset[ImageMeta] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.map { r =>
        val (w, h, fmt, pix) = decodeImage(r.payload)
        ImageMeta(r.doc_id, r.payload.length.toLong, w.toLong, h.toLong, fmt, pix)
      }
    }
  }

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

  case class Resized(doc_id: Long, width: Long, height: Long, scale: Double)

  /** STUB resize: fit decoded dims into a `maxSide` bounding box preserving
    * aspect ratio — the arithmetic is real (what a thumbnailing stage
    * computes), only the pixel resampling is absent. Runs as a plain
    * projection over the decoded metadata: no data movement at all.
    */
  def resizeStub(decoded: Dataset[Decoded], maxSide: Long)(
      implicit spark: SparkSession): Dataset[Resized] = {
    import spark.implicits._
    decoded.map { d =>
      val longest = math.max(d.width, d.height)
      val scale = if (longest <= maxSide) 1.0 else maxSide.toDouble / longest
      Resized(
        d.doc_id,
        math.max(1L, math.round(d.width * scale)),
        math.max(1L, math.round(d.height * scale)),
        scale)
    }
  }

  case class Frame(doc_id: Long, frame_idx: Long, frame_hash: String)

  /** STUB frame sampling: treat the payload as a "video" of fixed-size
    * frames and emit every `stride`-th frame's offset + md5. The plumbing is
    * the real shape — one input row fans out to N frame rows inside the
    * partition (flatMap, no shuffle), exactly how a video decoder feeds
    * per-frame feature extraction downstream.
    */
  def frameSampleStub(rows: Dataset[MediaRow], frameBytes: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    require(frameBytes > 0 && stride > 0)
    rows.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val nFrames = r.payload.length / frameBytes
        (0 until nFrames by stride).iterator.map { i =>
          md.reset()
          val hex = md
            .digest(java.util.Arrays.copyOfRange(r.payload, i * frameBytes, (i + 1) * frameBytes))
            .map("%02x".format(_)).mkString
          Frame(r.doc_id, i.toLong, hex.substring(0, 8))
        }
      }
    }
  }
}
