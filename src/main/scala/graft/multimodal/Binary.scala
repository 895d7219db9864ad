package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with typed
  * metadata, decoded per-partition (SURVEY.md north star "multimodal
  * columns").
  *
  * In a real pipeline the payload column comes from
  * `spark.read.format("binaryFile")` (images/audio/video blobs) or a parquet
  * table with a binary column. The IMAGE path is fully real (committed
  * png/jpg/bmp decoded with JDK-builtin `javax.imageio`, `decodeImages`)
  * and so is the AUDIO path (committed RIFF/WAVE decoded with JDK-builtin
  * `javax.sound.sampled`, `decodeAudios`/`audioWindows` — round 9, retiring
  * the former md5 stand-in stubs). Video is the one modality the JDK has no
  * codec for; its per-frame fan-out shape is `audioWindows`' flatMap.
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

  // ---- audio (REAL javax.sound.sampled WAV decode — round 9; replaces the
  // md5-derived decode/resize/frame stubs that stood in for non-JDK codecs.
  // Video remains the one absent modality: the JDK ships no video codec, and
  // the per-frame fan-out shape a video decoder needs is exactly
  // [[audioWindows]]' flatMap, now exercised with real decoded samples.) ----

  /** Committed fixture of real RIFF/WAVE payloads (see tools.GenAudioFixture):
    * rates {8k, 16k, 22.05k, 44.1k} × {mono, stereo} × {8, 16}-bit PCM, with
    * exp_* columns round-trip-precomputed through [[decodeAudio]] so the
    * DuckDB oracle asserts the decode without a WAV parser. PCM is lossless
    * — no jpeg-style masking needed anywhere.
    */
  val AudioFixturePath = "/root/repo/fixtures/media_audio.parquet"

  /** Samples per analysis window for [[audioWindows]]. */
  val AudioWindowFrames = 1000

  case class AudioMeta(
      doc_id: Long, byte_len: Long, sample_rate: Long, channels: Long,
      bits: Long, n_frames: Long, duration_us: Long, pcm_sum: Long)

  case class AudioWindow(doc_id: Long, win_idx: Long, n_samples: Long, energy: Long)

  /** REAL WAV decode (JDK-builtin `javax.sound.sampled`, zero new deps):
    * true sample rate / channel count / bit depth from the sniffed header,
    * frame count and µs duration, a checksum over EVERY decoded PCM sample
    * (proof the samples, not just the header, were parsed), and per-window
    * Σ|sample| energies — the windowed feature-extraction a training
    * pipeline runs on audio. Handles the two WAV PCM layouts the format
    * defines: 16-bit signed little-endian and 8-bit unsigned.
    */
  def decodeAudio(bytes: Array[Byte]): (AudioMeta, Array[Long]) = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new ByteArrayInputStream(bytes))
    try {
      val fmt = ais.getFormat
      val bits = fmt.getSampleSizeInBits
      val channels = fmt.getChannels
      require(bits == 16 || bits == 8, s"unsupported PCM depth: $bits")
      require(!fmt.isBigEndian || bits == 8, "WAV PCM is little-endian")
      val data = ais.readAllBytes()
      val frameSize = fmt.getFrameSize
      val nFrames = data.length / frameSize
      var sum = 0L
      val nWin = (nFrames + AudioWindowFrames - 1) / AudioWindowFrames
      val win = new Array[Long](nWin)
      var f = 0
      while (f < nFrames) {
        var c = 0
        while (c < channels) {
          val s =
            if (bits == 16) {
              val i = f * frameSize + c * 2
              ((data(i + 1).toInt << 8) | (data(i).toInt & 0xff)).toShort.toInt
            } else (data(f * frameSize + c).toInt & 0xff) - 128
          sum += s
          win(f / AudioWindowFrames) += math.abs(s).toLong
          c += 1
        }
        f += 1
      }
      val rate = fmt.getSampleRate.toLong
      val meta = AudioMeta(
        doc_id = -1L, byte_len = bytes.length.toLong, sample_rate = rate,
        channels = channels.toLong, bits = bits.toLong, n_frames = nFrames.toLong,
        duration_us = nFrames.toLong * 1000000L / rate, pcm_sum = sum)
      (meta, win)
    } finally ais.close()
  }

  /** Distributed audio decode: binary column in, typed per-file metadata
    * out. Same shape as [[decodeImages]] — decode inside `mapPartitions`,
    * no shuffle, narrow typed output.
    */
  def decodeAudios(spark: SparkSession, media: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.map(r => decodeAudio(r.payload)._1.copy(doc_id = r.doc_id))
    }
  }

  /** Windowed feature extraction over REAL decoded samples: each file fans
    * out to one row per `AudioWindowFrames`-frame window with Σ|sample|
    * energy — the per-frame/per-window flatMap shape a video or audio
    * feature stage needs (one input row → N output rows inside the
    * partition, no shuffle).
    */
  def audioWindows(spark: SparkSession, media: DataFrame): Dataset[AudioWindow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.flatMap { r =>
        val (meta, win) = decodeAudio(r.payload)
        val full = meta.n_frames / AudioWindowFrames
        win.iterator.zipWithIndex.map { case (e, i) =>
          val frames =
            if (i < full) AudioWindowFrames.toLong
            else meta.n_frames - full * AudioWindowFrames
          AudioWindow(r.doc_id, i.toLong, frames * meta.channels, e)
        }
      }
    }
  }

  // ---- multi-frame containers (REAL javax.imageio animated-GIF decode —
  // the JDK's one genuinely multi-frame media reader, so the video-style
  // "decode container → sample every Nth frame → per-frame features" path
  // runs on real frames rather than a stand-in; a proprietary-codec
  // deployment swaps decodeFrames' body for a JNI call, every Spark-side
  // shape stays identical) ----

  /** Committed fixture of real multi-frame animated GIFs (see
    * tools.GenVideoFixture), exp_* columns round-trip-precomputed through
    * [[decodeFrames]]. GIF's LZW is lossless, so like png/bmp every column
    * is portable across JDKs — no jpeg-style masking.
    */
  val VideoFixturePath = "/root/repo/fixtures/media_frames.parquet"

  /** Keyframe stride for [[sampleFrames]]: decode frames 0, N, 2N, … —
    * the "sample every Nth frame" a video training stage runs so feature
    * cost stays ~1/N of full decode.
    */
  val FrameStride = 3

  case class FrameRow(
      doc_id: Long, frame_idx: Long, n_frames: Long, width: Long,
      height: Long, pix_sum: Long)

  /** REAL multi-frame decode: frame count from the container directory,
    * then every `stride`-th frame decoded to true dims + a checksum over
    * every RGB sample of that frame (proof each sampled frame's pixels, not
    * just the header, were decoded). `getNumImages(true)` forces a full
    * directory scan; the per-frame reads then seek directly.
    */
  def decodeFrames(bytes: Array[Byte], stride: Int): (Int, Seq[(Int, Int, Int, Long)]) = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = ImageIO.getImageReaders(iis)
      require(readers.hasNext, "no ImageIO reader recognizes this payload")
      val reader = readers.next()
      try {
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val sampled = (0 until n by stride).map { i =>
          val img = reader.read(i)
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
          (i, img.getWidth, img.getHeight, sum)
        }
        (n, sampled)
      } finally reader.dispose()
    } finally iis.close()
  }

  /** Distributed strided frame sampling: one container row fans out to one
    * row per sampled frame inside its partition ([[audioWindows]]' flatMap
    * shape), narrow typed output — a 100 TB video scan ships only
    * (id, idx, dims, fingerprint) rows downstream, never pixels.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame): Dataset[FrameRow] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.flatMap { r =>
        val (n, frames) = decodeFrames(r.payload, FrameStride)
        frames.iterator.map { case (i, w, h, pix) =>
          FrameRow(r.doc_id, i.toLong, n.toLong, w.toLong, h.toLong, pix)
        }
      }
    }
  }

  // ---- perceptual-hash image dedup (round 11): the decode → downscale →
  // featurize → banded-join pipeline an image-corpus curation stage runs.
  // The 8×8 average-hash is the classic perceptual fingerprint (equal
  // images and mild re-encodes collide; unrelated images differ in ~32
  // bits); pair generation is EXACT via the SimHash 4-band pigeonhole
  // (operators.SimHash), here on 4 × 16-bit bands of the 64-bit hash. ----

  /** Committed fixture of real PNG payloads with near-duplicate pairs (see
    * tools.GenPhashFixture): (doc_id, payload, exp_ahash) where exp_ahash
    * was round-tripped through [[aHash]] at generation time — the DuckDB
    * oracle computes the SAME banded-hamming pairs from the recorded
    * hashes, so a hash-match proves the pixels were decoded AND hashed
    * identically. PNG only: lossless, so no jpeg-style masking.
    */
  val PhashFixturePath = "/root/repo/fixtures/media_phash.parquet"

  /** Corrupt-decode-audit fixture (round 13 — tools.GenDecodeAuditFixture):
    * good PNGs interleaved with garbage/truncated/empty payloads, with the
    * expected (ahash, decode_ok) recorded at generation time.
    */
  val DecodeAuditFixturePath = "/root/repo/fixtures/media_decode_audit.parquet"

  case class ImageHash(doc_id: Long, ahash: Long)

  /** 64-bit average-hash with fully DETERMINISTIC integer arithmetic — no
    * Graphics2D interpolation (whose kernels vary across JDK builds): each
    * source pixel maps to one 8×8 grid cell (cx = x·8/w), cells average
    * integer luminance (299r+587g+114b)/1000, and bit i is cell_i > mean.
    * Flat images hash to 0L (strict >), a useful degenerate-detector.
    */
  def aHash(bytes: Array[Byte]): Long = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "no ImageIO reader recognizes this payload")
    aHashOf(img)
  }

  /** Corruption-tolerant twin of [[aHash]] for the DISTRIBUTED path (round
    * 12, ADVICE r11): at corpus scale undecodable blobs are EXPECTED — a
    * curation pipeline flags and routes around them; it must never let one
    * truncated download abort a whole partition. None ⇔ ImageIO either
    * recognizes no reader or throws while decoding. The strict throwing
    * [[aHash]] remains for the fixture generator, where a decode failure IS
    * a bug.
    */
  def aHashOpt(bytes: Array[Byte]): Option[Long] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes))).map(aHashOf)
    catch { case scala.util.control.NonFatal(_) => None }

  private def aHashOf(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = y * 8 / h
      var x = 0
      while (x < w) {
        val cx = x * 8 / w
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
          (rgb & 0xff) * 114) / 1000
        val c = cy * 8 + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val cells = new Array[Long](64)
    var i = 0
    var tot = 0L
    while (i < 64) {
      cells(i) = if (counts(i) > 0) sums(i) / counts(i) else 0L
      tot += cells(i)
      i += 1
    }
    val mean = tot / 64
    var hash = 0L
    i = 0
    while (i < 64) {
      if (cells(i) > mean) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** Distributed hash pass: decode + hash inside `mapPartitions` (no
    * shuffle; pixels never leave their partition), narrow (id, 8-byte hash)
    * output — the only thing a 100 TB image corpus ships downstream.
    * Undecodable payloads are SKIPPED (round 12, ADVICE r11 — one corrupt
    * blob must not abort the partition); use [[imageHashStatus]] when the
    * pipeline needs the failures routed to a quarantine table instead of
    * dropped.
    */
  def imageHashes(spark: SparkSession, media: DataFrame): Dataset[ImageHash] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.flatMap(r => aHashOpt(r.payload).map(h => ImageHash(r.doc_id, h)))
    }
  }

  case class ImageHashStatus(doc_id: Long, ahash: Option[Long], decode_ok: Boolean)

  /** Flagged variant of [[imageHashes]]: every input row survives, corrupt
    * payloads carry `decode_ok = false` and a null hash — the shape that
    * feeds a quarantine/ retry table in a real curation run.
    */
  def imageHashStatus(spark: SparkSession, media: DataFrame): Dataset[ImageHashStatus] = {
    import spark.implicits._
    media.select("doc_id", "payload").as[ImageRow].mapPartitions { it =>
      it.map { r =>
        val h = aHashOpt(r.payload)
        ImageHashStatus(r.doc_id, h, h.isDefined)
      }
    }
  }

  /** All pairs (a_id < b_id) with Hamming(ahash) ≤ maxHamming via the
    * 4 × 16-bit band pigeonhole join (exact for maxHamming ≤ 3 — any such
    * pair agrees on a whole band; the operators.SimHash design on the
    * 64-bit perceptual hash). Shuffle carries (id, hash, band), never
    * pixels; degenerate buckets (e.g. many flat images at hash 0) are
    * bounded by the same declared-cap discipline as MinHashLsh buckets at
    * corpus scale.
    */
  def phashPairs(sigs: DataFrame, maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4x16-bit pigeonhole is exact only to hamming 3")
    val banded = sigs.select(
      col("doc_id"), col("ahash"),
      posexplode(expr(
        "transform(sequence(0, 3), k -> shiftright(ahash, 16 * k) & 65535L)")))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_val")
    val a = banded.select(
      col("band_idx"), col("band_val"), col("doc_id").as("a_id"), col("ahash").as("a_sig"))
    val b = banded.select(
      col("band_idx").as("bk"), col("band_val").as("bv"),
      col("doc_id").as("b_id"), col("ahash").as("b_sig"))
    a.join(b, col("band_idx") === col("bk") && col("band_val") === col("bv") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        expr("bit_count(a_sig ^ b_sig)").cast("long").as("hamming"))
      .dropDuplicates("a_id", "b_id")
      .filter(col("hamming") <= maxHamming)
  }
}
