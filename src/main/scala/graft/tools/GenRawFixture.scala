package graft.tools

import java.nio.file.{Files, Paths}

/** One-shot generator for the committed raw-file fixture
  * (`fixtures/raw_files/`) read by `scan_binaryfile` — the
  * `spark.read.format("binaryFile")` ingest path a multimodal pipeline
  * starts from (blobs on disk, not yet in a table). Four files, three
  * content kinds: two real PNGs (the GenPhashFixture patterns), a text
  * note, and an arithmetic byte ramp. Deterministic: no clock, no RNG.
  *
  * The DuckDB oracle reads the same directory with a read_blob glob
  * and compares (file_name, byte_len, md5) — content-addressed, so
  * modificationTime (which git does not preserve) never enters the result.
  */
object GenRawFixture {

  val OutPath = "/root/repo/fixtures/raw_files"

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(OutPath)
    Files.createDirectories(dir)

    def writeImg(name: String, base: Int): Unit = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cy <- 0 until 8; cx <- 0 until 8) {
        val c = cy * 8 + cx
        val v = math.abs((base * 2654435761L + c * 40503L) % 256).toInt
        val rgb = (v << 16) | (v << 8) | v
        for (y <- cy * 8 until (cy + 1) * 8; x <- cx * 8 until (cx + 1) * 8)
          img.setRGB(x, y, rgb)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      Files.write(dir.resolve(name), bos.toByteArray)
    }

    writeImg("img_a.png", 3)
    writeImg("img_b.png", 7)
    Files.write(dir.resolve("notes.txt"),
      "graft raw-file fixture: deterministic content, committed.\n".getBytes("UTF-8"))
    Files.write(dir.resolve("data.bin"),
      Array.tabulate(256)(i => ((i * 7) % 256).toByte))
    println(s"[gen-raw] wrote 4 files -> $OutPath")
  }
}
