package graft

/** Round-5 hardening + widening tests (VERDICT r4 task list). */
class Round5Spec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  // ---- CosinePairs fail-fast guard ----

  test("CosinePairs.allPairs throws fast when the build side exceeds maxBuildRows") {
    import spark.implicits._
    val big = spark.range(0, 50)
      .selectExpr("id", "array(cast(id as double), 1.0d) as vec")
    val e = intercept[IllegalArgumentException] {
      graft.operators.CosinePairs.allPairs(spark, big, threshold = 0.0, maxBuildRows = 10)
    }
    assert(e.getMessage.contains("maxBuildRows"))
  }

  // ---- real javax.imageio decode ----

  test("Binary.decodeImage recovers exact dims, format, and pixel sum from a hand-built PNG") {
    val img = new java.awt.image.BufferedImage(5, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 3; x <- 0 until 5) img.setRGB(x, y, (x << 16) | (y << 8) | 7)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val (w, h, fmt, pix) = graft.multimodal.Binary.decodeImage(bos.toByteArray)
    assert((w, h, fmt) === ((5, 3, "png")))
    // sum of r+g+b over the 15 pixels: r sums to 3*(0+1+2+3+4)=30,
    // g sums to 5*(0+1+2)=15, b is 7 everywhere = 105
    assert(pix === 30L + 15L + 105L)
  }

  test("Binary.decodeImage rejects a non-image payload loudly") {
    val e = intercept[IllegalArgumentException] {
      graft.multimodal.Binary.decodeImage("not an image".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("ImageIO"))
  }

  test("CosinePairs.allPairs under the cap still finds the duplicate pair") {
    val df = spark.range(0, 3)
      .selectExpr("id", "array(1.0d, 2.0d, 3.0d) as vec")
    val pairs = graft.operators.CosinePairs
      .allPairs(spark, df, threshold = 0.99, maxBuildRows = 10)
      .collect()
    // 3 identical vectors → 3 pairs, all cosine 1.0
    assert(pairs.length === 3)
    assert(pairs.forall(r => math.abs(r.getDouble(2) - 1.0) < 1e-12))
  }
}
