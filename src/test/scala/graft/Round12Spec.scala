package graft

import graft.multimodal.Binary

/** Round-12 hardening: corrupt-media tolerance on the distributed image
  * path (ADVICE r11 — at corpus scale undecodable blobs are expected and
  * must be skipped/flagged, never abort a partition).
  */
class Round12Spec extends SparkSpec {

  private def fixtures = spark.read.parquet(Binary.PhashFixturePath)

  test("a corrupt payload is skipped by imageHashes, not fatal to the partition") {
    import spark.implicits._
    val good = fixtures.select("doc_id", "payload").as[Binary.ImageRow].collect()
    val corrupt = Seq(
      Binary.ImageRow(9001L, Array[Byte](1, 2, 3, 4)), // no magic any reader knows
      Binary.ImageRow(9002L, good.head.payload.take(10)) // truncated PNG header
    )
    val mixed = spark.createDataset(good.toSeq ++ corrupt).toDF()
    val hashes = Binary.imageHashes(spark, mixed).collect()
    assert(hashes.length === good.length, "corrupt rows skip; good rows all survive")
    assert(!hashes.exists(h => h.doc_id == 9001L || h.doc_id == 9002L))
    // and the good hashes are unchanged by the corrupt neighbors
    val clean = Binary.imageHashes(spark, fixtures).collect()
      .map(h => h.doc_id -> h.ahash).toMap
    hashes.foreach(h => assert(clean(h.doc_id) === h.ahash))
  }

  test("imageHashStatus flags corrupt payloads with decode_ok=false and a null hash") {
    import spark.implicits._
    val good = fixtures.select("doc_id", "payload").as[Binary.ImageRow]
      .collect().take(2)
    val mixed = spark.createDataset(
      good.toSeq :+ Binary.ImageRow(9001L, Array[Byte](0, 0, 0))).toDF()
    val st = Binary.imageHashStatus(spark, mixed).collect()
      .map(s => s.doc_id -> s).toMap
    assert(st.size === 3, "the flagged variant keeps every input row")
    assert(!st(9001L).decode_ok && st(9001L).ahash.isEmpty)
    good.foreach(g => assert(st(g.doc_id).decode_ok && st(g.doc_id).ahash.isDefined))
  }

  test("the strict aHash still fails loudly (fixture-generator contract)") {
    val e = intercept[IllegalArgumentException] {
      Binary.aHash(Array[Byte](1, 2, 3, 4))
    }
    assert(e.getMessage.contains("no ImageIO reader"))
  }
}
