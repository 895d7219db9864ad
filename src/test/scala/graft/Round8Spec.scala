package graft

import org.apache.spark.sql.DataFrame

/** Round-8 hardening tests: the two-pass distributed prefix scans (skyline,
  * sequence packing) must be row-identical to the single-window forms they
  * replace, across every block/tie edge the scan can hit.
  */
class Round8Spec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  // ---- skyline: two-pass vs global window ----

  private def skylineFrame(data: Seq[(Long, Double, Int)]): DataFrame =
    spark.createDataFrame(data).toDF("p_partkey", "p_retailprice", "p_size")

  private def abSkyline(data: Seq[(Long, Double, Int)]): Unit = {
    val parts = skylineFrame(data)
    val twoPass = rows(graft.queries.WindowOps.skylineTwoPass(parts).orderBy("p_partkey"))
    val window = rows(graft.queries.WindowOps.skylineWindow(parts).orderBy("p_partkey"))
    assert(twoPass === window)
  }

  test("skyline two-pass is row-identical to the window form on the edge-case frame") {
    // duplicate point, same-size cheaper row, same-price bigger row — every
    // dominance edge case (the Round7Spec NOT EXISTS frame)
    abSkyline(Seq(
      (1L, 10.0, 5), (2L, 10.0, 5), (3L, 10.0, 7), (4L, 9.0, 5),
      (5L, 12.0, 9), (6L, 12.0, 8), (7L, 8.0, 2), (8L, 15.0, 9)))
  }

  test("skyline two-pass survives all-equal prices (degenerate single block)") {
    // mx == mn would divide by zero in the block formula without the guard
    abSkyline(Seq((1L, 5.0, 3), (2L, 5.0, 9), (3L, 5.0, 9), (4L, 5.0, 1)))
  }

  test("skyline two-pass handles many distinct prices straddling block boundaries") {
    // 200 points over a price range much wider than 32 blocks, with repeated
    // sizes so both dominance conditions fire across block boundaries
    abSkyline((0 until 200).map { i =>
      ((i + 1).toLong, (i * 7 % 97) * 1.5 + 900.0, i * 13 % 50)
    })
  }

  test("declared skyline_pareto equals the window form on the test part table") {
    val d = TestTables.dir(spark)
    val got = rows(SparkEntry.queries("skyline_pareto")(spark, d))
    val want = rows(graft.tools.AbBench.variants("skyline_pareto_window")(spark, d))
    assert(got.nonEmpty && got === want)
  }

  // ---- sequence packing: two-pass vs per-language window ----

  test("declared doc_pack_sequences equals the window form across many doc_id blocks") {
    import spark.implicits._
    // 1000 docs over 2 languages → doc_ids span 4 PackBlock(256) blocks per
    // language, so cross-block offset merging is genuinely exercised; token
    // counts vary so bin boundaries land mid-block
    val docs = (0 until 1000).map { i =>
      val words = (0 until (i * 31 % 40) + 1).map(j => s"w$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) "en" else "de", words, words.length.toLong)
    }
    val d = java.nio.file.Files.createTempDirectory("pack8").toString
    docs.toDF("doc_id", "lang", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = rows(SparkEntry.queries("doc_pack_sequences")(spark, d))
    val want = rows(graft.tools.AbBench.variants("doc_pack_sequences_window")(spark, d))
    assert(got.size > 10 && got === want)
  }

  test("doc_pack_sequences bins are contiguous and respect capacity arithmetic") {
    val d = TestTables.dir(spark)
    val got = SparkEntry.queries("doc_pack_sequences")(spark, d).collect()
    assert(got.nonEmpty)
    // per language: the first doc always has exclusive prefix 0, so bin 0
    // exists, and no (lang, bin) group can be empty by construction (a bin
    // id may legitimately be SKIPPED when one doc spans >1 capacity)
    got.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).min === 0L)
      rs.foreach(r => assert(r.getLong(2) > 0L && r.getLong(3) > 0L))
    }
  }
}
