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

  test("skyline two-pass matches the window form when prices are NULL") {
    // NULL prices sort first under the window's ascending order; the block
    // formula must send them to block 0, not (via null-skipping least())
    // to the last block
    val parts = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, CAST(NULL AS DOUBLE), 5), (2L, 10.0, 5), (3L, 9.0, 7),
        |  (4L, CAST(NULL AS DOUBLE), 9), (5L, 12.0, 3), (6L, 950.0, 2)
        |AS t(p_partkey, p_retailprice, p_size)""".stripMargin)
    val twoPass = rows(graft.queries.WindowOps.skylineTwoPass(parts).orderBy("p_partkey"))
    val window = rows(graft.queries.WindowOps.skylineWindow(parts).orderBy("p_partkey"))
    assert(twoPass === window)
  }

  test("doc_pack two-pass keeps NULL-language docs (null-safe offset join)") {
    import spark.implicits._
    // window partitioning groups NULL langs into their own partition; the
    // two-pass offset join must match them too, not drop them
    val docs = (0 until 40).map { i =>
      val lang = if (i % 3 == 0) null else "en"
      (i.toLong, lang, "w1 w2 w3 w4", 11L)
    }
    val d = java.nio.file.Files.createTempDirectory("packnull8").toString
    docs.toDF("doc_id", "lang", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    // force the two-pass branch — the null-safe offset join is what's under
    // test, and the auto-crossover would route 40 rows to the window form
    val got = graft.tools.AbBench.variants("doc_pack_sequences_blocked")(spark, d).collect()
    val want = graft.tools.AbBench.variants("doc_pack_sequences_window")(spark, d).collect()
    assert(got.map(_.toSeq).toSeq === want.map(_.toSeq).toSeq)
    assert(got.map(_.getLong(2)).sum === 40L) // every doc accounted for
  }

  test("declared skyline_pareto equals the window form on the test part table") {
    val d = TestTables.dir(spark)
    val got = rows(SparkEntry.queries("skyline_pareto")(spark, d))
    val want = rows(graft.tools.AbBench.variants("skyline_pareto_window")(spark, d))
    assert(got.nonEmpty && got === want)
  }

  // ---- sequence packing: two-pass vs per-language window ----

  test("blocked doc_pack equals the window form across many doc_id blocks") {
    import spark.implicits._
    // 1000 docs over 2 languages → doc_ids span 4 PackBlock(256) blocks per
    // language, so cross-block offset merging is genuinely exercised; token
    // counts vary so bin boundaries land mid-block. The FORCED two-pass
    // branch is compared (the round-9 auto-crossover sends an input this
    // small down the window branch, which would compare window to window).
    val docs = (0 until 1000).map { i =>
      val words = (0 until (i * 31 % 40) + 1).map(j => s"w$j").mkString(" ")
      (i.toLong, if (i % 2 == 0) "en" else "de", words, words.length.toLong)
    }
    val d = java.nio.file.Files.createTempDirectory("pack8").toString
    docs.toDF("doc_id", "lang", "text", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val got = rows(graft.tools.AbBench.variants("doc_pack_sequences_blocked")(spark, d))
    val want = rows(graft.tools.AbBench.variants("doc_pack_sequences_window")(spark, d))
    assert(got.size > 10 && got === want)
    // and the declared auto form agrees with whichever branch it picked
    assert(rows(SparkEntry.queries("doc_pack_sequences")(spark, d)) === want)
  }

  test("weighted-median forced branches are row-identical; auto agrees") {
    val d = TestTables.dir(spark)
    val win = rows(graft.tools.AbBench.variants("agg_weighted_median_window")(spark, d))
    val blk = rows(graft.tools.AbBench.variants("agg_weighted_median_blocked")(spark, d))
    val scan2 = rows(graft.tools.AbBench.variants("agg_weighted_median_scan2")(spark, d))
    val auto = rows(SparkEntry.queries("agg_weighted_median")(spark, d))
    assert(win.nonEmpty && win === blk && auto === win)
    // the retired full two-pass scan twin stays row-identical to the
    // round-15 median-block refinement that replaced it
    assert(scan2 === blk)
  }

  // ---- shingle document-frequency caps (stop-shingle guards) ----

  test("ngramContainment drops stop-shingles above the df cap, keeps informative ones") {
    import spark.implicits._
    // 3-token docs carry exactly one 3-gram each: docs 0-3 share a shingle
    // with df=4 (a stop-shingle at cap 2), docs 4-5 share one with df=2
    val docs = Seq(
      (0L, "s s s"), (1L, "s s s"), (2L, "s s s"), (3L, "s s s"),
      (4L, "u u u"), (5L, "u u u")).toDF("doc_id", "text")
    val capped = graft.queries.TextSim
      .ngramContainment(docs, n = 3, minC = 0.3, dfCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // the stop-shingle pairs (12 directed pairs among 0-3) are gone; the
    // informative pair survives in both directions
    assert(capped === Seq((4L, 5L, 1.0), (5L, 4L, 1.0)))
    // with the cap not binding, all 14 directed pairs appear
    val uncapped = graft.queries.TextSim
      .ngramContainment(docs, n = 3, minC = 0.3, dfCap = 64)
    assert(uncapped.count() === 14L)
  }

  test("contamination caps train-side 8-gram fan-out at the df cap") {
    import spark.implicits._
    val eight = (1 to 8).map(i => s"w$i").mkString(" ")
    val other = (1 to 8).map(i => s"v$i").mkString(" ")
    val bench = Seq((0L, eight), (1L, other)).toDF("doc_id", "text")
    // 3 train docs carry the 'w' gram (df=3 > cap 2) → dropped; 2 carry the
    // 'v' gram (df=2 ≤ cap) → kept
    val train = Seq((50L, eight), (51L, eight), (52L, eight),
      (60L, other), (61L, other)).toDF("doc_id", "text")
    val capped = graft.queries.Pipeline3.contamination(bench, train, dfCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(capped === Seq((60L, 1L, 1L), (61L, 1L, 1L)))
    val uncapped = graft.queries.Pipeline3.contamination(bench, train, dfCap = 64)
    assert(uncapped.count() === 5L)
  }

  // ---- ANN recall at the driver's BENCH scale (sf0.1) ----

  // Round5Spec pins recall@5 ≥ 0.8 at sf0.01 (the correctness-gate scale);
  // recall at 10× the corpus is the number that predicts 100 TB behavior —
  // LSH/IVF bucket occupancy grows with corpus size, so small-scale recall
  // can flatter. Same harness, bench scale.
  private def recallAt5(ann: String, sf: String): Double = {
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (q, a) => (q, a.map(_._2).toSet) }
    val exact = top5("sim_knn_cosine")
    val approx = top5(ann)
    val recalls = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
    }
    recalls.sum / recalls.size
  }

  test("sim_ann_lsh recall@5 >= 0.8 vs brute force at sf0.1 (bench scale)") {
    assume(new java.io.File("/root/testdata/sf0.1").isDirectory)
    val r = recallAt5("sim_ann_lsh", "/root/testdata/sf0.1")
    info(f"LSH mean recall@5 at sf0.1 = $r%.3f")
    assert(r >= 0.8, f"LSH mean recall@5 at sf0.1 = $r%.3f")
  }

  test("sim_ann_ivf recall@5 >= 0.8 vs brute force at sf0.1 (bench scale)") {
    assume(new java.io.File("/root/testdata/sf0.1").isDirectory)
    val r = recallAt5("sim_ann_ivf", "/root/testdata/sf0.1")
    info(f"IVF mean recall@5 at sf0.1 = $r%.3f")
    assert(r >= 0.8, f"IVF mean recall@5 at sf0.1 = $r%.3f")
  }

  // ---- §2.17 operators over literal frames ----

  private def writeEvents(d: String, rows: Seq[(Long, Long, Long, String)]): Unit = {
    import spark.implicits._
    val base = 1704067200L * 1000000000L // ns epoch, like TestTables
    rows.map { case (eid, min, uid, typ) =>
      (eid, base + min * 60L * 1000000000L, uid, typ, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
  }

  test("join_asof_nearest picks min |dt| and prefers the past on exact ties") {
    val d = java.nio.file.Files.createTempDirectory("near8").toString
    writeEvents(d, Seq(
      // user 1: views at minutes 0 and 20, purchase at 8 → past view (dt −8)
      // beats future view (dt +12)
      (1L, 0L, 1L, "view"), (2L, 20L, 1L, "view"), (3L, 8L, 1L, "purchase"),
      // user 2: views at 0 and 10, purchase at 5 → exact |dt| tie, past wins
      (4L, 0L, 2L, "view"), (5L, 10L, 2L, "view"), (6L, 5L, 2L, "purchase"),
      // user 3: only a FUTURE view → forward leg must still match
      (7L, 30L, 3L, "view"), (8L, 10L, 3L, "purchase"),
      // user 4: purchase with no views at all → dropped
      (9L, 10L, 4L, "purchase")))
    val min = 60L * 1000000L
    val got = SparkEntry.queries("join_asof_nearest")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((3L, 1L, -8L * min), (6L, 4L, -5L * min), (8L, 7L, 20L * min)))
  }

  test("window_pattern_match counts strictly-consecutive view,view,purchase runs") {
    val d = java.nio.file.Files.createTempDirectory("pat8").toString
    writeEvents(d, Seq(
      // user 1: view,view,purchase → 1 match starting at minute 0
      (1L, 0L, 1L, "view"), (2L, 1L, 1L, "view"), (3L, 2L, 1L, "purchase"),
      // user 2: view,CLICK,view,purchase → interrupted, no match
      (4L, 0L, 2L, "view"), (5L, 1L, 2L, "click"),
      (6L, 2L, 2L, "view"), (7L, 3L, 2L, "purchase")))
    val got = SparkEntry.queries("window_pattern_match")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 1L)))
  }

  test("join_snapshot_diff classifies added, removed and changed users") {
    val d = java.nio.file.Files.createTempDirectory("diff8").toString
    writeEvents(d, Seq(
      // user 1: even event 2 (view) then odd id%3>0 event 7 (purchase) → changed
      (2L, 0L, 1L, "view"), (7L, 5L, 1L, "purchase"),
      // user 2: only event_id 5 (odd, %3>0) → absent from snapshot A → added
      (5L, 0L, 2L, "view"),
      // user 3: only event_id 6 (even, %3==0) → absent from snapshot B → removed
      (6L, 0L, 3L, "view"),
      // user 4: event 4 (even AND %3>0) in both snapshots, same state → dropped
      (4L, 0L, 4L, "click")))
    val got = SparkEntry.queries("join_snapshot_diff")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(3))).toSeq
    assert(got === Seq((1L, "changed"), (2L, "added"), (3L, "removed")))
  }

  test("join_asof_tolerance drops matches staler than one hour") {
    val d = java.nio.file.Files.createTempDirectory("tol8").toString
    writeEvents(d, Seq(
      // user 1: view 30 min before the purchase → kept (staleness 30 min)
      (1L, 0L, 1L, "view"), (2L, 30L, 1L, "purchase"),
      // user 2: closest view is 90 min old → dropped entirely
      (3L, 0L, 2L, "view"), (4L, 90L, 2L, "purchase")))
    val min = 60L * 1000000L
    val got = SparkEntry.queries("join_asof_tolerance")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((2L, 1L, 30L * min)))
  }

  test("window_streak finds the longest consecutive-type run with deterministic ties") {
    val d = java.nio.file.Files.createTempDirectory("streak8").toString
    writeEvents(d, Seq(
      // user 1: view,view,view then purchase → longest run 3 (view)
      (1L, 0L, 1L, "view"), (2L, 1L, 1L, "view"), (3L, 2L, 1L, "view"),
      (4L, 3L, 1L, "purchase"),
      // user 2: click,click then view,view — tie of 2, type asc picks click
      (5L, 0L, 2L, "click"), (6L, 1L, 2L, "click"),
      (7L, 2L, 2L, "view"), (8L, 3L, 2L, "view")))
    val got = SparkEntry.queries("window_streak")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got === Seq((1L, 3L, "view"), (2L, 2L, "click")))
  }

  test("agg_weighted_median crosses half the total weight, not half the rows") {
    import spark.implicits._
    // group A: values 1(w=1), 2(w=1), 3(w=10) → half of 12 is 6, crossed at
    // value 3 — the row median (2) would be wrong
    val d = java.nio.file.Files.createTempDirectory("wmed8").toString
    Seq(("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 3.0, 10.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.parquet(s"$d/lineitem.parquet")
    val got = SparkEntry.queries("agg_weighted_median")(spark, d).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got === Seq(("A", 3.0)))
  }

  test("agg_bitmap_distinct equals countDistinct on the test lineitem") {
    val d = TestTables.dir(spark)
    val got = SparkEntry.queries("agg_bitmap_distinct")(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = graft.Tables.t(spark, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("l_partkey")).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got.nonEmpty && got === want)
  }

  test("sample_reservoir returns at most k rows per language, deterministically") {
    val d = TestTables.dir(spark)
    val a = SparkEntry.queries("sample_reservoir")(spark, d).collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("sample_reservoir")(spark, d).collect().map(_.toSeq).toSeq
    assert(a === b && a.nonEmpty)
    a.groupBy(_.head).foreach { case (_, rs) => assert(rs.size <= 10) }
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
