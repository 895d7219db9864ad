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

  test("char_ngrams kernel is bit-parity with the substring-transform expression form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftSqlShim.{column => gcol, expression => gexpr}
    import spark.implicits._
    // multi-byte code points (zh, emoji), ASCII, shorter-than-n, empty, null
    val df = Seq(
      "the quick brown fox", "的是不了我在", "a b", "ab", "", null,
      "mixé 文字 and ascii", "ìîï"
    ).toDF("s")
    val kernel = df.select(gcol(graft.plans.CharNGrams(gexpr(col("s")), 3)).as("g"))
      .collect().map(_.getSeq[String](0))
    val exprForm = df.select(expr(
      """CASE WHEN length(s) >= 3
        |     THEN transform(sequence(1, length(s) - 2), i -> substring(s, i, 3))
        |     ELSE CAST(array() AS ARRAY<STRING>) END""".stripMargin).as("g"))
      .collect().map(_.getSeq[String](0))
    kernel.zip(exprForm).foreach { case (k, e) => assert(k === e) }
    // whole-stage codegen must survive the kernel (the point of building
    // it) — asserted over a parquet-backed scan (a local literal frame
    // collapses to LocalTableScan with no codegen stage at all)
    val docs = graft.Tables.t(spark, TestTables.dir(spark), "documents")
    val plan = docs.select(gcol(graft.plans.CharNGrams(gexpr(col("text")), 3)))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is the WholeStageCodegen marker in the plan string;
    // the interpreted higher-order form printed a bare (non-starred) Project
    assert(plan.contains("*(1) Project [char_ngrams"), plan)
  }

  test("count_in_set kernel is bit-parity with the filter/array_contains form") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.GraftSqlShim.{column => gcol, expression => gexpr}
    import spark.implicits._
    val set = Seq("the", "ing", "and")
    val df = Seq(
      (1L, Seq("the", "the", "xxx", "ing")), // duplicates count each time
      (2L, Seq("none", "here")),
      (3L, Seq.empty[String]),
      (4L, null.asInstanceOf[Seq[String]]) // NULL array → SQL NULL, both forms
    ).toDF("id", "toks")
    val kernel = df.select(col("id"),
      gcol(graft.plans.CountInSet(gexpr(col("toks")), set)).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    val exprForm = df.select(col("id"),
      size(filter(col("toks"), t => array_contains(typedLit(set), t))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1))).toMap
    assert(kernel === exprForm)
    assert(kernel(1L) === 3L && kernel(4L) === null)
  }

  test("text_langid_ngram and text_langid results are unchanged by the round-12 kernels") {
    val d = TestTables.dir(spark)
    val ng = SparkEntry.queries("text_langid_ngram")(spark, d).collect()
    assert(ng.nonEmpty)
    // the fixture's zh doc must still classify via its 3-byte trigrams
    // (code-point slicing, not byte slicing, is the thing under test)
    val li = SparkEntry.queries("text_langid")(spark, d).collect()
    assert(li.nonEmpty)
  }

  // ---- ANN recall at the round-12 ladder rungs (sf3, sf10) ----
  // Round5Spec pins recall@5 ≥ 0.8 at sf0.01, Round8Spec at sf0.1,
  // Round11Spec at the true sf1; these extend the gate to the rungs this
  // round added (150k / 500k independently-drawn vectors). Same pattern:
  // assume-gated on the generated dirs so a fresh checkout stays green.
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

  for (rung <- Seq("sf3real", "sf10real"); ann <- Seq("sim_ann_lsh", "sim_ann_ivf")) {
    test(s"$ann recall@5 >= 0.8 vs brute force at $rung") {
      assume(new java.io.File(s"/tmp/$rung/embeddings.parquet").exists)
      val r = recallAt5(ann, s"/tmp/$rung")
      info(f"$ann mean recall@5 at $rung = $r%.3f")
      assert(r >= 0.8, f"$ann mean recall@5 at $rung = $r%.3f")
    }
  }

  // ---- resample_hourly trailing-window clamp (round 12, the sf10 find) ----
  // The unbounded per-user spine is O(users × total span) OUTPUT rows —
  // 1.08B rows / 936 s at sf10 where the generator widens the span with
  // scale. The declared form resamples the trailing 720 h; this pins the
  // clamp semantics on a literal corpus spanning > 720 h: (a) the spine
  // starts at max_hr - 719, (b) a user with no rows inside the window drops
  // out entirely, (c) forward-fill before a user's first in-window
  // observation SEEDS from their last pre-cutoff observation (ADVICE r12 —
  // not a NULL lead-in), (d) a ≤ 720 h corpus is bit-identical to the
  // unbounded form, (e) a user with no pre-cutoff history still leads in
  // with NULL. Runs the REAL operator (queries.Analytics2.resampleHourly),
  // not a spec-local re-implementation.
  test("resample_hourly clamps the spine to the trailing 720 hours and seeds the fill") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ev = Seq(
      (1L, 0L, 1.0), (1L, 300L, 2.0), (1L, 1000L, 3.0), // active across 1001 h
      (2L, 100L, 9.0),                                  // only before the window
      (3L, 999L, 4.0), (3L, 1000L, 5.0)                 // inside the window
    ).toDF("user_id", "hr", "value")
    def resample(src: org.apache.spark.sql.DataFrame, trailing: Int) =
      graft.queries.Analytics2.resampleHourly(src, trailing)
        .orderBy("user_id", "hr")
    val rows = resample(ev, 720).collect()
    val byUser = rows.groupBy(_.getLong(0))
    // (a) user 1's spine starts at the cutoff 1000-719=281, not at 0
    assert(byUser(1L).map(_.getLong(1)).min === 281L)
    assert(byUser(1L).length === 720)
    // (c) the hr-0 observation (value 1.0) is OUTSIDE the window but seeds
    // the fill: hours 281..299 carry 1.0 until the in-window obs at 300
    assert(byUser(1L).filter(_.getLong(1) < 300L).forall(_.getDouble(3) === 1.0))
    assert(byUser(1L).find(_.getLong(1) == 300L).get.getDouble(3) === 2.0)
    assert(byUser(1L).find(_.getLong(1) == 999L).get.getDouble(3) === 2.0)
    assert(byUser(1L).find(_.getLong(1) == 1000L).get.getDouble(3) === 3.0)
    // (b) user 2 (h1=100 < 281) drops out
    assert(!byUser.contains(2L))
    // user 3 spans 999..1000 only
    assert(byUser(3L).map(_.getLong(1)).toSeq.sorted === Seq(999L, 1000L))
    // (e) no pre-cutoff history → NULL lead-in before the first observation
    val ev2 = Seq((7L, 500L, 1.5), (7L, 1000L, 2.5), (8L, 1000L, 0.5))
      .toDF("user_id", "hr", "value")
    val u7 = resample(ev2, 720).collect().filter(_.getLong(0) == 7L)
    assert(u7.filter(_.getLong(1) < 500L).forall(_.isNullAt(3)))
    assert(u7.find(_.getLong(1) == 500L).get.getDouble(3) === 1.5)
    // (d) a corpus inside the window: clamped ≡ a huge-window (unbounded
    // in effect) form, row for row
    val small = ev.where(col("hr") >= 400L)
    assert(resample(small, 720).collect().toSeq ===
      resample(small, 1000000).collect().toSeq)
  }
}
