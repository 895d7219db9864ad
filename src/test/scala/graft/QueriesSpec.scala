package graft

import org.apache.spark.sql.Row

/** Operator-level tests running the REAL SparkEntry.queries functions over
  * the tiny literal tables (TestTables) — exact expected outputs.
  */
class QueriesSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  test("inventory: 219 declared queries (53 SURVEY §2 + 166 extras), 207 with oracles") {
    assert(SparkEntry.queries.size === 219)
    assert(SparkEntry.oracleSql.size === 207)
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle === Set(
      "agg_approx_distinct", "dedup_minhash", "sim_ann_lsh", "sim_ann_ivf",
      "sim_ann_pq", "sim_ann_ivfpq", "agg_kmv_distinct",
      "agg_approx_percentile", "agg_hll_union", "agg_approx_topk",
      "agg_weighted_median_approx", "sim_ann_index_serve"))
  }

  test("sim_ann_ivf recall: finds the aligned vector for query 0") {
    val rows = q("sim_ann_ivf").collect().filter(r => r.getLong(0) == 0L).map(_.getLong(2))
    assert(rows.contains(1L))
  }

  test("dedup_simhash pairs the normalized-identical docs at hamming 0") {
    val rows = q("dedup_simhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows.contains((0L, 1L, 0L)))
  }

  test("sim_ann_lsh finds the aligned vector among candidates") {
    val rows = q("sim_ann_lsh").collect()
      .filter(r => r.getLong(0) == 0L)
      .map(r => r.getLong(2))
    assert(rows.contains(1L)) // e1 shares e0's bucket (cos≈0.99)
  }

  test("multimodal_binary really decodes the committed images (true dims + formats)") {
    val rows = q("multimodal_binary").collect()
    assert(rows.length === 64)
    // dims follow the generator's formulas — only a real decode recovers them
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === 8 + id * 7 % 57, s"width of doc $id")
      assert(r.getLong(3) === 8 + id * 13 % 57, s"height of doc $id")
    }
    assert(rows.map(_.getString(4)).toSet === Set("png", "jpeg", "bmp"))
    // lossless rows carry the pixel checksum; jpeg pix_sum is masked in the
    // declared query (decoder-version-specific, see GenMediaFixture JDK pin)
    rows.foreach { r =>
      if (r.getString(4) == "jpeg") assert(r.isNullAt(5), s"jpeg pix_sum must be masked (doc ${r.getLong(0)})")
      else assert(r.getLong(5) > 0L, s"pixels of doc ${r.getLong(0)} were not summed")
    }
  }

  test("multimodal_audio really decodes the committed WAVs (round-trip exp columns)") {
    val fixture = spark.read.parquet(graft.multimodal.Binary.AudioFixturePath)
    val exp = fixture.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val got = q("multimodal_audio").collect()
    assert(got.length === exp.size)
    got.foreach { r =>
      val e = exp(r.getLong(0))
      assert(r.getLong(2) === e.getAs[Long]("exp_rate"))
      assert(r.getLong(3) === e.getAs[Long]("exp_channels"))
      assert(r.getLong(4) === e.getAs[Long]("exp_bits"))
      assert(r.getLong(5) === e.getAs[Long]("exp_n_frames"))
      assert(r.getLong(7) === e.getAs[Long]("exp_pcm_sum"))
    }
    // the matrix covers every rate/channel/depth combination
    assert(got.map(_.getLong(2)).toSet === Set(8000L, 16000L, 22050L, 44100L))
    assert(got.map(_.getLong(3)).toSet === Set(1L, 2L))
    assert(got.map(_.getLong(4)).toSet === Set(8L, 16L))
  }

  test("multimodal_audio_windows fans each file out to its PCM windows") {
    val wins = q("multimodal_audio_windows").collect()
    val meta = q("multimodal_audio").collect()
      .map(r => r.getLong(0) -> (r.getLong(5), r.getLong(3))).toMap
    // every file appears, with ceil(n_frames/1000) windows of <=1000*ch samples
    val byDoc = wins.groupBy(_.getLong(0))
    assert(byDoc.keySet === meta.keySet)
    byDoc.foreach { case (id, ws) =>
      val (frames, ch) = meta(id)
      assert(ws.length === ((frames + 999) / 1000).toInt)
      assert(ws.map(_.getLong(2)).sum === frames * ch) // all samples windowed
    }
  }

  test("multimodal_frames really decodes the committed animated gifs at the stride") {
    val rows = q("multimodal_frames").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === (0L until 24L).toSet)
    byDoc.foreach { case (id, fs) =>
      val expFrames = 2 + id * 5 % 19 // GenVideoFixture's formula
      // only a real container-directory scan recovers the frame count, and
      // only a real per-frame decode recovers the generator's dims
      assert(fs.head.getLong(2) === expFrames, s"n_frames of doc $id")
      val stride = graft.multimodal.Binary.FrameStride
      assert(fs.map(_.getLong(1)).sorted.toSeq ===
        (0L until expFrames by stride.toLong).toSeq, s"sampled indices of doc $id")
      fs.foreach { r =>
        assert(r.getLong(3) === 8 + id * 7 % 25, s"width of doc $id")
        assert(r.getLong(4) === 8 + id * 11 % 25, s"height of doc $id")
        assert(r.getLong(5) > 0L, s"pixels of doc $id frame ${r.getLong(1)} not summed")
      }
    }
    // distinct frames of one doc have distinct content → distinct checksums
    assert(byDoc(23L).map(_.getLong(5)).distinct.length === byDoc(23L).length)
  }

  test("text_langid scores and predicts deterministically") {
    val rows = q("text_langid").collect()
    assert(rows.length === 4)
    assert(rows.forall(r => Set("de", "en", "es", "fr", "zh", "und").contains(r.getString(6))))
  }

  test("text_fingerprint: identical normalized docs share the fingerprint") {
    val byDoc = q("text_fingerprint").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), Option(r.getString(2)))).toMap
    assert(byDoc(0L) === byDoc(1L))
    assert(byDoc(0L)._1 === 1L) // "a b c" → one trigram shingle
    assert(byDoc(2L) === ((0L, None))) // "x y" too short for trigrams
  }

  test("dedup_exact groups normalized duplicates") {
    val rows = q("dedup_exact").collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSeq // (keeper, dupes)
    assert(rows === Seq((0L, 2L), (2L, 1L), (3L, 1L)))
  }

  test("dedup_jaccard finds the a-b-c / a-b-d near pair") {
    val rows = q("dedup_jaccard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // jac(abc, abd) = 2/4 = 0.5 ; jac(abc, abc) = 1.0 (docs 0,1)
    assert(rows.contains((0L, 1L, 1.0)))
    assert(rows.contains((0L, 3L, 0.5)))
    assert(rows.contains((1L, 3L, 0.5)))
    assert(!rows.exists(r => r._1 == 2L || r._2 == 2L))
  }

  test("join_asof pairs each purchase with the latest earlier view") {
    val rows = q("join_asof").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(rows === Seq((2L, 1L), (4L, 3L)))
  }

  test("stream_session splits user 7 at the 40-min gap") {
    val rows = q("stream_session").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((7L, 1L, 2L), (7L, 2L, 2L), (8L, 1L, 1L)))
  }

  test("stream_tumbling buckets by hour") {
    val rows = q("stream_tumbling").collect()
    // hour 0: view(1,3) + purchase(2,5→user8 view) → events 1,2,5 in [0,60)
    // at minutes 0,10,20; events 3,4 at 50,55 are also hour 0
    assert(rows.map(_.getLong(2)).sum === 5L)
  }

  test("topk_per_group keeps 3 best orders per customer") {
    val rows = q("topk_per_group").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows === Seq((1L, 1L, 11L), (1L, 2L, 10L), (2L, 1L, 12L)))
  }

  test("agg_rollup emits leaf, subtotal and grand-total rows") {
    val rows = q("agg_rollup").collect()
    val total = rows.find(r => r.isNullAt(0) && r.isNullAt(1)).get
    assert(total.getLong(2) === 4L)
    assert(rows.length === 8) // 4 leaves + 3 flag subtotals + 1 total
  }

  test("join_left_outer counts orders per customer including zero") {
    val rows = q("join_left_outer").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(rows === Map(1L -> 2L, 2L -> 1L, 3L -> 0L))
  }

  test("udf_wordcount normalizes whitespace and case") {
    val rows = q("udf_wordcount").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows === Map(0L -> 3L, 1L -> 3L, 2L -> 2L, 3L -> 3L))
  }

  test("text_bigrams counts adjacent pairs across normalized docs") {
    val rows = q("text_bigrams").collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows("a b") === 3L)
    assert(rows("b c") === 2L)
    assert(rows("b d") === 1L)
  }

  test("dedup_minhash finds the exact-duplicate pair via banded LSH") {
    val rows = q("dedup_minhash").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows === Seq((0L, 1L, 1.0))) // docs 0,1 normalize identical
  }

  test("sim_knn_cosine ranks the aligned vector first") {
    val first = q("sim_knn_cosine").collect()
      .filter(r => r.getLong(0) == 0L && r.getLong(1) == 1L).head
    assert(first.getLong(2) === 1L) // nearest neighbor of e0 is e1
    assert(first.getDouble(3) > 0.99)
  }

  test("func_json extracts typed values") {
    val rows = q("func_json").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows === Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("entry returns the 3 ranked paraphrases of 'happy'") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length === 3)
    assert(rows.head.getString(0) === "glad")
  }
}
