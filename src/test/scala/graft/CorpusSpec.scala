package graft

import org.apache.spark.sql.functions._

import graft.queries.Corpus

/** Round-9 corpus-pipeline widening (SURVEY.md §2.19): boilerplate segment
  * removal, duplicated-substring spans, domain quota sampling, mixture
  * weights, exact EWMA, LPA communities, neighbor Jaccard, the Lloyd
  * clustering family (k-means / semantic dedup / diversity sample),
  * size-balanced sharding, temperature mixture allocation.
  */
class CorpusSpec extends SparkSpec {

  test("window_ewma matches the hand-computed dyadic values on the tiny events") {
    val d = TestTables.dir(spark)
    val got = SparkEntry.queries("window_ewma")(spark, d).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    // user 7 values 1,2,3,4 in ts order; α=1/2, cents, normalized by 1−2⁻ᵐ:
    // 1.0; (100+25)/75; (150+50+12.5)/87.5; (200+75+25+6.25)/93.75
    assert(got.toSeq === Seq(
      (7L, 1, 1.0), (7L, 2, 1.666667), (7L, 3, 2.428571), (7L, 4, 3.266667),
      (8L, 1, 5.0)))
  }

  test("text_seg_dedup reassembles docs losslessly when nothing is boilerplate") {
    val d = TestTables.dir(spark)
    // the 4 tiny docs share no 5-word segment → zero boilerplate and
    // clean_text must round-trip EXACTLY, empty split tokens included
    val out = SparkEntry.queries("text_seg_dedup")(spark, d)
      .join(graft.Tables.t(spark, d, "documents"), "doc_id")
    assert(out.count() === 4L)
    assert(out.filter(col("n_boiler") =!= 0L).count() === 0L)
    assert(out.filter(col("clean_text") =!= col("text")).count() === 0L)
  }

  test("dedup_substring_spans keeps gram-less docs with zero counts and NULL ratio") {
    val d = TestTables.dir(spark)
    val rows = SparkEntry.queries("dedup_substring_spans")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    // docs 0/2/3 have < 8 split tokens → no grams, NULL ratio (the
    // left-join keeps them); doc 1's whitespace padding splits into 9
    // tokens → 2 grams, none duplicated corpus-wide → ratio 0.0
    assert(rows.toSeq === Seq(
      (0L, 0L, 0L, null), (1L, 2L, 0L, 0.0), (2L, 0L, 0L, null), (3L, 0L, 0L, null)))
  }

  test("graph LPA and neighbor-jaccard are safe on an empty edge set") {
    val d = TestTables.dir(spark)
    // the tiny lineitem yields no support-≥2 co-purchase edge
    assert(SparkEntry.queries("graph_community_lpa")(spark, d).count() === 0L)
    assert(SparkEntry.queries("graph_neighbor_jaccard")(spark, d).count() === 0L)
  }

  test("sample_domain_quota keeps everything under quota and is rerun-stable") {
    val d = TestTables.dir(spark)
    val a = SparkEntry.queries("sample_domain_quota")(spark, d).collect().toSeq
    val b = SparkEntry.queries("sample_domain_quota")(spark, d).collect().toSeq
    assert(a.length === 4 && a === b) // 4 docs over 3 sources, all ≤ quota
  }

  test("data_mixture_weights is the identity on a single-language corpus") {
    val d = TestTables.dir(spark)
    val r = SparkEntry.queries("data_mixture_weights")(spark, d).collect()
    assert(r.length === 1)
    assert(r(0).getString(0) === "en")
    assert(r(0).getDouble(3) === 1.0 && r(0).getDouble(4) === 1.0)
  }

  test("embedding_kmeans fixes each tiny vector as its own zero-distance centroid") {
    val d = TestTables.dir(spark)
    // 4 vectors < K=8 → every vector seeds a centroid; Lloyd must leave
    // each in its own cluster at exact squared distance 0 (any drift
    // would mean the integer update rule moved a centroid it shouldn't)
    val rows = SparkEntry.queries("embedding_kmeans")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq === Seq((0L, 0L, 0L), (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L)))
  }

  test("dedup_semantic keeps singleton clusters with a NULL neighbor") {
    val d = TestTables.dir(spark)
    // the 4 tiny vectors each seed their own cluster (see the kmeans test
    // above), so every cluster is a singleton: the sorted-neighborhood
    // pairing must produce NO candidates and keep all rows with NULL nn
    val rows = SparkEntry.queries("dedup_semantic")(spark, d).collect()
    assert(rows.length === 4)
    assert(rows.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("sample_diversity takes each singleton cluster's own vector at distance 0") {
    val d = TestTables.dir(spark)
    val rows = SparkEntry.queries("sample_diversity")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === Seq((0L, 1L, 0L, 0L), (1L, 1L, 1L, 0L),
      (2L, 1L, 2L, 0L), (3L, 1L, 3L, 0L)))
  }

  test("doc_shard_assign covers every doc exactly once in contiguous shards") {
    val d = TestTables.dir(spark)
    val docs = graft.Tables.t(spark, d, "documents").count()
    val m = SparkEntry.queries("doc_shard_assign")(spark, d).collect()
    assert(m.map(_.getLong(1)).sum === docs) // partition: every doc in exactly one shard
    // contiguity: each shard's id range starts right after the previous one's
    val sorted = m.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) => assert(b.getLong(3) === a.getLong(4) + 1)
      case _           =>
    }
  }

  test("sample_coreset radii are monotone non-increasing (the k-center certificate)") {
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory, "driver testdata not present")
    val rows = SparkEntry.queries("sample_coreset")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.length === 8 && rows.head === ((1L, 0L)))
    rows.drop(1).sliding(2).foreach {
      case Array((_, a), (_, b)) => assert(b <= a)
      case _                     =>
    }
  }

  test("dedup_semantic: quadratic candidate twin is row-identical to the SNM equi-join") {
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory, "driver testdata not present")
    val snm = Corpus.semanticNn(spark, sf).collect().toSeq
    val quad = Corpus.semanticNn(spark, sf, quadratic = true).collect().toSeq
    assert(quad === snm)
  }

  test("doc_shard_assign: blocked PrefixScan form is row-identical to the window form") {
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory, "driver testdata not present")
    val win = Corpus.shardManifest(spark, sf, blocked = Some(false)).collect().toSeq
    val blk = Corpus.shardManifest(spark, sf, blocked = Some(true)).collect().toSeq
    assert(blk === win)
  }

  test("sample_temperature allocations are exact-sqrt-weighted and sum to the budget") {
    val d = TestTables.dir(spark)
    val rows = SparkEntry.queries("sample_temperature")(spark, d).collect()
    assert(rows.map(_.getLong(3)).sum === 10000L) // largest-remainder hits the budget exactly
    rows.foreach { r =>
      val (nt, w) = (r.getLong(1), r.getLong(2))
      assert(w * w <= nt && (w + 1) * (w + 1) > nt) // w is the EXACT integer sqrt
    }
  }

  test("the corpus ops find real signal in the driver testdata") {
    val sf = "/root/testdata/sf0.01"
    assume(new java.io.File(sf).isDirectory, "driver testdata not present")
    val seg = SparkEntry.queries("text_seg_dedup")(spark, sf)
    assert(seg.agg(sum(col("n_boiler"))).head.getLong(0) > 0L)
    val spans = SparkEntry.queries("dedup_substring_spans")(spark, sf)
    assert(spans.agg(sum(col("n_dup"))).head.getLong(0) > 0L)
    val lpa = SparkEntry.queries("graph_community_lpa")(spark, sf)
    val (nodes, comms) = (lpa.count(),
      lpa.agg(countDistinct(col("community"))).head.getLong(0))
    assert(comms > 1L && comms < nodes) // propagation happened, nontrivially
    val jac = SparkEntry.queries("graph_neighbor_jaccard")(spark, sf)
    assert(jac.count() === 100L)
    val quota = SparkEntry.queries("sample_domain_quota")(spark, sf)
    assert(quota.groupBy(col("source")).count()
      .filter(col("count") > 10).count() === 0L)
    val km = SparkEntry.queries("embedding_kmeans")(spark, sf)
      .groupBy(col("cluster")).count().collect()
    assert(km.length === 8 && km.forall(_.getLong(1) > 0L)) // no cluster collapses
    // no singleton clusters at sf0.01 → every vector has an SNM candidate
    val sem = SparkEntry.queries("dedup_semantic")(spark, sf)
    assert(sem.filter(col("nn_id").isNull).count() === 0L)
    val div = SparkEntry.queries("sample_diversity")(spark, sf)
    assert(div.count() === 40L) // 8 clusters × DivM
  }
}
