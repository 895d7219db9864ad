package graft

import org.apache.spark.sql.functions._

/** Product-quantization ANN (operators.AnnPq / `sim_ann_pq`, round 16):
  * the family recall bar vs the brute-force twin, exactness of reported
  * cosines (the ADC pass may only choose CANDIDATES — never values),
  * determinism, and the fit/encode edge contracts.
  */
class AnnPqSpec extends SparkSpec {

  private lazy val d = TestTables.dir(spark)
  private def q(name: String) = SparkEntry.queries(name)(spark, d)

  // the Round5Spec recall harness, at the driver's correctness scale
  private def top5(name: String, sf: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (qid, a) => (qid, a.map(_._2).toSet) }

  test("sim_ann_pq recall@5 >= 0.8 vs brute force over all 10 queries at sf0.01") {
    assume(new java.io.File("/root/testdata/sf0.01").isDirectory)
    val sf = "/root/testdata/sf0.01"
    val exact = top5("sim_knn_cosine", sf)
    val approx = top5("sim_ann_pq", sf)
    val recalls = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
    }
    val r = recalls.sum / recalls.size
    assert(r >= 0.8, f"PQ mean recall@5 = $r%.3f")
  }

  test("reported cosines are EXACT: every (qid, nid, cos_sim) row matches the brute-force value") {
    // the exact re-rank contract — approximation may drop a neighbor from
    // the candidate set, but a reported cosine must be the kernel-exact one
    val exact = q("sim_knn_cosine").collect()
      .map(r => ((r.getLong(0), r.getLong(2)), r.getDouble(3))).toMap
    val emb = Tables.t(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val pq = q("sim_ann_pq").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(pq.nonEmpty)
    for ((qid, nid, cos) <- pq) {
      val want = exact.getOrElse((qid, nid), {
        // neighbor outside the twin's top-5: recompute brute force
        val a = emb(qid); val b = emb(nid)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        math.floor(dot / (math.sqrt(na) * math.sqrt(nb)) * 1e4 + 0.5) / 1e4
      })
      assert(math.abs(cos - want) < 1e-9, s"($qid, $nid): reported $cos, exact $want")
    }
  }

  test("recall holds at the 4.2M-vector rung (codebooks from a 4096-row sample of 4.2M)") {
    // the Round13Spec emb4m gate for the PQ family: the fit sample is a
    // fixed 4096 rows however large the corpus grows, so this pins that
    // sample-fit codebooks still rank well at 1000x the sample size
    assume(new java.io.File("/tmp/emb4m/embeddings.parquet").exists)
    val sf = "/tmp/emb4m"
    val exact = Emb4mExact.top5(spark) // shared with the IVF rung gate
    val approx = top5("sim_ann_pq", sf)
    val recalls = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
    }
    val r = recalls.sum / recalls.size
    info(f"sim_ann_pq mean recall@5 at 4.2M vectors = $r%.3f")
    assert(r >= 0.8, f"PQ mean recall@5 at 4.2M = $r%.3f")
  }

  test("deterministic: two runs produce identical rows") {
    val a = q("sim_ann_pq").collect().map(_.toString).toSeq
    val b = q("sim_ann_pq").collect().map(_.toString).toSeq
    assert(a === b)
  }

  // ---- the IVF-PQ composition (sim_ann_ivfpq) ----

  test("sim_ann_ivfpq recall@5 >= 0.8 vs brute force over all 10 queries at sf0.01") {
    assume(new java.io.File("/root/testdata/sf0.01").isDirectory)
    val sf = "/root/testdata/sf0.01"
    val exact = top5("sim_knn_cosine", sf)
    val approx = top5("sim_ann_ivfpq", sf)
    val recalls = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
    }
    val r = recalls.sum / recalls.size
    assert(r >= 0.8, f"IVF-PQ mean recall@5 = $r%.3f")
  }

  test("sim_ann_ivfpq recall holds at the 4.2M-vector rung (prune AND compress)") {
    assume(new java.io.File("/tmp/emb4m/embeddings.parquet").exists)
    val exact = Emb4mExact.top5(spark) // shared ground truth
    val approx = top5("sim_ann_ivfpq", "/tmp/emb4m")
    val recalls = exact.map { case (qid, ex) =>
      approx.getOrElse(qid, Set.empty[Long]).intersect(ex).size / ex.size.toDouble
    }
    val r = recalls.sum / recalls.size
    info(f"sim_ann_ivfpq mean recall@5 at 4.2M vectors = $r%.3f")
    assert(r >= 0.8, f"IVF-PQ mean recall@5 at 4.2M = $r%.3f")
  }

  test("fitCodebooks: empty corpus yields empty books; topK yields empty result") {
    val de = TestTables.dirEmpty(spark)
    val out = SparkEntry.queries("sim_ann_pq")(spark, de)
    assert(out.count() === 0L)
  }

  test("dim not divisible by m fails loudly (a ragged slice would mis-encode silently)") {
    val emb = spark.range(0, 50)
      .selectExpr("id as vec_id", "array(cast(id as double), 1.0d, 2.0d) as vec") // dim 3
    val qs = emb.limit(1).selectExpr("vec_id as qid", "vec as qvec")
    val e = intercept[Throwable] {
      graft.operators.AnnPq.topK(emb, qs, k = 1, m = 2, kSub = 4, rerank = 4).collect()
    }
    def chain(t: Throwable): String = {
      var x = t; val sb = new StringBuilder
      while (x != null) { sb.append(x.getMessage).append('\n'); x = x.getCause }
      sb.toString
    }
    assert(chain(e).contains("not divisible"), s"unexpected failure: ${chain(e).take(300)}")
  }
}
