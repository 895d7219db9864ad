package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF-PQ approximate nearest-neighbor search — the composition the two
  * parent operators were built to meet (FAISS's IndexIVFPQ, the standard
  * billion-scale ANN architecture; Jégou et al. TPAMI 2011 §V): an
  * [[AnnIvf]]-style coarse quantizer PRUNES the search to `nProbe` of
  * `nLists` cells, then an [[AnnPq]] compressed-domain ADC scan ranks only
  * the probed cells' code rows, and the exact cosine re-rank reports. At
  * 100 TB the two mechanisms compose multiplicatively: the probe touches
  * ~nProbe/nLists of the corpus, and what it touches is read as m code
  * bytes per vector instead of dim·8 — neither parent alone gets both the
  * candidate cut and the bandwidth cut.
  *
  * Variant note: codes quantize the unit-normalized vectors DIRECTLY (the
  * FAISS `by_residual=false` flavor), not the cell residuals — residual
  * encoding buys accuracy at equal code length but couples the codebooks
  * to the coarse quantizer; the direct flavor keeps the PQ codebooks
  * cell-independent, which is what lets this operator reuse [[AnnPq]]'s
  * fit/encode/LUT machinery verbatim (and lets a deployment re-fit the
  * coarse level without re-encoding the corpus). The recall cost is
  * covered by the family's √n re-rank list, gate-pinned like the parents.
  *
  * Everything bounded/deterministic by inheritance: both fits are seeded
  * executor-side passes over hash-ordered samples; assignment + encode is
  * ONE map pass emitting (vec_id, list_id, codes); the ADC scan joins the
  * broadcast probe list on list_id (equi-join, no cross product against
  * the corpus); top-`rerank` is the two-phase heap pattern; the exact
  * re-rank join touches ≤ rerank·q ids.
  */
object AnnIvfPq {

  /** Adaptive composition: coarse width from [[AnnIvf.listsFor]] (clamped
    * to the one-task fit bound — the hierarchical extension composes the
    * same way), code budget + √n re-rank from the [[AnnPq.topKAdaptive]]
    * ladder, nProbe = nLists/2 (the family's scale-constant probed
    * fraction, which is also what the ≥0.8 recall bars are pinned at).
    */
  def topKAdaptive(emb: DataFrame, queries: DataFrame, k: Int = 5): DataFrame = {
    val n = emb.count()
    val lists = math.min(AnnIvf.listsFor(n), AnnIvf.MaxLists)
    val (m, kSub) = if (n < AnnPq.BigCorpus) (8, 32) else (16, 256)
    val rerank = math.max(128L, math.ceil(math.sqrt(n.toDouble)).toLong)
      .min(Int.MaxValue.toLong).toInt
    topK(emb, queries, k, nLists = lists, nProbe = math.max(1, lists / 2),
      m = m, kSub = kSub, rerank = rerank)
  }

  /** Top-k approximate neighbors through the pruned compressed scan.
    * emb: (vec_id, vec array<double>); queries: (qid, qvec array<double>).
    */
  def topK(
      emb0: DataFrame,
      queries0: DataFrame,
      k: Int = 5,
      nLists: Int = 16,
      nProbe: Int = 8,
      m: Int = 8,
      kSub: Int = 32,
      rerank: Int = 128): DataFrame = {

    def requireVec(vec: Column, side: String): Column =
      when(vec.isNotNull, vec).otherwise(raise_error(lit(
        s"AnnIvfPq: null $side vector (ANN input contract: filter null embeddings upstream)")))
    val emb = emb0.withColumn("vec", requireVec(col("vec"), "corpus"))
    val queries = queries0.withColumn("qvec", requireVec(col("qvec"), "query"))
    val spark = emb.sparkSession

    // spherical coarse quantizer: cells live on the unit sphere like the
    // codes, so cell-nearness tracks angle, not magnitude. The unit frame
    // is built from ONE pre-sampled slice, not the whole corpus: both fits
    // sample the top-cap rows by (xxhash64(vec_id), vec_id), so sampling
    // the max of the two caps FIRST and normalizing only those rows gives
    // each fit its exact same sample (re-sampling a hash-ordered superset
    // by the same key is a prefix) while the per-row normalize UDF runs
    // O(cap) times instead of O(n) — at the 4.2M rung that was a full
    // redundant corpus pass per fit (review finding, round 16b).
    val capC = AnnIvf.sampleCapFor(nLists)
    val capB = math.max(4096, 16 * kSub)
    val normalizeUdf = udf((v: Seq[Double]) => AnnPq.normalize(v.toArray).toSeq)
    val unitSample = emb
      .select(col("vec_id"), col("vec"),
        pmod(xxhash64(col("vec_id")), lit(1000000007L)).as("hk"))
      .orderBy(col("hk"), col("vec_id"))
      .limit(math.max(capC, capB))
      .select(col("vec_id"), normalizeUdf(col("vec")).as("vec"))
      .localCheckpoint() // both fits scan it; ≤ max(capC, capB) rows

    val centers = AnnIvf.fitCentroids(unitSample, nLists, iters = 5,
      sampleCap = capC)
    val books = AnnPq.fitCodebooks(unitSample, m, kSub, iters = 5,
      sampleCap = capB)
    if (centers.isEmpty || books.isEmpty) {
      return queries
        .select(col("qid"), lit(0L).as("rnk"), col("qid").as("nid"), lit(0.0).as("cos"))
        .limit(0)
    }
    val centersB = spark.sparkContext.broadcast(centers)

    // one map pass: cell assignment + PQ encode on the unit vector
    val assignUdf = udf((v: Seq[Double]) => {
      val u = AnnPq.normalize(v.toArray)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < centersB.value.length) {
        val cv = centersB.value(c)
        var s = 0.0; var i = 0
        while (i < u.length) { val dx = u(i) - cv(i); s += dx * dx; i += 1 }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      best
    })
    val coded = emb
      .repartition(spark.sparkContext.defaultParallelism, col("vec_id"))
      .select(col("vec_id"),
        assignUdf(col("vec")).as("list_id"),
        AnnPq.encoder(books)(col("vec")).as("codes"))

    // probe: nProbe nearest cells per (tiny) query, on the unit query
    val nProbe0 = math.min(nProbe, centers.length)
    val probeUdf = udf((qv: Seq[Double]) =>
      AnnIvf.rankedIdx(centersB.value, AnnPq.normalize(qv.toArray)).take(nProbe0))
    val probed = queries.withColumn("probe", explode(probeUdf(col("qvec"))))

    // pruned ADC scan: equi-join coded rows to the broadcast probe list —
    // only probed cells' codes are ever scored
    val scored = coded
      .join(broadcast(probed.select(col("qid"), col("probe"))),
        col("list_id") === col("probe") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        AnnPq.adcScorer(queries, books)(col("codes"), col("qid")).as("score"))
    // no dedup needed: each vec_id lives in exactly ONE cell and the probe
    // list is distinct cells per query, so (qid, vec_id) pairs are unique
    val cands = AnnPq.topRerank(scored, rerank)
    AnnPq.exactRerank(cands, emb, queries, k)
  }
}
