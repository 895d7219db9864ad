package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LSH-bucketed embedding near-dup pairs — the 100 TB path that replaces
  * the broadcast-capped all-pairs kernel (operators.CosinePairs) for
  * unbounded inputs: random-hyperplane buckets (the AnnLsh machinery) are
  * the BLOCKING KEY, the exact cosine runs only inside buckets, and the
  * declared semantics are "pairs that collide in ≥1 of nTables tables AND
  * cos ≥ threshold" — exactly mirrorable in SQL (the oracle embeds the
  * same ±1 plane literals), unlike a recall-based approximation.
  *
  * Scale design:
  * - The plane count ADAPTS to the corpus: nPlanes = smallest k with
  *   2^k ≥ ceil(n / TargetBucket), so mean bucket occupancy stays
  *   ~TargetBucket and per-table candidate work stays LINEAR in n
  *   (n/2^nPlanes per bucket × 2^nPlanes buckets × occupancy), instead of
  *   quadratic blow-up inside fixed buckets. Derived from an EXACT count
  *   (one metadata-cheap job) — the oracle mirrors it from count(*), which
  *   a byte-based plan estimate could not match. The prefix property of
  *   AnnLsh.planes means every adaptive choice selects a prefix of one
  *   fixed plane matrix.
  * - `maxBucketSize` is the standard skew guard (MinHashLsh.maxBucketSize
  *   family): a degenerate corpus (all-identical vectors) collapses into
  *   one bucket whose pair count is quadratic — such buckets are dropped,
  *   deterministically, and the oracle drops them identically (HAVING
  *   count ≤ cap). Sized not to bind at any test scale.
  * - One shuffle on the packed (table, bucket) key; the index replicates
  *   each vector nTables times (the textbook LSH space/recall trade).
  *   The cosine runs INSIDE the bucket-join stage (codegen'd, no shuffle)
  *   and the (a_id, b_id) dedup happens AFTER the threshold filter, on
  *   slim (a_id, b_id, cos) rows — see the note at the join below.
  *
  * Recall (vs true all-pairs) follows the Charikar collision bound
  * p = (1 − θ/π)^nPlanes per table, OR-amplified over nTables — tuned for
  * genuine near-dups (cos ≥ 0.9), where it stays high as nPlanes grows;
  * the test corpus' random near-orthogonal pairs are the hard case and
  * Round9Spec pins the blocked-pair semantics exactly instead.
  */
object AnnDedup {

  /** Adaptive-plane bounds: 4 ⇒ ≥16 buckets/table even on tiny inputs;
    * 26 ⇒ 67M buckets/table, enough for ~4.3 BILLION vectors at
    * TargetBucket=64 — above the O(10⁹)-vector embedding table a 100 TB
    * corpus implies (VERDICT r11 item 2 raised the r9→r11 ceiling of 20 ≈
    * 67M vectors, which sat BELOW that bar). The oracle's plane literals
    * and CASE ladder are GENERATED from this constant
    * (queries.Extras.annDedupOracleSql) and AnnLsh.planes is row-major
    * prefix-stable, so raising it regenerates both sides consistently; the
    * packed (table, bucket) key stays well inside a long
    * (nTables·2^MaxPlanes = 8·2^26 ≈ 5.4e8). Beyond the ceiling the ladder
    * CLAMPS: mean bucket occupancy grows as n/(2^MaxPlanes·64) and
    * per-bucket pair work with its square — raise MaxPlanes again before
    * running corpora past ~4.3B vectors (Round9Spec pins the clamp boundary
    * so the limit is visible, not silent).
    */
  val MinPlanes = 4
  val MaxPlanes = 26

  /** Mean bucket occupancy the adaptive plane count aims for. */
  val TargetBucket = 64L

  /** Smallest k in [MinPlanes, MaxPlanes] with 2^k ≥ ceil(n/TargetBucket) —
    * integer arithmetic only, so the DuckDB mirror (a CASE ladder over the
    * same thresholds) cannot diverge on a float-log boundary.
    */
  def adaptivePlanes(n: Long): Int = {
    val q = (math.max(n, 1L) + TargetBucket - 1) / TargetBucket
    (MinPlanes to MaxPlanes).find(k => (1L << k) >= q).getOrElse(MaxPlanes)
  }

  /** Pairs (a_id < b_id) colliding in ≥1 LSH table with cosine ≥ threshold.
    * Input df: (id, vec: array<double>[dim]). Output: (a_id, b_id, cos).
    *
    * The bucketed index feeds THREE consumers (the skew-guard count and
    * both self-join sides), so each re-runs the plane kernel — deliberate:
    * the checkpointed alternative (`reuseIndex = true`, kept for AbBench)
    * measured SLOWER at both test scales (1.37× at sf0.1, 1.50× at the
    * 10× proxy, interleaved ×5 — BASELINE round 9): materializing the
    * nTables-replicated index serializes the fat vec column nTables times,
    * which costs more than three passes of the codegen'd kernel. Same
    * recompute-beats-checkpoint economics the repo measured for the
    * two-pass prefix scans; revisit only if the kernel stops being
    * CPU-cheap relative to index width (e.g. much higher dim · nPlanes).
    */
  def pairs(
      emb: DataFrame,
      threshold: Double,
      dim: Int,
      nTables: Int,
      maxBucketSize: Long,
      reuseIndex: Boolean = false): DataFrame = {
    val s = emb.sparkSession
    val npl = adaptivePlanes(emb.count())
    // fan out before the CPU-bound bucket kernel — a one-file scan arrives
    // as a single partition
    val raw = emb
      .repartition(s.sparkContext.defaultParallelism, col("id"))
      .select(col("id"), col("vec"),
        explode(AnnLsh.tableBuckets(col("vec"), npl, dim, nTables)).as("bucket"))
    val bucketed = if (reuseIndex) raw.localCheckpoint() else raw
    // skew guard: drop over-occupied buckets (count frame is ≤ nTables·2^npl
    // rows — far smaller than the data; no broadcast hint so the planner
    // stays free at any bucket count)
    val ok = bucketed.groupBy("bucket").agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") <= maxBucketSize)
      .select("bucket")
    val pruned = bucketed.join(ok, Seq("bucket"), "left_semi")
    val a = pruned.select(col("bucket"), col("id").as("a_id"), col("vec").as("va"))
    val b = pruned.select(col("bucket"), col("id").as("b_id"), col("vec").as("vb"))
    val dot = graft.functions.Vec.dotNative(s, "va", "vb")
    val (na, nb) = (graft.functions.Vec.l2Native(s, "va"),
      graft.functions.Vec.l2Native(s, "vb"))
    // The cosine runs in the SAME stage as the bucket join (whole-stage
    // codegen, zero extra shuffle) and the (a_id, b_id) dedup runs after
    // the threshold filter on slim 24-byte rows. The pre-cosine dedup this
    // replaces (round ≤11) shuffled every candidate pair CARRYING BOTH
    // VECTORS — ~1 KB/row at dim 64, multi-GB once candidates hit O(10M) —
    // and turned 18× superlinear at the sf3 rung from spill. A pair that
    // collides in k tables now pays k kernel calls (~dim multiplies each,
    // far cheaper than shuffling 2·dim doubles), every duplicate computes a
    // BIT-IDENTICAL cos from the same vectors, so keeping an arbitrary
    // duplicate is deterministic and the declared semantics are unchanged.
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .withColumn("cos", dot / (na * nb))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("cos"))
      .dropDuplicates("a_id", "b_id")
  }
}
