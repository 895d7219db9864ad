package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Weighted-quantile sketch via a deterministic weight-proportional sample —
  * the 100 TB approximate path next to the exact `agg_weighted_median`
  * (which needs a full prefix scan of every group).
  *
  * Sampling scheme: A-ES exponential keys (Efraimidis–Spirakis 2006): each
  * row carries e = −ln(u)/w with u a SEEDED md5-uniform in (0,1], and the
  * sketch keeps the k smallest keys. Inclusion probability is ∝ weight
  * (without replacement), so the UNWEIGHTED order statistics of the sampled
  * values estimate the WEIGHTED population quantiles; the lower sample
  * median estimates the weighted median. The key is computed in codegen'd
  * SQL (md5 → 52-bit uniform → −ln(u)/w, the `sample_hash` portable-coin
  * family), so the JVM aggregator only maintains the k-smallest set — the
  * KMV pattern (functions.KmvDistinct).
  *
  * Scale shape: the buffer is ≤ k (key, value, weight) triples kept
  * UNSORTED with the current max cached — filling is O(1) per row, the
  * full-buffer no-op path (key ≥ max) is O(1), and the O(k) evict+rescan
  * path fires only ~k·ln(n/k) times per group. Associative + commutative,
  * so Spark runs it as a partial + final aggregate: executors ship ≤ 24k
  * bytes per group, never rows, and no per-group sort of the data ever
  * happens. Deterministic: the coins are md5 of stable row identity and
  * ties order by the full (key, value, weight) triple, so every run and
  * any partial/final split keeps the same multiset.
  *
  * Exactness floor: a group with < k rows keeps ALL rows, and `finish`
  * then computes the EXACT weighted median from the buffered weights — the
  * sketch only approximates where the group outgrows the buffer. Rank
  * error of the sample median concentrates as ~0.5/√k (≈0.8% at k=4096;
  * realized value error ≤2.4% on the test corpora — Round9Spec pins it
  * ≤5% against the exact twin at two scale factors). k dials accuracy vs
  * the 24k-bytes-per-group buffer.
  */
class WeightedMedianSketch(k: Int)
  extends Aggregator[
    (Double, Double, Double),
    (Int, (Double, Double, Double), List[(Double, Double, Double)]),
    Double] {
  require(k >= 16, "k < 16 gives useless variance")

  /** (size, cached max element — valid when size > 0, unsorted triples). */
  type Buf = (Int, (Double, Double, Double), List[(Double, Double, Double)])

  private val ord = Ordering[(Double, Double, Double)]

  override def zero: Buf = (0, (0.0, 0.0, 0.0), Nil)

  private def removeOne(
      b: List[(Double, Double, Double)],
      x: (Double, Double, Double)): List[(Double, Double, Double)] = {
    val (pre, post) = b.span(_ != x)
    pre ::: post.drop(1)
  }

  override def reduce(b: Buf, x: (Double, Double, Double)): Buf =
    if (b._1 < k)
      (b._1 + 1, if (b._1 == 0 || ord.gt(x, b._2)) x else b._2, x :: b._3)
    else if (ord.lt(x, b._2)) {
      val kept = x :: removeOne(b._3, b._2)
      (k, kept.max(ord), kept)
    } else b

  override def merge(b1: Buf, b2: Buf): Buf = {
    if (b1._1 == 0) b2
    else if (b2._1 == 0) b1
    else {
      val all = (b1._3 ::: b2._3).sorted(ord).take(k)
      (all.length, all.last, all)
    }
  }

  override def finish(b: Buf): Double =
    if (b._1 == 0) Double.NaN
    else if (b._1 < k) {
      // the whole group fits: exact weighted median (smallest value whose
      // cumulative weight reaches half the total — the twin's definition)
      val byV = b._3.map { case (_, v, w) => (v, w) }.sortBy(_._1)
      val tot = byV.iterator.map(_._2).sum
      var cum = 0.0
      byV.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
    } else {
      // weight-proportional sample: lower unweighted median of the values
      val vals = b._3.map(_._2).sorted
      vals((vals.length - 1) / 2)
    }

  // native nested-product buffer (codegen'd), not Encoders.kryo: Kryo needs
  // JPMS --add-opens under Java 17+ launchers that don't pass them
  override def bufferEncoder: Encoder[Buf] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
