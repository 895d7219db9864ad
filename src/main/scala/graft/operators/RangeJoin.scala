package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed range join: `left.point ∈ [right.start, right.end]` WITHOUT a
  * selective equi key.
  *
  * Spark plans a pure interval predicate as a nested-loop join — O(n·m) at
  * any scale. The standard fix (the same one behind Databricks' range-join
  * optimization) manufactures an equi key: chunk the value domain into
  * fixed-width buckets; each point lands in exactly one bucket, each
  * interval replicates to every bucket it overlaps, and the join becomes
  * `bucket equality (+ optional real keys) AND exact residual`. Cost:
  * O(points + Σ interval_width/bucket) shuffled rows instead of n·m pairs —
  * and because a point owns exactly ONE bucket, no pair dedup is needed.
  *
  * Pick `bucketWidth` ≈ the typical interval length: too small replicates
  * intervals widely, too large packs unrelated rows per bucket. `maxBuckets`
  * guards against degenerate giant intervals (they'd replicate everywhere);
  * rows exceeding it are dropped and should be handled out-of-band (e.g. a
  * broadcast side-join of the handful of huge intervals).
  *
  * Domain: non-negative longs (epoch µs/ms/s); `div` is floor there.
  */
object RangeJoin {

  def pointInInterval(
      left: DataFrame,
      right: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long,
      extraKeys: Seq[(String, String)] = Nil,
      maxBuckets: Int = 1000): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val shared = left.columns.toSet.intersect(right.columns.toSet)
    require(shared.isEmpty, s"left/right column names must be disjoint; shared: $shared")

    val l = left.withColumn("__bucket", expr(s"$pointCol div $bucketWidth"))
    val r = right
      .withColumn("__b0", expr(s"$startCol div $bucketWidth"))
      .withColumn("__b1", expr(s"$endCol div $bucketWidth"))
      .filter(col("__b1") - col("__b0") < maxBuckets) // degenerate-interval guard
      .withColumn("__bucket_r", explode(sequence(col("__b0"), col("__b1"))))
      .drop("__b0", "__b1")

    val cond = (extraKeys.map { case (lk, rk) => col(lk) === col(rk) } ++ Seq(
      col("__bucket") === col("__bucket_r"),
      col(pointCol) >= col(startCol),
      col(pointCol) <= col(endCol))).reduce(_ && _)

    l.join(r, cond).drop("__bucket", "__bucket_r")
  }
}
