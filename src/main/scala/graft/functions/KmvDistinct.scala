package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al. 2002) —
  * the custom-sketch face of the aggregation surface, next to the built-in
  * HLL++ `approx_count_distinct`.
  *
  * Buffer = the k smallest distinct 64-bit hashes seen. If the kth-smallest
  * normalized hash is u_k ∈ (0,1), the distinct count ≈ (k−1)/u_k. The
  * buffer is tiny (k longs), associative and commutative, so Spark runs it
  * as a partial + final aggregate: at 100 TB each executor ships k·8 bytes
  * per group, never values. Standard error ≈ 1/√(k−2) (~6% at k=256).
  *
  * Input is a pre-hashed column (`xxhash64(col)`): hashing stays in
  * codegen'd SQL, the JVM aggregator only maintains the k-minimum set.
  */
class KmvDistinct(k: Int) extends Aggregator[Long, List[Long], Long] {
  require(k >= 16, "k < 16 gives useless variance")

  override def zero: List[Long] = Nil

  // sorted ascending, ≤ k elements, distinct
  override def reduce(b: List[Long], h: Long): List[Long] =
    if (b.contains(h)) b
    else if (b.size < k) (h :: b).sorted
    else if (h < b.last) (h :: b.init).sorted
    else b

  override def merge(b1: List[Long], b2: List[Long]): List[Long] =
    (b1 ++ b2).distinct.sorted.take(k)

  override def finish(b: List[Long]): Long =
    if (b.size < k) b.size.toLong
    else {
      // map signed long to (0,1): u = h/2^64 + 0.5
      val uK = b.last.toDouble / math.pow(2.0, 64) + 0.5
      math.round((k - 1) / uK)
    }

  // native array<bigint> buffer (codegen'd), not Encoders.kryo: Kryo needs
  // JPMS --add-opens under Java 17+ launchers that don't pass them
  override def bufferEncoder: Encoder[List[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
