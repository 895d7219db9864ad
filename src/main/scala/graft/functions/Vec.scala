package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over array<double> columns.
  *
  * Two implementations of the dot product:
  *  - `dot`: higher-order `aggregate(zip_with(...))` — general, but Spark
  *    evaluates lambda functions interpretively (one closure call per
  *    element), which dominates all-pairs similarity joins.
  *  - `dotUnrolled(dim)`: a fixed `dim`-term codegen'd arithmetic expression
  *    (`a[1]*b[1] + … + a[dim]*b[dim]`) — no lambdas, no intermediate
  *    array, stays inside whole-stage codegen. Bitwise-identical result:
  *    both are the same left-associated IEEE sum (the fold's `0.0 + x` seed
  *    is exact). Measured ~5× faster on the 2M-pair embedding join.
  *
  * The unrolled form requires vectors of length ≥ `dim` (`element_at`
  * throws under ANSI on out-of-bounds; `try_element_at` was measured and
  * rejected — its TryEval wrapper cost more than the lambda it replaced).
  */
object Vec {

  def dot(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

  def l2(a: String): Column =
    expr(s"sqrt(aggregate(transform($a, x -> x * x), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))")

  def dotUnrolled(a: String, b: String, dim: Int): Column =
    (1 to dim)
      .map(i => expr(s"element_at($a, $i) * element_at($b, $i)"))
      .reduce(_ + _)

  def l2Unrolled(a: String, dim: Int): Column =
    sqrt(dotUnrolled(a, a, dim))

  /** Native codegen'd kernels (graft.plans.VecExprs) — the preferred tier:
    * one call inside whole-stage codegen, any dimension, no per-element
    * closures, no intermediate arrays; bit-identical to the tiers above
    * (same left-fold IEEE order). Idempotently registers the extension
    * functions on the session first, so they work under sessions created
    * without `spark.sql.extensions` (the driver's Verify/Bench).
    */
  def dotNative(spark: org.apache.spark.sql.SparkSession, a: String, b: String): Column = {
    graft.plans.GraftExtensions.register(spark)
    call_function("dot_product", expr(a), expr(b))
  }

  def l2Native(spark: org.apache.spark.sql.SparkSession, a: String): Column = {
    graft.plans.GraftExtensions.register(spark)
    call_function("l2_norm", expr(a))
  }
}
