package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension wiring (SURVEY.md §3.2 / §4): injects the custom
  * expressions into Catalyst's function registry.
  *
  * Two entry points:
  *  - declarative: `--conf spark.sql.extensions=graft.plans.GraftExtensions`
  *    (the production path — every session on the cluster gets the
  *    functions at analyzer time);
  *  - imperative: `GraftExtensions.register(spark)` for sessions the caller
  *    doesn't control the conf of (the driver's Verify/Bench sessions).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => VecRewrite)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      (
        FunctionIdentifier("ppdb_split"),
        new ExpressionInfo(
          classOf[PpdbSplitLine].getCanonicalName,
          "ppdb_split",
          "ppdb_split(line) - one-pass split of a PPDB release line on ' ||| '"),
        (args: Seq[Expression]) => PpdbSplitLine(args.head)),
      (
        FunctionIdentifier("dot_product"),
        new ExpressionInfo(
          classOf[DotProduct].getCanonicalName,
          "dot_product",
          "dot_product(a, b) - codegen'd double-array dot product (left-fold IEEE order)"),
        (args: Seq[Expression]) => DotProduct(args.head, args(1))),
      (
        FunctionIdentifier("l2_norm"),
        new ExpressionInfo(
          classOf[L2Norm].getCanonicalName,
          "l2_norm",
          "l2_norm(a) - codegen'd double-array L2 norm (left-fold IEEE order)"),
        (args: Seq[Expression]) => L2Norm(args.head)))

  /** Idempotent imperative registration into an existing session: the
    * function registry plus the [[VecRewrite]] auto-vectorization rule
    * (via `experimental.extraOptimizations`, the imperative counterpart of
    * `injectOptimizerRule`).
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(VecRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRewrite
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }
}
