package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PPDB release-line splitter — the engine's reference custom
  * Catalyst `Expression` (SURVEY.md §4 named it the only candidate native
  * expression, to be adopted "only if bench demands it").
  *
  * Measured against the built-in regex `split` on 240k lines: first-run
  * 0.61 s vs 1.15 s, warm 0.39 s vs 0.27 s — the warm JVM regex on a
  * literal pattern is already efficient, so the hot path keeps the
  * built-in and this class stays as the documented extension surface
  * ("measure, don't guess").
  *
  * Demonstrates the full native-expression contract: analysis-time type
  * check, null-safe interpreted eval, AND `doGenCode` so the expression
  * stays inside whole-stage codegen (a Scala UDF here would break the
  * codegen stage and hide the projection from the optimizer).
  *
  * Registered as SQL function `ppdb_split` via [[GraftExtensions]]
  * (`spark.sql.extensions`) or imperatively via [[GraftExtensions.register]].
  */
case class PpdbSplitLine(child: Expression) extends UnaryExpression {

  // ExpectsInputTypes is not implementable outside spark.sql in 4.x
  // (AbstractDataType is private[sql]) — check manually at analysis time
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppdb_split expects a string column, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ppdb_split"

  override protected def nullSafeEval(input: Any): Any =
    PpdbSplitLine.split(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PpdbSplitLine.split($c)")

  override protected def withNewChildInternal(newChild: Expression): PpdbSplitLine =
    copy(child = newChild)
}

object PpdbSplitLine {

  private val Delim = UTF8String.fromString(" ||| ")

  /** Single forward scan over the line; shared by interpreted eval and the
    * generated code (static call keeps the codegen'd method tiny).
    */
  def split(line: UTF8String): ArrayData = {
    val parts = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val n = line.numChars()
    var start = 0
    var idx = line.indexOf(Delim, 0)
    while (idx >= 0) {
      parts += line.substring(start, idx)
      start = idx + 5
      idx = line.indexOf(Delim, start)
    }
    parts += line.substring(start, n)
    new GenericArrayData(parts.toArray[Any])
  }
}
