package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native text-sketch expressions (SURVEY.md §4 tier (b)), sibling of
  * [[VecExprs]].
  */
object TextExprs {

  /** Full MinHash signature of a shingle array in ONE pass: per shingle,
    * hash once (the same `XxHash64Function` the builtin `xxhash64` calls,
    * seed 42) and update all k running minima — replacing k separate
    * interpreted `array_min(transform(...))` lambda folds, each of which
    * re-walks the array and allocates an intermediate copy.
    *
    * Parity contract with the expression form it replaces
    * (`array_min(transform(base, h -> pmod(h·a_i + b_i, P)))` over
    * `base = transform(sh, s -> pmod(xxhash64(s), P))`):
    * identical hash (same function, same seed), identical pmod arithmetic
    * (all operands non-negative after the first pmod, products < 2⁶⁰ — no
    * overflow under ANSI), null shingles hash to the SEED exactly as the
    * builtin `xxhash64(null)` does (hash expressions skip null inputs and
    * return the running seed), empty input → all-null signature exactly as
    * `array_min(empty) = null`, and a NULL input ARRAY → all-null signature
    * (handled in [[MinHashSig.eval]]: `transform(NULL)` nulls each slot but
    * the outer `array(...)` constructor never returns SQL NULL).
    */
  def minhashSig(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long): ArrayData = {
    val k = a.length
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h0 =
        if (arr.isNullAt(i)) 42L // xxhash64(null) = seed
        else XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      val h = ((h0 % p) + p) % p
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    if (n == 0) new GenericArrayData(new Array[Any](k)) // all-null, as array_min(empty)
    else new GenericArrayData(mins)
  }

  /** Signature for a NULL input array: k nulls — what the expression form
    * produces (`transform(NULL)` is NULL, so each `array_min` slot is NULL,
    * but the outer `array(...)` constructor is not).
    */
  def allNullSig(k: Int): ArrayData = new GenericArrayData(new Array[Any](k))
}

/** `minhash_sig(shingles)` — the k-hash MinHash signature as one codegen'd
  * kernel call. Hash params are Seq-typed for structural equality (plan
  * canonicalization); the kernel sees primitive arrays via reference
  * objects.
  */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long], prime: Long)
  extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "need matching a/b hash params")

  @transient private lazy val aArr: Array[Long] = a.toArray
  @transient private lazy val bArr: Array[Long] = b.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  // NULL-input parity with the expression form it replaces: a NULL shingle
  // array yields an array of k NULLs (the outer array(...) constructor never
  // returns SQL NULL), so the kernel must not NULL-propagate. The result is
  // therefore never null.
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) TextExprs.allNullSig(aArr.length)
    else TextExprs.minhashSig(v.asInstanceOf[ArrayData], aArr, bArr, prime)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    val c = child.genCode(ctx)
    val out = ctx.freshName("mhsig")
    ev.copy(
      code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.util.ArrayData $out = ${c.isNull}
          ? graft.plans.TextExprs.allNullSig(${aArr.length})
          : graft.plans.TextExprs.minhashSig(${c.value}, $aRef, $bRef, ${prime}L);
      """,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
