package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native vector-math expressions (SURVEY.md §4 tier (b): a custom Catalyst
  * `Expression` with `doGenCode`, above UDFs in the preference order).
  *
  * Why a third implementation next to Vec.dot (higher-order lambdas,
  * interpreted closure per element) and Vec.dotUnrolled (64-term codegen'd
  * arithmetic tree): the native kernel is a tight JVM loop over the packed
  * `ArrayData`, stays inside whole-stage codegen as ONE call, works for any
  * dimension (unrolled hardcodes it), and allocates nothing (zip_with
  * materializes an intermediate array per row).
  *
  * Parity contract: the sums are the same left-associated IEEE fold as both
  * the lambda (`aggregate(..., (acc, v) -> acc + v)`) and the unrolled tree
  * (left-assoc `+`), so all three tiers — and DuckDB's sequential
  * `list_inner_product` — produce bit-identical doubles on identical input.
  *
  * Contract (fail-fast, intentionally STRICTER than the lambda forms):
  * vectors are dense, equal-dimension, non-null-element arrays. A ragged
  * pair or a null element THROWS — the zip_with alternative silently
  * null-pads / null-poisons to a NULL score, which hides data corruption
  * in a similarity pipeline instead of surfacing it (AnlLsh's scaladoc
  * documents the same hazard). [[VecRewrite]] carries this contract to
  * lambda-written queries it rewrites.
  */
object VecExprs {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"dot_product: dimension mismatch ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"dot_product: null element at index $i")
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def l2(a: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(s"l2_norm: null element at index $i")
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    math.sqrt(s)
  }

  /** Canonical unit-normalize of the ANN family (round 18: MOVED here from
    * AnnPq.normalize, which now delegates — one implementation, so the
    * native assign+encode kernel and every closure caller share bits).
    * Zero vector returns the INPUT array unchanged, as before.
    */
  def normalizeUnit(v: Array[Double]): Array[Double] = {
    var s = 0.0; var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    if (s == 0.0) return v
    val inv = 1.0 / math.sqrt(s)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Index of the nearest center by squared L2 (canonical copy — AnnIvf
    * delegates here, round 18). */
  def nearestIdx(centers: Array[Array[Double]], q: Array[Double]): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val cv = centers(c)
      var s = 0.0; var i = 0
      while (i < q.length) { val dx = q(i) - cv(i); s += dx * dx; i += 1 }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Nearest-subspace-centroid PQ codes of an already-prepared point
    * (canonical copy — AnnPq.encodePoint delegates here, round 18). */
  def pqEncode(books: Array[Array[Array[Double]]], u: Array[Double]): Array[Int] = {
    val subDim = u.length / books.length
    val codes = new Array[Int](books.length)
    var mi = 0
    while (mi < books.length) {
      val cb = books(mi)
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < cb.length) {
        val cv = cb(c)
        var s = 0.0; var i = 0
        while (i < subDim) {
          val dx = u(mi * subDim + i) - cv(i); s += dx * dx; i += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(mi) = best
      mi += 1
    }
    codes
  }

  /** One fused normalize → coarse-assign → PQ-encode pass (the
    * [[graft.plans.PqAssignEncode]] kernel body): flat when `subs` is
    * empty (list_id = c1), hierarchical otherwise (list_id = c1·k2 + s2).
    * Arithmetic is bit-identical to the closure-UDF composition it
    * replaces — same normalize, same nearest-center loops, same encode.
    */
  def assignEncode(
      v: ArrayData,
      centers: Array[Array[Double]],
      subs: Array[Array[Array[Double]]],
      k2: Int,
      books: Array[Array[Array[Double]]]): org.apache.spark.sql.catalyst.InternalRow = {
    val u = normalizeUnit(v.toDoubleArray)
    val c1 = nearestIdx(centers, u)
    val lid =
      if (subs.length == 0) c1.toLong
      else c1.toLong * k2 + nearestIdx(subs(c1), u)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](lid,
        new org.apache.spark.sql.catalyst.util.GenericArrayData(pqEncode(books, u))))
  }

  /** Lenient kernels with EXACTLY the lambda-fold null semantics (used by
    * [[VecRewrite]], which must not change what a query returns): a ragged
    * pair or a null element yields SQL NULL — `zip_with` null-pads the
    * shorter side and a null product/square null-poisons the fold. Same
    * left-to-right IEEE accumulation otherwise.
    */
  def dotLenient(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  /** Exact long squared distance with the lambda-fold's lenient null
    * semantics (round 18) — the native twin of the clustering family's
    * `aggregate(zip_with(a, b, (x, y) -> (x - y) * (x - y)), 0L,
    * (acc, v) -> acc + v)` (Corpus.sqDist): ragged pair or null element →
    * SQL NULL (zip_with null-pads, a null square null-poisons the fold),
    * else the identical left-to-right exact long sum. Operands are
    * fixed-point micros (|x| ≤ ~3·10⁶ per component, 64 dims), so the sum
    * stays far below 2⁶³ — overflow is unreachable in the calling domain,
    * exactly as for the fold under ANSI.
    */
  def sqDistLenient(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }

  def l2Lenient(a: ArrayData): java.lang.Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      val x = a.getDouble(i)
      s += x * x
      i += 1
    }
    java.lang.Double.valueOf(math.sqrt(s))
  }

  /** All LSH table buckets of one vector in ONE pass: planes is the
    * flattened (nTables·nPlanes) × dim ±1 matrix; output bucket t packs
    * bit k = sign(v · planes[t·nPlanes + k]) > 0. Replaces
    * nTables·nPlanes separate zip_with/aggregate lambda folds — the form
    * that blew whole-stage codegen past Janino's 64 KB method limit and
    * fell back to interpreted evaluation.
    */
  def lshBuckets(a: ArrayData, planes: Array[Array[Double]], nPlanes: Int): ArrayData = {
    val dim = planes(0).length
    if (a.numElements() != dim)
      throw new IllegalArgumentException(
        s"lsh_buckets: expected $dim-dim vector, got ${a.numElements()}")
    val nTables = planes.length / nPlanes
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var k = 0
      while (k < nPlanes) {
        val p = planes(t * nPlanes + k)
        var s = 0.0
        var i = 0
        while (i < dim) {
          if (a.isNullAt(i))
            throw new IllegalArgumentException(s"lsh_buckets: null element at index $i")
          s += a.getDouble(i) * p(i)
          i += 1
        }
        if (s > 0) bucket |= 1L << k
        k += 1
      }
      out(t) = bucket
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation) score of one PQ-coded row
    * against one query's lookup table: Σ_mi lut[mi·kSub + codes[mi]].
    * `luts` maps qid → the query's flattened m·kSub subspace-dot-product
    * table (built once driver-side from the tiny query frame, shipped as a
    * codegen reference object). This is the per-row kernel of the PQ scan —
    * m lookups + adds over EVERY corpus row — so it must stay inside
    * whole-stage codegen; the closure-UDF form it replaces blocked codegen
    * for the entire scoring stage. Same ascending-mi left-fold as the UDF,
    * so scores are bit-identical.
    *
    * Fail-fast contract (the VecExprs norm): an unknown qid or an
    * out-of-range code throws — both mean the LUT and the encoded corpus
    * disagree about the codebook, and a silent 0.0 would quietly rank
    * garbage.
    */
  def adcScore(
      codes: ArrayData,
      qid: Long,
      luts: java.util.HashMap[java.lang.Long, Array[Double]],
      kSub: Int): Double = {
    val flat = luts.get(qid)
    if (flat == null)
      throw new IllegalArgumentException(s"adc_score: unknown qid $qid")
    val m = codes.numElements()
    if (m * kSub != flat.length)
      throw new IllegalArgumentException(
        s"adc_score: $m codes vs ${flat.length / kSub}-subspace LUT")
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val c = codes.getInt(mi)
      if (c < 0 || c >= kSub)
        throw new IllegalArgumentException(
          s"adc_score: code $c out of range [0, $kSub) at subspace $mi")
      s += flat(mi * kSub + c)
      mi += 1
    }
    s
  }

  private[plans] def checkDoubleArray(name: String, e: Expression): TypeCheckResult =
    e.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$name expects array<double>, got ${other.catalogString}")
    }
}

/** `dot_product(a, b)` — Σ aᵢ·bᵢ as a single codegen'd kernel call. */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecExprs.checkDoubleArray(prettyName, left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecExprs.checkDoubleArray(prettyName, right)
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.VecExprs.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** `l2_norm(a)` — √(Σ aᵢ²) as a single codegen'd kernel call. */
case class L2Norm(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecExprs.checkDoubleArray(prettyName, child)

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_norm"

  override protected def nullSafeEval(a: Any): Any =
    VecExprs.l2(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.plans.VecExprs.l2($a)")

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}

/** `lsh_buckets(vec)` — every LSH table's bucket id for a vector as one
  * codegen'd kernel call returning array<long> (index = table). `planes`
  * is Seq-typed for structural equality (plan canonicalization dedups
  * identical scans); the kernel sees a converted primitive matrix via a
  * per-query reference object.
  */
case class LshBuckets(child: Expression, planes: Seq[Seq[Double]], nPlanes: Int)
  extends UnaryExpression {

  require(planes.nonEmpty && planes.length % nPlanes == 0,
    "planes must hold nTables complete plane sets")

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    VecExprs.checkDoubleArray(prettyName, child)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override protected def nullSafeEval(a: Any): Any =
    VecExprs.lshBuckets(a.asInstanceOf[ArrayData], planesArr, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.plans.VecExprs.lshBuckets($a, $ref, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** `adc_score(codes, qid)` — PQ asymmetric-distance score as one codegen'd
  * kernel call (the [[LshBuckets]] pattern: per-query constant state rides
  * a codegen reference object, not the expression tree, so janino never
  * sees the q·m·kSub doubles). `luts` is Seq-typed for structural equality
  * (plan canonicalization); the kernel sees a primitive java.util.HashMap
  * built once per executor via the lazy val.
  */
case class AdcScore(
    left: Expression, // codes: array<int>
    right: Expression, // qid: long
    luts: Seq[(Long, Seq[Double])],
    kSub: Int)
  extends BinaryExpression {

  require(kSub > 0, "kSub must be positive")

  @transient private lazy val lutMap: java.util.HashMap[java.lang.Long, Array[Double]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Double]](luts.length * 2)
    luts.foreach { case (qid, flat) => m.put(qid, flat.toArray) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.IntegerType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (array<int>, bigint), got (${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override protected def nullSafeEval(codes: Any, qid: Any): Any =
    VecExprs.adcScore(codes.asInstanceOf[ArrayData], qid.asInstanceOf[Long], lutMap, kSub)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("luts", lutMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, (codes, qid) =>
      s"graft.plans.VecExprs.adcScore($codes, $qid, $ref, $kSub)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

/** Rewrite target of [[VecRewrite]]: the fast kernel with the ORIGINAL
  * lambda null semantics (ragged / null element → NULL, never an error) so
  * the optimizer rule is observationally transparent.
  */
case class DotProductLenient(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = VecExprs.checkDoubleArray(prettyName, left)
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else VecExprs.checkDoubleArray(prettyName, right)
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product_lenient"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.dotLenient(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Double ${ev.value}_r = graft.plans.VecExprs.dotLenient($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLenient =
    copy(left = newLeft, right = newRight)
}

/** `sq_dist_long(a, b)` — exact long squared distance between fixed-point
  * vectors as one codegen'd kernel call, lambda null semantics (see
  * [[VecExprs.sqDistLenient]]). The clustering family's inner loop
  * (embedding_kmeans / dedup_semantic / sample_diversity / sample_coreset)
  * evaluated the aggregate-zip_with fold INTERPRETED per (vector, centroid)
  * pair — ArrayAggregate is CodegenFallback — before round 18.
  */
case class SqDistLong(left: Expression, right: Expression) extends BinaryExpression {

  private def checkLongArray(e: Expression): TypeCheckResult = e.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkLongArray(left)
    if (l != TypeCheckResult.TypeCheckSuccess) l else checkLongArray(right)
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_long"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecExprs.sqDistLenient(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""java.lang.Long ${ev.value}_r = graft.plans.VecExprs.sqDistLenient($a, $b);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.longValue(); }""".stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistLong =
    copy(left = newLeft, right = newRight)
}

/** `pq_assign_encode(vec)` — the ANN family's fused normalize →
  * coarse-assign → PQ-encode map pass as ONE codegen'd kernel call
  * (round 18). Replaces the struct-returning closure UDF whose
  * `ae._1`/`ae._2` extraction Catalyst DUPLICATED: the join key's inferred
  * `isnotnull(UDF(vec)._1)` filter pushed the whole closure below the
  * exchange, so every corpus row paid normalize+assign+encode TWICE
  * (measured 2.3× on the declared sim_ann_ivfpq at sf10). The kernel
  * declares honest nullability — the requireVec contract upstream RAISES
  * on a null vector, so the struct is never null and no isnotnull filter
  * is inferred at all — and whole-stage codegen's subexpression
  * elimination evaluates the one remaining occurrence once per row.
  * Centers/subs/books travel as reference objects (the LshBuckets
  * playbook), never as codegen literals.
  *
  * `subs` empty ⇒ flat coarse assignment (list_id = c1); otherwise
  * hierarchical (list_id = c1·k2 + s2). Scores bit-identical to the UDF
  * composition (AnnPqParitySpec pins it).
  */
case class PqAssignEncode(
    child: Expression,
    centers: Seq[Seq[Double]],
    subs: Seq[Seq[Seq[Double]]],
    k2: Int,
    books: Seq[Seq[Seq[Double]]]) extends UnaryExpression {

  @transient private lazy val centersA: Array[Array[Double]] =
    centers.map(_.toArray).toArray
  @transient private lazy val subsA: Array[Array[Array[Double]]] =
    subs.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val booksA: Array[Array[Array[Double]]] =
    books.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    VecExprs.checkDoubleArray(prettyName, child)

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("list_id", LongType, nullable = false),
    org.apache.spark.sql.types.StructField("codes",
      ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
      nullable = false)))
  override def prettyName: String = "pq_assign_encode"
  // never null: the ANN input contract upstream (requireVec) raises on a
  // null vector before this expression ever sees it — and declaring it
  // lets the optimizer skip the isnotnull inference that caused the
  // double evaluation
  override def nullable: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    require(v != null,
      "pq_assign_encode: null vector (ANN input contract: filter null embeddings upstream)")
    VecExprs.assignEncode(v.asInstanceOf[ArrayData], centersA, subsA, k2, booksA)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val c = child.genCode(ctx)
    val centersRef = ctx.addReferenceObj("paeCenters", centersA, "double[][]")
    val subsRef = ctx.addReferenceObj("paeSubs", subsA, "double[][][]")
    val booksRef = ctx.addReferenceObj("paeBooks", booksA, "double[][][]")
    val out = ctx.freshName("assignEncode")
    ev.copy(
      code = code"""
        ${c.code}
        if (${c.isNull}) {
          throw new IllegalArgumentException(
            "pq_assign_encode: null vector (ANN input contract: filter null embeddings upstream)");
        }
        InternalRow $out = graft.plans.VecExprs.assignEncode(
          ${c.value}, $centersRef, $subsRef, $k2, $booksRef);
      """,
      isNull = FalseLiteral,
      value = JavaCode.variable(out, dataType))
  }

  override protected def withNewChildInternal(newChild: Expression): PqAssignEncode =
    copy(child = newChild)
}

/** Rewrite target of [[VecRewrite]] for L2 norms — lambda null semantics. */
case class L2NormLenient(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VecExprs.checkDoubleArray(prettyName, child)

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_norm_lenient"

  override protected def nullSafeEval(a: Any): Any =
    VecExprs.l2Lenient(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""java.lang.Double ${ev.value}_r = graft.plans.VecExprs.l2Lenient($a);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): L2NormLenient =
    copy(child = newChild)
}
