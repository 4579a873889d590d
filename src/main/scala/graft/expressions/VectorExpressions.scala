package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression for the embedding hot path.
  *
  * The built-in route (`transform(cast) → zip_with(*) → aggregate(+)`)
  * is correct but interpreted: higher-order functions carry no codegen,
  * so every candidate pair pays lambda dispatch per element plus two
  * intermediate arrays. This expression generates a tight Java loop
  * (whole-stage-codegen-able) and allocates nothing.
  *
  * Semantics are IDENTICAL to the fold it replaces — left-to-right
  * double accumulation over `(double) a[i] * (double) b[i]` — so the
  * DuckDB verify oracle (`list_reduce(list_prepend(0.0, …), +)`)
  * continues to match bit-for-bit. This is the preference ladder of the
  * engine design: compose built-ins first, drop to a custom Expression
  * only where the built-in plan can't express the performance.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "vec_dot"

  private def floatElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  @transient private lazy val leftFloat = floatElem(left)
  @transient private lazy val rightFloat = floatElem(right)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float>/array<double> args, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0d
    var i = 0
    while (i < n) {
      val xe = if (leftFloat) x.getFloat(i).toDouble else x.getDouble(i)
      val ye = if (rightFloat) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xe * ye
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (leftFloat) "getFloat" else "getDouble"
    val rGet = if (rightFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $x.$lGet($i) * (double) $y.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** [[VecDot]]'s integer twin for the compressed-domain hot paths
  * (SQ8 codes, JL sketches): a tight long-accumulating loop over two
  * array<long> columns. Replaces `aggregate(zip_with(_*_), 0L, _+_)`
  * — same exact 64-bit result (integer addition is associative), but
  * codegen'd with zero intermediate arrays where the higher-order
  * built-ins interpret a lambda per element. The caller owns the
  * no-overflow argument (SQ8: |dot·scale| ≲ 10¹²; sketches: ≤ 4·10¹⁵
  * by the 2-bit downshift).
  *
  * CALLER CONTRACT — equal dimensions. Mismatched arrays TRUNCATE to
  * the shorter length (the loop bound is min(|a|, |b|)), unlike the
  * replaced fold, where zip_with's null padding nulled the whole sum.
  * Every call site derives both sides from one encoder (same dim by
  * construction: SQ8 codes, JL sketches, PQ sub-codes), so the branch
  * a per-row dimension check would add to the hot loop buys nothing
  * there; a caller joining arrays of independent provenance must pre-filter
  * `size(a) = size(b)` or accept a plausible-but-partial dot.
  */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "vec_dot_long"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint> args, " +
        s"got ${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($x.numElements(), $y.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getLong($i) * $y.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDotLong =
    copy(left = newLeft, right = newRight)
}

/** Native PQ encoder — the whole per-row codebook argmin in ONE
  * compiled call: for each of the m subspaces, the squared-L2 to all
  * ksub sub-centroids and the argmin (ties to the lower cent_id),
  * returning struct(codes array<int>, recon bigint).
  *
  * Replaces the composed tree it is value-identical to
  * ([[graft.operators.Similarity]]'s previous `least(struct(dist,c)…)`
  * over m·ksub literal-array dot expansions): per subspace slice vs,
  * d(c) = Σ vs·vs − 2·Σ vs·c + Σ c² with the SAME left-to-right double
  * fold as [[VecDot]] and the same truncating long cast; the cross/self
  * terms run over the slice's actual length and the ‖c‖² term over the
  * full sub-centroid (exactly what `slice`+`vec_dot`+literal-Σc² did on
  * short inputs), so even degenerate non-MaxDim vectors encode
  * bit-identically. The DuckDB oracle replays the same arithmetic
  * unchanged.
  *
  * Why it exists (optimization round 18, measured): the composed form
  * put ~32 literal-array dot subtrees into the encode Project; fused
  * under a BroadcastNestedLoopJoin, whole-stage codegen re-evaluated
  * that tree once per BUILD ROW (50×/row — deferred-evaluation
  * semantics), and the giant generated method plus per-eval slice
  * allocations made the fused stage a 6.7 s single task at sf0.1.
  * One compiled call is ~µs even when the join defers it, and the
  * plan/task binary shrinks by the 32 inlined centroid arrays.
  *
  * The codebook is held as constructor DATA (value-comparable nested
  * Seqs so plan canonicalization and exchange reuse still work), not
  * as child expressions.
  */
case class PqEncode(child: Expression, model: Seq[Seq[Seq[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("codes",
        ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false),
        nullable = false),
      org.apache.spark.sql.types.StructField("recon", LongType,
        nullable = false)))

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${t.sql}")
  }

  @transient private lazy val m = model.size
  @transient private lazy val ksub = model.head.size
  @transient private lazy val subDim = model.head.head.size
  // flattened double image [s*ksub + c] and its full-width ‖c‖² (the
  // driver-side left-to-right sums the literal tree used)
  @transient private lazy val cents: Array[Array[Double]] =
    model.flatMap(_.map(_.map(_.toDouble).toArray)).toArray
  @transient private lazy val ccs: Array[Double] =
    cents.map(cd => cd.map(x => x * x).sum)

  def encodeRow(input: Any): Any = {
    val vd = input.asInstanceOf[ArrayData]
    val len = vd.numElements()
    val codes = new Array[Int](m)
    var recon = 0L
    var s0 = 0
    while (s0 < m) {
      val start = s0 * subDim
      val nv = math.max(0, math.min(len - start, subDim))
      // Σ x² over the slice — shared across this subspace's centroids,
      // same fold order as vec_dot(vs, vs)
      var dxx = 0.0d
      var i = 0
      while (i < nv) {
        val x = vd.getDouble(start + i); dxx += x * x; i += 1
      }
      var bestD = Long.MaxValue
      var bestC = 0
      var c0 = 0
      while (c0 < ksub) {
        val cd = cents(s0 * ksub + c0)
        var dxc = 0.0d
        var j = 0
        while (j < nv) {
          dxc += vd.getDouble(start + j) * cd(j); j += 1
        }
        val d = (dxx - 2.0d * dxc + ccs(s0 * ksub + c0)).toLong
        if (d < bestD) { bestD = d; bestC = c0 }
        c0 += 1
      }
      codes(s0) = bestC
      recon += bestD
      s0 += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
          .fromPrimitiveArray(codes),
        recon))
  }

  override def nullSafeEval(input: Any): Any = encodeRow(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeExpr", this,
      classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.InternalRow)
       |  $ref.encodeRow($x);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** [[PqEncode]]'s query-side twin: the full m×ksub ADC lookup table
  * (exact integer subspace distances to every sub-centroid, flattened
  * subspace-major) in ONE compiled call — value-identical to the
  * m·ksub literal-array dot expansion it replaces (same left-to-right
  * double folds, same slice-length semantics, same truncating long
  * cast). Shrinks the query-side broadcast build's generated code by
  * the 32 inlined centroid subtrees and makes per-row LUT evaluation
  * ~µs for the streaming screen, whose arrival batches pay it per row.
  */
case class PqLut(child: Expression, model: Seq[Seq[Seq[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pq_lut"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<double>, got ${t.sql}")
  }

  @transient private lazy val m = model.size
  @transient private lazy val ksub = model.head.size
  @transient private lazy val subDim = model.head.head.size
  @transient private lazy val cents: Array[Array[Double]] =
    model.flatMap(_.map(_.map(_.toDouble).toArray)).toArray
  @transient private lazy val ccs: Array[Double] =
    cents.map(cd => cd.map(x => x * x).sum)

  def lutRow(input: Any): Any = {
    val vd = input.asInstanceOf[ArrayData]
    val len = vd.numElements()
    val out = new Array[Long](m * ksub)
    var s0 = 0
    while (s0 < m) {
      val start = s0 * subDim
      val nv = math.max(0, math.min(len - start, subDim))
      var dxx = 0.0d
      var i = 0
      while (i < nv) {
        val x = vd.getDouble(start + i); dxx += x * x; i += 1
      }
      var c0 = 0
      while (c0 < ksub) {
        val cd = cents(s0 * ksub + c0)
        var dxc = 0.0d
        var j = 0
        while (j < nv) {
          dxc += vd.getDouble(start + j) * cd(j); j += 1
        }
        out(s0 * ksub + c0) =
          (dxx - 2.0d * dxc + ccs(s0 * ksub + c0)).toLong
        c0 += 1
      }
      s0 += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override def nullSafeEval(input: Any): Any = lutRow(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqLutExpr", this, classOf[PqLut].getName)
    nullSafeCodeGen(ctx, ev, x => s"""
       |${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)
       |  $ref.lutRow($x);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-level dot product backed by the codegen expression. */
  def vecDot(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDot(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level integer dot product (array<long>), codegen'd. */
  def vecDotLong(a: Column, b: Column): Column =
    GraftBridge.column(
      VecDotLong(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column-level PQ encode (struct(codes, recon)) under a driver-held
    * codebook — see [[PqEncode]].
    */
  def pqEncode(vd: Column, model: Seq[Seq[Array[Long]]]): Column =
    GraftBridge.column(
      PqEncode(GraftBridge.expression(vd),
        model.map(_.map(_.toSeq))))

  /** Column-level ADC lookup table (array<long>, subspace-major) under
    * a driver-held codebook — see [[PqLut]].
    */
  def pqLut(vd: Column, model: Seq[Seq[Array[Long]]]): Column =
    GraftBridge.column(
      PqLut(GraftBridge.expression(vd),
        model.map(_.map(_.toSeq))))
}
