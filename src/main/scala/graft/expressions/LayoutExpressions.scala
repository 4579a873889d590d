package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Runtime for [[HilbertIndex]] — plain object so codegen calls a
  * static forwarder (the [[CharGramHash]] pattern).
  */
object HilbertCurve {

  /** Hilbert-curve distance of the cell (x, y) on the 2^bits × 2^bits
    * grid — the classic iterative xy→d transform (quadrant digit +
    * reflect/transpose rotation per level, most-significant level
    * first). Inputs are masked to their low `bits` bits, mirroring
    * [[graft.sources.Zorder.morton]]'s low-bit contract.
    */
  def index(x0: Long, y0: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = x0 & (n - 1)
    var y = y0 & (n - 1)
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** Hilbert-curve index of two key columns — the locality-preserving
  * alternative to the Morton/Z-order interleave for multi-dimensional
  * file layout. Z-order's weakness is its diagonal seams: every 2^k
  * boundary crossing makes a long jump in code space, so files built
  * from Morton runs cover L-shaped regions and a box query near a
  * seam touches extra files. The Hilbert curve is fully continuous
  * (adjacent codes are always grid neighbors), so equal code runs
  * tile into more compact rectangles and min/max stats prune box
  * queries at least as well — measured against Z-order on the same
  * grid in ZorderSpec, and the standard choice at 100 TB file counts
  * for exactly that reason.
  *
  * The per-level rotation state makes the transform data-dependent —
  * a composed column-arithmetic unrolling doubles the expression tree
  * per level (the conditional swap references BOTH previous x and y),
  * so this is a native codegen expression per the house preference
  * ladder: one static-call loop, whole-stage-codegen-able, allocation-
  * free. The DuckDB oracle replays the identical algorithm as `bits`
  * chained CTE stages (one materialized (x, y, d) state per level —
  * the same anti-blowup discipline, in SQL).
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "hilbert_index"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (bigint, bigint), got " +
        s"${left.dataType.sql}, ${right.dataType.sql}")

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertCurve.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => s"""
       |${ev.value} = graft.expressions.HilbertCurve.index($x, $y, $bits);
     """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object LayoutExpressions {
  /** Column wrapper for [[HilbertIndex]]. */
  def hilbertIndex(a: Column, b: Column, bits: Int): Column =
    GraftBridge.column(HilbertIndex(
      GraftBridge.expression(a.cast("long")),
      GraftBridge.expression(b.cast("long")), bits))
}
