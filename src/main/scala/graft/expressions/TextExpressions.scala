package graft.expressions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native 16-bit SimHash fold over a pre-hashed word array.
  *
  * Replaces the built-in composition of SIXTEEN per-bit
  * `aggregate(hashes, 0, acc + ((h >> b) & 1) * 2 - 1)` folds — higher-
  * order functions are interpreted (no codegen, no subexpression
  * elimination), so that shape re-walks the array 16 times with lambda
  * dispatch per element. This expression walks it ONCE inside
  * whole-stage codegen, updating 16 counters.
  *
  * Semantics are bit-identical to the folds it replaces (and to the
  * DuckDB oracle's per-bit `list_sum` CASE): bit b of the result is set
  * iff strictly more element-hashes have bit b set than clear. Input
  * elements are non-null by construction (md5-derived hashes of
  * non-null tokens).
  */
case class SimhashFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash_fold"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<bigint>, got ${t.sql}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](16)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var b = 0
      while (b < 16) {
        counts(b) += (((h >>> b) & 1L) * 2 - 1).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 16) {
      if (counts(b) > 0) out |= 1L << b
      b += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int $n = $x.numElements();
         |int[] $counts = new int[16];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $x.getLong($i);
         |  for (int $b = 0; $b < 16; $b++) {
         |    $counts[$b] += (int) ((($h >>> $b) & 1L) * 2 - 1);
         |  }
         |}
         |long $out = 0L;
         |for (int $b = 0; $b < 16; $b++) {
         |  if ($counts[$b] > 0) $out |= 1L << $b;
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashFold =
    copy(child = newChild)
}

object TextExpressions {
  /** Column-level 16-bit simhash fold backed by the codegen expression. */
  def simhashFold(hashes: Column): Column =
    GraftBridge.column(SimhashFold(GraftBridge.expression(hashes)))
}
