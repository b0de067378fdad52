package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Z-order (Morton) interleave of two dimension keys
  * (SURVEY.md §2.2.11 data-layout row, q146).
  *
  * Takes two int64 dimension values, truncates each to its low 16 bits
  * (the caller buckets/normalizes dimensions into [0, 65535] first —
  * at 100 TB the dimensions are already range-bucketed file statistics,
  * not raw values), and interleaves the bits so that sorting by the
  * result places rows close in BOTH dimensions into the same file:
  *
  *   z = Σ_{i=0}^{15} ((x >> i) & 1) << (2i)  |  ((y >> i) & 1) << (2i+1)
  *
  * This is the clustering key behind multi-dimensional data skipping
  * (Delta/Iceberg `OPTIMIZE ZORDER BY`): a table laid out by z-value
  * gives every file a tight min/max range on BOTH dimensions, so a
  * predicate on either dimension prunes files — a linear sort gives
  * tight ranges on the leading dimension only. The oracle reproduces
  * the interleave with 16 unrolled integer shift/mask terms, so the
  * value is integer-exact cross-engine.
  *
  * Interpreted bit-twiddling per row is exactly the pattern that falls
  * off the codegen path when phrased as a 16-step SQL expression tree;
  * this kernel is one fused whole-stage-codegen'd loop, zero allocation.
  *
  * Negative inputs are masked the same way (`& 0xFFFF` of the two's
  * complement), keeping the function total; nulls propagate.
  */
case class ZOrder2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorder2 expects two bigint arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "zorder2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long] & 0xFFFFL
    val y = b.asInstanceOf[Long] & 0xFFFFL
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $x = $a & 0xFFFFL;
         |long $y = $b & 0xFFFFL;
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($x >> $i) & 1L) << (2 * $i);
         |  $z |= (($y >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
