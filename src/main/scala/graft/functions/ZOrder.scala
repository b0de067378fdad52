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

/** Native k-dimensional Z-order (Morton) interleave (q186 — the r12
  * verdict's "2-dimensional only" note closed): `zorderk(x1, …, xd)`
  * for 2 ≤ d ≤ 6 int64 dimensions, each truncated to its low 16 bits
  * (the caller normalizes to [0, 65535] from a stats prepass, exactly
  * as q146 documents), interleaved round-robin so bit i of dimension j
  * lands at position i·d + j:
  *
  *   z = Σ_{j<d} Σ_{i<16} ((x_j >> i) & 1) << (i·d + j)
  *
  * 16·d ≤ 96 would overflow a long at d = 6, so dimensions past the
  * 63-bit budget contribute their low ⌊63/d⌋ bits only (d ≤ 3 keeps
  * all 16; d = 4 → 15 bits, d = 5 → 12, d = 6 → 10) — the same
  * precision trade Delta/Iceberg make when widening ZORDER BY column
  * lists, and why z-ordering degrades past a handful of columns. For
  * d = 2 with full 16-bit budget the layout is bit-identical to
  * `zorder2` (dim 0 on even bits, dim 1 on odd) — spec-pinned, so the
  * two kernels can never drift.
  *
  * Same codegen rationale as ZOrder2: one fused loop beats a 16·d-term
  * SQL expression tree; the oracle unrolls the shift/mask sum, which
  * stays integer-exact cross-engine.
  */
case class ZOrderK(children: Seq[Expression]) extends Expression {

  private val d = children.length
  require(d >= 2 && d <= 6, s"zorderk expects 2..6 dimensions, got $d")
  private val bits = math.min(16, 63 / d)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"zorderk expects bigint arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "zorderk"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < d) {
      val v = children(j).eval(input)
      if (v == null) return null
      val x = v.asInstanceOf[Long] & 0xFFFFL
      var i = 0
      while (i < bits) {
        z |= ((x >> i) & 1L) << (i * d + j)
        i += 1
      }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val evals = children.map(_.genCode(ctx))
    val z = ctx.freshName("z")
    val i = ctx.freshName("i")
    val childCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(e => s"${e.isNull}").mkString(" || ")
    val dims = evals.zipWithIndex.map { case (e, j) =>
      s"""long ${z}x$j = ${e.value} & 0xFFFFL;
         |for (int $i$j = 0; $i$j < $bits; $i$j++) {
         |  $z |= ((${z}x$j >> $i$j) & 1L) << ($i$j * $d + $j);
         |}""".stripMargin
    }.mkString("\n")
    ev.copy(code =
      code"""
        |$childCode
        |boolean ${ev.isNull} = $anyNull;
        |long ${ev.value} = 0L;
        |if (!${ev.isNull}) {
        |  long $z = 0L;
        |  $dims
        |  ${ev.value} = $z;
        |}
      """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}
