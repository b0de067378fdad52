package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native random-hyperplane LSH bucket id (SURVEY.md §2.2.11 similarity
  * search — the coarse quantizer of the 100-TB ANN path, q87).
  *
  * For an `array<double>` vector and `numPlanes` fixed ±1 hyperplanes,
  * computes one sign bit per plane and packs them into an int bucket id:
  *
  *   sign_ij = +1 if ((i*31 + j*17) mod 7) < 4 else -1   (integer-exact,
  *   so a SQL oracle reproduces the projections bit-for-bit)
  *   bit_j   = [ Σ_i sign_ij · d[i]  >=  0 ]
  *   bucket  = Σ_j bit_j · 2^j
  *
  * Multi-table variant (q97 recall recovery): a third argument selects
  * an independent hash TABLE — plane j of table t is global plane
  * J = j + numPlanes·t drawn from the mod-13 family
  * sign_iJ = +1 if ((i·31 + J·17) mod 13) < 7 else -1. Because 17 is
  * invertible mod 13, tables 0..2 with 4 planes each use 12 DISTINCT
  * hyperplanes — no plane is shared between tables, which the legacy
  * mod-7 family cannot provide (it only has 7 distinct planes). The
  * 2-arg form keeps the original mod-7 planes so q87/q92 oracles are
  * unchanged.
  *
  * The HOF formulation (nested aggregate/zip_with over sequence(0,63) per
  * plane) is CodegenFallback: ~4 planes × 64 dims = 256 interpreted
  * lambda steps per ROW — the exact pattern measured 40× slower on the
  * cosine/minhash hot paths (BASELINE.md round-2 notes). This expression
  * fuses all planes into one whole-stage-codegen'd loop pair with zero
  * allocation, so bucketing a 100-TB embedding table costs one array
  * scan per row. Summation order is ascending i per plane, matching both
  * the HOF formulation and the DuckDB oracle's list comprehension.
  *
  * Null/absent elements are not expected (embeddings are non-null by
  * schema); a null vector yields a null bucket.
  */
case class HyperplaneBucket(child: Expression, numPlanes: Int, table: Int = -1)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) if numPlanes > 0 && numPlanes <= 30 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<double> and a plane count in [1, 30], " +
        s"got ${other.simpleString} / $numPlanes")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var j = 0
    while (j < numPlanes) {
      var s = 0.0
      var i = 0
      if (table < 0) {
        while (i < n) {
          val v = arr.getDouble(i)
          s += (if ((i * 31 + j * 17) % 7 < 4) v else -v)
          i += 1
        }
      } else {
        val jj = j + numPlanes * table
        while (i < n) {
          val v = arr.getDouble(i)
          s += (if ((i * 31 + jj * 17) % 13 < 7) v else -v)
          i += 1
        }
      }
      if (s >= 0.0) bucket |= 1 << j
      j += 1
    }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val bucket = ctx.freshName("bucket")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val sign =
        if (table < 0) s"((($i * 31 + $j * 17) % 7) < 4)"
        else s"((($i * 31 + ($j + ${numPlanes * table}) * 17) % 13) < 7)"
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < $numPlanes; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $a.getDouble($i);
         |    $s += $sign ? $v : -$v;
         |  }
         |  if ($s >= 0.0) $bucket |= 1 << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
