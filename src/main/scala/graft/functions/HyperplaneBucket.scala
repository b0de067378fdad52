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
  * J = j + numPlanes·t drawn from the mod-m family
  * sign_iJ = +1 if ((i·31 + J·17) mod m) < (m+1)/2 else -1, where the
  * optional fourth argument picks the family width m (default 13).
  * Because 17 is invertible mod any prime m, a family provides m
  * DISTINCT hyperplanes: tables 0..2 with 4 planes each fit in mod-13
  * (12 ≤ 13 planes, none shared). The 2-arg form keeps the original
  * mod-7 planes so q87/q92 oracles are unchanged.
  *
  * Scrambled family (fourth argument = 0; q160, chosen by the
  * RecallCurve sweep): DISTINCT lattice planes are necessary but not
  * sufficient for multi-table amplification — all mod-m planes live on
  * a 2-parameter integer lattice, so tables are pairwise CORRELATED
  * and measured recall plateaus far below the independent-table
  * 1−(1−p^b)^L prediction (0.66 at L = 12 on the sf0.1 embeddings,
  * BASELINE.md). The scrambled family decorrelates by drawing each
  * sign from an avalanching integer mix (same ops both engines,
  * integer-exact):
  *   h  = (i·2654435761 + J·2654435769 + 2246822507) mod 2³²
  *   h  = ((h xor h>>16) · 73244475) mod 2³²
  *   sign_iJ = +1 if (h xor h>>16) is odd else −1
  * Measured effect at (bits = 4, L = 12): recall 0.66 → 0.89 with ~40%
  * FEWER candidates (lattice buckets were also skewed).
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
case class HyperplaneBucket(child: Expression, numPlanes: Int, table: Int = -1,
    modulus: Int = 13)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _)
        if numPlanes > 0 && numPlanes <= 30 && (modulus >= 3 || modulus == 0) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_bucket expects array<double>, a plane count in [1, 30] and " +
        s"a family modulus >= 3 (or 0 = scrambled), got ${other.simpleString} / $numPlanes / $modulus")
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
      } else if (modulus == 0) {
        val jj = j + numPlanes * table
        while (i < n) {
          val v = arr.getDouble(i)
          var h = (i.toLong * 2654435761L + jj.toLong * 2654435769L + 2246822507L) & 0xFFFFFFFFL
          h = ((h ^ (h >>> 16)) * 73244475L) & 0xFFFFFFFFL
          h = h ^ (h >>> 16)
          s += (if ((h & 1L) == 1L) v else -v)
          i += 1
        }
      } else {
        val jj = j + numPlanes * table
        val half = (modulus + 1) / 2
        while (i < n) {
          val v = arr.getDouble(i)
          s += (if ((i * 31 + jj * 17) % modulus < half) v else -v)
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
      val h = ctx.freshName("h")
      val body =
        if (table >= 0 && modulus == 0)
          // Scrambled family: avalanching integer mix per (i, J) — see
          // the class doc for why the lattice families can't be
          // amplified past their table correlation.
          s"""long $h = (($i * 2654435761L) + (($j + ${numPlanes * table}L) * 2654435769L) + 2246822507L) & 0xFFFFFFFFL;
             |    $h = (($h ^ ($h >>> 16)) * 73244475L) & 0xFFFFFFFFL;
             |    $h = $h ^ ($h >>> 16);
             |    $s += (($h & 1L) == 1L) ? $v : -$v;""".stripMargin
        else {
          val sign =
            if (table < 0) s"((($i * 31 + $j * 17) % 7) < 4)"
            else s"((($i * 31 + ($j + ${numPlanes * table}) * 17) % $modulus) < ${(modulus + 1) / 2})"
          s"$s += $sign ? $v : -$v;"
        }
      s"""
         |int $n = $a.numElements();
         |int $bucket = 0;
         |for (int $j = 0; $j < $numPlanes; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $v = $a.getDouble($i);
         |    $body
         |  }
         |  if ($s >= 0.0) $bucket |= 1 << $j;
         |}
         |${ev.value} = $bucket;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
