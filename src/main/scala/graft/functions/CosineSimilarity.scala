package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression (SURVEY.md §2.2.10 last row): fused cosine
  * similarity over two `array<double>` columns, with whole-stage codegen.
  *
  * Compared to the HOF formulation (`zip_with` + `aggregate` + two norm
  * aggregates), this fuses dot product and both norms into ONE pass with
  * no intermediate array allocation — the per-pair inner loop of every
  * similarity join, so it is the single hottest scalar in the §2.2.11
  * pipeline at 100 TB. Returns null when either vector has zero norm.
  *
  * Null/absent elements are treated as 0.0 (embeddings are non-null by
  * schema); vectors of unequal length compare over the common prefix.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<double> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xv = x.getDouble(i); val yv = y.getDouble(i)
      dot += xv * yv; nx += xv * xv; ny += yv * yv
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = $a.getDouble($i);
         |  double $yv = $b.getDouble($i);
         |  $dot += $xv * $yv; $nx += $xv * $xv; $ny += $yv * $yv;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / java.lang.Math.sqrt($nx * $ny);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration for the native expressions, mirroring what
  * a SparkSessionExtensions.injectFunction would do at session build time
  * (the harness owns session construction, so registration is performed
  * by the queries that use the function).
  */
object NativeFunctions {

  /** Evaluates a function argument that must be a foldable int literal
    * (hash counts, shingle sizes), failing with a real analysis error
    * instead of an NPE/cast exception on misuse.
    */
  private[graft] def intLiteralArg(
      name: String, exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      idx: Int): Int = {
    require(exprs.length > idx, s"$name expects ${idx + 1} arguments, got ${exprs.length}")
    val e = exprs(idx)
    require(e.foldable, s"$name: argument ${idx + 1} must be a literal int, got ${e.sql}")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$name: argument ${idx + 1} must be an int literal, got $other")
    }
  }

  /** Arity guard for the builder lambdas: `exprs(1)` on a 1-arg call is
    * an IndexOutOfBoundsException from inside the registry — surface a
    * real "wrong number of arguments" analysis error instead.
    */
  private def arity(name: String,
      exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      n: Int): Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    if (exprs.length != n) {
      throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${exprs.length}")
    }
    exprs
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim",
      exprs => { val e = arity("cosine_sim", exprs, 2); CosineSimilarity(e.head, e(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig",
      exprs => { val e = arity("minhash_sig", exprs, 2); MinHashSignature(e.head, intLiteralArg("minhash_sig", e, 1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaccard_sim",
      exprs => { val e = arity("jaccard_sim", exprs, 2); JaccardSimilarity(e.head, e(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_sig",
      exprs => SimHashSignature(arity("simhash_sig", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "rolling_stats",
      exprs => RollingHashStats(arity("rolling_stats", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      exprs => { val e = arity("word_shingles", exprs, 2); WordShingles(e.head, intLiteralArg("word_shingles", e, 1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hash64",
      exprs => ShingleHash64(arity("shingle_hash64", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hyperplane_bucket",
      exprs => {
        if (exprs.length < 2 || exprs.length > 4) {
          throw new IllegalArgumentException(
            s"hyperplane_bucket expects 2 to 4 arguments, got ${exprs.length}")
        }
        val table =
          if (exprs.length >= 3) intLiteralArg("hyperplane_bucket", exprs, 2) else -1
        val modulus =
          if (exprs.length == 4) intLiteralArg("hyperplane_bucket", exprs, 3) else 13
        HyperplaneBucket(exprs.head, intLiteralArg("hyperplane_bucket", exprs, 1), table, modulus)
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product",
      exprs => { val e = arity("dot_product", exprs, 2); DotProduct(e.head, e(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorder2",
      exprs => { val e = arity("zorder2", exprs, 2); ZOrder2(e.head, e(1)) },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "zorderk",
      exprs => {
        require(exprs.length >= 2 && exprs.length <= 6,
          s"zorderk expects 2..6 arguments, got ${exprs.length}")
        ZOrderK(exprs)
      },
      "scala_udf")
    // Spark's own Bloom-filter expressions (used by the q99 runtime
    // rewrite) are registry-internal — not resolvable from expr(). For
    // operators that build a Bloom filter EXPLICITLY (q145: eval-set
    // n-gram filter applied scan-side to the training stream), expose
    // them under graft names. Both are existing Catalyst classes, so
    // codegen/serialization behavior is exactly the built-in one.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => {
        val e = arity("bloom_agg", exprs, 3)
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          e.head, e(1), e(2))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_might_contain",
      exprs => {
        val e = arity("bloom_might_contain", exprs, 2)
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(e.head, e(1))
      },
      "scala_udf")
    // KLL quantile-sketch family (q183) — see functions/KllSketch.scala.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch_agg",
      exprs => {
        val e = arity("kll_sketch_agg", exprs, 2)
        KllSketchAgg(e.head, intLiteralArg("kll_sketch_agg", e, 1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_union_agg",
      exprs => KllUnionAgg(arity("kll_union_agg", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_sketch_quantile",
      exprs => {
        val e = arity("kll_sketch_quantile", exprs, 2)
        KllSketchQuantile(e.head, e(1))
      },
      "scala_udf")
    // Count-min frequency-sketch family (q184) — see functions/CountMin.scala.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_sketch_agg",
      exprs => {
        val e = arity("cm_sketch_agg", exprs, 4)
        CmSketchAgg(e.head, intLiteralArg("cm_sketch_agg", e, 1),
          intLiteralArg("cm_sketch_agg", e, 2), intLiteralArg("cm_sketch_agg", e, 3))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_union_agg",
      exprs => CmUnionAgg(arity("cm_union_agg", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_estimate",
      exprs => {
        val e = arity("cm_estimate", exprs, 2)
        CmEstimate(e.head, e(1))
      },
      "scala_udf")
    // Theta set-algebra sketch family (q185) — see functions/ThetaSketch.scala.
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_sketch_agg",
      exprs => {
        val e = arity("theta_sketch_agg", exprs, 2)
        ThetaSketchAgg(e.head, intLiteralArg("theta_sketch_agg", e, 1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_union_agg",
      exprs => {
        val e = arity("theta_union_agg", exprs, 2)
        ThetaUnionAgg(e.head, intLiteralArg("theta_union_agg", e, 1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_estimate",
      exprs => ThetaEstimate(arity("theta_estimate", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_intersect_estimate",
      exprs => {
        val e = arity("theta_intersect_estimate", exprs, 2)
        ThetaIntersectEstimate(e.head, e(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_bounds",
      exprs => ThetaBounds(arity("theta_bounds", exprs, 1).head),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_intersect_bounds",
      exprs => {
        val e = arity("theta_intersect_bounds", exprs, 2)
        ThetaIntersectBounds(e.head, e(1))
      },
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "theta_anotb_bounds",
      exprs => {
        val e = arity("theta_anotb_bounds", exprs, 2)
        ThetaAnotbBounds(e.head, e(1))
      },
      "scala_udf")
  }
}
