package graft

import org.apache.spark.sql.functions._

import graft.functions.NativeFunctions
import graft.queries.LlmPipeline

class NativeExprSpec extends SparkSpec {

  test("native cosine_sim matches the HOF formulation on all embedding pairs") {
    NativeFunctions.register(spark)
    val e = graft.sources.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("d"))
    val maxDiff = e.alias("a").join(broadcast(e.alias("b")), col("a.vec_id") < col("b.vec_id"))
      .select(
        expr("cosine_sim(a.d, b.d)").as("native"),
        (expr("aggregate(zip_with(a.d, b.d, (x, y) -> x * y), 0D, (acc, x) -> acc + x)") /
          (expr("sqrt(aggregate(zip_with(a.d, a.d, (x, y) -> x * y), 0D, (acc, x) -> acc + x))") *
           expr("sqrt(aggregate(zip_with(b.d, b.d, (x, y) -> x * y), 0D, (acc, x) -> acc + x))"))).as("hof"))
      .select(abs(col("native") - col("hof")).as("diff"))
      .agg(max("diff")).head.getDouble(0)
    assert(maxDiff < 1e-9, s"native vs HOF diverged by $maxDiff")
  }

  test("cosine_sim handles zero vectors (null) and identity (1.0)") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (Seq(1.0, 2.0), Seq(1.0, 2.0)),
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)").as("s"))
      .collect()
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).isNullAt(0))
    assert(math.abs(rows(2).getDouble(0)) < 1e-12)
  }

  test("cosine_sim stays inside WholeStageCodegen on a parquet-backed plan") {
    val df = LlmPipeline.nativeCosineNearDup(spark, sfDir)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cosine_sim"), s"expression missing:\n$plan")
    assert(plan.contains("*("), s"no codegen spans:\n$plan")
  }

  test("q86 native query equals q77 HOF query row for row") {
    val a = LlmPipeline.embeddingNearDup(spark, sfDir).collect().map(_.toString).toSeq
    val b = LlmPipeline.nativeCosineNearDup(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }
}
