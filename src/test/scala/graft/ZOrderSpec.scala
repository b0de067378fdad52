package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.NativeFunctions
import graft.queries.SourcesOps

/** The q146 z-order layout operator: the native `zorder2` kernel
  * (values + codegen), the scalable arithmetic-ntile file assignment
  * (pinned against the window ntile it replaces — the range-sampling
  * divergence this guards against was observed live), and the layout's
  * actual claim: tight per-file ranges on BOTH dimensions.
  */
class ZOrderSpec extends SparkSpec {

  test("zorder2 interleaves bits correctly on known values") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (0L, 0L),      // -> 0
      (1L, 0L),      // x bit 0 -> z bit 0 = 1
      (0L, 1L),      // y bit 0 -> z bit 1 = 2
      (3L, 3L),      // 0b1111 = 15
      (0xFFFFL, 0L), // x bits at even positions: 0x55555555
      (0L, 0xFFFFL), // y bits at odd positions: 0xAAAAAAAA
      (0x10000L, 0L) // truncated to 16 bits -> 0
    ).toDF("x", "y").selectExpr("zorder2(x, y) as z").as[Long].collect().toSeq
    assert(rows == Seq(0L, 1L, 2L, 15L, 0x55555555L, 0xAAAAAAAAL, 0L))
  }

  test("zorder2 stays inside WholeStageCodegen on a parquet-backed plan") {
    NativeFunctions.register(spark)
    val df = graft.sources.Tables.orders(spark, sfDir)
      .selectExpr("zorder2(o_orderkey, o_custkey) as z")
      .agg(sum("z"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("zorder2"), s"expression missing:\n$plan")
    assert(plan.contains("*("), s"no codegen spans:\n$plan")
  }

  test("q146 arithmetic file assignment equals the global-window NTILE it replaces") {
    // The scalable path (radix pid + local ranks + broadcast offsets)
    // must reproduce NTILE(16) exactly — bucket boundaries included.
    NativeFunctions.register(spark)
    val scalable = SourcesOps.zorderLayout(spark, sfDir)
      .collect().map(_.toString).toSeq
    val base = graft.sources.Tables.orders(spark, sfDir)
      .withColumn("dd", expr(
        "cast(datediff(to_date(o_orderdate), date'1992-01-01') as bigint)"))
    val stats = base.agg(max(col("o_custkey")).as("max_ck"), max(col("dd")).as("max_dd"))
    val windowed = base.crossJoin(broadcast(stats))
      .withColumn("xd", expr("(o_custkey * 65535) div max_ck"))
      .withColumn("yd", expr("(dd * 65535) div max_dd"))
      .withColumn("z", expr("zorder2(xd, yd)"))
      .withColumn("file_id", ntile(16).over(Window.orderBy(col("z"), col("o_orderkey"))))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("o_custkey")).as("custkey_lo"), max(col("o_custkey")).as("custkey_hi"),
        min(to_date(col("o_orderdate"))).as("date_lo"),
        max(to_date(col("o_orderdate"))).as("date_hi"))
      .orderBy("file_id")
      .collect().map(_.toString).toSeq
    assert(scalable == windowed)
  }

  test("z-order files prune on BOTH dimensions: tighter than each single-dimension sort") {
    // A layout sorted by date alone scatters custkey across its full
    // domain in every file (no custkey pruning possible), and vice
    // versa. Z-order must keep the mean per-file width meaningfully
    // below the OTHER dimension's sorted layout on both axes — the
    // multi-dimensional skipping claim, quantified.
    NativeFunctions.register(spark)
    val orders = graft.sources.Tables.orders(spark, sfDir)
    def widths(layout: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val r = layout.select(
        avg(col("custkey_hi") - col("custkey_lo")).as("ck"),
        avg(datediff(col("date_hi"), col("date_lo"))).as("dd")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    def sortedLayout(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
      orders
        .withColumn("file_id", ntile(16).over(Window.orderBy(cols: _*)))
        .groupBy("file_id")
        .agg(min(col("o_custkey")).as("custkey_lo"),
          max(col("o_custkey")).as("custkey_hi"),
          min(to_date(col("o_orderdate"))).as("date_lo"),
          max(to_date(col("o_orderdate"))).as("date_hi"))
    val (zCk, zDd) = widths(SourcesOps.zorderLayout(spark, sfDir))
    val (dateCk, _) = widths(sortedLayout(col("o_orderdate"), col("o_orderkey")))
    val (_, ckDd) = widths(sortedLayout(col("o_custkey"), col("o_orderkey")))
    assert(zCk < dateCk * 0.75,
      s"z-order mean custkey width $zCk not meaningfully tighter than date-sort's $dateCk")
    assert(zDd < ckDd * 0.75,
      s"z-order mean date width $zDd not meaningfully tighter than custkey-sort's $ckDd")
  }
}
