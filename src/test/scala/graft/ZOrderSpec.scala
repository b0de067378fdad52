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

  test("zorderk at d=2 is bit-identical to zorder2 — the kernels cannot drift") {
    NativeFunctions.register(spark)
    val diff = spark.range(4096)
      .selectExpr("id * 37 % 65536 as x", "id * 101 % 65536 as y")
      .selectExpr("zorder2(x, y) as z2", "zorderk(x, y) as zk")
      .filter("z2 != zk").count()
    assert(diff == 0, s"$diff of 4096 values differ between zorder2 and zorderk(d=2)")
  }

  test("zorderk interleaves 3 dimensions correctly on known values") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val rows = Seq(
      (0L, 0L, 0L),       // -> 0
      (1L, 0L, 0L),       // dim0 bit0 -> z bit 0 = 1
      (0L, 1L, 0L),       // dim1 bit0 -> z bit 1 = 2
      (0L, 0L, 1L),       // dim2 bit0 -> z bit 2 = 4
      (1L, 1L, 1L),       // -> 0b111 = 7
      (2L, 0L, 0L),       // dim0 bit1 -> z bit 3 = 8
      (0xFFFFL, 0L, 0L),  // dim0 at bits 0,3,6,... = 0x249249249249
      (0x10000L, 0L, 0L)  // truncated to 16 bits -> 0
    ).toDF("x", "y", "w").selectExpr("zorderk(x, y, w) as z").as[Long].collect().toSeq
    val d0Full = (0 until 16).map(i => 1L << (3 * i)).sum
    assert(rows == Seq(0L, 1L, 2L, 4L, 7L, 8L, d0Full, 0L))
  }

  test("zorderk stays inside WholeStageCodegen on a parquet-backed plan") {
    NativeFunctions.register(spark)
    val df = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("zorderk(l_partkey, l_suppkey, l_orderkey) as z")
      .agg(sum("z"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("zorderk"), s"expression missing:\n$plan")
    assert(plan.contains("*("), s"no codegen spans:\n$plan")
  }

  test("q186 three-dimension files prune on ALL dimensions: tighter than each other-dimension sort") {
    // The 3-dim claim, quantified the same way as the 2-dim test: a
    // layout sorted by any ONE dimension scatters the other two across
    // their full domains in every file; the 3-dim z-order must keep the
    // mean per-file width meaningfully below every OTHER-dimension
    // sorted layout on all three axes.
    NativeFunctions.register(spark)
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    def widths(layout: org.apache.spark.sql.DataFrame): (Double, Double, Double) = {
      val r = layout.select(
        avg(col("partkey_hi") - col("partkey_lo")).as("pk"),
        avg(col("suppkey_hi") - col("suppkey_lo")).as("sk"),
        avg(datediff(col("date_hi"), col("date_lo"))).as("dd")).head()
      (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    }
    def sortedLayout(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.DataFrame =
      li.withColumn("file_id", ntile(16).over(Window.orderBy(cols: _*)))
        .groupBy("file_id")
        .agg(min(col("l_partkey")).as("partkey_lo"), max(col("l_partkey")).as("partkey_hi"),
          min(col("l_suppkey")).as("suppkey_lo"), max(col("l_suppkey")).as("suppkey_hi"),
          min(to_date(col("l_shipdate"))).as("date_lo"),
          max(to_date(col("l_shipdate"))).as("date_hi"))
    val (zPk, zSk, zDd) = widths(SourcesOps.zorderKLayout(spark, sfDir))
    val (datePk, dateSk, _) = widths(sortedLayout(col("l_shipdate"), col("l_orderkey"), col("l_linenumber")))
    val (_, pkSk, pkDd) = widths(sortedLayout(col("l_partkey"), col("l_orderkey"), col("l_linenumber")))
    // Three dims share the 16-file budget, so per-axis tightening is
    // weaker than d=2's 0.75 — but it must still be real on EVERY axis
    // vs a sort that ignores that axis entirely.
    assert(zPk < datePk * 0.85,
      s"3-dim z-order mean partkey width $zPk not tighter than date-sort's $datePk")
    assert(zSk < dateSk * 0.85 && zSk < pkSk * 0.85,
      s"3-dim z-order mean suppkey width $zSk not tighter than date-sort's $dateSk / part-sort's $pkSk")
    assert(zDd < pkDd * 0.85,
      s"3-dim z-order mean date width $zDd not tighter than part-sort's $pkDd")
  }
}
