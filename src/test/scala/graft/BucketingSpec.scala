package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Bucketed co-located joins (SURVEY.md §4.2 partitioning obligations):
  * pre-bucketing both sides of a recurring join key removes the shuffle
  * entirely — at 100 TB this converts every orders⋈customer query from
  * a full network exchange into a local per-bucket merge. Verified here
  * by plan shape: no hash-partitioning Exchange above bucketed scans.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed tables join without any shuffle exchange") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      Tables.customer(spark, sfDir)
        .select("c_custkey", "c_mktsegment")
        .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(round(sum("o_totalprice"), 2).as("s"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning(o_custkey"),
        s"orders side still shuffles:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning(c_custkey"),
        s"customer side still shuffles:\n$plan")
      // And the result is still correct vs the unbucketed join.
      val bucketed = joined.collect().map(_.toString).sorted.toSeq
      val plain = Tables.orders(spark, sfDir)
        .join(Tables.customer(spark, sfDir), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(round(sum("o_totalprice"), 2).as("s"))
        .collect().map(_.toString).sorted.toSeq
      assert(bucketed == plain)
    } finally {
      spark.conf.set(key, prev)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("q102 core: join AND per-customer aggregate run with zero shuffle exchange") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val keys = Seq("spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "-1"))
    try {
      val core = graft.queries.SourcesOps.bucketedJoinCore(spark, sfDir)
      assert(core.count() > 0)
      // AQE final plan (after the action): the bucketed scans satisfy both
      // the SMJ's and the aggregate's clustering, so no ShuffleExchange
      // anywhere — the shape that holds when neither side is broadcastable.
      val finalPlan = core.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }
      val shuffles = finalPlan.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"expected a fully co-located plan, found ${shuffles.size} shuffle(s):\n$finalPlan")
      assert(finalPlan.toString.contains("SortMergeJoin"),
        s"expected a sort-merge join over bucketed scans:\n$finalPlan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
