package graft

import org.apache.spark.sql.functions._

/** Cost-based-optimizer demonstration (VERDICT r5 item 5 — the one
  * SURVEY §4.2 optimizer behavior never previously demonstrated):
  * ANALYZE-collected table + column statistics, fed through
  * `spark.sql.cbo.enabled`, must CHANGE a physical plan — here the
  * broadcast decision on a filtered fact table.
  *
  * The mechanism under test is exactly what a 100-TB deployment relies
  * on: without column stats, Spark estimates a Filter's output size as
  * its child's size (file bytes), so a selective predicate on a large
  * table still looks large and the join stays shuffle-based; with
  * ANALYZE stats and CBO on, FilterEstimation applies the predicate's
  * selectivity from min/max/NDV, the estimated size drops below the
  * broadcast threshold, and the join flips to BroadcastHashJoin — no
  * shuffle of the big side. Results must be identical either way (the
  * optimizer may only change the plan, never the answer).
  */
class CboSpec extends SparkSpec {

  test("ANALYZE stats + CBO flip a selectively-filtered join side to broadcast") {
    val confs = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    // appId-unique location: the in-memory catalog is per-JVM but the
    // filesystem is not — a fixed path collides with a previous test
    // JVM's leaked managed-table directory (LOCATION_ALREADY_EXISTS).
    val wh = s"/tmp/graft_cbo_wh_${graft.queries.SourcesOps.sanitizedAppId(spark)}"
    try {
      // AQE off so the assertion reads the statically-planned join (AQE
      // could flip the join at runtime from observed shuffle sizes —
      // a different, already-spec'd mechanism: AqeSkewSpec).
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // Threshold between the FULL orders size (~60 KB parquet at
      // sf0.001) and the filtered estimate (~1% of rows).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (8 * 1024).toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")

      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_cbo LOCATION '$wh'")
      graft.sources.Tables.orders(spark, sfDir)
        .write.mode("overwrite").saveAsTable("graft_cbo.orders_t")
      graft.sources.Tables.lineitem(spark, sfDir)
        .write.mode("overwrite").saveAsTable("graft_cbo.lineitem_t")
      spark.sql("ANALYZE TABLE graft_cbo.orders_t COMPUTE STATISTICS FOR ALL COLUMNS")
      spark.sql("ANALYZE TABLE graft_cbo.lineitem_t COMPUTE STATISTICS FOR ALL COLUMNS")

      val orderKeyMax = spark.table("graft_cbo.orders_t")
        .agg(max(col("o_orderkey"))).head().getLong(0)
      // ~1% selective predicate, stats-estimable from the min/max range.
      val sql =
        s"""SELECT o.o_orderpriority, sum(l.l_quantity) AS sum_qty
           |FROM graft_cbo.lineitem_t l
           |JOIN graft_cbo.orders_t o ON l.l_orderkey = o.o_orderkey
           |WHERE o.o_orderkey <= ${orderKeyMax / 100}
           |GROUP BY o.o_orderpriority""".stripMargin

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val noCbo = spark.sql(sql)
      val noCboPlan = noCbo.queryExecution.sparkPlan.toString
      val noCboRows = noCbo.collect().map(_.toString).sorted.toSeq

      spark.conf.set("spark.sql.cbo.enabled", "true")
      val cbo = spark.sql(sql)
      val cboPlan = cbo.queryExecution.sparkPlan.toString
      val cboRows = cbo.collect().map(_.toString).sorted.toSeq

      assert(!noCboPlan.contains("BroadcastHashJoin"),
        s"without CBO the filtered orders side should look too large to broadcast:\n$noCboPlan")
      assert(cboPlan.contains("BroadcastHashJoin"),
        s"with ANALYZE stats + CBO the filtered orders side should broadcast:\n$cboPlan")
      assert(cboRows == noCboRows && cboRows.nonEmpty,
        "CBO changed the ANSWER, not just the plan")
    } finally {
      // Drop the database AND its warehouse dir (ADVICE r6): the
      // appId-unique path avoids cross-JVM collisions but would leak a
      // /tmp directory per test JVM without this.
      spark.sql("DROP DATABASE IF EXISTS graft_cbo CASCADE")
      deleteRecursively(new java.io.File(wh))
      prev.foreach { case (k, v) =>
        v match {
          case Some(x) => spark.conf.set(k, x)
          case None => spark.conf.unset(k)
        }
      }
    }
  }

  test("ANALYZE stats + CBO reorder a 3-table star join away from the syntactic order") {
    // VERDICT r6 item 3: the broadcast flip above proves stats change a
    // PHYSICAL decision; this proves they change the LOGICAL join TREE.
    // Syntactically the query is (lineitem ⋈ orders) ⋈ customer — the
    // biggest table leads. A ~1% range predicate on customer makes
    // (orders ⋈ σcustomer) the far smaller first join; CBO's
    // CostBasedJoinReorder (DP over the inner-join component, costed
    // from ANALYZE row counts + FilterEstimation selectivity) must
    // rebuild the tree so lineitem joins LAST. At 100 TB this is the
    // difference between shuffling the fact table against everything
    // versus against an already-reduced dimension product.
    val confs = Seq(
      "spark.sql.cbo.enabled",
      "spark.sql.cbo.joinReorder.enabled",
      "spark.sql.adaptive.enabled")
    val prev = confs.map(k => k -> spark.conf.getOption(k)).toMap
    val wh = s"/tmp/graft_cbo_wh_reorder_${graft.queries.SourcesOps.sanitizedAppId(spark)}"
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_cbo_r LOCATION '$wh'")
      graft.sources.Tables.orders(spark, sfDir)
        .write.mode("overwrite").saveAsTable("graft_cbo_r.orders_t")
      graft.sources.Tables.lineitem(spark, sfDir)
        .write.mode("overwrite").saveAsTable("graft_cbo_r.lineitem_t")
      graft.sources.Tables.customer(spark, sfDir)
        .write.mode("overwrite").saveAsTable("graft_cbo_r.customer_t")
      for (t <- Seq("orders_t", "lineitem_t", "customer_t"))
        spark.sql(s"ANALYZE TABLE graft_cbo_r.$t COMPUTE STATISTICS FOR ALL COLUMNS")

      val custKeyMax = spark.table("graft_cbo_r.customer_t")
        .agg(max(col("c_custkey"))).head().getLong(0)
      val sql =
        s"""SELECT c.c_mktsegment, sum(l.l_quantity) AS sum_qty
           |FROM graft_cbo_r.lineitem_t l
           |JOIN graft_cbo_r.orders_t o ON l.l_orderkey = o.o_orderkey
           |JOIN graft_cbo_r.customer_t c ON o.o_custkey = c.c_custkey
           |WHERE c.c_custkey <= ${custKeyMax / 100}
           |GROUP BY c.c_mktsegment""".stripMargin

      // The optimized logical plan's leaf sequence encodes the join
      // tree's shape: a left-deep ((A ⋈ B) ⋈ C) lists leaves A, B, C.
      def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.queryExecution.optimizedPlan.collectLeaves().map(_.toString).map { s =>
          Seq("lineitem_t", "orders_t", "customer_t").find(s.contains).getOrElse("?")
        }

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val noCbo = spark.sql(sql)
      val noCboOrder = leafOrder(noCbo)
      val noCboRows = noCbo.collect().map(_.toString).sorted.toSeq

      spark.conf.set("spark.sql.cbo.enabled", "true")
      val cbo = spark.sql(sql)
      val cboOrder = leafOrder(cbo)
      val cboRows = cbo.collect().map(_.toString).sorted.toSeq

      assert(noCboOrder == Seq("lineitem_t", "orders_t", "customer_t"),
        s"without CBO the join tree should stay syntactic: $noCboOrder")
      assert(cboOrder != noCboOrder,
        s"CBO + ANALYZE stats did not reorder the join tree: $cboOrder")
      assert(cboOrder.head != "lineitem_t",
        s"reordered tree should not lead with the fact table: $cboOrder")
      assert(cboRows == noCboRows && cboRows.nonEmpty,
        "join reorder changed the ANSWER, not just the plan")
    } finally {
      spark.sql("DROP DATABASE IF EXISTS graft_cbo_r CASCADE")
      deleteRecursively(new java.io.File(wh))
      prev.foreach { case (k, v) =>
        v match {
          case Some(x) => spark.conf.set(k, x)
          case None => spark.conf.unset(k)
        }
      }
    }
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }
}
