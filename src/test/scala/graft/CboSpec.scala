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
    try {
      // AQE off so the assertion reads the statically-planned join (AQE
      // could flip the join at runtime from observed shuffle sizes —
      // a different, already-spec'd mechanism: AqeSkewSpec).
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // Threshold between the FULL orders size (~60 KB parquet at
      // sf0.001) and the filtered estimate (~1% of rows).
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (8 * 1024).toString)
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")

      // appId-unique location: the in-memory catalog is per-JVM but the
      // filesystem is not — a fixed path collides with a previous test
      // JVM's leaked managed-table directory (LOCATION_ALREADY_EXISTS).
      val wh = s"/tmp/graft_cbo_wh_${graft.queries.SourcesOps.sanitizedAppId(spark)}"
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
      prev.foreach { case (k, v) =>
        v match {
          case Some(x) => spark.conf.set(k, x)
          case None => spark.conf.unset(k)
        }
      }
    }
  }
}
