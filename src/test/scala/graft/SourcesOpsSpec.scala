package graft

import org.apache.spark.sql.functions._

import graft.queries.SourcesOps

class SourcesOpsSpec extends SparkSpec {

  test("local sort: every partition is internally sorted by o_orderkey") {
    import spark.implicits._
    val bad = SourcesOps.localSortRaw(spark, sfDir)
      .select("o_orderkey").as[Long]
      .mapPartitions { it =>
        val keys = it.toSeq
        Iterator.single(keys.zip(keys.drop(1)).count { case (a, b) => a > b })
      }.collect().sum
    assert(bad == 0, s"$bad out-of-order adjacent pairs inside partitions")
  }

  test("partitioned sink lays out one directory per mktsegment and prunes reads") {
    SourcesOps.partitionedSink(spark, sfDir).collect() // triggers the write
    val out = new java.io.File(
      sys.props("java.io.tmpdir"), "graft_srcops_psink")
    val segDirs = out.listFiles().filter(_.getName.startsWith("c_mktsegment="))
    assert(segDirs.length >= 2, s"expected partition dirs, got ${out.listFiles().map(_.getName).mkString(",")}")
    // Pruned read: the physical plan must select partitions, not filter rows.
    val plan = spark.read.parquet(out.toString)
      .filter(col("c_mktsegment") === "BUILDING")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "partition pruning not in plan")
  }

  test("csv and json round-trips preserve row counts") {
    val nCsv = SourcesOps.csvRoundtrip(spark, sfDir).agg(sum("n_orders")).head.getLong(0)
    val nOrders = graft.sources.Tables.orders(spark, sfDir).count()
    assert(nCsv == nOrders)
    val nJson = SourcesOps.jsonRoundtrip(spark, sfDir).agg(sum("n_docs")).head.getLong(0)
    val nDocs = graft.sources.Tables.documents(spark, sfDir).count()
    assert(nJson == nDocs)
  }
}
