package graft

import org.apache.spark.sql.functions._

import graft.queries.Aggregates
import graft.sources.Tables

/** Property checks for the aggregates that cannot be oracle-hash-compared
  * (approx sketches) plus a full-width check of the centroid Aggregator
  * (the oracle only spot-checks 4 of 64 dimensions).
  */
class AggregatesSpec extends SparkSpec {

  test("approx_count_distinct is within rsd bounds of exact") {
    val apx = Aggregates.approxAggs(spark, sfDir)
      .select("o_orderpriority", "apx_n_cust").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(apx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = apx(k).toDouble
      assert(math.abs(a - n) <= math.max(4.0, 0.1 * n),
        s"priority $k: approx $a vs exact $n out of bounds")
    }
  }

  test("percentile_approx median is between group min and max and near exact") {
    val apx = Aggregates.approxAggs(spark, sfDir)
      .select("o_orderpriority", "apx_median").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = Tables.orders(spark, sfDir)
      .groupBy("o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    exact.foreach { case (k, m) =>
      assert(math.abs(apx(k) - m) / m < 0.05, s"$k: ${apx(k)} vs exact $m")
    }
  }

  test("VectorCentroid matches posexplode+avg on all 64 dimensions") {
    val centroid = udaf(new graft.functions.Udafs.VectorCentroid(64))
    val viaUdaf = Tables.embeddings(spark, sfDir)
      .select(col("label"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .groupBy("label").agg(centroid(col("v")).as("c"))
      .select(col("label"), posexplode(col("c")).as(Seq("pos", "v")))
    val viaExplode = Tables.embeddings(spark, sfDir)
      .select(col("label"), posexplode(expr("transform(embedding, x -> cast(x as double))")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg(col("x")).as("v"))
    val diff = viaUdaf.alias("a")
      .join(viaExplode.alias("b"), Seq("label", "pos"))
      .select(abs(col("a.v") - col("b.v")).as("d"))
      .agg(max("d")).head.getDouble(0)
    assert(diff < 1e-9, s"max centroid divergence $diff")
  }

  test("WeightedAvg equals unweighted avg when weights are constant") {
    val wavg = udaf(graft.functions.Udafs.WeightedAvg)
    val r = Tables.customer(spark, sfDir)
      .agg(
        wavg(col("c_acctbal"), lit(1.0)).as("w"),
        avg(col("c_acctbal")).as("a"))
      .head
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9)
  }

  test("q131: histogram bins partition the rows and bin extremes nest in order") {
    import graft.queries.Aggregates
    import graft.sources.Tables
    val h = Aggregates.histogram(spark, sfDir).collect()
    val total = Tables.orders(spark, sfDir).count()
    assert(h.map(_.getLong(1)).sum == total, "bin counts do not partition the table")
    // Bins are disjoint ranges: each bin's max stays below the next bin's min.
    val ordered = h.sortBy(_.getInt(0))
    ordered.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(3) < hi.getDouble(2),
          s"bin ${lo.getInt(0)} max ${lo.getDouble(3)} overlaps bin ${hi.getInt(0)} min ${hi.getDouble(2)}")
      case _ => ()
    }
  }
}
