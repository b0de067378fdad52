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

  test("q182: merged shard sketches stay in tolerance for EVERY sharding width, and re-union is deterministic") {
    import graft.queries.Aggregates
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sfDir)
    val exact = ev.select("user_id").distinct().count()
    def unionEst(width: Int): Long = ev
      .groupBy(pmod(col("user_id"), lit(width)))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    // Any sharding width — 1 shard to 31 shards — merges to within
    // sketch tolerance of the exact count (the maintenance guarantee a
    // pipeline actually relies on: shards sketched independently, union
    // late, accuracy preserved).
    val widths = Seq(1, 2, 3, 7, 13, 31)
    val ests = widths.map(w => w -> unionEst(w))
    ests.foreach { case (w, e) =>
      assert(math.abs(e - exact) <= 0.05 * exact,
        s"union over $w shards estimated $e vs exact $exact — outside 3*rsd")
    }
    // Re-execution stability: a second run of the same sharding lands
    // inside the cross-sharding agreement band. Exact equality is NOT
    // asserted — the round's own measurements show the estimator is
    // merge-path sensitive, and Spark's partial-aggregation merge order
    // is not guaranteed stable across executions; the contract cells'
    // wide margins are what make the hashed query deterministic.
    assert(math.abs(unionEst(7) - ests.toMap.apply(7)) <= 0.02 * exact,
      "re-union of the same sharding drifted outside the agreement band")
    // The query's own contract cells hold.
    val rows = Aggregates.sketchMaintenance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4)),
      "q182 contract cells flipped")
    assert(rows.map(_.getLong(2)).distinct.toSeq == Seq(exact))
  }

  test("q183: merged KLL shard sketches stay in the rank band for EVERY sharding width, and counts merge exactly") {
    import graft.queries.Aggregates
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    graft.functions.NativeFunctions.register(spark)
    val ev = Tables.events(spark, sfDir)
    val n = ev.count()
    // Exact continuous-percentile rank bands at p50/p90 ± 5% (the
    // query's contract band: multi-epsilon headroom over KLL's
    // published eps(200) ~ 1.33% at 99%).
    val pb = ev.agg(expr(
      "percentile(value, array(0.45D, 0.55D, 0.85D, 0.95D))")).head().getSeq[Double](0)
    def merged(width: Int): (Double, Double, Long) = {
      val r = ev.groupBy(pmod(col("user_id"), lit(width)))
        .agg(expr("kll_sketch_agg(value, 200)").as("sk"))
        .agg(expr("kll_union_agg(sk)").as("m"))
        .select(expr("kll_sketch_quantile(m, 0.5D)"),
          expr("kll_sketch_quantile(m, 0.9D)"),
          // n flows through the union exactly — the lossless axis of
          // the merge (unlike the randomized compaction, item counts
          // add), checked via a sketch rebuilt from the merged bytes.
          expr("cast(0L as bigint)"))
        .head()
      (r.getDouble(0), r.getDouble(1), n)
    }
    Seq(1, 2, 7, 13, 31).foreach { w =>
      val (q50, q90, _) = merged(w)
      assert(q50 >= pb(0) && q50 <= pb(1),
        s"$w-shard merged p50 $q50 outside rank band [${pb(0)}, ${pb(1)}]")
      assert(q90 >= pb(2) && q90 <= pb(3),
        s"$w-shard merged p90 $q90 outside rank band [${pb(2)}, ${pb(3)}]")
    }
    // A LOST shard of material size must break the band: drop the
    // largest user_id % 2 shard and the p90 of the remainder should
    // still be in band, but the retained-count law catches the loss —
    // merged getN is exact item count under any sharding.
    val bytes = ev.groupBy(pmod(col("user_id"), lit(7)))
      .agg(expr("kll_sketch_agg(value, 200)").as("sk"))
      .agg(expr("kll_union_agg(sk)").as("m")).head().getAs[Array[Byte]](0)
    val sk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(bytes))
    assert(sk.getN == n, s"merged sketch retained ${sk.getN} items, corpus has $n")
    val lossy = ev.filter(pmod(col("user_id"), lit(2)) === 1)
      .agg(expr("kll_sketch_agg(value, 200)").as("sk")).head().getAs[Array[Byte]](0)
    val lostSk = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(lossy))
    assert(lostSk.getN < n, "the deliberately lossy sharding lost nothing")
    // The query's own contract cells hold.
    val rows = Aggregates.quantileMaintenance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getBoolean(5) && r.getBoolean(6)),
      "q183 contract cells flipped")
  }

  test("q184: merged CM sketches are BIT-IDENTICAL under every sharding and never underestimate any key") {
    import graft.queries.Aggregates
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    graft.functions.NativeFunctions.register(spark)
    val ev = Tables.events(spark, sfDir)
    // Cell-wise counter addition commutes exactly: the merged sketch
    // from EVERY sharding width must estimate bit-equal to the direct
    // single-sketch build — the law q182/q183 could only band.
    def estimates(width: Int): Map[Long, Long] = {
      val m = ev.groupBy(pmod(col("user_id"), lit(width)))
        .agg(expr("cm_sketch_agg(user_id, 7, 400, 42)").as("sk"))
        .agg(expr("cm_union_agg(sk)").as("m"))
      ev.select(col("user_id")).distinct()
        .crossJoin(broadcast(m))
        .select(col("user_id"), expr("cm_estimate(m, user_id)").as("est"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val direct = ev.agg(expr("cm_sketch_agg(user_id, 7, 400, 42)").as("m"))
    val directEst = ev.select(col("user_id")).distinct()
      .crossJoin(broadcast(direct))
      .select(col("user_id"), expr("cm_estimate(m, user_id)").as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 2, 7, 13, 31).foreach { w =>
      assert(estimates(w) == directEst,
        s"$w-shard merged CM estimates differ from the direct build — merge is not cell-wise")
    }
    // Never-underestimate is a theorem — assert it for EVERY key, not
    // just the hot ones the query emits.
    val exact = ev.groupBy("user_id").agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, c) =>
      assert(directEst(k) >= c, s"CM underestimated key $k: ${directEst(k)} < $c")
    }
    // The query's own contract cells hold (within_eps_n included —
    // deterministic given data + seed, so this pin is stable).
    val rows = Aggregates.freqSketchMaintenance(spark, sfDir).collect()
    assert(rows.length == 8)
    assert(rows.forall(r => r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5)),
      "q184 contract cells flipped")
  }

  test("q185: merged theta sketches are sharding-independent, exact below k, and in-band in estimation mode") {
    import graft.queries.Aggregates
    import graft.sources.Tables
    import org.apache.spark.sql.functions._
    graft.functions.NativeFunctions.register(spark)
    val parts = Tables.lineitem(spark, sfDir).select(col("l_partkey"))
    val exact = parts.distinct().count()
    // Sharding-independence: union keeps the global k smallest hashes
    // (the MinKLongs argument), so every sharding width lands on the
    // identical merged sketch estimate.
    def merged(width: Int): Double = parts
      .groupBy(pmod(col("l_partkey"), lit(width)))
      .agg(expr("theta_sketch_agg(l_partkey, 4096)").as("sk"))
      .agg(expr("theta_union_agg(sk, 4096)").as("m"))
      .select(expr("theta_estimate(m)")).head().getDouble(0)
    val ests = Seq(1, 2, 7, 13, 31).map(merged)
    assert(ests.distinct.size == 1,
      s"theta merged estimates differ across shardings: $ests")
    // Below k retained entries the sketch is EXACT (theta = 1).
    assert(ests.head == exact.toDouble,
      s"theta in exact mode estimated ${ests.head}, exact $exact")
    // Estimation mode: replicate the key set with disjoint offsets to
    // exceed k, then the estimate must land within the published
    // ~3/sqrt(k) band (3 sigma ~ 4.7% at k = 4096) and stay
    // sharding-independent there too.
    val big = parts.crossJoin(spark.range(40).select(col("id").as("rep")))
      .select((col("l_partkey") + col("rep") * 1000000L).as("k"))
    val bigExact = 40L * exact
    def mergedBig(width: Int): Double = big
      .groupBy(pmod(col("k"), lit(width)))
      .agg(expr("theta_sketch_agg(k, 4096)").as("sk"))
      .agg(expr("theta_union_agg(sk, 4096)").as("m"))
      .select(expr("theta_estimate(m)")).head().getDouble(0)
    val bigEsts = Seq(1, 7, 13).map(mergedBig)
    assert(bigEsts.distinct.size == 1,
      s"estimation-mode theta estimates differ across shardings: $bigEsts")
    assert(math.abs(bigEsts.head - bigExact) <= 0.047 * bigExact,
      s"estimation-mode estimate ${bigEsts.head} outside 4.7% of $bigExact")
    // The query's own contract cells hold.
    val row = Aggregates.setSketchMaintenance(spark, sfDir).head()
    assert(row.getBoolean(7) && row.getBoolean(8) && row.getBoolean(9) && row.getBoolean(10),
      s"q185 contract cells flipped: $row")
    assert(row.getLong(2) > 0 && row.getLong(4) > 0 && row.getLong(5) > 0,
      "q185 degenerate: empty year set, intersection, or difference")
  }
}
