package graft

import org.apache.spark.sql.functions._

import graft.queries.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSpec {

  test("stratified sample hits each stratum's fraction within tolerance") {
    val totals = Tables.orders(spark, sfDir)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sampled = Relational.sampleStratified(spark, sfDir)
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Map("F" -> 0.05, "O" -> 0.20, "P" -> 0.50)
    want.foreach { case (s, f) =>
      val n = totals(s).toDouble
      val got = sampled.getOrElse(s, 0L).toDouble
      // Bernoulli: 6-sigma bounds around n*f.
      val sigma = math.sqrt(n * f * (1 - f))
      assert(math.abs(got - n * f) <= 6 * sigma + 1,
        s"stratum $s: sampled $got of $n at fraction $f")
    }
    // No rows leak from unlisted strata.
    assert(sampled.keySet.subsetOf(want.keySet))
  }

  test("stratified sample is deterministic under a fixed seed") {
    val a = Relational.sampleStratified(spark, sfDir).collect().map(_.toString).toSeq
    val b = Relational.sampleStratified(spark, sfDir).collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("q134: skyline equals brute-force non-dominated set and dominates everything else") {
    import graft.queries.Relational
    import graft.sources.Tables
    val pts = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir), col("c_custkey") === col("o_custkey"))
      .groupBy("c_custkey", "c_acctbal").agg(count(lit(1)).as("n_orders"))
      .select("c_acctbal", "n_orders").distinct()
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    def dominated(p: (Double, Long)) = pts.exists(q =>
      q._1 >= p._1 && q._2 >= p._2 && (q._1 > p._1 || q._2 > p._2))
    val truth = pts.filterNot(dominated).toSet
    val got = Relational.skyline(spark, sfDir)
      .select("c_acctbal", "n_orders").collect()
      .map(r => (r.getDouble(0), r.getLong(1))).toSet
    assert(got == truth, s"skyline $got != brute-force $truth")
    assert(truth.nonEmpty)
  }

  test("q137: partition-offset numbering equals the global window row_number") {
    import graft.queries.Relational
    import org.apache.spark.sql.expressions.Window
    val got = Relational.scalableRowNumbers(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val truth = Tables.orders(spark, sfDir)
      .withColumn("global_rn", row_number().over(
        Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("global_rn") <= 1000)
      .select("o_orderkey", "global_rn")
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    assert(got.toSeq == truth.toSeq.map(t => (t._1, t._2)),
      "offset-based numbering diverges from the single-partition window")
    // Ranks are dense from 1.
    assert(got.map(_._2).toSeq == (1L to got.length).toSeq)
  }

  test("q187: priority sample equals the pure-Scala recurrence, and the DLT estimator is draw-noise, not bias") {
    import graft.queries.Relational
    val M = 2147483647L
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("l_orderkey", "cast(l_linenumber as bigint)", "cast(l_quantity as bigint)")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val exact = rows.map(_._3).sum
    def estimator(a: Long): (Seq[(Long, Long, Long, Long)], Long, Long) = {
      def u(ok: Long, ln: Long): Long =
        ((ok * 8 + ln) % M) * a % M * a % M + 1
      val pr = rows.map { case (ok, ln, w) => (w * 2147483646L / u(ok, ln), ok, ln, w) }
        .sortBy { case (p, ok, ln, _) => (-p, ok, ln) }
      val tau = pr(50)._1
      val est = pr.take(50).map { case (_, _, _, w) => math.max(w, tau) }.sum
      (pr.take(50).map { case (p, ok, ln, w) => (ok, ln, w, p) }, tau, est)
    }
    // The query's sample, priorities, and estimate equal the pure-Scala
    // recurrence at the shipped multiplier — integer-exact end to end.
    val (sample, _, est) = estimator(48271L)
    val got = Relational.prioritySample(spark, sfDir).collect()
    assert(got.length == 50)
    assert(got.map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2), r.getLong(3))).toSeq == sample,
      "query sample differs from the pure-Scala priority recurrence")
    assert(got.head.getLong(4) == est && got.head.getLong(5) == exact,
      s"estimator mismatch: query ${got.head.getLong(4)}/${got.head.getLong(5)} vs scala $est/$exact")
    assert(got.forall(_.getBoolean(7)), "est_within_band cell flipped")
    // Unbiasedness evidence: 8 independent Lehmer multipliers give 8
    // near-independent draws; every realized error stays inside the
    // ~3/sqrt(k) envelope and the MEAN error is an order smaller —
    // draw-noise around the truth, not systematic bias (all integer
    // arithmetic: deterministic, measured before pinning).
    val rels = Seq(48271L, 16807L, 69621L, 40692L, 39373L, 27437L, 50653L, 76829L)
      .map { a => val (_, _, e) = estimator(a); (e - exact).toDouble / exact }
    assert(rels.forall(r => math.abs(r) <= 0.4),
      s"a priority-sampling draw left the error envelope: $rels")
    assert(math.abs(rels.sum / rels.length) <= 0.1,
      s"mean error ${rels.sum / rels.length} too large — estimator looks biased")
  }
}
