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
}
