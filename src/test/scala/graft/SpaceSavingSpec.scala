package graft

import org.apache.spark.sql.functions._

import graft.functions.Udafs

/** Laws for the SpaceSaving heavy-hitters Aggregator (q154's kernel).
  * The sketch's tracked SET is arrival-order-dependent, so the tests
  * assert its THEOREMS (exactness below capacity, upper/lower bounds,
  * heavy-hitter retention) and that they hold under different
  * parallelism — never a specific tracked set.
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  private def entries(df: org.apache.spark.sql.DataFrame) =
    df.select(explode(col("sk")).as("e"))
      .select(col("e.token"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

  test("below capacity the sketch is exact (every err = 0, est = true count)") {
    val data = (1 to 50).flatMap(i => Seq.fill(i % 7 + 1)(s"tok$i"))
    val ss = udaf(new Udafs.SpaceSaving(64))
    val got = entries(data.toDF("t").repartition(5).agg(ss(col("t")).as("sk")))
    val exact = data.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    assert(got.length == exact.size)
    got.foreach { case (tok, est, err) =>
      assert(err == 0L, s"$tok err=$err below capacity")
      assert(est == exact(tok), s"$tok est=$est != exact ${exact(tok)}")
    }
  }

  test("contracts hold over capacity, at every tested parallelism") {
    // Zipf-ish: token i appears ~ 3000/i times; k = 16 slots.
    val data = (1 to 200).flatMap(i => Seq.fill(3000 / i)(s"w$i"))
    val exact = data.groupBy(identity).map { case (k, vs) => k -> vs.size.toLong }
    val n = data.size.toLong
    val k = 16
    val ss = udaf(new Udafs.SpaceSaving(k))
    for (parts <- Seq(1, 3, 8)) {
      val got = entries(data.toDF("t").repartition(parts).agg(ss(col("t")).as("sk")))
      assert(got.length <= k)
      val tracked = got.map(_._1).toSet
      // 3. heavy hitters (true count > N/k) always tracked
      exact.filter { case (_, c) => c * k > n }.keys.foreach { hh =>
        assert(tracked.contains(hh), s"heavy hitter $hh missing at parts=$parts")
      }
      got.foreach { case (tok, est, err) =>
        val truth = exact.getOrElse(tok, 0L)
        // 1. estimates are upper bounds; 2. est - err is a lower bound
        assert(est >= truth, s"$tok est=$est < true=$truth at parts=$parts")
        assert(est - err <= truth, s"$tok lb=${est - err} > true=$truth at parts=$parts")
      }
    }
  }

  test("q154 gate: all three contract booleans come out true on the fixture") {
    val row = graft.queries.Aggregates.heavyHitters(spark, sfDir).head()
    assert(row.getLong(0) > 0L && row.getLong(1) > 0L,
      "fixture should have tokens and at least one heavy hitter")
    assert(row.getBoolean(2), "a heavy hitter escaped the sketch")
    assert(row.getBoolean(3), "an estimate under-counted")
    assert(row.getBoolean(4), "a lower bound over-counted")
  }
}
