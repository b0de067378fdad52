package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.queries.{Aggregates, LlmPipeline, Relational}
import graft.sources.Tables

/** Algebraic-law property tests (SURVEY.md §5.2 item 3, ScalaCheck):
  * engine-level invariants that must hold for any input, checked over
  * generated predicates/parameters against the fixture tables. Gens are
  * driven directly with fixed seeds (the scalatest-scalacheck bridge is
  * not in the offline cache).
  */
class PropertySpec extends SparkSpec {

  private def forAll[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)).foreach(body)
    }

  private lazy val orders = Tables.orders(spark, sfDir).cache()

  test("filter pushdown equivalence: filter(p)(A ⋈ B) == filter(p)(A) ⋈ B for left-local p") {
    val customer = Tables.customer(spark, sfDir)
    forAll(Gen.choose(0.0, 300000.0), 5) { threshold =>
      val joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
      val late = joined.filter(col("o_totalprice") > threshold).count()
      val early = orders.filter(col("o_totalprice") > threshold)
        .join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(late == early)
    }
  }

  test("union length law: |A ∪all B| == |A| + |B|; |A ∪ B| <= that") {
    forAll(Gen.oneOf("F", "O", "P"), 3) { status =>
      val a = orders.filter(col("o_orderstatus") === status).select("o_custkey")
      val b = orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      assert(a.unionAll(b).count() == a.count() + b.count())
      assert(a.union(b).distinct().count() <= a.count() + b.count())
    }
  }

  test("rollup totals law: every rollup level sums to the grand total") {
    val r = Aggregates.rollupAggs(spark, sfDir)
    val grand = r.filter(col("gid") === 3).agg(sum("n_rows")).head.getLong(0)
    val level1 = r.filter(col("gid") === 1).agg(sum("n_rows")).head.getLong(0)
    val level0 = r.filter(col("gid") === 0).agg(sum("n_rows")).head.getLong(0)
    assert(grand == level1 && level1 == level0)
  }

  test("top-k per group is a subset of the group and respects k") {
    forAll(Gen.choose(1, 5), 3) { k =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val topk = Tables.customer(spark, sfDir)
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      val maxPerGroup = topk.groupBy("c_nationkey").count()
        .agg(max("count")).head.getLong(0)
      assert(maxPerGroup <= k)
      // subset: every top-k row exists in customer
      val c = Tables.customer(spark, sfDir)
      assert(topk.select(c.columns.head, c.columns.tail: _*).except(c).count() == 0)
    }
  }

  test("dedup idempotence: dedup(dedup(X)) == dedup(X)") {
    val once = LlmPipeline.exactDedup(spark, sfDir)
    // Re-dedup the keeper set (already unique) — must be a fixpoint.
    val keepers = once.select("keeper")
    assert(keepers.distinct().count() == keepers.count())
  }

  test("sampling bounds: key-modulo sample size is exact, bernoulli within bounds") {
    forAll(Gen.choose(2, 50), 5) { m =>
      val n = orders.filter(pmod(col("o_orderkey"), lit(m)) === 0).count()
      val exact = orders.select("o_orderkey").collect()
        .count(_.getLong(0) % m == 0)
      assert(n == exact)
    }
    val frac = Relational.sampleBernoulli(spark, sfDir).count().toDouble /
      orders.count()
    assert(frac > 0.03 && frac < 0.25, s"bernoulli 0.1 sample wildly off: $frac")
  }

  test("set-op laws: A∩B ⊆ A, A\\B ∩ B = ∅, |A∩all B| >= |A∩B|") {
    val a = orders.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    val b = orders.filter(col("o_orderstatus") === "F").select("o_custkey")
    assert(a.intersect(b).except(a).count() == 0)
    assert(a.except(b).intersect(b).count() == 0)
    assert(a.intersectAll(b).count() >= a.intersect(b).count())
  }
}
