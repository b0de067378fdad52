package graft

import org.apache.spark.sql.functions._

import graft.plans.TopKPerGroup
import graft.queries.Relational
import graft.sources.Tables

class TopKPerGroupSpec extends SparkSpec {

  test("custom operator equals the window row_number composite for several k") {
    Seq(1, 3, 7).foreach { k =>
      import org.apache.spark.sql.expressions.Window
      val base = Tables.customer(spark, sfDir)
        .select("c_nationkey", "c_custkey", "c_acctbal")
      val custom = TopKPerGroup.topKPerGroup(
        base, Seq("c_nationkey"), Seq("c_acctbal" -> true, "c_custkey" -> false), k)
        .collect().map(_.toString).sorted.toSeq
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
      val reference = base.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= k).drop("rk")
        .collect().map(_.toString).sorted.toSeq
      assert(custom == reference, s"k=$k diverged")
    }
  }

  test("physical plan uses TopKPerGroupExec with a single exchange, no Window/Sort of input") {
    val df = Relational.customTopKPerNation(spark, sfDir)
    df.collect()
    // AQE's string repeats the initial plan below the final one — only
    // assert on the finalized section.
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    // SparkPlan.nodeName strips the Exec suffix in plan strings.
    assert(plan.contains("TopKPerGroup ["), s"custom exec missing:\n$plan")
    assert(!plan.contains("Window"), s"window crept back in:\n$plan")
    // exactly one hash exchange (for the clustered distribution); the
    // final small orderBy's range exchange is allowed.
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashEx == 1, s"expected 1 hash exchange, got $hashEx:\n$plan")
  }

  test("handles ties, k larger than group, and empty input") {
    import spark.implicits._
    val d = Seq((1L, 5.0), (1L, 5.0), (1L, 1.0), (2L, 2.0))
      .toDF("g", "v")
    val top2 = TopKPerGroup.topKPerGroup(d, Seq("g"), Seq("v" -> true), 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toSeq
    assert(top2 == Seq((1L, 5.0), (1L, 5.0), (2L, 2.0)))
    val top9 = TopKPerGroup.topKPerGroup(d, Seq("g"), Seq("v" -> true), 9).count()
    assert(top9 == 4)
    val empty = TopKPerGroup.topKPerGroup(d.filter(col("g") > 100), Seq("g"), Seq("v" -> true), 2)
    assert(empty.count() == 0)
  }
}
