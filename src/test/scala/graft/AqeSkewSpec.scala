package graft

import org.apache.spark.sql.functions._

/** AQE skewed-join evidence (SURVEY §2.2.3 scale story): at 100 TB the
  * hot-key partition of a shuffle join is the classic straggler, and
  * Spark's OptimizeSkewedJoin splits it at runtime from the actual map
  * output sizes — no salting rewrite needed (q19 demonstrates the manual
  * salting pattern for the window case AQE cannot split). This spec
  * proves the mechanism actually fires — plan shows
  * `SortMergeJoin(skew=true)` over an `AQEShuffleRead … skewed` — and
  * that the split answer equals the unsplit one.
  *
  * Note the deliberate plan shape: the skewed join feeds a GLOBAL
  * aggregate. If the join fed a groupBy on the join key, AQE would
  * refuse to split the skewed partition (splitting breaks the hash
  * partitioning the downstream aggregate requires, and re-shuffling
  * would cost more than the straggler) — the 100-TB takeaway being that
  * skew-join rescue applies when the join's output partitioning is not
  * load-bearing downstream.
  */
class AqeSkewSpec extends SparkSpec {

  private def withConf[T](pairs: (String, String)*)(f: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def skewedJoin() = {
    // Key 7 carries 200k rows (~20× every other key's partition share);
    // 100 uniform keys carry 100 rows each.
    val left = spark.range(0, 200000).select(lit(7L).as("k"), col("id").as("v"))
      .union(spark.range(0, 10000).select((col("id") % 100 + 100).as("k"), col("id").as("v")))
    val right = spark.range(0, 300).select(col("id").as("k"), (col("id") * 2).as("w"))
    left.join(right, "k").agg(count(lit(1)).as("n"), sum(col("v") + col("w")).as("s"))
  }

  test("OptimizeSkewedJoin splits the hot partition and preserves the answer") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // Scope the byte thresholds down to fixture scale so the 200k-row
      // partition registers as skewed (defaults are 256 MiB / 64 MiB).
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val (splitRow, plan) = withConf(confs: _*) {
      val df = skewedJoin()
      val row = df.collect().head
      (row, df.queryExecution.executedPlan.toString)
    }
    assert(plan.contains("SortMergeJoin(skew=true)"),
      s"OptimizeSkewedJoin did not mark the join: ${plan.linesIterator.filter(_.contains("Join")).mkString("; ")}")
    assert(plan.linesIterator.exists(l => l.contains("AQEShuffleRead") && l.contains("skewed")),
      "no skewed AQEShuffleRead under the join")
    // Equal results with the skew rescue off.
    val baseRow = withConf(confs :+ ("spark.sql.adaptive.skewJoin.enabled" -> "false"): _*) {
      skewedJoin().collect().head
    }
    assert(splitRow == baseRow, s"skew split changed the answer: $splitRow vs $baseRow")
  }
}
