package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** The session-scoped LSH pair-graph memo (r6 VERDICT item 3; redesigned
  * r9): q75, q101, q127, q132 and q151 share one graph build per
  * (session, dir), served as a leaf scan of a materialized parquet
  * artifact. These tests pin the three properties the bench-cost claim
  * rests on — identity (later consumers get the SAME frame, not a
  * rebuild), lineage truncation (the served plan is a LEAF, so iterative
  * consumers never re-analyze the LSH subtree — the r8 regression), and
  * correctness (the memoized graph equals a direct un-memoized build) —
  * plus deterministic eviction (backing files gone at the clear call,
  * not at GC time).
  */
class PairGraphMemoSpec extends SparkSpec {

  test("second lookup returns the identical memoized DataFrame (no rebuild)") {
    val first = LlmPipeline.lshPairGraph(spark, sfDir)
    val second = LlmPipeline.lshPairGraph(spark, sfDir)
    assert(first eq second,
      "pair-graph memo must return the same materialized instance per (session, dir)")
  }

  test("served graph is a leaf scan — no LSH lineage behind it") {
    val g = LlmPipeline.lshPairGraph(spark, sfDir)
    val plan = g.queryExecution.optimizedPlan
    assert(plan.collectLeaves().size == 1 && plan.children.isEmpty,
      s"memoized pair graph must be a bare leaf relation (iterative consumers " +
        s"re-plan it every round); got:\n$plan")
  }

  test("memoized graph equals a direct lshNearDupPairs build") {
    graft.functions.NativeFunctions.register(spark)
    val memo = LlmPipeline.lshPairGraph(spark, sfDir)
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j"))
      .collect().map(_.toString).sorted.toSeq
    val direct = LlmPipeline.lshNearDupPairs(
      graft.sources.Tables.documents(spark, sfDir)
        .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
        .select("doc_id", "sh"))
      .select(col("id1"), col("id2"), round(col("jaccard"), 4).as("j"))
      .collect().map(_.toString).sorted.toSeq
    assert(memo == direct && memo.nonEmpty,
      s"memoized pair graph diverged from direct build (memo=${memo.size}, direct=${direct.size})")
  }

  test("eviction deletes the backing store at the call, not at GC time") {
    val g = LlmPipeline.lshPairGraph(spark, sfDir)
    val backing = LlmPipeline.pairGraphBackingDir(spark, sfDir)
    assert(backing.exists(java.nio.file.Files.exists(_)),
      "memoized graph must have a live backing store while the memo holds it")
    LlmPipeline.clearPairGraphCache(spark)
    assert(!java.nio.file.Files.exists(backing.get),
      "clearPairGraphCache must delete the backing files deterministically")
    assert(LlmPipeline.pairGraphBackingDir(spark, sfDir).isEmpty)
    // A later lookup rebuilds rather than resurrecting the evicted entry.
    val g2 = LlmPipeline.lshPairGraph(spark, sfDir)
    assert(!(g2 eq g), "post-eviction lookup must build a fresh graph")
    LlmPipeline.clearPairGraphCache(spark)
  }
}
