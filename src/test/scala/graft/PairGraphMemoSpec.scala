package graft

import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** The session-scoped LSH pair-graph memo (r6, VERDICT item 3): q75,
  * q101, q127 and q132 share one graph build per (session, dir). These
  * tests pin the two properties the bench-cost claim rests on —
  * identity (later consumers get the SAME materialized plan, not a
  * rebuild) and correctness (the memoized graph equals a direct
  * un-memoized build).
  */
class PairGraphMemoSpec extends SparkSpec {

  test("second lookup returns the identical memoized DataFrame (no rebuild)") {
    val first = LlmPipeline.lshPairGraph(spark, sfDir)
    val second = LlmPipeline.lshPairGraph(spark, sfDir)
    assert(first eq second,
      "pair-graph memo must return the same persisted instance per (session, dir)")
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

  test("eviction unpersists the cached graph at the call, not at GC time") {
    val g = LlmPipeline.lshPairGraph(spark, sfDir)
    assert(g.storageLevel.useMemory || g.storageLevel.useDisk,
      "memoized graph must be persisted while the memo holds it")
    LlmPipeline.clearPairGraphCache(spark)
    assert(g.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
      "clearPairGraphCache must free the blocks deterministically (unpersist)")
    // A later lookup rebuilds rather than resurrecting the evicted entry.
    val g2 = LlmPipeline.lshPairGraph(spark, sfDir)
    assert(!(g2 eq g), "post-eviction lookup must build a fresh graph")
    LlmPipeline.clearPairGraphCache(spark)
  }
}
