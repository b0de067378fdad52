package graft

import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** q155 scale-shape laws: the vocabulary is capped BEFORE the global
  * rank window and the broadcast, so both are bounded by construction
  * (the r7 verdict's scale-killer — an uncapped vocab over 100 TB of
  * web text is billions of distinct strings, which kills the
  * single-partition window and the broadcast alike).
  */
class VocabEncodeSpec extends SparkSpec {

  test("q155 plan: top-K cap feeds the rank window (TakeOrdered, window over the capped vocab)") {
    val df = LlmPipeline.vocabEncode(spark, sfDir)
    // Physical: the cap plans as TakeOrderedAndProject — per-partition
    // k-heaps + one k-sized driver merge, never a global sort.
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("TakeOrderedAndProject"),
      s"vocab cap must plan as TakeOrderedAndProject:\n$physical")
    // Logical: every Window's input subtree contains the limit — the
    // rank assignment runs over the ≤VocabCap capped aggregate, not the
    // unbounded distinct-token set.
    val windows = df.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the rank-assignment window")
    assert(windows.forall(w => w.child.collect { case g: GlobalLimit => g }.nonEmpty),
      "rank window must consume the CAPPED vocab (no GlobalLimit below Window)")
  }

  test("q155: ids are bounded by the cap and out-of-vocab tokens drop") {
    val df = LlmPipeline.vocabEncode(spark, sfDir)
    val ids = df.select(explode(split(col("ids_csv"), ",")).as("s"))
      .select(col("s").cast("long").as("id"))
    val row = ids.agg(max("id").as("mx"), countDistinct("id").as("dx")).collect()(0)
    assert(row.getLong(0) <= LlmPipeline.VocabCap.toLong,
      s"an id exceeded the cap: ${row.getLong(0)}")
    assert(row.getLong(1) <= LlmPipeline.VocabCap.toLong)
    // The fixture corpus has more distinct tokens than the cap, so the
    // OOV drop is actually exercised: at least one document's encoded
    // sequence is shorter than its (≤12-token) raw prefix.
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val distinctTokens = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").distinct().count()
    assert(distinctTokens > LlmPipeline.VocabCap,
      "fixture must exceed the cap or the cut is untested")
    val rawLens = docs.select(col("doc_id"),
      size(slice(split(col("text"), " "), 1, 12)).as("raw_len"))
    val shortened = df.alias("e").join(rawLens.alias("r"), Seq("doc_id"))
      .filter(col("n_enc") < col("raw_len")).count()
    assert(shortened > 0, "no document lost an OOV token — the cap did nothing")
  }
}
