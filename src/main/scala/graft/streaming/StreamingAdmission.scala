package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import scala.jdk.CollectionConverters._
import scala.util.Using

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

  // --- streaming component maintenance (q177's live form, r12) ----------

  /** Streaming incremental connected-components maintenance: q177's
    * quotient-graph fold run continuously — each micro-batch of newly
    * crawled docs is admitted into the STANDING component labeling,
    * which EVOLVES across batches (unlike [[start]]/[[startAnn]], whose
    * decisions are stateless against static artifacts, this operator
    * maintains state — the labeling is the state).
    *
    * State discipline (the generation convention, not operator state
    * store): labeling generation b lands in `labels/batch_id=b` with
    * Overwrite; batch b reads its predecessor (the highest generation
    * `< b`), merges, writes generation b. foreachBatch is
    * at-least-once, and a replayed batch re-reads the SAME predecessor
    * and rewrites the SAME directory — replay converges (the q144 sink
    * argument applied to evolving state; spec-exercised). A crash
    * between the write and the checkpoint commit leaves a complete
    * generation that the replay simply rewrites.
    *
    * Pair discovery per batch (all against bucket-keyed artifacts, so
    * per-batch cost tracks the batch):
    *   - batch × standing corpus: the q144 band-index probe, verified,
    *   - batch × previously streamed docs: the batch's bands probe the
    *     ACCUMULATED stream band store (each batch appends its bands
    *     and shingles under `batch_id=` directories — the q168
    *     incremental-index idea applied to the stream's own history),
    *   - batch-internal: the ordinary capped LSH pair pass.
    * A pair (x, y) with x streamed before y is discovered exactly when
    * y arrives, so the UNION of discovered pairs over any chunking of
    * the same doc set is the same pair set (below the bucket cap —
    * caps bind per visibility set, so the invariance law is exercised
    * below them, where the fixture lives), and CC of the same edges is
    * chunking- and order-invariant: the final labeling equals the
    * single-batch run's. CcStreamSpec asserts exactly that, plus
    * replay idempotence and the coarsen-only law (stored corpus
    * components can merge downstream, never split).
    */
  private[graft] def ccBatchPairs(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      streamDir: String, batch: DataFrame, batchId: Long): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    // Idempotent history append: this batch's shingles + bands land in
    // their own batch_id directories (a replay rewrites them in place).
    // The batch's tokenize+minhash lineage runs ONCE — everything below
    // reads the just-written parquet back, which is also exactly what a
    // replayed batch observes. The stored band history is CAPPED (the
    // ensureBandIndex write-time discipline): it serves future batches
    // as an index, and an uncapped store would hand a later probe an
    // unbounded degenerate bucket.
    batch
      .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh")
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$streamDir/shingles/batch_id=$batchId")
    val shNew = spark.read
      .parquet(s"$streamDir/shingles/batch_id=$batchId")
      .select("doc_id", "sh")
    LlmPipeline.cappedBandIndex(shNew).write.mode(SaveMode.Overwrite)
      .parquet(s"$streamDir/bands/batch_id=$batchId")
    val newBands = LlmPipeline.lshBands(shNew)
      .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
    def verified(cand: DataFrame, shOld: DataFrame): DataFrame = cand
      .join(shNew.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(shOld.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), "old_id")
      .filter(expr("jaccard_sim(sh_n, sh_o)") >= 0.5)
      .select(col("new_id").as("id1"), col("old_id").as("id2"))
    // vs the standing corpus (static artifacts).
    val corpusCand = newBands
      .join(spark.read.parquet(bandsPath)
        .select(col("doc_id").as("old_id"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select("new_id", "old_id").distinct()
    val corpusPairs = verified(corpusCand, spark.read.parquet(shinglesPath))
    // vs previously streamed docs (accumulated history, batches < b).
    val histBase = java.nio.file.Paths.get(streamDir, "bands")
    val hasHistory = Using.resource(java.nio.file.Files.list(histBase)) { st =>
      st.iterator().asScala.exists(p =>
        p.getFileName.toString.startsWith("batch_id=") &&
          p.getFileName.toString.stripPrefix("batch_id=").toLong < batchId)
    }
    val streamPairs = if (!hasHistory) spark.emptyDataFrame.select(
      lit(0L).as("id1"), lit(0L).as("id2")).limit(0)
    else {
      val oldBands = spark.read.option("basePath", s"$streamDir/bands")
        .parquet(s"$streamDir/bands")
        .filter(col("batch_id") < batchId)
      val oldSh = spark.read.option("basePath", s"$streamDir/shingles")
        .parquet(s"$streamDir/shingles")
        .filter(col("batch_id") < batchId)
        .select("doc_id", "sh")
      val cand = newBands
        .join(oldBands.select(col("doc_id").as("old_id"), col("band"), col("bsig")),
          Seq("band", "bsig"))
        .select("new_id", "old_id").distinct()
      verified(cand, oldSh)
    }
    // batch-internal pairs (the ordinary capped pass).
    val internal = LlmPipeline.lshNearDupPairs(shNew).select("id1", "id2")
    corpusPairs.unionByName(streamPairs).unionByName(internal).distinct()
  }

  /** Merge one micro-batch into the labeling chain: read the
    * predecessor generation, fold the batch's pairs through the q177
    * quotient merge, write this batch's generation idempotently.
    */
  private[graft] def commitCcBatch(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      streamDir: String, labelsDir: String, batch: DataFrame,
      batchId: Long): Unit = {
    val prev = spark.read.parquet(latestLabels(labelsDir, batchId))
    val pairs = ccBatchPairs(spark, bandsPath, shinglesPath, streamDir, batch, batchId)
    LlmPipeline.mergeComponentLabels(prev, pairs)
      .select(col("id"), col("cluster").as("label"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$labelsDir/batch_id=$batchId")
  }

  /** The highest committed labeling generation strictly below
    * `beforeBatch` — the predecessor a (re)played batch reads. The
    * listing is driver-side control plane (one directory per batch).
    */
  private[graft] def latestLabels(labelsDir: String, beforeBatch: Long): String = {
    val ids = Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(labelsDir))) { st =>
      st.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("batch_id="))
        .map(_.stripPrefix("batch_id=").toLong)
        .filter(_ < beforeBatch)
        .toSeq
    }
    require(ids.nonEmpty, s"no labeling generation below $beforeBatch in $labelsDir")
    s"$labelsDir/batch_id=${ids.max}"
  }

  /** Seed the labeling chain with the standing corpus labeling (the
    * q177 stored artifact) as generation -1, and prepare the stream
    * history root.
    */
  private[graft] def initCc(
      spark: SparkSession, corpusLabelsPath: String, streamDir: String,
      labelsDir: String): Unit = {
    spark.read.parquet(corpusLabelsPath)
      .select("id", "label")
      .write.mode(SaveMode.Overwrite).parquet(s"$labelsDir/batch_id=-1")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(streamDir, "bands"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(streamDir, "shingles"))
  }

  /** Retention for the labeling chain — q171's VACUUM discipline
    * applied to [[startCc]]'s state: generations strictly below
    * `keepFrom` are dropped (each is a complete superseded snapshot;
    * the chain needs only the latest plus however much replay window
    * the checkpoint can demand). Fail-closed consequences, both
    * spec-asserted: [[labelsAt]] on a dropped generation names the
    * earliest retained one, and a replay DEEPER than the retention
    * point refuses (its predecessor is gone) instead of computing from
    * wrong state. Returns the dropped generation ids.
    */
  private[graft] def vacuumCcGenerations(labelsDir: String, keepFrom: Long): Seq[Long] = {
    val dirs = Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(labelsDir))) { st =>
      st.iterator().asScala
        .filter(_.getFileName.toString.startsWith("batch_id="))
        .map(p => (p.getFileName.toString.stripPrefix("batch_id=").toLong, p))
        .toSeq
    }
    val dropped = dirs.filter(_._1 < keepFrom)
    require(dirs.exists(_._1 >= keepFrom),
      s"refusing to vacuum every generation in $labelsDir (keepFrom=$keepFrom)")
    dropped.foreach { case (_, p) => LlmPipeline.deleteRecursively(p) }
    dropped.map(_._1).sorted
  }

  /** Read one exact labeling generation; a generation dropped by
    * [[vacuumCcGenerations]] fails CLOSED naming the earliest retained
    * one (the q171 error contract on the streaming state axis).
    */
  private[graft] def labelsAt(
      spark: SparkSession, labelsDir: String, gen: Long): DataFrame = {
    val p = java.nio.file.Paths.get(labelsDir, s"batch_id=$gen")
    if (!java.nio.file.Files.exists(p)) {
      val retained = Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(labelsDir))) { st =>
        st.iterator().asScala
          .map(_.getFileName.toString)
          .filter(_.startsWith("batch_id="))
          .map(_.stripPrefix("batch_id=").toLong)
          .toSeq
      }
      throw new IllegalStateException(
        s"labeling generation $gen was dropped by retention; earliest retained " +
          s"generation is ${retained.min}")
    }
    spark.read.parquet(p.toString)
  }

  /** Start the component-maintenance stream: `input` is a streaming
    * DataFrame of (doc_id, text); call [[initCc]] first. The labeling
    * after the stream drains is `latestLabels(labelsDir, Long.MaxValue)`.
    */
  def startCc(
      spark: SparkSession, bandsPath: String, shinglesPath: String,
      input: DataFrame, streamDir: String, labelsDir: String,
      checkpointDir: String): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitCcBatch(spark, bandsPath, shinglesPath, streamDir, labelsDir,
          batch, batchId)
      }
      .start()
}
