package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.StreamingAdmission

/** Streaming shard admission (live q144): per-micro-batch probe of the
  * stored band index must reproduce the batch decision exactly — for
  * every chunking and arrival order of the crawl stream, because each
  * decision depends only on (doc, static index). That independence is
  * the design point; this spec is its proof obligation.
  */
class StreamingAdmissionSpec extends SparkSpec {

  test("streamed admission over a scrambled chunked crawl equals batch q144's corpus-partner column") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)

    // The q144 "new shard", delivered out of id order (deterministic
    // scramble) across three micro-batches.
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = newDocs.grouped(math.max(newDocs.length / 3, 1)).toSeq

    val tmp = Files.createTempDirectory("graft_admit")
    val sink = tmp.resolve("decisions").toString
    val ckpt = tmp.resolve("ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingAdmission.start(spark, bandsPath, shinglesPath,
      input.toDS().toDF("doc_id", "text"), sink, ckpt)
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = LlmPipeline.incrementalDedup(spark, sfDir)
        .filter(col("n_dup_old") > 0).select("doc_id", "n_dup_old")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(batch.nonEmpty, "fixture must produce corpus-partner rejections")
      assert(streamed == batch,
        s"streamed decisions diverged: stream=${streamed.take(5)}… batch=${batch.take(5)}…")
      // foreachBatch is at-least-once: replay batch 0 against the same
      // log (the post-failure re-execution path) and require the log is
      // byte-identical — the batch_id-keyed Overwrite commit makes the
      // replay rewrite its own directory, not append a duplicate copy.
      StreamingAdmission.commitBatch(spark, bandsPath, shinglesPath,
        chunks.head.toSeq.toDF("doc_id", "text"), sink, batchId = 0L)
      val replayed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(replayed == batch,
        s"batch replay duplicated decisions: ${replayed.size} rows vs ${batch.size}")
    } finally {
      q.stop()
      LlmPipeline.deleteRecursively(tmp)
    }
  }

  test("streamed embedding admission over a scrambled chunked feed equals the batch q174 answer") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)

    // The q174 "new shard" of vectors, delivered out of id order across
    // three micro-batches (deterministic scramble).
    val newVecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter("vec_id % 4 = 0").select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .sortBy { case (id, _) => (id % 7, id) }
    val chunks = newVecs.grouped(math.max(newVecs.length / 3, 1)).toSeq

    val tmp = Files.createTempDirectory("graft_admit_ann")
    val sink = tmp.resolve("decisions").toString
    val ckpt = tmp.resolve("ckpt").toString
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAdmission.startAnn(spark, keysPath, vecsPath,
      input.toDS().toDF("vec_id", "embedding"), sink, ckpt)
    try {
      chunks.foreach { c => input.addData(c.toSeq); q.processAllAvailable() }
      val streamed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      val batch = LlmPipeline.annAdmission(spark, sfDir)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(batch.nonEmpty, "fixture must produce embedding near-dup admissions")
      assert(streamed == batch,
        s"streamed ANN decisions diverged: stream=${streamed.take(5)}… batch=${batch.take(5)}…")
      // Batch replay (at-least-once foreachBatch) must leave the log
      // unchanged — same idempotent batch_id-keyed commit as the
      // document path.
      StreamingAdmission.commitAnnBatch(spark, keysPath, vecsPath,
        chunks.head.toSeq.toDF("vec_id", "embedding"), sink, batchId = 0L)
      val replayed = spark.read.parquet(sink)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      assert(replayed == batch,
        s"ANN batch replay duplicated decisions: ${replayed.size} rows vs ${batch.size}")
    } finally {
      q.stop()
      LlmPipeline.deleteRecursively(tmp)
    }
  }
}
