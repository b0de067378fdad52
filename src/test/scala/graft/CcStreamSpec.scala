package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.StreamingAdmission

/** Streaming component maintenance (q177's live form): the labeling is
  * STATE that evolves across micro-batches, so the proof obligations go
  * beyond the stateless admission specs — the final labeling must be
  * invariant to how the same doc set is chunked and ordered (a pair
  * split across batches is discovered when its later endpoint arrives,
  * via the accumulated stream history), a replayed batch must converge
  * onto the same generation (at-least-once), and stored corpus
  * components may only MERGE downstream, never split (the quotient fold
  * adds edges; it cannot remove any).
  */
class CcStreamSpec extends SparkSpec {

  private def runStream(
      chunks: Seq[Seq[(Long, String)]], bandsPath: String, shinglesPath: String,
      ccPath: String): (Map[Long, Long], java.nio.file.Path) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_ccstream")
    val hist = tmp.resolve("hist").toString
    val labels = tmp.resolve("labels").toString
    val ckpt = tmp.resolve("ckpt").toString
    StreamingAdmission.initCc(spark, ccPath, hist, labels)
    val input = MemoryStream[(Long, String)]
    val q = StreamingAdmission.startCc(spark, bandsPath, shinglesPath,
      input.toDS().toDF("doc_id", "text"), hist, labels, ckpt)
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val fin = spark.read
      .parquet(StreamingAdmission.latestLabels(labels, Long.MaxValue))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    (fin, tmp)
  }

  test("streamed CC maintenance: chunked == single-batch, corpus components only coarsen, replay converges") {
    import spark.implicits._
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = newDocs.grouped(math.max(newDocs.length / 3, 1)).toSeq
      .map(_.toSeq)

    val (single, t1) = runStream(Seq(newDocs.toSeq), bandsPath, shinglesPath, ccPath)
    val (chunked, t2) = runStream(chunks, bandsPath, shinglesPath, ccPath)
    try {
      // Chunking/order invariance: the same doc set through 1 batch and
      // through 3 scrambled batches lands on the identical labeling —
      // cross-batch pairs were recovered through the stream history.
      assert(single == chunked,
        s"chunked labeling diverged from single-batch (${chunked.size} vs ${single.size} rows)")
      // The maintained labeling strictly extends the stored one: shard
      // endpoints joined.
      val stored = spark.read.parquet(ccPath)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(chunked.size > stored.size,
        "no shard doc entered the labeling — fixture must bridge")
      // Coarsen-only: ids the stored labeling co-labeled stay co-labeled.
      stored.groupBy(_._2).values.foreach { members =>
        val finals = members.map { case (id, _) => chunked(id) }.toSet
        assert(finals.size == 1,
          s"a stored corpus component split across ${finals.size} final labels")
      }
      // The fixture genuinely exercises cross-batch discovery: some
      // shard-shard near-dup pair straddles two chunks AND is co-labeled.
      val shardPairs = LlmPipeline.minhashLsh(spark, sfDir)
        .filter("id1 % 4 = 0 AND id2 % 4 = 0")
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      val chunkOf = chunks.zipWithIndex
        .flatMap { case (c, i) => c.map { case (id, _) => id -> i } }.toMap
      val straddling = shardPairs.filter { case (a, b) => chunkOf(a) != chunkOf(b) }
      assert(straddling.nonEmpty,
        "scramble must split at least one shard pair across chunks")
      straddling.foreach { case (a, b) =>
        assert(chunked(a) == chunked(b),
          s"cross-chunk pair ($a,$b) not co-labeled — stream history probe failed")
      }
      // At-least-once: replay the LAST batch over the existing state
      // (same predecessor generation, same directory) — labeling
      // unchanged.
      val labelsDir = t2.resolve("labels").toString
      StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
        t2.resolve("hist").toString, labelsDir,
        chunks.last.toDF("doc_id", "text"), batchId = (chunks.size - 1).toLong)
      val replayed = spark.read
        .parquet(StreamingAdmission.latestLabels(labelsDir, Long.MaxValue))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(replayed == chunked, "batch replay changed the maintained labeling")
      // Retention (q171's VACUUM on the state axis): drop everything
      // below the last batch's predecessor; the latest generation and
      // the last batch's replay window survive.
      val lastId = (chunks.size - 1).toLong
      val dropped = StreamingAdmission.vacuumCcGenerations(labelsDir, lastId - 1)
      assert(dropped == (-1L until (lastId - 1)).toSeq,
        s"unexpected dropped set $dropped")
      val afterVac = spark.read
        .parquet(StreamingAdmission.latestLabels(labelsDir, Long.MaxValue))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(afterVac == chunked, "vacuum touched the retained labeling")
      // Replay of the LAST batch still converges (its predecessor was
      // retained)…
      StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
        t2.resolve("hist").toString, labelsDir,
        chunks.last.toDF("doc_id", "text"), batchId = lastId)
      // …while reads of dropped generations and a replay DEEPER than
      // the retention point both fail closed, naming the earliest
      // retained generation instead of computing from wrong state.
      val e1 = intercept[IllegalStateException] {
        StreamingAdmission.labelsAt(spark, labelsDir, 0L)
      }
      assert(e1.getMessage.contains(s"earliest retained generation is ${lastId - 1}"))
      val e2 = intercept[IllegalArgumentException] {
        StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
          t2.resolve("hist").toString, labelsDir,
          chunks.head.toDF("doc_id", "text"), batchId = lastId - 1)
      }
      assert(e2.getMessage.contains("no labeling generation below"),
        s"too-deep replay must refuse, got: ${e2.getMessage}")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }
}
