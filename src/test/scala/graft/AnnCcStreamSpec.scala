package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.StreamingAdmission

/** Embedding-side streaming component maintenance (r14 — VERDICT r13
  * item 3): the text stream's evolving-labeling machinery composed with
  * the multi-probe ANN pair discovery. The proof obligations mirror
  * CcStreamSpec's, plus one the text side cannot offer: an EXTERNAL
  * ground truth. The stream's discoverable pair set (corpus×new through
  * the stored index, new×new through the stream history and
  * batch-internal pass) is exactly the symmetric radius-1 multi-probe
  * verified pairs with ≥ 1 shard endpoint — the batch
  * `multiProbeVerifiedPairs` surface — so the drained labeling must
  * equal the one-shot quotient merge of the stored corpus labeling with
  * those batch-path pairs, computed by code the stream never touches.
  */
class AnnCcStreamSpec extends SparkSpec {

  private def runStream(
      chunks: Seq[Seq[(Long, Seq[Float])]], keysPath: String, vecsPath: String,
      ccPath: String, compactEvery: Int = 0): (Map[Long, Long], java.nio.file.Path) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_annccstream")
    val hist = tmp.resolve("hist").toString
    val labels = tmp.resolve("labels").toString
    val ckpt = tmp.resolve("ckpt").toString
    StreamingAdmission.initAnnCc(spark, ccPath, hist, labels)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = StreamingAdmission.startAnnCc(spark, keysPath, vecsPath,
      input.toDS().toDF("vec_id", "embedding"), hist, labels, ckpt, compactEvery)
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    (readLabels(labels), tmp)
  }

  private def readLabels(labelsDir: String): Map[Long, Long] =
    StreamingAdmission.currentLabels(spark, labelsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("streamed ANN CC: chunked == single-batch == batch-path quotient merge; deltas delta-sized; replay converges") {
    import spark.implicits._
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureAnnCcArtifact(spark, sfDir)
    val newVecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter("vec_id % 4 = 0").select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .sortBy { case (id, _) => (id % 7, id) }
    val chunks = newVecs.grouped(math.max(newVecs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")

    val (single, t1) = runStream(Seq(newVecs.toSeq), keysPath, vecsPath, ccPath)
    val (chunked, t2) = runStream(chunks, keysPath, vecsPath, ccPath)
    try {
      // Chunking/order invariance.
      assert(single == chunked,
        s"chunked ANN labeling diverged from single-batch (${chunked.size} vs ${single.size} rows)")
      // EXTERNAL ground truth: the drained labeling equals the one-shot
      // quotient merge of the stored corpus labeling with the BATCH
      // pair surface (symmetric radius-1 multi-probe verified pairs
      // with >= 1 shard endpoint) — discovered by multiProbeVerifiedPairs,
      // code the stream never calls.
      val stored = spark.read.parquet(ccPath).select("id", "label")
      val deltaPairs = LlmPipeline.multiProbeVerifiedPairs(spark, sfDir)
        .filter("id1 % 4 = 0 OR id2 % 4 = 0").select("id1", "id2")
      assert(deltaPairs.count() > 0, "fixture must produce shard-touching ANN pairs")
      val expected = LlmPipeline.mergeComponentLabels(stored, deltaPairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(chunked == expected,
        "streamed labeling != batch-path quotient merge (external ground truth)")
      // Coarsen-only: stored corpus components never split downstream.
      val storedMap = stored.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      storedMap.groupBy(_._2).values.foreach { members =>
        val finals = members.map { case (id, _) => chunked(id) }.toSet
        assert(finals.size == 1,
          s"a stored ANN component split across ${finals.size} final labels")
      }
      // Delta-state law: each batch wrote exactly the changed/new rows.
      val labelsDir = t2.resolve("labels").toString
      chunks.indices.foreach { b =>
        val prev = StreamingAdmission.resolveLabels(spark, labelsDir, b - 1L)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val cur = StreamingAdmission.resolveLabels(spark, labelsDir, b.toLong)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val written = spark.read.parquet(s"$labelsDir/delta/batch_id=$b")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        val changed = cur.filter { case (id, l) => prev.get(id) != Some(l) }
        assert(written == changed,
          s"batch $b delta (${written.size} rows) != changed labels (${changed.size})")
        assert(written.size < cur.size,
          s"batch $b rewrote the full labeling (${written.size} of ${cur.size} rows)")
      }
      // Cross-batch discovery is genuinely exercised: some shard-shard
      // verified pair straddles two chunks and is co-labeled.
      val shardPairs = LlmPipeline.multiProbeVerifiedPairs(spark, sfDir)
        .filter("id1 % 4 = 0 AND id2 % 4 = 0")
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
      val chunkOf = chunks.zipWithIndex
        .flatMap { case (c, i) => c.map { case (id, _) => id -> i } }.toMap
      val straddling = shardPairs.filter { case (a, b) => chunkOf(a) != chunkOf(b) }
      assert(straddling.nonEmpty,
        "scramble must split at least one shard ANN pair across chunks")
      straddling.foreach { case (a, b) =>
        assert(chunked(a) == chunked(b),
          s"cross-chunk ANN pair ($a,$b) not co-labeled — stream history probe failed")
      }
      // At-least-once: replay the last batch — labeling unchanged.
      StreamingAdmission.commitAnnCcBatch(spark, keysPath, vecsPath,
        t2.resolve("hist").toString, labelsDir,
        chunks.last.toDF("vec_id", "embedding"),
        batchId = (chunks.size - 1).toLong)
      assert(readLabels(labelsDir) == chunked,
        "ANN batch replay changed the maintained labeling")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("compactAnnCc crash mid-cleanup: a committed fold with leftover inputs is kept, never refolded (ADVICE r14)") {
    import spark.implicits._
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureAnnCcArtifact(spark, sfDir)
    val newVecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter("vec_id % 4 = 0").select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .sortBy { case (id, _) => (id % 7, id) }
    val chunks = newVecs.grouped(math.max(newVecs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val (_, t2) = runStream(chunks.init, keysPath, vecsPath, ccPath)
    try {
      val hist = t2.resolve("hist").toString
      val labelsDir = t2.resolve("labels").toString
      val atBatch = (chunks.size - 2).toLong
      val before = readLabels(labelsDir)
      // The [[CcStreamSpec]] crash-mid-cleanup scenario on the ANN
      // axis: base twins committed, input cleanup interrupted — the
      // replay must keep the committed fold, not rebuild it from the
      // partially-deleted input set.
      val asideK = t2.resolve("aside_keys"); val asideV = t2.resolve("aside_vecs")
      copyDir(Paths.get(hist, "keys", "batch_id=0"), asideK)
      copyDir(Paths.get(hist, "vecs", "batch_id=0"), asideV)
      StreamingAdmission.compactAnnCc(spark, hist, labelsDir, atBatch)
      val baseRows = spark.read.parquet(s"$hist/keys_base/gen=$atBatch")
        .collect().map(_.toString).toSet
      copyDir(asideK, Paths.get(hist, "keys", "batch_id=0"))
      copyDir(asideV, Paths.get(hist, "vecs", "batch_id=0"))
      StreamingAdmission.compactAnnCc(spark, hist, labelsDir, atBatch)
      assert(Files.exists(Paths.get(hist, "keys_base", s"gen=$atBatch", "_SUCCESS")) &&
        Files.exists(Paths.get(hist, "vecs_base", s"gen=$atBatch", "_SUCCESS")),
        "ANN compaction replay lost the committed history base")
      val baseRowsAfter = spark.read.parquet(s"$hist/keys_base/gen=$atBatch")
        .collect().map(_.toString).toSet
      assert(baseRowsAfter == baseRows,
        s"ANN compaction replay refolded the committed base from partial inputs " +
          s"(${baseRowsAfter.size} vs ${baseRows.size} rows)")
      assert(!Files.exists(Paths.get(hist, "keys", "batch_id=0")) &&
        !Files.exists(Paths.get(hist, "vecs", "batch_id=0")),
        "ANN compaction replay did not finish the leftover-input cleanup")
      assert(readLabels(labelsDir) == before,
        "ANN compaction replay changed the resolved labeling")
    } finally {
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("ANN CC compaction cadence: compactEvery=1 folds mid-stream; labeling == single-batch; fails closed below") {
    import spark.implicits._
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureAnnCcArtifact(spark, sfDir)
    val newVecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter("vec_id % 4 = 0").select("vec_id", "embedding")
      .as[(Long, Seq[Float])].collect()
      .sortBy { case (id, _) => (id % 7, id) }
    val chunks = newVecs.grouped(math.max(newVecs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val (single, t1) = runStream(Seq(newVecs.toSeq), keysPath, vecsPath, ccPath)
    val (auto, t2) = runStream(chunks, keysPath, vecsPath, ccPath,
      compactEvery = 1)
    try {
      assert(auto == single,
        "cadence-compacted ANN labeling diverged from the single-batch run")
      val labelsDir = t2.resolve("labels").toString
      val hist = t2.resolve("hist").toString
      val at = (chunks.size - 2).toLong
      assert(Files.exists(Paths.get(labelsDir, "snap", s"batch_id=$at", "_SUCCESS")),
        "cadence did not commit the mid-stream snapshot")
      assert(Files.exists(Paths.get(hist, "keys_base", s"gen=$at", "_SUCCESS")) &&
        Files.exists(Paths.get(hist, "vecs_base", s"gen=$at", "_SUCCESS")),
        "cadence did not fold the key/vec history base")
      (-1L to at).foreach { b =>
        assert(!Files.exists(Paths.get(labelsDir, "delta", s"batch_id=$b")),
          s"label delta $b survived the cadence compaction")
        assert(!Files.exists(Paths.get(hist, "keys", s"batch_id=$b")),
          s"key generation $b survived the cadence compaction")
      }
      // Fail-closed below the cadence's snapshot: reads AND deep
      // replays refuse before touching state.
      val e1 = intercept[IllegalStateException] {
        StreamingAdmission.labelsAt(spark, labelsDir, at - 1)
      }
      assert(e1.getMessage.contains("no labeling snapshot"))
      val e2 = intercept[IllegalStateException] {
        StreamingAdmission.commitAnnCcBatch(spark, keysPath, vecsPath,
          hist, labelsDir, chunks.head.toDF("vec_id", "embedding"),
          batchId = at)
      }
      assert(e2.getMessage.contains("no labeling snapshot"),
        s"too-deep ANN replay must refuse, got: ${e2.getMessage}")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }
}
