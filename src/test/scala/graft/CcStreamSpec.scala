package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.StreamingAdmission

/** Streaming component maintenance (q177's live form): the labeling is
  * STATE that evolves across micro-batches, so the proof obligations go
  * beyond the stateless admission specs — the final labeling must be
  * invariant to how the same doc set is chunked and ordered (a pair
  * split across batches is discovered when its later endpoint arrives,
  * via the stream history index), a replayed batch must converge onto
  * the same generation (at-least-once), and stored corpus components
  * may only MERGE downstream, never split (the quotient fold adds
  * edges; it cannot remove any).
  *
  * r13 adds the delta-state laws (VERDICT r12 items 1–2): each batch
  * persists ONLY the labels it changed — written rows equal the ids
  * whose label moved or appeared, bounded by |batch| + |members of
  * merged components| — and [[StreamingAdmission.compactCc]] (snapshot
  * + truncate on the label chain, q168-fold on the band/shingle
  * history) preserves the resolved labeling exactly while deleting the
  * folded generations, with reads/replays below the compaction point
  * failing closed.
  */
class CcStreamSpec extends SparkSpec {

  private def runStream(
      chunks: Seq[Seq[(Long, String)]], bandsPath: String, shinglesPath: String,
      ccPath: String, compactEvery: Int = 0): (Map[Long, Long], java.nio.file.Path) = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_ccstream")
    val hist = tmp.resolve("hist").toString
    val labels = tmp.resolve("labels").toString
    val ckpt = tmp.resolve("ckpt").toString
    StreamingAdmission.initCc(spark, ccPath, hist, labels)
    val input = MemoryStream[(Long, String)]
    val q = StreamingAdmission.startCc(spark, bandsPath, shinglesPath,
      input.toDS().toDF("doc_id", "text"), hist, labels, ckpt, compactEvery)
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    (readLabels(labels), tmp)
  }

  private def readLabels(labelsDir: String): Map[Long, Long] =
    StreamingAdmission.currentLabels(spark, labelsDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap

  test("streamed CC maintenance: chunked == single-batch, delta-sized state writes, corpus components only coarsen, replay converges") {
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
      // Delta-state law (r13): each batch wrote EXACTLY the rows whose
      // label changed or appeared vs its predecessor generation —
      // bounded by |batch| + |corpus ids swept into a merged component|,
      // never a full-labeling rewrite.
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
        val changedOld = changed.keySet.count(prev.contains)
        assert(written.size <= chunks(b).size + changedOld,
          s"batch $b wrote ${written.size} rows > |batch| + |touched corpus ids|")
        assert(written.size < cur.size,
          s"batch $b rewrote the full labeling (${written.size} of ${cur.size} rows)")
      }
      // Overlay law: the delta fold reproduces the full quotient merge.
      // (mergeComponentDeltas is what the stream persists; the q177
      // batch form is the ground truth.)
      val prevAll = spark.read.parquet(ccPath).select("id", "label")
      val allPairs = StreamingAdmission.ccBatchPairs(spark, bandsPath, shinglesPath,
        t1.resolve("hist").toString, newDocs.toSeq.toDF("doc_id", "text"), 0L)
      val full = LlmPipeline.mergeComponentLabels(prevAll, allPairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val delta = LlmPipeline.mergeComponentDeltas(prevAll, allPairs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val prevMap = prevAll.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(prevMap ++ delta == full,
        "stored-overlaid-with-deltas != full quotient merge")
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
      // (same predecessor chain, same delta directory) — labeling
      // unchanged.
      StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
        t2.resolve("hist").toString, labelsDir,
        chunks.last.toDF("doc_id", "text"), batchId = (chunks.size - 1).toLong)
      assert(readLabels(labelsDir) == chunked,
        "batch replay changed the maintained labeling")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("compactCc: snapshot+truncate preserves the labeling, folds the history index, fails closed below the snapshot") {
    import spark.implicits._
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = newDocs.grouped(math.max(newDocs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")

    // Ground truth: the whole doc set in one batch.
    val (single, t1) = runStream(Seq(newDocs.toSeq), bandsPath, shinglesPath, ccPath)
    // Stream the first chunks, stop, compact MID-STREAM, then admit the
    // last chunk directly — cross-compaction pairs must be discovered
    // through the FOLDED history artifact, and the final labeling must
    // equal the single-batch run's.
    val (_, t2) = runStream(chunks.init, bandsPath, shinglesPath, ccPath)
    try {
      val hist = t2.resolve("hist").toString
      val labelsDir = t2.resolve("labels").toString
      val atBatch = (chunks.size - 2).toLong // last committed batch
      val beforeCompact = readLabels(labelsDir)
      // Crashed-compaction simulation (ADVICE r13): a PARTIAL snapshot
      // — truncated rows under the final directory name, no _SUCCESS
      // job-commit marker — must be invisible to reads (resolveLabels
      // would otherwise compute from truncated state) and must be
      // discarded and redone by compactCc (which would otherwise
      // "detect" it as done and truncate the still-needed deltas).
      val partialSnap = Paths.get(labelsDir, "snap", s"batch_id=$atBatch")
      spark.read.parquet(s"$labelsDir/snap/batch_id=-1").limit(3)
        .write.mode("overwrite").parquet(partialSnap.toString)
      Files.deleteIfExists(partialSnap.resolve("_SUCCESS"))
      assert(readLabels(labelsDir) == beforeCompact,
        "a markerless partial snapshot leaked into resolveLabels")
      StreamingAdmission.compactCc(spark, hist, labelsDir, atBatch)
      assert(Files.exists(partialSnap.resolve("_SUCCESS")),
        "compaction did not redo the crashed partial snapshot")
      // (b) compacted-chain == full-chain labeling equality.
      assert(readLabels(labelsDir) == beforeCompact,
        "compaction changed the resolved labeling")
      // Folded generations are GONE (the retention the r12 history
      // lacked): no per-batch label deltas, band or shingle generations
      // at or below the compaction point survive.
      (-1L to atBatch).foreach { b =>
        assert(!Files.exists(Paths.get(labelsDir, "delta", s"batch_id=$b")),
          s"label delta $b survived compaction")
        assert(!Files.exists(Paths.get(hist, "bands", s"batch_id=$b")),
          s"band generation $b survived compaction")
        assert(!Files.exists(Paths.get(hist, "shingles", s"batch_id=$b")),
          s"shingle generation $b survived compaction")
      }
      assert(!Files.exists(Paths.get(labelsDir, "snap", "batch_id=-1")),
        "superseded seed snapshot survived compaction")
      assert(Files.exists(Paths.get(hist, "bands_base", s"gen=$atBatch")) &&
        Files.exists(Paths.get(hist, "shingles_base", s"gen=$atBatch")),
        "compaction did not write the folded history base")
      // Idempotent re-run (crash-recovery path): no-op.
      StreamingAdmission.compactCc(spark, hist, labelsDir, atBatch)
      assert(readLabels(labelsDir) == beforeCompact,
        "re-running compaction changed the labeling")
      // Crashed HISTORY fold simulation: a markerless bands_base at a
      // HIGHER generation (its shingles twin never landed) must not be
      // selected by streamHistory — trusting it would exclude every
      // delta below it while supplying garbage bands, so the held-out
      // chunk's cross-chunk pairs would be lost. The admission below
      // detects exactly that: it must still land on the single-batch
      // labeling, through the COMMITTED base at atBatch + the tail.
      val partialBase = Paths.get(hist, "bands_base", s"gen=${chunks.size + 3}")
      spark.read.parquet(s"$hist/bands_base/gen=$atBatch").limit(1)
        .write.mode("overwrite").parquet(partialBase.toString)
      Files.deleteIfExists(partialBase.resolve("_SUCCESS"))
      // Admit the held-out chunk AFTER compaction: its cross-chunk
      // pairs resolve through the folded base, landing on the
      // single-batch labeling exactly.
      StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
        hist, labelsDir, chunks.last.toDF("doc_id", "text"),
        batchId = (chunks.size - 1).toLong)
      assert(readLabels(labelsDir) == single,
        "post-compaction admission diverged from the single-batch labeling")
      // Fail-closed below the snapshot: time-travel reads name the
      // earliest retained generation; a too-deep replay refuses before
      // touching state.
      val e1 = intercept[IllegalStateException] {
        StreamingAdmission.labelsAt(spark, labelsDir, atBatch - 1)
      }
      assert(e1.getMessage.contains(s"earliest retained generation is $atBatch"))
      val e2 = intercept[IllegalStateException] {
        StreamingAdmission.commitCcBatch(spark, bandsPath, shinglesPath,
          hist, labelsDir, chunks.head.toDF("doc_id", "text"), batchId = atBatch)
      }
      assert(e2.getMessage.contains("no labeling snapshot"),
        s"too-deep replay must refuse, got: ${e2.getMessage}")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("compactCc crash mid-cleanup: a committed fold with leftover inputs is kept, never refolded (ADVICE r14)") {
    import spark.implicits._
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = newDocs.grouped(math.max(newDocs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val (_, t2) = runStream(chunks.init, bandsPath, shinglesPath, ccPath)
    try {
      val hist = t2.resolve("hist").toString
      val labelsDir = t2.resolve("labels").toString
      val atBatch = (chunks.size - 2).toLong
      val before = readLabels(labelsDir)
      // Snapshot batch 0's fold inputs aside, compact, then RESTORE
      // them — the exact on-disk state of a compaction whose base
      // (both twins) COMMITTED but whose input cleanup was interrupted:
      // inputs delete strictly after the markers land, so a committed
      // base at atBatch can coexist with a subset of its inputs.
      val asideB = t2.resolve("aside_bands"); val asideS = t2.resolve("aside_sh")
      val asideD = t2.resolve("aside_delta")
      copyDir(Paths.get(hist, "bands", "batch_id=0"), asideB)
      copyDir(Paths.get(hist, "shingles", "batch_id=0"), asideS)
      copyDir(Paths.get(labelsDir, "delta", "batch_id=0"), asideD)
      StreamingAdmission.compactCc(spark, hist, labelsDir, atBatch)
      val baseRows = spark.read.parquet(s"$hist/bands_base/gen=$atBatch")
        .collect().map(_.toString).toSet
      copyDir(asideB, Paths.get(hist, "bands", "batch_id=0"))
      copyDir(asideS, Paths.get(hist, "shingles", "batch_id=0"))
      copyDir(asideD, Paths.get(labelsDir, "delta", "batch_id=0"))
      // Leftovers are invisible to reads (≤ the committed snapshot/base).
      assert(readLabels(labelsDir) == before,
        "a leftover folded label delta leaked into resolveLabels")
      // The compaction replay must KEEP the committed fold (refolding
      // from the now-partial input set — batch 1's deltas are already
      // gone — would silently truncate the history base) and only
      // finish the cleanup.
      StreamingAdmission.compactCc(spark, hist, labelsDir, atBatch)
      assert(Files.exists(Paths.get(hist, "bands_base", s"gen=$atBatch", "_SUCCESS")) &&
        Files.exists(Paths.get(hist, "shingles_base", s"gen=$atBatch", "_SUCCESS")),
        "compaction replay lost the committed history base")
      val baseRowsAfter = spark.read.parquet(s"$hist/bands_base/gen=$atBatch")
        .collect().map(_.toString).toSet
      assert(baseRowsAfter == baseRows,
        s"compaction replay refolded the committed base from partial inputs " +
          s"(${baseRowsAfter.size} vs ${baseRows.size} rows)")
      assert(!Files.exists(Paths.get(hist, "bands", "batch_id=0")) &&
        !Files.exists(Paths.get(hist, "shingles", "batch_id=0")) &&
        !Files.exists(Paths.get(labelsDir, "delta", "batch_id=0")),
        "compaction replay did not finish the leftover-input cleanup")
      assert(readLabels(labelsDir) == before,
        "compaction replay changed the resolved labeling")
    } finally {
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("compaction cadence: compactEvery=1 compacts every committed predecessor mid-stream; labeling == single-batch") {
    import spark.implicits._
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = newDocs.grouped(math.max(newDocs.length / 3, 1)).toSeq
      .map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val (single, t1) = runStream(Seq(newDocs.toSeq), bandsPath, shinglesPath, ccPath)
    // The most aggressive cadence: every batch b > 0 compacts b-1
    // before committing — b-1 is checkpoint-committed by construction
    // (streaming hands us b only after b-1's commit), so the
    // snapshot-at-committed-offset precondition holds automatically.
    // Cross-compaction pairs must flow through the folded bases and
    // still land on the single-batch labeling.
    val (auto, t2) = runStream(chunks, bandsPath, shinglesPath, ccPath,
      compactEvery = 1)
    try {
      assert(auto == single,
        "cadence-compacted labeling diverged from the single-batch run")
      val labelsDir = t2.resolve("labels").toString
      val hist = t2.resolve("hist").toString
      val at = (chunks.size - 2).toLong // the last cadence fire point
      // The fold artifacts exist and are committed; everything at or
      // below the fire point is truncated; the final batch's delta
      // survives as the live tail.
      assert(Files.exists(Paths.get(labelsDir, "snap", s"batch_id=$at", "_SUCCESS")),
        "cadence did not commit the mid-stream snapshot")
      assert(Files.exists(Paths.get(hist, "bands_base", s"gen=$at", "_SUCCESS")) &&
        Files.exists(Paths.get(hist, "shingles_base", s"gen=$at", "_SUCCESS")),
        "cadence did not fold the history base")
      (-1L to at).foreach { b =>
        assert(!Files.exists(Paths.get(labelsDir, "delta", s"batch_id=$b")),
          s"label delta $b survived the cadence compaction")
        assert(!Files.exists(Paths.get(hist, "bands", s"batch_id=$b")),
          s"band generation $b survived the cadence compaction")
      }
      assert(Files.exists(
        Paths.get(labelsDir, "delta", s"batch_id=${chunks.size - 1}")),
        "the live tail delta is missing")
      // Fail-closed below the cadence's snapshot.
      val e = intercept[IllegalStateException] {
        StreamingAdmission.labelsAt(spark, labelsDir, at - 1)
      }
      assert(e.getMessage.contains("no labeling snapshot"))
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("takedown on the streamed chain: coarsen-only revoked on the delete axis — re-label snapshot == rebuild over surviving edges") {
    import spark.implicits._
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect()
    val (_, t) = runStream(Seq(newDocs.toSeq), bandsPath, shinglesPath, ccPath)
    try {
      val labelsDir = t.resolve("labels").toString
      // The population the chain labels is the FULL corpus (standing
      // snapshot + ingested shard), so its pair graph is the full
      // memoized leaf; the notice is the q165 closure UNRESTRICTED
      // (streamed takedowns may name shard docs too).
      val fullPairs = LlmPipeline.lshPairGraph(spark, sfDir)
        .select("id1", "id2").localCheckpoint()
      val removed = LlmPipeline.takedownSpread(spark, sfDir)
        .select("doc_id").localCheckpoint()
      val labeledBefore = readLabels(labelsDir)
      val hit = removed.as[Long].collect().count(labeledBefore.contains)
      assert(hit > 0, "notice touches no labeled doc -- law vacuous")
      StreamingAdmission.ccTakedownSnapshot(
        spark, labelsDir, fullPairs, removed, atGen = 0L)
      // The delete axis could NOT ride the coarsen-only delta fold --
      // it committed a re-labeled SNAPSHOT the chain continues from:
      // deltas <= 0 truncated, resolve at 0 serves the new base.
      assert(!Files.exists(Paths.get(labelsDir, "delta", "batch_id=0")),
        "takedown snapshot did not subsume the delta tail")
      assert(Files.exists(Paths.get(labelsDir, "snap", "batch_id=0", "_SUCCESS")),
        "takedown snapshot not committed")
      val got = readLabels(labelsDir)
      // Rebuild: CC over the surviving full-graph edges.
      val survPairs = fullPairs
        .join(removed.select(col("doc_id").as("id1")), Seq("id1"), "left_anti")
        .join(removed.select(col("doc_id").as("id2")), Seq("id2"), "left_anti")
        .select("id1", "id2")
      val expected = LlmPipeline.minLabelComponents(
          survPairs.union(survPairs.select(col("id2").as("id1"), col("id1").as("id2"))))
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        s"streamed takedown labeling (${got.size} rows) != survivor rebuild (${expected.size})")
      val removedSet = removed.as[Long].collect().toSet
      assert(got.keySet.intersect(removedSet).isEmpty,
        "streamed chain still labels removed docs after the takedown")
      // Replay convergence (at-least-once notices): re-running the
      // SAME takedown at the SAME generation resolves from the
      // committed takedown snapshot itself, re-folds (a no-op — the
      // removal set no longer labels anything), and rewrites identical
      // state. This is exactly the path that would have scanned
      // deleted files without the eager materialization.
      StreamingAdmission.ccTakedownSnapshot(
        spark, labelsDir, fullPairs, removed, atGen = 0L)
      assert(readLabels(labelsDir) == expected,
        "takedown replay diverged from the first application")
    } finally LlmPipeline.deleteRecursively(t)
  }
}
