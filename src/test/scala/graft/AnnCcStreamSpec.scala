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

  /** Streamed ANN-CC takedown (r18 — VERDICT r17 item 5): the text
    * chain's ccTakedownSnapshot laws on the embedding axis, plus the
    * obligation the ANN axis adds — the stream's own key/vector
    * history must stop serving removed vectors, or the next batch's
    * history probe re-links them. Laws: (1) mid-stream takedown
    * re-labels to the survivor rebuild and purges every committed
    * key/vec generation (deltas AND compacted bases); (2) the delta
    * chain CONTINUES — a post-takedown batch folds in and the final
    * labeling equals the full survivor rebuild over every discovered
    * pair, with no removed id ever reappearing; (3) both halves replay
    * idempotently (at-least-once notices and batches); (4) a crash
    * between the purge's delete and its atomic swap is recovered on
    * the next call.
    */
  test("streamed ANN takedown: re-label + history purge; delta chain continues on survivors; replay + crash-swap converge") {
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
    // Stream the first two chunks with cadence compaction so the purge
    // sees BOTH state shapes: a live delta (batch 1) and a folded base
    // (gen 0).
    val (_, t) = runStream(chunks.init, keysPath, vecsPath, ccPath,
      compactEvery = 1)
    try {
      val hist = t.resolve("hist").toString
      val labelsDir = t.resolve("labels").toString
      // Batches 0..nb-1 streamed; cadence compacted last at nb-2, so the
      // state is one folded base (gen = nb-2) + one live delta (nb-1).
      val nb = chunks.init.size
      val lastB = (nb - 1).toLong
      val labeledBefore = readLabels(labelsDir)
      val streamed12 = chunks.init.flatten.map(_._1).toSet
      val labeledStreamed = labeledBefore.keySet.intersect(streamed12).toSeq.sorted
      assert(labeledStreamed.nonEmpty,
        "no streamed vec is labeled after two chunks — law vacuous")
      // Remove up to four labeled streamed vectors, preferring a
      // min-id LABEL itself (the case no label rewrite can patch).
      val minLabelHit = labeledStreamed.filter(id => labeledBefore(id) == id)
      val removedIds = (minLabelHit.take(1) ++ labeledStreamed.take(3)).distinct
      info(s"notice: ${removedIds.size} vecs, ${minLabelHit.take(1).size} of them min-id labels")
      val removed = removedIds.toDF("doc_id").localCheckpoint()
      val removedSet = removedIds.toSet
      // The pair graph over the population the chain labels SO FAR
      // (corpus + chunks 1–2) — chunk 3's ids must not leak into the
      // re-label.
      def inPop12(c: org.apache.spark.sql.Column) =
        (c % 4 =!= 0) || c.isin(streamed12.toSeq: _*)
      val pairs12 = LlmPipeline.multiProbeVerifiedPairs(spark, sfDir)
        .filter(inPop12(col("id1")) && inPop12(col("id2")))
        .select("id1", "id2").localCheckpoint()
      StreamingAdmission.annCcTakedownSnapshot(
        spark, hist, labelsDir, pairs12, removed, atGen = lastB)
      // -- law 1: snapshot committed, deltas subsumed, purge complete --
      assert(Files.exists(Paths.get(labelsDir, "snap", s"batch_id=$lastB", "_SUCCESS")),
        "takedown snapshot not committed")
      assert(!Files.exists(Paths.get(labelsDir, "delta", s"batch_id=$lastB")),
        "takedown snapshot did not subsume the delta tail")
      val stateDirs = Seq(
        Paths.get(hist, "keys", s"batch_id=$lastB"),
        Paths.get(hist, "vecs", s"batch_id=$lastB"),
        Paths.get(hist, "keys_base", s"gen=${nb - 2}"),
        Paths.get(hist, "vecs_base", s"gen=${nb - 2}"))
      stateDirs.foreach { d =>
        assert(Files.exists(d.resolve("_SUCCESS")), s"purged generation $d lost its commit marker")
        val served = spark.read.parquet(d.toString)
          .filter(col("vec_id").isin(removedSet.toSeq: _*)).count()
        assert(served == 0, s"$d still serves $served removed vec rows after the purge")
      }
      val mid = readLabels(labelsDir)
      assert(mid.keySet.intersect(removedSet).isEmpty,
        "chain still labels removed vecs after the takedown")
      val surv12 = pairs12
        .filter(!col("id1").isin(removedSet.toSeq: _*) &&
          !col("id2").isin(removedSet.toSeq: _*))
      val expectedMid = LlmPipeline.minLabelComponents(
          surv12.union(surv12.select(col("id2").as("id1"), col("id1").as("id2"))))
        .as[(Long, Long)].collect().toMap
      assert(mid == expectedMid,
        s"takedown labeling (${mid.size} rows) != survivor rebuild (${expectedMid.size})")
      // -- law 2: the delta chain continues; final == survivor rebuild --
      StreamingAdmission.commitAnnCcBatch(spark, keysPath, vecsPath,
        hist, labelsDir, chunks.last.toDF("vec_id", "embedding"), batchId = nb.toLong)
      val fin = readLabels(labelsDir)
      assert(fin.keySet.intersect(removedSet).isEmpty,
        "a post-takedown batch re-introduced a removed vec into the labeling")
      val survAll = LlmPipeline.multiProbeVerifiedPairs(spark, sfDir)
        .filter(!col("id1").isin(removedSet.toSeq: _*) &&
          !col("id2").isin(removedSet.toSeq: _*))
        .select("id1", "id2").localCheckpoint()
      val expectedFin = LlmPipeline.minLabelComponents(
          survAll.union(survAll.select(col("id2").as("id1"), col("id1").as("id2"))))
        .as[(Long, Long)].collect().toMap
      assert(fin == expectedFin,
        s"continued chain (${fin.size} rows) != full survivor rebuild (${expectedFin.size})")
      // -- law 3: replay idempotence on both halves ----------------------
      StreamingAdmission.annCcTakedownSnapshot(
        spark, hist, labelsDir, pairs12, removed, atGen = lastB)
      StreamingAdmission.commitAnnCcBatch(spark, keysPath, vecsPath,
        hist, labelsDir, chunks.last.toDF("vec_id", "embedding"), batchId = nb.toLong)
      assert(readLabels(labelsDir) == expectedFin,
        "takedown/batch replay diverged from the first application")
      // -- law 4: crash between the purge's delete and its swap ---------
      val gen = Paths.get(hist, "keys", s"batch_id=$lastB")
      val before = spark.read.parquet(gen.toString).collect().map(_.toString).toSet
      val staging = gen.resolveSibling(s".staging-${gen.getFileName}")
      Files.move(gen, staging) // the crash state: staging complete, target gone
      StreamingAdmission.purgeAnnStreamState(spark, hist, removed)
      assert(Files.exists(gen.resolve("_SUCCESS")) && !Files.exists(staging),
        "crash-swap recovery did not republish the purged generation")
      assert(spark.read.parquet(gen.toString).collect().map(_.toString).toSet == before,
        "crash-swap recovery changed the purged generation's rows")
      // The OTHER crash window: a PARTIAL staging (no _SUCCESS — died
      // mid-write) beside the still-committed target. The replay must
      // discard the partial and rewrite from the committed copy — a
      // Files.exists-style "staging present ⇒ swap" would publish a
      // half-written file set over a good generation (the ADVICE r13
      // labeling hazard, on the purge axis).
      Files.createDirectories(staging)
      Files.writeString(staging.resolve("part-00000.parquet"), "torn")
      StreamingAdmission.purgeAnnStreamState(spark, hist, removed)
      assert(Files.exists(gen.resolve("_SUCCESS")) && !Files.exists(staging),
        "partial-staging recovery left the torn staging behind")
      assert(spark.read.parquet(gen.toString).collect().map(_.toString).toSet == before,
        "partial-staging recovery corrupted the committed generation")
    } finally {
      LlmPipeline.deleteRecursively(t)
    }
  }
}
