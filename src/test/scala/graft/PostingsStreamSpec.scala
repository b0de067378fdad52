package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.PostingsMaintenance

/** Streaming postings maintenance (r15 — VERDICT r14 item 4): the
  * q188/q189 fold laws on the stream's time axis. Obligations:
  *
  *   - chunked == single-batch == the nightly one-shot build, as exact
  *     ROW EQUALITY on all three axes (row union over disjoint doc
  *     sets commutes — the merged postings must be byte-equal to
  *     `postingsFor` of the whole corpus, not merely rank-equal);
  *   - replay idempotency (at-least-once: re-committing a generation
  *     changes no merged read);
  *   - compaction preserves every merged read, deletes the folded
  *     inputs, survives idempotent re-runs and the crash-mid-cleanup
  *     state (committed base + leftover inputs — ADVICE r14);
  *   - READ-SIDE CLOSURE: a q181 BM25 retrieval against the streamed
  *     artifacts equals the retrieval against the stored batch-built
  *     artifacts — maintaining the index preserves every ranking
  *     computed from it, live as well as nightly.
  */
class PostingsStreamSpec extends SparkSpec {

  private def runStream(
      chunks: Seq[Seq[(Long, String)]], compactEvery: Int = 0): java.nio.file.Path = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_poststream")
    val dir = tmp.resolve("index").toString
    val ckpt = tmp.resolve("ckpt").toString
    val input = MemoryStream[(Long, String)]
    val q = PostingsMaintenance.start(spark,
      input.toDS().toDF("doc_id", "text"), dir, ckpt, compactEvery)
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    tmp
  }

  private def rowsEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def standingDocs = graft.sources.Tables.documents(spark, sfDir)
    .filter(col("doc_id") % 4 =!= 0).select("doc_id", "text")

  test("streamed postings: chunked == single-batch == one-shot build; replay idempotent; BM25 closure holds") {
    import spark.implicits._
    val docs = standingDocs.as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = docs.grouped(math.max(docs.length / 3, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val t1 = runStream(Seq(docs.toSeq))
    val t2 = runStream(chunks)
    try {
      val dir1 = t1.resolve("index").toString
      val dir2 = t2.resolve("index").toString
      val (p1, d1, s1, x1) = PostingsMaintenance.mergedIndex(spark, dir1)
      val (p2, d2, s2, x2) = PostingsMaintenance.mergedIndex(spark, dir2)
      // The one-shot nightly build of the same corpus — the external
      // ground truth the stream must reproduce byte-for-byte.
      val (pB, dB, sB) = LlmPipeline.postingsFor(standingDocs)
      assert(rowsEqual(p2, p1) && rowsEqual(p2, pB),
        "streamed postings != one-shot build (row union must commute)")
      val xB = LlmPipeline.positionalPostingsFor(standingDocs)
      assert(rowsEqual(x2, x1) && rowsEqual(x2, xB),
        "streamed positional postings != one-shot build")
      assert(rowsEqual(d2, d1) && rowsEqual(d2, dB),
        "streamed docstats != one-shot build")
      val sRow = s2.head(); val sTruth = sB.head()
      assert(sRow.getLong(0) == sTruth.getLong(0) &&
        sRow.getLong(1) == sTruth.getLong(1) &&
        sRow.getLong(2) == sTruth.getLong(2),
        s"streamed corpus stats $sRow != one-shot $sTruth (addition fold broken)")
      // Replay idempotency: re-commit the last generation.
      PostingsMaintenance.commitPostingsBatch(spark,
        chunks.last.toDF("doc_id", "text"), dir2, (chunks.size - 1).toLong)
      val (pR, dR, sR, _) = PostingsMaintenance.mergedIndex(spark, dir2)
      assert(rowsEqual(pR, pB) && rowsEqual(dR, dB) &&
        sR.head().getLong(2) == sTruth.getLong(2),
        "replaying a batch changed a merged read")
      // READ-SIDE CLOSURE (the LlmPipelineSpec law extended to the
      // live plane): BM25 against the streamed artifacts == BM25
      // against the stored batch-built artifacts. Both sides select
      // terms from their own (token, df) relation, so this also pins
      // streamed df == stored df.
      val live = PostingsMaintenance.bm25AgainstStream(spark, dir2)
        .collect().map(_.toString).toSeq
      val stored = LlmPipeline.bm25Retrieval(spark, sfDir)
        .collect().map(_.toString).toSeq
      assert(live == stored,
        "BM25 over streamed artifacts diverged from the stored-artifact ranking")
    } finally {
      LlmPipeline.deleteRecursively(t1)
      LlmPipeline.deleteRecursively(t2)
    }
  }

  test("postings compaction: fold preserves reads, cadence folds mid-stream, crash-mid-cleanup keeps the committed base") {
    import spark.implicits._
    val docs = standingDocs.as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = docs.grouped(math.max(docs.length / 4, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 4, "fixture must yield >= 4 chunks")
    val (pB, dB, sB) = LlmPipeline.postingsFor(standingDocs)
    val sTruth = sB.head()
    val xB = LlmPipeline.positionalPostingsFor(standingDocs)
    // Cadence: every 2nd batch folds its committed predecessor.
    val t = runStream(chunks, compactEvery = 2)
    try {
      val dir = t.resolve("index").toString
      // The last cadence fire: the largest even batch id compacts its
      // committed predecessor.
      val lastFold = (0 until chunks.size).filter(b => b > 0 && b % 2 == 0).max - 1L
      assert(Files.exists(Paths.get(dir, "postings_base", s"gen=$lastFold", "_SUCCESS")) &&
        Files.exists(Paths.get(dir, "stats_base", s"gen=$lastFold", "_SUCCESS")),
        "cadence did not fold a committed base mid-stream")
      (0L to lastFold).foreach { b =>
        assert(!Files.exists(Paths.get(dir, "postings", s"batch_id=$b")),
          s"cadence left folded generation batch_id=$b behind")
      }
      val (pC, dC, sC, xC) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(rowsEqual(pC, pB) && rowsEqual(dC, dB) && rowsEqual(xC, xB) &&
        sC.head().getLong(2) == sTruth.getLong(2),
        "cadence compaction changed a merged read")
      // Manual fold of the whole tail; reads unchanged, inputs gone.
      val at = (chunks.size - 1).toLong
      PostingsMaintenance.compactPostings(spark, dir, at)
      val (pF, dF, sF, _) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(rowsEqual(pF, pB) && rowsEqual(dF, dB) &&
        sF.head().getLong(2) == sTruth.getLong(2),
        "full compaction changed a merged read")
      assert(!Files.exists(Paths.get(dir, "postings_base", s"gen=$lastFold")),
        "full compaction left the superseded base behind")
      // Idempotent re-run.
      PostingsMaintenance.compactPostings(spark, dir, at)
      // Crash mid-cleanup (ADVICE r14): commit one more generation,
      // snapshot it aside, compact, restore it — the committed base
      // must be KEPT and the leftover only cleaned up; refolding from
      // the leftover alone would truncate the index to one batch.
      val extraId = at + 1
      PostingsMaintenance.commitPostingsBatch(spark,
        Seq((400000001L, "zz yy zz")).toDF("doc_id", "text"), dir, extraId)
      val (pE, _, sE, _) = PostingsMaintenance.mergedIndex(spark, dir)
      val pTruth = pE.collect().map(_.toString).toSet
      val tokTruth = sE.head().getLong(2)
      val aside = t.resolve("aside")
      copyDir(Paths.get(dir, "postings", s"batch_id=$extraId"), aside)
      PostingsMaintenance.compactPostings(spark, dir, extraId)
      copyDir(aside, Paths.get(dir, "postings", s"batch_id=$extraId"))
      PostingsMaintenance.compactPostings(spark, dir, extraId)
      assert(Files.exists(
        Paths.get(dir, "postings_base", s"gen=$extraId", "_SUCCESS")),
        "compaction replay lost the committed base")
      assert(!Files.exists(Paths.get(dir, "postings", s"batch_id=$extraId")),
        "compaction replay did not finish the leftover cleanup")
      val (pZ, _, sZ, _) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(pZ.collect().map(_.toString).toSet == pTruth &&
        sZ.head().getLong(2) == tokTruth,
        "compaction replay rebuilt truncated state from leftover inputs")
    } finally LlmPipeline.deleteRecursively(t)
  }

  test("tombstones: delete-then-read == rebuild-without-docs, subtract-once under overlap+replay, compaction purges physically, BM25 closure holds") {
    import spark.implicits._
    val docs = standingDocs.as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 5, id) }
    val chunks = docs.grouped(math.max(docs.length / 4, 1)).toSeq.map(_.toSeq)
    val removedIds = docs.map(_._1).filter(_ % 7 == 1).toSeq
    assert(removedIds.nonEmpty, "fixture removal set empty — law vacuous")
    val kept = standingDocs.filter(!col("doc_id").isin(removedIds: _*))
    val (pK, dK, sK) = LlmPipeline.postingsFor(kept)
    val xK = LlmPipeline.positionalPostingsFor(kept)
    val sTruth = sK.head()
    val t = runStream(chunks)
    try {
      val dir = t.resolve("index").toString
      // Two OVERLAPPING tombstone generations (two notices naming some
      // of the same docs) — the read must subtract each doc ONCE.
      val (half1, half2) = removedIds.splitAt(removedIds.length / 2 + 1)
      PostingsMaintenance.commitTombstones(spark,
        (half1 ++ half2.take(1)).toDF("doc_id"), dir, 0L)
      PostingsMaintenance.commitTombstones(spark, half2.toDF("doc_id"), dir, 1L)
      // Replay idempotency: re-committing a tombstone generation
      // changes nothing.
      PostingsMaintenance.commitTombstones(spark,
        (half1 ++ half2.take(1)).toDF("doc_id"), dir, 0L)
      val (pT, dT, sT, xT) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(rowsEqual(pT, pK) && rowsEqual(dT, dK) && rowsEqual(xT, xK),
        "tombstoned merged read != rebuild-without-docs")
      assert(sT.head() == sTruth, "subtracted stream stats != recount")
      // BM25 closure on the DELETE axis: ranking against the
      // tombstoned stream == ranking against a stream that never
      // ingested the removed docs.
      val tClean = runStream(Seq(kept.as[(Long, String)].collect().toSeq))
      try {
        val a = PostingsMaintenance.bm25AgainstStream(spark, dir)
        val b = PostingsMaintenance.bm25AgainstStream(spark,
          tClean.resolve("index").toString)
        assert(rowsEqual(a, b), "post-takedown ranking != rebuilt-corpus ranking")
      } finally LlmPipeline.deleteRecursively(tClean)
      // Compaction purges physically: reads unchanged, and the base
      // parquet itself contains none of the removed docs' rows.
      PostingsMaintenance.compactPostings(spark, dir, (chunks.size - 1).toLong)
      val (pC, dC, sC, xC) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(rowsEqual(pC, pK) && rowsEqual(dC, dK) && rowsEqual(xC, xK) &&
        sC.head() == sTruth, "compaction changed a tombstoned read")
      val gen = (chunks.size - 1).toLong
      val inBase = spark.read.parquet(s"$dir/postings_base/gen=$gen")
        .filter(col("doc_id").isin(removedIds: _*)).count()
      assert(inBase == 0, s"base still holds $inBase purged posting rows")
      val statsBase = spark.read.parquet(s"$dir/stats_base/gen=$gen").head()
      assert(statsBase == sTruth, "purged stats base != recount")
      // Idempotent re-read after purge: tombstones still on disk, now
      // no-ops — nothing double-subtracts.
      val (pZ, _, sZ, _) = PostingsMaintenance.mergedIndex(spark, dir)
      assert(rowsEqual(pZ, pK) && sZ.head() == sTruth,
        "post-purge re-read double-subtracted")
    } finally LlmPipeline.deleteRecursively(t)
  }

  test("in-flight guard: compaction refuses to fold past a crashed partial batch; mid-cleanup leftovers below the base stay deletable") {
    import spark.implicits._
    val t = Files.createTempDirectory("graft_postguard")
    try {
      val dir = t.resolve("index").toString
      (0 to 2).foreach { b =>
        PostingsMaintenance.commitPostingsBatch(spark,
          Seq((100L + b, s"aa bb cc$b")).toDF("doc_id", "text"), dir, b.toLong)
      }
      val (p0, _, s0, _) = PostingsMaintenance.mergedIndex(spark, dir)
      val truth = p0.collect().map(_.toString).toSet
      val tokTruth = s0.head().getLong(2)
      // A crashed in-flight batch: generation directory present on one
      // axis, no _SUCCESS — exactly what a kill mid-commitPostingsBatch
      // leaves, and what a stream replay would rewrite at the same id.
      val partial = Paths.get(dir, "postings", "batch_id=3")
      Files.createDirectories(partial)
      Files.writeString(partial.resolve("part-00000.parquet"), "partial")
      // Folding AT or PAST the in-flight id must refuse (ADVICE r15):
      // committing base gen=3 and deleting the partial would strand the
      // replayed batch 3 below baseGen — silent data loss.
      intercept[IllegalStateException] {
        PostingsMaintenance.compactPostings(spark, dir, 3L)
      }
      assert(Files.exists(partial), "refused fold must not touch the partial")
      assert(!Files.exists(Paths.get(dir, "postings_base", "gen=3")),
        "refused fold must not commit a base")
      // Folding strictly BELOW the in-flight id is the sanctioned move.
      PostingsMaintenance.compactPostings(spark, dir, 2L)
      assert(Files.exists(Paths.get(dir, "postings_base", "gen=2", "_SUCCESS")))
      // The replay arrives: batch 3 commits over its own partial, then
      // the fold at 3 succeeds and every read shows the batch.
      PostingsMaintenance.commitPostingsBatch(spark,
        Seq((103L, "dd ee")).toDF("doc_id", "text"), dir, 3L)
      // A markerless leftover BELOW the base (mid-cleanup debris from
      // the fold at 2) must not block the fold — it is provably inside
      // the base already.
      val debris = Paths.get(dir, "postings", "batch_id=1")
      Files.createDirectories(debris)
      Files.writeString(debris.resolve("part-00000.parquet"), "leftover")
      PostingsMaintenance.compactPostings(spark, dir, 3L)
      assert(!Files.exists(debris), "fold must clean up sub-base debris")
      val (pF, _, sF, _) = PostingsMaintenance.mergedIndex(spark, dir)
      val fRows = pF.collect().map(_.toString).toSet
      assert(truth.subsetOf(fRows) && fRows.exists(_.contains("dd")) &&
        sF.head().getLong(2) == tokTruth + 2,
        "post-replay fold lost state")
    } finally LlmPipeline.deleteRecursively(t)
  }
}
