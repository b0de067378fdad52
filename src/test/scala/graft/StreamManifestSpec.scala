package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.streaming.{PostingsMaintenance, SketchMaintenance, StreamingAdmission}

/** Per-micro-batch manifest commits on the streaming chains (r19 —
  * VERDICT r18 item 3): a reader that resolves ALL its planes from one
  * committed stream manifest can never compose a torn cross-plane pair
  * (new postings generation beside old docstats; a label delta beside
  * a history frontier that predates its batch; a compaction's base
  * counted beside the tail it subsumed). Laws, per chain:
  *
  *   - a POLLING reader during the live stream (compaction cadence
  *     running) sees the cross-plane invariants hold at EVERY
  *     observation — the OccSpec reader discipline on the streaming
  *     axis;
  *   - after the stream drains, the manifest-resolved state equals the
  *     listing-based read and the batch ground truth — the manifest
  *     changes WHERE the frontier comes from, never what it reads;
  *   - replay idempotency survives the composition: batch_id
  *     generations are idempotent and the manifest only ever binds a
  *     monotone frontier.
  */
class StreamManifestSpec extends SparkSpec {

  private def rowsEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  private def standingDocs = graft.sources.Tables.documents(spark, sfDir)
    .filter(col("doc_id") % 4 =!= 0).select("doc_id", "text")

  test("postings chain: polling manifest reader is torn-free under live batches + compaction; final == one-shot build") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = standingDocs.as[(Long, String)].collect()
      .sortBy { case (id, _) => (id % 7, id) }
    val chunks = docs.grouped(math.max(docs.length / 5, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 5, "fixture must yield >= 5 chunks")
    val tmp = Files.createTempDirectory("graft_smanpost")
    val dir = tmp.resolve("index").toString
    val ckpt = tmp.resolve("ckpt").toString
    val logDir = tmp.resolve("mlog")
    Files.createDirectories(logDir)
    val input = MemoryStream[(Long, String)]
    val q = PostingsMaintenance.start(spark,
      input.toDS().toDF("doc_id", "text"), dir, ckpt,
      compactEvery = 2, manifestLog = Some(logDir))
    @volatile var streamDone = false
    var readerObs = 0
    var vacuumRaces = 0
    var readerErr: Throwable = null
    val reader = new Thread(() =>
      try {
        while (!streamDone) {
          if (Files.exists(logDir.resolve(f"commit-${0L}%06d"))) try {
            val (p, d, s, _) = PostingsMaintenance.mergedIndexAt(spark, logDir)
            // The invariants a torn frontier breaks: the one-row stats
            // must equal the docstats recount, and the postings and
            // docstats doc sets must coincide — a manifest composing
            // axis frontiers from different batches fails one of them.
            val sRow = s.head()
            val rc = d.agg(count(lit(1)).as("ndl"),
              coalesce(sum("dl"), lit(0L)).as("tok")).head()
            assert(sRow.getLong(1) == rc.getLong(0) &&
              sRow.getLong(2) == rc.getLong(1),
              s"TORN stream read: stats $sRow != docstats recount $rc")
            assert(p.select("doc_id").distinct()
              .join(d.select("doc_id"), Seq("doc_id"), "full_outer")
              .filter(col("doc_id").isNull).isEmpty,
              "TORN stream read: postings/docstats doc sets diverge")
            readerObs += 1
          } catch {
            // The documented reader contract (StreamManifest.current):
            // a scan losing the compaction's input-deletion race
            // re-resolves from the head manifest — never a torn read.
            case t: Throwable if graft.streaming.StreamManifest.isVacuumRace(t) =>
              vacuumRaces += 1
          }
        }
      } catch { case t: Throwable => readerErr = t })
    reader.start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally {
      q.stop()
      streamDone = true
      reader.join(120000)
    }
    try {
      assert(readerErr == null, s"manifest reader failed: $readerErr")
      assert(readerObs > 0, "manifest reader made no observations")
      info(s"manifest reader made $readerObs torn-free observations ($vacuumRaces vacuum-race retries)")
      val (p, d, s, x) = PostingsMaintenance.mergedIndexAt(spark, logDir)
      val (pL, dL, sL, _) = PostingsMaintenance.mergedIndex(spark, dir)
      val (pB, dB, sB) = LlmPipeline.postingsFor(standingDocs)
      assert(rowsEqual(p, pL) && rowsEqual(p, pB),
        "manifest-resolved postings != listing read / one-shot build")
      assert(rowsEqual(d, dL) && rowsEqual(d, dB),
        "manifest-resolved docstats != listing read / one-shot build")
      assert(s.head() == sL.head() && s.head() == sB.head(),
        "manifest-resolved stats != listing read / one-shot build")
      assert(rowsEqual(x, LlmPipeline.positionalPostingsFor(standingDocs)),
        "manifest-resolved positions != one-shot build")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("postings chain retention: a reader pinned to the pre-compaction manifest still resolves; a later compaction reclaims below retention (r20 — VERDICT r19 item 7)") {
    import spark.implicits._
    import graft.queries.{PlaneChains, SqlGateway}
    val docs = standingDocs.as[(Long, String)].collect().sortBy(_._1)
    val chunks = docs.grouped(math.max(docs.length / 5, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 5, "fixture must yield >= 5 chunks")
    val tmp = Files.createTempDirectory("graft_smret")
    val dir = tmp.resolve("index").toString
    val logDir = tmp.resolve("mlog")
    Files.createDirectories(logDir)
    try {
      def feed(b: Int): Unit = {
        PostingsMaintenance.commitPostingsBatch(spark,
          chunks(b).toDF("doc_id", "text"), dir, b.toLong)
        PostingsMaintenance.commitIndexManifest(dir, logDir)
      }
      // Batches 0-2 land (manifest generations 0-2).
      (0 to 2).foreach(feed)
      val gPin = graft.queries.SqlGateway.occCurrentGen(logDir)
      val mPin = SqlGateway.occManifestAt(logDir, gPin)
      // First compaction under retention, fresh manifest right after
      // (the foreachBatch wiring, driven deterministically).
      PostingsMaintenance.compactPostings(spark, dir, 2L,
        graft.streaming.StreamManifest.retainedPaths(logDir))
      PostingsMaintenance.commitIndexManifest(dir, logDir)
      // The pinned reader law: every directory manifest gPin binds is
      // STILL on disk and readable — no FileNotFoundException retry.
      val pinnedDirs = PlaneChains.paths(mPin("postings"))
      pinnedDirs.foreach(p => assert(
        java.nio.file.Files.isDirectory(java.nio.file.Paths.get(p)),
        s"compaction deleted $p, bound by retained manifest $gPin"))
      val pinned = spark.read.parquet(pinnedDirs: _*)
      val expect02 = LlmPipeline.postingsFor(
        chunks.take(3).flatten.toDF("doc_id", "text"))._1
      assert(rowsEqual(pinned, expect02),
        "pinned pre-compaction manifest no longer resolves its postings")
      // Batches 3-4 land, then a second compaction: the manifests have
      // advanced past the old batch directories — reclaimed below
      // retention — while directories recent manifests bind survive.
      (3 to 4).foreach(feed)
      PostingsMaintenance.compactPostings(spark, dir, 4L,
        graft.streaming.StreamManifest.retainedPaths(logDir))
      PostingsMaintenance.commitIndexManifest(dir, logDir)
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "postings", "batch_id=0")),
        "second compaction failed to reclaim a directory below retention")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(dir, "postings", "batch_id=3")),
        "second compaction deleted a directory recent manifests bind")
      // Head read == one-shot build of everything fed.
      val (p, _, s, _) = PostingsMaintenance.mergedIndexAt(spark, logDir)
      val (pB, _, sB) = LlmPipeline.postingsFor(standingDocs)
      assert(rowsEqual(p, pB), "head read != one-shot build")
      assert(s.head() == sB.head(), "head stats != one-shot recount")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("unified log: streamed batches and a tombstone takedown serialize on ONE manifest; polling reader composes streamed and batch planes torn-free (r20 — VERDICT r19 item 2)") {
    import spark.implicits._
    import graft.queries.{PlaneChains, SqlGateway}
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_smuni")
    val planesRoot = tmp.resolve("planes").toString
    val ckpt = tmp.resolve("ckpt").toString
    val logDir = tmp.resolve("log")
    Files.createDirectories(logDir)
    try {
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logDir)
      val shard = graft.sources.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
      // Noticed streamed docs are all in the FIRST batch (doc_id % 8
      // == 0 implies doc_id/4 even), so the final state is independent
      // of how the takedown interleaves with the later batches.
      val b0 = shard.filter((col("doc_id") / 4) % 2 === 0)
        .as[(Long, String)].collect().toSeq
      val rest = shard.filter((col("doc_id") / 4) % 2 === 1)
        .as[(Long, String)].collect().sortBy(_._1)
      val later = rest.grouped(math.max(rest.size / 2, 1)).toSeq.map(_.toSeq)
      require(b0.nonEmpty && later.size >= 2, "fixture too small")
      val removed = LlmPipeline.takedownDocSet(spark, sfDir)
        .unionByName(shard.select("doc_id").filter(col("doc_id") % 8 === 0))
        .distinct().localCheckpoint()
      assert(removed.count() > b0.size / 64, "notice empty — law weak")
      val input = MemoryStream[(Long, String)]
      val q = graft.streaming.UnifiedIngest.start(spark,
        input.toDS().toDF("doc_id", "text"), planesRoot, logDir, ckpt)
      @volatile var done = false
      var readerObs = 0
      var readerErr: Throwable = null
      val reader = new Thread(() =>
        try {
          while (!done) {
            // ONE manifest resolves streamed chains (postings/stats)
            // BESIDE batch planes (labels/pairs/reps) — the full
            // cross-plane invariant set per observation.
            val g = SqlGateway.occCurrentGen(logDir)
            assert(LlmPipeline.manifestPlanesConsistent(spark, logDir, g),
              s"TORN READ at unified-log generation $g")
            readerObs += 1
          }
        } catch { case t: Throwable => readerErr = t })
      var tdGen = -1L
      var tdErr: Throwable = null
      val tdThread = new Thread(() =>
        try {
          var won = false; var attempt = 0
          while (!won && attempt < 8) {
            attempt += 1
            val (w, _) = LlmPipeline.commitTakedownTombstones(
              spark, planesRoot, logDir, removed, s"td$attempt")
            won = w
          }
          assert(won, "takedown writer never committed")
          tdGen = SqlGateway.occCurrentGen(logDir)
        } catch { case t: Throwable => tdErr = t })
      reader.start()
      try {
        input.addData(b0); q.processAllAvailable() // generation 1
        tdThread.start() // races the remaining stream batches
        later.foreach { c => input.addData(c); q.processAllAvailable() }
        tdThread.join(240000)
      } finally {
        q.stop()
        done = true
        reader.join(120000)
      }
      assert(tdErr == null, s"takedown writer failed: $tdErr")
      assert(readerErr == null, s"unified reader failed: $readerErr")
      assert(readerObs > 0, "unified reader made no observations")
      info(s"unified reader made $readerObs torn-free observations; " +
        s"takedown landed at generation $tdGen of ${SqlGateway.occCurrentGen(logDir)}")
      val finalGen = SqlGateway.occCurrentGen(logDir)
      assert(finalGen == 4L, s"expected 4 commits past bootstrap, got $finalGen")
      (0L to finalGen).foreach(g => assert(
        LlmPipeline.manifestPlanesConsistent(spark, logDir, g),
        s"generation $g inconsistent"))
      // Final resolved state: (standing u all streamed) - notice, with
      // the takedown's tombstones binding the STREAMED rows too.
      val mF = SqlGateway.occManifestAt(logDir, finalGen)
      val post = PlaneChains.resolve(spark, "postings", mF("postings"))
      assert(post.join(broadcast(removed), Seq("doc_id"), "left_semi").isEmpty,
        "a noticed doc (streamed or standing) is still served")
      val corpus = graft.sources.Tables.documents(spark, sfDir)
        .select("doc_id", "text")
        .join(broadcast(removed), Seq("doc_id"), "left_anti")
      val (pB, _, sB) = LlmPipeline.postingsFor(corpus)
      assert(rowsEqual(post, pB),
        "unified final postings != rebuild over (standing u streamed) - notice")
      assert(PlaneChains.resolve(spark, "stats", mF("stats")).head() == sB.head(),
        "unified final stats != survivor recount")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("CC chain: label deltas never outrun their history twin under the manifest; final labels == listing read") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureCcArtifact(spark, sfDir)
    val newDocs = graft.sources.Tables.documents(spark, sfDir)
      .filter("doc_id % 4 = 0").select("doc_id", "text")
      .as[(Long, String)].collect().sortBy(_._1)
    val chunks = newDocs.grouped(math.max(newDocs.length / 4, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 4, "fixture must yield >= 4 chunks")
    val tmp = Files.createTempDirectory("graft_smancc")
    val hist = tmp.resolve("hist").toString
    val labels = tmp.resolve("labels").toString
    val ckpt = tmp.resolve("ckpt").toString
    val logDir = tmp.resolve("mlog")
    Files.createDirectories(logDir)
    StreamingAdmission.initCc(spark, ccPath, hist, labels)
    val input = MemoryStream[(Long, String)]
    val q = StreamingAdmission.startCc(spark, bandsPath, shinglesPath,
      input.toDS().toDF("doc_id", "text"), hist, labels, ckpt,
      compactEvery = 2, manifestLog = Some(logDir))
    @volatile var streamDone = false
    var readerObs = 0
    var vacuumRaces = 0
    var readerErr: Throwable = null
    val reader = new Thread(() =>
      try {
        while (!streamDone) {
          if (Files.exists(logDir.resolve(f"commit-${0L}%06d"))) try {
            val (bands, shingles, lab) = StreamingAdmission.chainStateAt(
              spark, "bands", "shingles", logDir)
            // Torn pair #1: a streamed labeled id whose shingle row is
            // not in the bound history — a label delta composed with a
            // history frontier that predates its batch.
            assert(lab.filter(col("id") % 4 === 0)
              .join(shingles.select(col("doc_id").as("id")), Seq("id"), "left_anti")
              .isEmpty,
              "TORN stream read: streamed label without its history twin")
            // Torn pair #2: the two history axes at different frontiers.
            assert(bands.select("doc_id").distinct()
              .join(shingles.select("doc_id").distinct(), Seq("doc_id"), "full_outer")
              .filter(col("doc_id").isNull).isEmpty,
              "TORN stream read: band/shingle history frontiers diverge")
            readerObs += 1
          } catch {
            case t: Throwable if graft.streaming.StreamManifest.isVacuumRace(t) =>
              vacuumRaces += 1
          }
        }
      } catch { case t: Throwable => readerErr = t })
    reader.start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally {
      q.stop()
      streamDone = true
      reader.join(120000)
    }
    try {
      assert(readerErr == null, s"manifest reader failed: $readerErr")
      assert(readerObs > 0, "manifest reader made no observations")
      info(s"manifest reader made $readerObs torn-free observations ($vacuumRaces vacuum-race retries)")
      val (_, _, lab) = StreamingAdmission.chainStateAt(
        spark, "bands", "shingles", logDir)
      assert(rowsEqual(lab, StreamingAdmission.currentLabels(spark, labels)),
        "manifest-resolved labels != listing-based currentLabels")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("ANN-CC chain: manifest composes keys/vecs and labels torn-free; final == listing read") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val ccPath = LlmPipeline.ensureAnnCcArtifact(spark, sfDir)
    val newVecs = graft.sources.Tables.embeddings(spark, sfDir)
      .filter("vec_id % 4 = 0").select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val chunks = newVecs.grouped(math.max(newVecs.length / 3, 1)).toSeq.map(_.toSeq)
    require(chunks.size >= 3, "fixture must yield >= 3 chunks")
    val tmp = Files.createTempDirectory("graft_smanann")
    val hist = tmp.resolve("hist").toString
    val labels = tmp.resolve("labels").toString
    val ckpt = tmp.resolve("ckpt").toString
    val logDir = tmp.resolve("mlog")
    Files.createDirectories(logDir)
    StreamingAdmission.initAnnCc(spark, ccPath, hist, labels)
    val input = MemoryStream[(Long, Array[Float])]
    val q = StreamingAdmission.startAnnCc(spark, keysPath, vecsPath,
      input.toDS().toDF("vec_id", "embedding"), hist, labels, ckpt,
      compactEvery = 2, manifestLog = Some(logDir))
    @volatile var streamDone = false
    var readerObs = 0
    var vacuumRaces = 0
    var readerErr: Throwable = null
    val reader = new Thread(() =>
      try {
        while (!streamDone) {
          if (Files.exists(logDir.resolve(f"commit-${0L}%06d"))) try {
            val (keys, vecs, lab) = StreamingAdmission.chainStateAt(
              spark, "keys", "vecs", logDir)
            assert(lab.filter(col("id") % 4 === 0)
              .join(vecs.select(col("vec_id").as("id")), Seq("id"), "left_anti")
              .isEmpty,
              "TORN stream read: streamed label without its vector twin")
            assert(keys.select("vec_id").distinct()
              .join(vecs.select("vec_id").distinct(), Seq("vec_id"), "full_outer")
              .filter(col("vec_id").isNull).isEmpty,
              "TORN stream read: key/vec history frontiers diverge")
            readerObs += 1
          } catch {
            case t: Throwable if graft.streaming.StreamManifest.isVacuumRace(t) =>
              vacuumRaces += 1
          }
        }
      } catch { case t: Throwable => readerErr = t })
    reader.start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally {
      q.stop()
      streamDone = true
      reader.join(120000)
    }
    try {
      assert(readerErr == null, s"manifest reader failed: $readerErr")
      assert(readerObs > 0, "manifest reader made no observations")
      info(s"manifest reader made $readerObs torn-free observations ($vacuumRaces vacuum-race retries)")
      val (_, _, lab) = StreamingAdmission.chainStateAt(
        spark, "keys", "vecs", logDir)
      assert(rowsEqual(lab, StreamingAdmission.currentLabels(spark, labels)),
        "manifest-resolved labels != listing-based currentLabels")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("sketch chain: manifest frontier keeps the exact count monotone across base/tail compactions; final == listing read") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    graft.functions.NativeFunctions.register(spark)
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"))
      .as[(Long, Double)].collect().toSeq
    require(rows.size >= 50, "fixture too small")
    val chunks = rows.grouped(math.max(rows.size / 5, 1)).toSeq
    val tmp = Files.createTempDirectory("graft_smansk")
    val dir = tmp.resolve("sk").toString
    val ckpt = tmp.resolve("ckpt").toString
    val logDir = tmp.resolve("mlog")
    Files.createDirectories(logDir)
    val input = MemoryStream[(Long, Double)]
    val q = SketchMaintenance.start(spark,
      input.toDS().toDF("user_id", "value"), dir, ckpt,
      compactEvery = 2, manifestLog = Some(logDir))
    @volatile var streamDone = false
    var readerObs = 0
    var vacuumRaces = 0
    var lastN = -1L
    var readerErr: Throwable = null
    val reader = new Thread(() =>
      try {
        while (!streamDone) {
          if (Files.exists(logDir.resolve(f"commit-${0L}%06d"))) try {
            val n = SketchMaintenance.mergedSketchesAt(spark, logDir)
              .select("n").head().getLong(0)
            // A base/tail listing race double-counts (fold + subsumed
            // tail) or drops (neither); the manifest frontier makes
            // the exact audit count monotone non-decreasing.
            assert(n >= lastN,
              s"TORN sketch read: exact count went backward ($lastN -> $n)")
            lastN = n
            readerObs += 1
          } catch {
            case t: Throwable if graft.streaming.StreamManifest.isVacuumRace(t) =>
              vacuumRaces += 1
          }
        }
      } catch { case t: Throwable => readerErr = t })
    reader.start()
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally {
      q.stop()
      streamDone = true
      reader.join(120000)
    }
    try {
      assert(readerErr == null, s"manifest reader failed: $readerErr")
      assert(readerObs > 0, "manifest reader made no observations")
      info(s"manifest reader made $readerObs torn-free observations ($vacuumRaces vacuum-race retries)")
      val n = SketchMaintenance.mergedSketchesAt(spark, logDir)
        .select("n").head().getLong(0)
      assert(n == rows.size,
        s"manifest-resolved exact count $n != ${rows.size} rows fed")
    } finally LlmPipeline.deleteRecursively(tmp)
  }
}
