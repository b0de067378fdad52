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
