package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SketchMaintenance

/** Streaming sketch maintenance: the mergeable-sketch plane on the
  * stream's time axis. The proof obligations mirror the batch families'
  * contracts, upgraded to stream laws:
  *
  *   - chunking/order invariance: the same event set through 1 batch
  *     and through 4 scrambled batches lands on the IDENTICAL merged
  *     count-min sketch (BYTE-equal — cell-wise addition commutes
  *     exactly), the identical theta estimate, and a KLL sketch with
  *     the exact same item count whose quantiles stay in the exact
  *     rank band;
  *   - parity with the batch build: the streamed fold equals a direct
  *     one-shot sketch of the whole set (byte-equal for CM);
  *   - replay idempotency: re-committing a batch generation
  *     (at-least-once delivery) leaves every merged read unchanged —
  *     the per-batch-generation layout is what makes a replay a
  *     rewrite instead of a double count;
  *   - compaction: folding generations into a base preserves every
  *     merged read exactly (union associativity), deletes the folded
  *     inputs, survives an idempotent re-run, and admits new batches
  *     on top of the base.
  */
class SketchStreamSpec extends SparkSpec {

  private def runStream(
      chunks: Seq[Seq[(Long, Double)]], compactEvery: Int = 0): java.nio.file.Path = {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val tmp = Files.createTempDirectory("graft_skstream")
    val dir = tmp.resolve("sketches").toString
    val ckpt = tmp.resolve("ckpt").toString
    val input = MemoryStream[(Long, Double)]
    val q = SketchMaintenance.start(spark,
      input.toDS().toDF("user_id", "value"), dir, ckpt, compactEvery)
    try {
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    } finally q.stop()
    tmp
  }

  private def readMerged(tmp: java.nio.file.Path): (Array[Byte], Double, Long, Double, Double, Long, Double) = {
    val r = SketchMaintenance.mergedSketches(spark, tmp.resolve("sketches").toString)
      .select(col("cm"),
        expr("theta_estimate(theta)"),
        col("n"),
        expr("kll_sketch_quantile(kll, 0.5D)"),
        expr("kll_sketch_quantile(kll, 0.9D)"),
        col("kll"),
        expr("hll_sketch_estimate(hll)"))
      .head()
    val kllN = org.apache.datasketches.kll.KllDoublesSketch.heapify(
      org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]](5))).getN
    (r.getAs[Array[Byte]](0), r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), kllN,
      // hll_sketch_estimate returns BIGINT (the rounded HIP estimate).
      r.getLong(6).toDouble)
  }

  /** The q182 HLL band: within 3·rsd(lgK=12) ≈ 5% of the exact count.
    * Never equality — the HIP estimator is merge-path dependent, and
    * chunking/replay/compaction all change the merge path.
    */
  private def assertHllBand(est: Double, exact: Long, ctx: String): Unit = {
    // Absolute floor of 1.0 (ADVICE r14): hll_sketch_estimate returns a
    // rounded BIGINT, so a purely relative band can be sub-1 on small
    // counts and fail on integer rounding rather than sketch error.
    val tol = math.max(0.05 * exact, 1.0)
    assert(math.abs(est - exact) <= tol,
      s"$ctx: HLL estimate $est outside the band ±$tol of exact $exact")
  }

  test("streamed sketches: chunked == single-batch == direct build, replay idempotent, compaction exact") {
    import spark.implicits._
    graft.functions.NativeFunctions.register(spark)
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("value"))
    val rows = ev.as[(Long, Double)].collect()
    val exactUsers = rows.map(_._1).distinct.length.toLong
    val pb = ev.agg(expr(
      "percentile(value, array(0.45D, 0.55D, 0.85D, 0.95D))")).head().getSeq[Double](0)

    // Scramble deterministically, split into 4 chunks.
    val scrambled = rows.sortBy { case (u, v) => (u % 7, v) }
    val chunks = scrambled.grouped(math.max(scrambled.length / 4, 1)).toSeq.map(_.toSeq)

    val t1 = runStream(Seq(rows.toSeq))
    val t2 = runStream(chunks)
    try {
      val (cm1, th1, n1, q50a, q90a, klln1, hll1) = readMerged(t1)
      val (cm2, th2, n2, q50b, q90b, klln2, hll2) = readMerged(t2)
      // Chunking invariance. CM: byte-equal (cell-wise addition
      // commutes exactly). Theta: estimate-equal, and exact below k.
      // KLL: item count exact; quantiles in the exact rank band (values
      // may differ across merge paths — the q183 contract, not
      // byte-equality).
      assert(java.util.Arrays.equals(cm1, cm2),
        "merged count-min sketches differ between chunkings — merge is not cell-wise")
      assert(th1 == th2 && th1 == exactUsers.toDouble,
        s"theta estimates differ or miss exact: $th1 / $th2 vs $exactUsers")
      assert(n1 == rows.length && n2 == rows.length && klln1 == rows.length && klln2 == rows.length,
        s"counts drifted: n=$n1/$n2 kllN=$klln1/$klln2 vs ${rows.length}")
      Seq((q50a, q90a), (q50b, q90b)).foreach { case (q50, q90) =>
        assert(q50 >= pb(0) && q50 <= pb(1), s"streamed p50 $q50 outside rank band")
        assert(q90 >= pb(2) && q90 <= pb(3), s"streamed p90 $q90 outside rank band")
      }
      // HLL (r14): band contract ONLY — both chunkings inside 5% of
      // exact distinct users; equality across merge paths is exactly
      // the claim q182 measured and refused.
      assertHllBand(hll1, exactUsers, "single-batch")
      assertHllBand(hll2, exactUsers, "chunked")
      // Parity with the direct one-shot batch build.
      val direct = ev.agg(expr("cm_sketch_agg(user_id, 7, 400, 42)")).head().getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(cm1, direct),
        "streamed CM fold differs from the direct batch build")

      // Replay idempotency: re-commit an existing generation with the
      // same data (at-least-once) — every merged read unchanged.
      val dir2 = t2.resolve("sketches").toString
      val gen0 = chunks.head.toDF("user_id", "value")
      SketchMaintenance.commitSketchBatch(spark, gen0, dir2, 0L)
      val (cmR, thR, nR, _, _, kllnR, hllR) = readMerged(t2)
      assert(java.util.Arrays.equals(cmR, cm2) && thR == th2 && nR == n2 && kllnR == klln2,
        "replaying batch 0 changed a merged read — the generation sink is not idempotent")
      assertHllBand(hllR, exactUsers, "post-replay")

      // Compaction: fold generations 0..2 into base/gen=2. Every merged
      // read must be unchanged; the folded batch dirs must be gone.
      SketchMaintenance.compactSketches(spark, dir2, 2L)
      val (cmC, thC, nC, q50c, q90c, kllnC, hllC) = readMerged(t2)
      assert(java.util.Arrays.equals(cmC, cm2) && thC == th2 && nC == n2 && kllnC == klln2,
        "compaction changed a merged read — the fold is not union-exact")
      assert(q50c >= pb(0) && q50c <= pb(1) && q90c >= pb(2) && q90c <= pb(3),
        "post-compaction KLL quantiles left the rank band")
      assertHllBand(hllC, exactUsers, "post-compaction")
      (0L to 2L).foreach { b =>
        assert(!Files.exists(Paths.get(dir2, s"batch_id=$b")),
          s"folded generation batch_id=$b not deleted")
      }
      assert(Files.exists(Paths.get(dir2, "base", "gen=2")), "base generation missing")
      // Idempotent re-run: folds the base into itself, reads unchanged.
      SketchMaintenance.compactSketches(spark, dir2, 2L)
      val (cmC2, _, nC2, _, _, _, _) = readMerged(t2)
      assert(java.util.Arrays.equals(cmC2, cm2) && nC2 == n2,
        "re-running compaction changed a merged read")
      // Post-compaction admission: a new batch on top of the base.
      val extra = Seq((999999L, 42.0))
      SketchMaintenance.commitSketchBatch(spark, extra.toDF("user_id", "value"), dir2, 4L)
      val (_, thE, nE, _, _, kllnE, hllE) = readMerged(t2)
      assert(nE == n2 + 1 && kllnE == klln2 + 1 && thE == exactUsers.toDouble + 1,
        s"post-compaction admission wrong: n=$nE theta=$thE kllN=$kllnE")
      assertHllBand(hllE, exactUsers + 1, "post-compaction admission")
      // Crashed-fold simulation (ADVICE r13): a markerless base at a
      // HIGHER generation — a fold that died before its _SUCCESS
      // marker, here missing batch 4's contribution — must not be
      // preferred by name; trusting it would exclude the still-present
      // batch-4 generation and silently undercount every merged read.
      val partialBase = Paths.get(dir2, "base", "gen=9")
      spark.read.parquet(s"$dir2/base/gen=2")
        .write.mode("overwrite").parquet(partialBase.toString)
      Files.deleteIfExists(partialBase.resolve("_SUCCESS"))
      val (_, thP, nP, _, _, kllnP, _) = readMerged(t2)
      assert(nP == n2 + 1 && kllnP == klln2 + 1 && thP == exactUsers.toDouble + 1,
        s"markerless partial base leaked into mergedSketches: n=$nP (want ${n2 + 1})")
      // Re-running compaction at the crashed point discards the
      // partial, folds the committed base + tail, and commits the
      // marker; reads unchanged.
      SketchMaintenance.compactSketches(spark, dir2, 9L)
      assert(Files.exists(partialBase.resolve("_SUCCESS")),
        "compaction re-run did not commit the redone base")
      assert(!Files.exists(Paths.get(dir2, "batch_id=4")) &&
        !Files.exists(Paths.get(dir2, "base", "gen=2")),
        "compaction re-run left folded inputs behind")
      val (_, thF, nF, _, _, kllnF, hllF) = readMerged(t2)
      assert(nF == n2 + 1 && kllnF == klln2 + 1 && thF == exactUsers.toDouble + 1,
        s"redone fold changed a merged read: n=$nF")
      assertHllBand(hllF, exactUsers + 1, "post-redone-fold")
    } finally {
      graft.queries.LlmPipeline.deleteRecursively(t1)
      graft.queries.LlmPipeline.deleteRecursively(t2)
    }
  }

  test("crash mid-cleanup: a committed base with leftover inputs is kept, never refolded (ADVICE r14)") {
    import spark.implicits._
    graft.functions.NativeFunctions.register(spark)
    val tmp = Files.createTempDirectory("graft_skcrash")
    try {
      val dir = tmp.resolve("sketches").toString
      // Three committed batch generations.
      val batches = Seq(
        Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)),
        Seq((4L, 4.0), (5L, 5.0)),
        Seq((6L, 6.0), (1L, 7.0)))
      batches.zipWithIndex.foreach { case (b, i) =>
        SketchMaintenance.commitSketchBatch(spark,
          b.toDF("user_id", "value"), dir, i.toLong)
      }
      def merged(): (Array[Byte], Long) = {
        val r = SketchMaintenance.mergedSketches(spark, dir)
          .select(col("cm"), col("n")).head()
        (r.getAs[Array[Byte]](0), r.getLong(1))
      }
      val (cm0, n0) = merged()
      // Snapshot batch 1 aside, compact, then RESTORE it — the exact
      // on-disk state of a cleanup that crashed after the base's
      // _SUCCESS landed and after deleting batch 0 but before batch 1
      // (inputs delete in ascending order, strictly after the marker).
      val aside = tmp.resolve("aside_b1")
      copyDir(Paths.get(dir, "batch_id=1"), aside)
      SketchMaintenance.compactSketches(spark, dir, 2L)
      copyDir(aside, Paths.get(dir, "batch_id=1"))
      // The leftover is invisible to reads (≤ the committed base).
      val (cmL, nL) = merged()
      assert(java.util.Arrays.equals(cmL, cm0) && nL == n0,
        "a leftover folded input leaked into a merged read")
      // The compaction replay must KEEP the committed base (the fold is
      // complete) and only finish the cleanup — refolding from the
      // partially-deleted input set would silently drop batches 0 and 2.
      SketchMaintenance.compactSketches(spark, dir, 2L)
      assert(Files.exists(Paths.get(dir, "base", "gen=2", "_SUCCESS")),
        "replayed compaction lost the committed base")
      assert(!Files.exists(Paths.get(dir, "batch_id=1")),
        "replayed compaction did not finish the input cleanup")
      val (cmR, nR) = merged()
      assert(java.util.Arrays.equals(cmR, cm0) && nR == n0,
        s"replayed compaction rebuilt truncated state (n=$nR, want $n0)")
      // Same crash point during OLD-BASE deletion: a later compaction
      // (after batch 3) commits base gen=3; restore base gen=2 as the
      // not-yet-deleted old base and replay.
      val aside2 = tmp.resolve("aside_base2")
      copyDir(Paths.get(dir, "base", "gen=2"), aside2)
      SketchMaintenance.commitSketchBatch(spark,
        Seq((9L, 9.0)).toDF("user_id", "value"), dir, 3L)
      val (cm3, n3) = merged()
      SketchMaintenance.compactSketches(spark, dir, 3L)
      copyDir(aside2, Paths.get(dir, "base", "gen=2"))
      SketchMaintenance.compactSketches(spark, dir, 3L)
      assert(!Files.exists(Paths.get(dir, "base", "gen=2")),
        "replayed compaction did not remove the leftover old base")
      val (cmS, nS) = merged()
      assert(java.util.Arrays.equals(cmS, cm3) && nS == n3,
        s"replay refolded from the stale old base (n=$nS, want $n3)")
    } finally graft.queries.LlmPipeline.deleteRecursively(tmp)
  }

  test("compaction cadence: compactEvery folds the tail mid-stream; merged reads stay exact/banded") {
    import spark.implicits._
    graft.functions.NativeFunctions.register(spark)
    val rows = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("value")).as[(Long, Double)].collect()
    val exactUsers = rows.map(_._1).distinct.length.toLong
    val chunks = rows.sortBy { case (u, v) => (u % 5, v) }
      .grouped(math.max(rows.length / 4, 1)).toSeq.map(_.toSeq)
    assert(chunks.size >= 4, "fixture must yield >= 4 chunks")
    // Every 2nd batch folds its committed predecessor's tail: batch 2
    // compacts at 1 — snapshot-at-committed-offset holds by
    // construction because streaming only hands us batch b after b-1's
    // checkpoint commit.
    val t = runStream(chunks, compactEvery = 2)
    try {
      val dir = t.resolve("sketches").toString
      assert(Files.exists(Paths.get(dir, "base", "gen=1", "_SUCCESS")),
        "cadence did not fold a committed base mid-stream")
      (0L to 1L).foreach { b =>
        assert(!Files.exists(Paths.get(dir, s"batch_id=$b")),
          s"cadence left folded generation batch_id=$b behind")
      }
      (2L until chunks.size.toLong).foreach { b =>
        assert(Files.exists(Paths.get(dir, s"batch_id=$b")),
          s"cadence deleted the live tail generation batch_id=$b")
      }
      val (_, th, n, _, _, klln, hll) = readMerged(t)
      assert(n == rows.length && klln == rows.length,
        s"cadence-compacted counts drifted: n=$n kllN=$klln vs ${rows.length}")
      assert(th == exactUsers.toDouble, s"theta estimate $th != exact $exactUsers")
      assertHllBand(hll, exactUsers, "cadence-compacted")
    } finally graft.queries.LlmPipeline.deleteRecursively(t)
  }
}
