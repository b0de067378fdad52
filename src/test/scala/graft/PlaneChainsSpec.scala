package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{LlmPipeline, PlaneChains, SqlGateway}

/** The delta-binding chain algebra (r19 — VERDICT r18 items 1-3):
  * chain resolution must be EXACTLY the rewrite convention's fold —
  * q210/q212's oracles prove it through the BM25 read; this suite
  * proves it PER PLANE against the r18 rewrite stagers, plus the
  * grammar laws and the ordering semantics the manifest relies on.
  */
class PlaneChainsSpec extends SparkSpec {

  private def rowsEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  /** Compare two head-index relations (token, df, head_ids) — arrays
    * compared element-wise after a token join, so a single stale head
    * or df fails loudly.
    */
  private def indexEqual(a: DataFrame, b: DataFrame): Boolean = {
    val j = a.select(col("token"), col("df").as("df_a"), col("head_ids").as("h_a"))
      .join(b.select(col("token"), col("df").as("df_b"), col("head_ids").as("h_b")),
        Seq("token"), "full_outer")
    j.filter(col("df_a").isNull || col("df_b").isNull ||
      col("df_a") =!= col("df_b") || col("h_a") =!= col("h_b")).isEmpty
  }

  test("grammar: bare paths parse as base chains, encode round-trips, paths() names every generation") {
    import PlaneChains._
    assert(parse("postings", "/tmp/x/gen-a") == Seq(Elem(U, "/tmp/x/gen-a")))
    assert(parse("stats", "/tmp/x/gen-a") == Seq(Elem(A, "/tmp/x/gen-a")))
    assert(parse("index", "/tmp/x/gen-a") == Seq(Elem(M, "/tmp/x/gen-a")))
    assert(parse("labels", "/tmp/x/gen-a") == Seq(Elem(O, "/tmp/x/gen-a")))
    val chain = Seq(Elem(U, "/a/b"), Elem(T, "/c/d"), Elem(U, "/e/f"))
    assert(parse("postings", encode(chain)) == chain)
    val appended = append("/base/gen-0", Elem(T, "/t/gen-1"))
    assert(parse("docstats", appended) ==
      Seq(Elem(U, "/base/gen-0"), Elem(T, "/t/gen-1")))
    assert(paths(appended) == Seq("/base/gen-0", "/t/gen-1"))
  }

  test("grammar: a typo'd kind prefix is rejected loudly, not read as a bare path (ADVICE r19)") {
    import PlaneChains._
    val exP = intercept[IllegalArgumentException](parse("postings", "x:/tmp/p"))
    assert(exP.getMessage.contains("x:") && exP.getMessage.contains("x:/tmp/p"),
      s"error must name the offending element: ${exP.getMessage}")
    val exV = intercept[IllegalArgumentException](
      paths("/base/gen-0;z:/tmp/q"))
    assert(exV.getMessage.contains("z:"), exV.getMessage)
    // Bare absolute paths (and the five known kinds) still parse.
    assert(parse("postings", "/tmp/x;u:/tmp/y").size == 2)
  }

  test("bands over-cap bucket: resolved chain never exceeds the cap, never serves a removed doc, refills from chain survivors (ADVICE r19)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-pc-cap-")
    try {
      val cap = LlmPipeline.LshBucketCap // 512
      def bucketRows(ids: Seq[Long]) =
        ids.map(id => (id, 1, 7L)).toDF("doc_id", "band", "bsig")
      // Base: a FULL bucket (the rewrite convention stores cap-smallest).
      bucketRows(1L to cap.toLong).write.parquet(s"$root/base")
      // Delta admits 100 more docs into the same bucket; tombstone
      // removes docs 1-10.
      bucketRows(601L to 700L).write.parquet(s"$root/delta")
      Seq(1L to 10L: _*).toDF("doc_id").write.parquet(s"$root/tomb")
      val resolved = PlaneChains.resolve(spark, "bands",
        s"$root/base;u:$root/delta;t:$root/tomb")
      val ids = resolved.select("doc_id").as[Long].collect().sorted.toSeq
      // Survivors = (1..512 u 601..700) \ 1..10 = 602 docs; the end-cap
      // keeps the cap-smallest 512 of THEM: 11..512 u 601..610.
      val expected = ((11L to cap.toLong) ++ (601L to 610L)).sorted
      assert(ids.size == cap, s"bucket resolved above cap: ${ids.size}")
      assert(ids.intersect(1L to 10L).isEmpty, "resolved a removed doc")
      assert(ids == expected,
        "end-cap must keep the cap-smallest chain survivors (refill allowed)")
      // Single-element (v1) chains skip the re-cap: the base reads
      // unchanged even when over cap — the documented back-compat.
      bucketRows(1L to (cap + 50L)).write.parquet(s"$root/over")
      assert(PlaneChains.resolve(spark, "bands", s"$root/over").count() ==
        cap + 50L, "v1 single-element base must read unchanged")
    } finally LlmPipeline.deleteRecursively(root)
  }

  test("admission: chain resolution equals the r18 rewrite fold on every plane") {
    val logA = Files.createTempDirectory("graft-pc-admA-")
    val logB = Files.createTempDirectory("graft-pc-admB-")
    val plA = Files.createTempDirectory("graft-pc-admApl-")
    val plB = Files.createTempDirectory("graft-pc-admBpl-")
    try {
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logA)
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logB)
      val pqRoot = LlmPipeline.ensurePqIndex(spark, sfDir)
      val shardDocs = graft.sources.Tables.documents(spark, sfDir)
        .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
        .localCheckpoint()
      val shardEmb = graft.sources.Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
        .localCheckpoint()
      val (wonD, _) = LlmPipeline.commitAdmissionDeltas(
        spark, plA.toString, logA, shardDocs, shardEmb, sfDir, pqRoot, "a1")
      val (wonR, _) = LlmPipeline.commitAdmissionGeneration(
        spark, plB.toString, logB, shardDocs, shardEmb, sfDir, pqRoot, "a1")
      assert(wonD && wonR)
      val mD = SqlGateway.occManifestAt(logA, 1L)
      val mR = SqlGateway.occManifestAt(logB, 1L)
      def resD(p: String) = PlaneChains.resolve(spark, p, mD(p))
      def rewr(p: String) = spark.read.parquet(mR(p))
      Seq("postings", "positions", "docstats", "shingles", "bands",
          "ann_keys", "ann_vecs", "pq_cells", "pq_codes", "pairs",
          "labels", "reps").foreach { p =>
        assert(rowsEqual(resD(p), rewr(p)),
          s"admission chain resolve != rewrite fold on plane $p")
      }
      assert(resD("stats").head() == rewr("stats").head(),
        "admission chain stats != rewrite stats")
      assert(indexEqual(resD("index"), rewr("index")),
        "admission chain index merge != rewrite head merge")
    } finally Seq(logA, logB, plA, plB).foreach(LlmPipeline.deleteRecursively)
  }

  test("takedown: tombstone-chain resolution equals the r18 rewrite fold on every plane; replay is a resolved no-op") {
    val logA = Files.createTempDirectory("graft-pc-tdA-")
    val logB = Files.createTempDirectory("graft-pc-tdB-")
    val plA = Files.createTempDirectory("graft-pc-tdApl-")
    val plB = Files.createTempDirectory("graft-pc-tdBpl-")
    try {
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logA)
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logB)
      val removed = LlmPipeline.takedownDocSet(spark, sfDir).localCheckpoint()
      assert(removed.count() > 0, "fixture notice empty — law vacuous")
      val (wonT, _) = LlmPipeline.commitTakedownTombstones(
        spark, plA.toString, logA, removed, "t1")
      val (wonR, _) = LlmPipeline.commitTakedownGeneration(
        spark, plB.toString, logB, removed, "t1")
      assert(wonT && wonR)
      val mD = SqlGateway.occManifestAt(logA, 1L)
      val mR = SqlGateway.occManifestAt(logB, 1L)
      def resD(p: String) = PlaneChains.resolve(spark, p, mD(p))
      def rewr(p: String) = spark.read.parquet(mR(p))
      Seq("postings", "positions", "docstats", "shingles", "bands",
          "ann_keys", "ann_vecs", "pq_cells", "pq_codes", "pairs",
          "labels", "reps").foreach { p =>
        assert(rowsEqual(resD(p), rewr(p)),
          s"takedown chain resolve != rewrite fold on plane $p")
      }
      assert(resD("stats").head() == rewr("stats").head(),
        "takedown chain stats != rewrite stats")
      assert(indexEqual(resD("index"), rewr("index")),
        "takedown chain index override != rewrite repair")
      // Replay (at-least-once notices): committing the SAME notice
      // again appends presence-keyed elements that resolve to nothing
      // — every resolved plane is row-identical to generation 1's.
      val (wonRe, _) = LlmPipeline.commitTakedownTombstones(
        spark, plA.toString, logA, removed, "t2")
      assert(wonRe, "unopposed replay commit must win")
      val mRe = SqlGateway.occManifestAt(logA, 2L)
      LlmPipeline.TakedownPlanes.filterNot(p => p == "stats" || p == "index")
        .foreach { p =>
          assert(rowsEqual(PlaneChains.resolve(spark, p, mRe(p)), resD(p)),
            s"replayed tombstone changed resolved plane $p")
        }
      assert(PlaneChains.resolve(spark, "stats", mRe("stats")).head() ==
        resD("stats").head(), "replayed tombstone changed resolved stats")
      assert(indexEqual(PlaneChains.resolve(spark, "index", mRe("index")),
        resD("index")), "replayed tombstone changed resolved index")
    } finally Seq(logA, logB, plA, plB).foreach(LlmPipeline.deleteRecursively)
  }

  test("three-transaction composition: admit -> takedown -> admit through chains equals the rewrite-convention composition on every plane") {
    // The induction step the per-transaction laws above license, made
    // airtight end-to-end: a 4-element chain (base; u/m/o shard A;
    // t/a/o notice; u/m/o shard B) must resolve exactly as the r18
    // rewrite stagers applied in the same order — including the stages
    // READING THROUGH the partially-built chains (admission B probes
    // a band chain that already carries a delta AND a tombstone).
    import org.apache.spark.sql.functions._
    val logA = Files.createTempDirectory("graft-pc-cmpA-") // delta chains
    val logB = Files.createTempDirectory("graft-pc-cmpB-") // rewrites
    val plA = Files.createTempDirectory("graft-pc-cmpApl-")
    val plB = Files.createTempDirectory("graft-pc-cmpBpl-")
    try {
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logA)
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logB)
      val pqRoot = LlmPipeline.ensurePqIndex(spark, sfDir)
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val embs = graft.sources.Tables.embeddings(spark, sfDir)
      def shard(i: Int) = (
        docs.filter(col("doc_id") % 4 === 0 && (col("doc_id") / 4) % 2 === i)
          .select("doc_id", "text").localCheckpoint(),
        embs.filter(col("vec_id") % 4 === 0 && (col("vec_id") / 4) % 2 === i)
          .select("vec_id", "embedding").localCheckpoint())
      val (sdA, seA) = shard(0)
      val (sdB, seB) = shard(1)
      // Notice names standing docs AND shard-A docs — non-commuting
      // with the surrounding admissions, so order genuinely matters.
      val removed = LlmPipeline.takedownDocSet(spark, sfDir)
        .unionByName(sdA.select("doc_id").filter(col("doc_id") % 8 === 0))
        .distinct().localCheckpoint()
      assert(removed.join(sdA, Seq("doc_id"), "left_semi").count() > 0,
        "notice names no shard-A docs — composition commutes, law weak")
      // Delta path.
      assert(LlmPipeline.commitAdmissionDeltas(
        spark, plA.toString, logA, sdA, seA, sfDir, pqRoot, "a")._1)
      assert(LlmPipeline.commitTakedownTombstones(
        spark, plA.toString, logA, removed, "t")._1)
      assert(LlmPipeline.commitAdmissionDeltas(
        spark, plA.toString, logA, sdB, seB, sfDir, pqRoot, "b")._1)
      // Rewrite path, same order.
      assert(LlmPipeline.commitAdmissionGeneration(
        spark, plB.toString, logB, sdA, seA, sfDir, pqRoot, "a")._1)
      assert(LlmPipeline.commitTakedownGeneration(
        spark, plB.toString, logB, removed, "t")._1)
      assert(LlmPipeline.commitAdmissionGeneration(
        spark, plB.toString, logB, sdB, seB, sfDir, pqRoot, "b")._1)
      val mD = SqlGateway.occManifestAt(logA, 3L)
      val mR = SqlGateway.occManifestAt(logB, 3L)
      def resD(p: String) = PlaneChains.resolve(spark, p, mD(p))
      def rewr(p: String) = spark.read.parquet(mR(p))
      Seq("postings", "positions", "docstats", "shingles", "bands",
          "ann_keys", "ann_vecs", "pq_cells", "pq_codes", "pairs",
          "labels", "reps").foreach { p =>
        assert(rowsEqual(resD(p), rewr(p)),
          s"3-transaction chain resolve != rewrite composition on plane $p")
      }
      assert(resD("stats").head() == rewr("stats").head(),
        "3-transaction chain stats != rewrite composition")
      assert(indexEqual(resD("index"), rewr("index")),
        "3-transaction chain index != rewrite composition")
      // And compacting the 4-element chains is content-neutral.
      val (wonC, folded, genC) = LlmPipeline.compactManifest(
        spark, plA.toString, logA, "c")
      assert(wonC && folded == LlmPipeline.TakedownPlanes.size && genC == 4L)
      val mC = SqlGateway.occManifestAt(logA, 4L)
      Seq("postings", "labels", "reps").foreach { p =>
        assert(rowsEqual(PlaneChains.resolve(spark, p, mC(p)), resD(p)),
          s"compaction changed the resolved plane $p")
      }
    } finally Seq(logA, logB, plA, plB).foreach(LlmPipeline.deleteRecursively)
  }

  test("chain-length policy: the threshold commit inlines one compaction; post-trigger read equals pre-trigger read (r20 — VERDICT r19 item 3)") {
    import org.apache.spark.sql.functions._
    val logDir = Files.createTempDirectory("graft-pc-auto-log-")
    val planes = Files.createTempDirectory("graft-pc-auto-pl-")
    try {
      LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logDir)
      val removed = LlmPipeline.takedownDocSet(spark, sfDir).localCheckpoint()
      val n = LlmPipeline.ChainCompactThreshold // commit k leaves k+1 elements
      // Commits 1..n-1: chains stay at or below the threshold — no
      // trigger, one generation per commit.
      (1 until n).foreach { k =>
        val (won, _) = LlmPipeline.commitTakedownTombstones(
          spark, planes.toString, logDir, removed, s"t$k")
        assert(won)
        assert(SqlGateway.occCurrentGen(logDir) == k.toLong,
          s"auto-compaction fired below the threshold at commit $k")
      }
      val mPre = SqlGateway.occManifestAt(logDir, (n - 1).toLong)
      assert(PlaneChains.parse("postings", mPre("postings")).size == n,
        "chain length drifted from one element per commit")
      val pre = PlaneChains.resolve(spark, "postings", mPre("postings"))
        .localCheckpoint()
      // Commit n: the resulting chain exceeds the threshold — the
      // commit itself lands as generation n and the inlined compaction
      // as generation n+1, folding every chain to one element.
      val (won, _) = LlmPipeline.commitTakedownTombstones(
        spark, planes.toString, logDir, removed, s"t$n")
      assert(won)
      assert(SqlGateway.occCurrentGen(logDir) == (n + 1).toLong,
        "threshold commit did not inline a compaction")
      val mPost = SqlGateway.occManifestAt(logDir, (n + 1).toLong)
      LlmPipeline.TakedownPlanes.foreach(p =>
        assert(PlaneChains.parse(p, mPost(p)).size == 1,
          s"auto-compaction left plane $p unfolded"))
      // Read-equivalence across the trigger: the replayed notice is a
      // resolved no-op, so pre-trigger == post-trigger reads.
      val post = PlaneChains.resolve(spark, "postings", mPost("postings"))
      assert(pre.exceptAll(post).isEmpty && post.exceptAll(pre).isEmpty,
        "post-trigger read != pre-trigger read")
    } finally Seq(logDir, planes).foreach(LlmPipeline.deleteRecursively)
  }

  test("ordering: t-then-u serves a re-added doc, u-then-t does not (the non-commuting pair the fold preserves)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-pc-ord-")
    try {
      val base = Seq((1L, "a", 2L, 4L), (2L, "b", 1L, 3L))
        .toDF("doc_id", "token", "tf", "dl")
      val readd = Seq((1L, "a", 2L, 4L)).toDF("doc_id", "token", "tf", "dl")
      val tomb = Seq(Tuple1(1L)).toDF("doc_id")
      base.write.parquet(s"$root/g0")
      readd.write.parquet(s"$root/g1")
      tomb.write.parquet(s"$root/t0")
      val tu = s"$root/g0;t:$root/t0;u:$root/g1" // takedown then re-admit
      val ut = s"$root/g0;u:$root/g1;t:$root/t0" // admit then takedown
      val rTu = PlaneChains.resolve(spark, "postings", tu)
      val rUt = PlaneChains.resolve(spark, "postings", ut)
      assert(rTu.filter(col("doc_id") === 1L).count() == 1,
        "takedown-then-admit must serve the re-added doc")
      assert(rUt.filter(col("doc_id") === 1L).count() == 0,
        "admit-then-takedown must not serve the doc")
    } finally LlmPipeline.deleteRecursively(root)
  }

  test("vacuum retains every chain element: an uncompacted delta generation survives, orphans do not") {
    import spark.implicits._
    val logDir = Files.createTempDirectory("graft-pc-vac-log-")
    val planes = Files.createTempDirectory("graft-pc-vac-pl-")
    try {
      val d0 = Seq((1L, 10L)).toDF("doc_id", "dl")
      val d1 = Seq((2L, 20L)).toDF("doc_id", "dl")
      d0.write.parquet(s"$planes/docstats/gen-base")
      d1.write.parquet(s"$planes/docstats/gen-delta")
      // An orphan a loser staged but never bound:
      d1.write.parquet(s"$planes/docstats/gen-orphan")
      assert(SqlGateway.occTryCommitManifest(logDir, -1L,
        Seq("docstats" -> s"$planes/docstats/gen-base")))
      assert(SqlGateway.occTryCommitManifest(logDir, 0L, Seq("docstats" ->
        s"$planes/docstats/gen-base;u:$planes/docstats/gen-delta")))
      val (expired, orphans) =
        SqlGateway.vacuumManifestLog(logDir, planes, retainFrom = 1L)
      assert(expired == 1 && orphans == 1,
        s"expected (1 manifest, 1 orphan), got ($expired, $orphans)")
      assert(java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$planes/docstats/gen-delta")),
        "vacuum deleted a retained chain's delta generation")
      val m = SqlGateway.occManifestAt(logDir, 1L)
      assert(PlaneChains.resolve(spark, "docstats", m("docstats")).count() == 2)
    } finally Seq(logDir, planes).foreach(LlmPipeline.deleteRecursively)
  }
}
