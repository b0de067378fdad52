package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline
import graft.sources.Tables

/** Index-side takedown maintenance (r16 — VERDICT r15 item 1): the
  * batch-plane laws behind q193/q194/q195 plus the ANN planes the
  * oracles can't reach. The binding law everywhere is
  * DELETE-THEN-READ == REBUILD-WITHOUT-DOCS, as exact row equality:
  *
  *   - postings / positions / docstats: anti-join == `postingsFor` /
  *     `positionalPostingsFor` of the surviving corpus (the q188
  *     row-union law run backward);
  *   - stats: subtraction == recount;
  *   - head index: subtractive df + head REFILL == the q149 rebuild
  *     (the refill matters — a capped min-k head that lost a member
  *     must surface the next-smallest surviving doc);
  *   - ANN keys/vecs: anti-join == rebuild over surviving embeddings
  *     (uncapped planes, so equality is exact), and the PROBE
  *     decisions against the maintained artifacts equal those against
  *     the rebuilt ones — takedown preserves every read, not just
  *     every row;
  *   - the q193 ranking never serves a removed doc.
  */
class IndexDeleteSpec extends SparkSpec {

  private def rowsEqual(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("postings-family takedown == rebuild-without-docs on all four axes + stats; ranking stops serving removed docs") {
    val root = LlmPipeline.ensurePostingsArtifact(spark, sfDir)
    val idxPath = LlmPipeline.ensureIndexArtifact(spark, sfDir)
    val removed = LlmPipeline.takedownDocSet(spark, sfDir)
    assert(removed.count() > 0, "fixture takedown closure is empty — law vacuous")
    val (idx, postings, positions, docstats, stats) =
      LlmPipeline.applyIndexTakedown(spark, root, idxPath, removed)

    val kept = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 =!= 0)
      .join(removed, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    val (rp, rd, rs) = LlmPipeline.postingsFor(kept)
    assert(rowsEqual(postings, rp), "maintained postings != rebuild")
    assert(rowsEqual(positions, LlmPipeline.positionalPostingsFor(kept)),
      "maintained positions != rebuild")
    assert(rowsEqual(docstats, rd), "maintained docstats != rebuild")
    assert(stats.head() == rs.head(), "subtracted stats != recount")

    // Head refill: the maintained index equals the q149 rebuild over
    // the survivors, heads included — and at least one affected
    // token's head must actually have CHANGED (otherwise the refill
    // path is untested on this fixture).
    val minK = udaf(new graft.functions.Udafs.MinKLongs(LlmPipeline.PostingsHeadCap))
    val rIdx = kept
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .groupBy("token")
      .agg(count(lit(1)).as("df"), minK(col("doc_id")).as("head_ids"))
    def flat(d: DataFrame): DataFrame = d.select(col("token"), col("df"),
      expr("array_join(transform(head_ids, x -> cast(x as string)), ',')").as("h"))
    assert(rowsEqual(flat(idx), flat(rIdx)), "maintained head index != rebuild")
    val changedHeads = flat(idx).alias("n")
      .join(flat(spark.read.parquet(idxPath)).alias("o"), Seq("token"))
      .filter(col("n.h") =!= col("o.h")).count()
    assert(changedHeads > 0,
      "no head changed under the takedown — the refill path is vacuous here")

    // The ranking law: no removed doc is served post-takedown.
    val served = LlmPipeline.indexTakedown(spark, sfDir)
      .join(removed, Seq("doc_id"), "left_semi").count()
    assert(served == 0, s"post-takedown ranking still serves $served removed docs")

    // The PRUNED read path too (VERDICT r15 item 1 named q181 AND
    // q190): the Block-Max-WAND conjunctive pipeline over the
    // maintained artifacts equals the same pipeline over rebuilt-
    // without-docs artifacts — pruning bounds, θ seeding and the pivot
    // all survive the subtractive maintenance — and serves no removed
    // doc.
    val rIdxDf = kept
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val wandMaintained = LlmPipeline.bm25ConjunctiveRank(
      LlmPipeline.bm25ConjunctiveMatchedFrom(idx, postings, stats))
    val wandRebuilt = LlmPipeline.bm25ConjunctiveRank(
      LlmPipeline.bm25ConjunctiveMatchedFrom(rIdxDf, rp, rs))
    assert(rowsEqual(wandMaintained, wandRebuilt),
      "post-takedown pruned conjunctive ranking != rebuilt-corpus ranking")
    assert(wandMaintained.join(removed, Seq("doc_id"), "left_semi").count() == 0,
      "post-takedown pruned ranking still serves removed docs")

    // And the DISJUNCTIVE (MAXSCORE) read path (VERDICT r16 item 3):
    // its pruning machinery — per-slot upper bounds, the θ seed, the
    // greedy essential-list split — also shifts under subtractive
    // df/stats maintenance, so the law must run the PRUNED q192
    // pipeline, not just the exact scores: over the maintained
    // artifacts it must equal the same pipeline over rebuilt-without-
    // docs artifacts, and serve no removed doc.
    val maxscoreMaintained = LlmPipeline.bm25DisjunctiveRank(
      spark, LlmPipeline.bm25ConjunctiveMatchedFrom(idx, postings, stats))
    val maxscoreRebuilt = LlmPipeline.bm25DisjunctiveRank(
      spark, LlmPipeline.bm25ConjunctiveMatchedFrom(rIdxDf, rp, rs))
    assert(rowsEqual(maxscoreMaintained, maxscoreRebuilt),
      "post-takedown pruned disjunctive ranking != rebuilt-corpus ranking")
    assert(maxscoreMaintained.join(removed, Seq("doc_id"), "left_semi").count() == 0,
      "post-takedown pruned disjunctive ranking still serves removed docs")
  }

  test("band-index takedown: shingles anti-join == rebuild exactly; bands == re-band of maintained shingles below cap") {
    val (bandsPath, shinglesPath) = LlmPipeline.ensureBandIndex(spark, sfDir)
    val removed = LlmPipeline.takedownDocSet(spark, sfDir)
    val (bands, sh) = LlmPipeline.applyBandTakedown(spark, bandsPath, shinglesPath, removed)
    // Shingle plane: uncapped pure per-doc rows — anti-join IS the
    // rebuild (stored shingles == per-doc function of text, so
    // filtering docs == recomputing over survivors).
    val shStored = spark.read.parquet(shinglesPath)
    assert(rowsEqual(sh,
      shStored.join(removed, Seq("doc_id"), "left_anti")
        .select(shStored.columns.map(col).toSeq: _*)),
      "maintained shingles != rebuild")
    // Cap precondition: the equality law below needs every AFFECTED
    // bucket (one that held a removed doc) below the write-time cap —
    // at cap, the rebuild would admit the member the cap evicted,
    // whose band rows the maintained index never stored. Assert the
    // fixture satisfies it so the law is tested non-vacuously.
    val storedBands = spark.read.parquet(bandsPath)
    val affectedAtCap = storedBands
      .join(storedBands.join(removed, Seq("doc_id"), "left_semi")
        .select("band", "bsig").distinct(), Seq("band", "bsig"), "left_semi")
      .groupBy("band", "bsig").agg(count(lit(1)).as("n"))
      .filter(col("n") >= LlmPipeline.LshBucketCap).count()
    assert(affectedAtCap == 0,
      s"$affectedAtCap affected buckets at cap — the equality law does not apply; " +
        "below-cap fixture structure changed")
    // Band plane: below cap, the maintained index equals the band
    // index REBUILT from the maintained shingle table.
    assert(rowsEqual(bands, LlmPipeline.cappedBandIndex(sh)),
      "maintained band index != re-band of the maintained shingles")
    // And it never serves a removed doc.
    assert(bands.join(removed, Seq("doc_id"), "left_semi").count() == 0,
      "band index still serves removed docs")
  }

  test("PQ takedown: cells/codes anti-join == re-encode of survivors under the fixed codebooks; reads stop serving removed vectors") {
    import spark.implicits._
    val root = LlmPipeline.ensurePqIndex(spark, sfDir)
    val removed = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 9 === 2 && col("vec_id") >= 16)
      .select("vec_id")
    assert(removed.count() > 0, "fixture PQ removal set empty — law vacuous")
    val (cells, codes) = LlmPipeline.applyPqTakedown(spark, root, removed)
    // Codes/cells are pure per-vector functions of the FIXED nightly
    // codebooks — the anti-join must equal re-encoding the survivors
    // under the same codebooks (retraining is the nightly build's job,
    // the q161 admission-window story).
    val survivors = Tables.embeddings(spark, sfDir)
      .join(removed, Seq("vec_id"), "left_anti")
    val q = survivors.select(col("vec_id"), expr(
      "transform(embedding, x -> cast(floor(cast(x as double) * 65536.0) as bigint))").as("qd"))
    val coarse = spark.read.parquet(
      LlmPipeline.ensureIvfCodebookK(spark, sfDir, LlmPipeline.PqCoarseK))
    val subcb = spark.read.parquet(s"$root/subcb")
    assert(rowsEqual(cells, LlmPipeline.ivfAssign(q, coarse)),
      "maintained PQ cells != re-encode of survivors")
    // The stored plane is the packed 4-byte layout (r17) — the law
    // compares packed-to-packed, byte columns included.
    assert(rowsEqual(codes,
      LlmPipeline.packPqCodes(
        LlmPipeline.pqAssign(LlmPipeline.pqSubVecs(q), subcb)
          .withColumnRenamed("cell", "code"))),
      "maintained PQ codes != re-encode of survivors")
    // Read closure: the compressed query against the maintained planes
    // equals the query against planes rebuilt from survivors, and it
    // never surfaces a removed vector.
    val t = java.nio.file.Files.createTempDirectory("graft_pqdel")
    try {
      cells.write.parquet(t.resolve("cells").toString)
      codes.write.parquet(t.resolve("codes").toString)
      copyDir(java.nio.file.Paths.get(root, "subcb"), t.resolve("subcb"))
      val got = LlmPipeline.ivfPqAnnAgainst(spark, sfDir, t.toString)
      assert(got.join(removed.withColumnRenamed("vec_id", "c_id"),
        Seq("c_id"), "left_semi").count() == 0,
        "post-takedown PQ read still serves removed vectors")
    } finally LlmPipeline.deleteRecursively(t)
  }

  test("hybrid RRF read closure under takedown: fusion over maintained planes (both legs) == over rebuilt planes; no removed id served") {
    // q196 composes BOTH index families, so its takedown closure needs
    // BOTH legs maintained at once — a subtractive-maintenance bug on
    // either side shifts a leg ranking and with it the fusion.
    graft.functions.NativeFunctions.register(spark)
    val root = LlmPipeline.ensurePostingsArtifact(spark, sfDir)
    val removed = LlmPipeline.takedownDocSet(spark, sfDir).localCheckpoint()
    val (idx, postings, _, _, stats) = LlmPipeline.applyIndexTakedown(
      spark, root, LlmPipeline.ensureIndexArtifact(spark, sfDir), removed)
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val remVec = removed.select(col("doc_id").as("vec_id"))
    val (keys, vecs) = LlmPipeline.applyAnnTakedown(spark, keysPath, vecsPath, remVec)
    // Rebuilt-from-survivors relations for both legs.
    val kept = Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 =!= 0)
      .join(removed, Seq("doc_id"), "left_anti")
      .select("doc_id", "text")
    val (rp, _, rs) = LlmPipeline.postingsFor(kept)
    val rIdxDf = kept
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
      .distinct()
      .groupBy("token").agg(count(lit(1)).as("df"))
    val survivors = Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") % 4 =!= 0)
      .join(remVec, Seq("vec_id"), "left_anti")
    val rVecs = LlmPipeline.mpVecsFor(survivors)
    val rKeys = LlmPipeline.mpKeysFor(rVecs, LlmPipeline.MpBits)
    val t = java.nio.file.Files.createTempDirectory("graft_rrfdel")
    try {
      def dump(df: DataFrame, name: String): String = {
        val p = t.resolve(name).toString
        df.write.parquet(p); p
      }
      val fusedMaintained = LlmPipeline.hybridRrfFrom(spark, sfDir,
        idx, postings, stats, dump(keys, "mk"), dump(vecs, "mv"))
        .localCheckpoint()
      val fusedRebuilt = LlmPipeline.hybridRrfFrom(spark, sfDir,
        rIdxDf, rp, rs, dump(rKeys, "rk"), dump(rVecs, "rv"))
      assert(rowsEqual(fusedMaintained, fusedRebuilt),
        "post-takedown fused ranking != rebuilt-corpus fused ranking")
      assert(fusedMaintained.join(removed, Seq("doc_id"), "left_semi").count() == 0,
        "post-takedown fusion still serves removed docs")
      // Non-vacuity: the takedown must actually have MOVED the fusion
      // relative to the pre-delete stored planes.
      assert(!rowsEqual(fusedMaintained, LlmPipeline.hybridRrf(spark, sfDir)),
        "takedown changed no fused row — removal set too small to test the closure")
    } finally LlmPipeline.deleteRecursively(t)
  }

  test("CC-plane takedown: maintained labeling == CC rebuilt from the survivor corpus (VERDICT r16 item 2)") {
    graft.functions.NativeFunctions.register(spark)
    val labels = spark.read.parquet(LlmPipeline.ensureCcArtifact(spark, sfDir))
    val pairs = LlmPipeline.lshPairGraph(spark, sfDir).select("id1", "id2")
      .filter(col("id1") % 4 =!= 0 && col("id2") % 4 =!= 0)
    val removed = LlmPipeline.takedownDocSet(spark, sfDir)
    // Non-vacuity: the notice must touch at least one stored component.
    val affected = labels.join(removed.select(col("doc_id").as("id")),
      Seq("id"), "left_semi").count()
    assert(affected > 0, "takedown touches no clustered doc — law vacuous")
    val maintained = LlmPipeline.applyCcTakedown(labels, pairs, removed)
    // Rebuild: CC over the surviving-corpus edge set (an edge is a
    // pure function of its endpoints, so filtering removed endpoints
    // IS the survivor pair graph).
    val survPairs = pairs
      .join(removed.select(col("doc_id").as("id1")), Seq("id1"), "left_anti")
      .join(removed.select(col("doc_id").as("id2")), Seq("id2"), "left_anti")
      .select("id1", "id2")
    val rebuilt = LlmPipeline.minLabelComponents(
      survPairs.union(survPairs.select(col("id2").as("id1"), col("id1").as("id2"))))
    assert(rowsEqual(maintained, rebuilt.select("id", "label")),
      "maintained labeling != survivor-corpus CC rebuild")
    assert(maintained.join(removed.select(col("doc_id").as("id")),
      Seq("id"), "left_semi").count() == 0,
      "maintained labeling still labels removed docs")
  }

  test("CC takedown semantics on a synthetic chain: split into fragments, min-label re-elected, singletons dropped, untouched kept") {
    import spark.implicits._
    // Chain 1-2-3-4-5 plus the untouched pair 6-7. The stored labeling
    // is the min-label fixpoint: {1..5} -> 1, {6,7} -> 6.
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (6L, 7L))
      .toDF("id1", "id2")
    val edges = pairs.union(pairs.select(col("id2").as("id1"), col("id1").as("id2")))
    val labels = LlmPipeline.minLabelComponents(edges).localCheckpoint()
    def fold(rem: Seq[Long]): Map[Long, Long] =
      LlmPipeline.applyCcTakedown(labels, pairs, rem.toDF("doc_id"))
        .as[(Long, Long)].collect().toMap
    // Remove the bridge 3: the component SPLITS into {1,2} and {4,5} —
    // the second fragment needs a label (4) that never existed before,
    // which no label rewrite of the old state could produce.
    assert(fold(Seq(3L)) == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L,
      6L -> 6L, 7L -> 6L), "bridge removal must split the component")
    // Remove the min-label 1 AND interior 4: {2,3} re-elects label 2;
    // 5 loses its last edge and drops (a singleton is not a cluster
    // member — matching the rebuild); {6,7} is untouched verbatim.
    assert(fold(Seq(1L, 4L)) == Map(2L -> 2L, 3L -> 2L, 6L -> 6L, 7L -> 6L),
      "min-label re-election / singleton drop diverged")
  }

  test("ANN takedown: keys/vecs anti-join == rebuild over surviving embeddings; probe decisions preserved") {
    import spark.implicits._
    val (keysPath, vecsPath) = LlmPipeline.ensureMpAnnIndex(spark, sfDir)
    val standing = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 4 =!= 0)
    val removed = standing.filter(col("vec_id") % 9 === 2).select("vec_id")
    assert(removed.count() > 0, "fixture ANN removal set empty — law vacuous")

    val (keys, vecs) = LlmPipeline.applyAnnTakedown(spark, keysPath, vecsPath, removed)
    val survivors = standing.join(removed, Seq("vec_id"), "left_anti")
    val rVecs = LlmPipeline.mpVecsFor(survivors)
    val rKeys = LlmPipeline.mpKeysFor(rVecs, LlmPipeline.MpBits)
    assert(rowsEqual(keys, rKeys), "maintained ANN keys != rebuild")
    assert(rowsEqual(vecs, rVecs), "maintained ANN vecs != rebuild")

    // Read closure: probing the maintained artifacts == probing the
    // rebuilt ones, for the q174 shard batch. (Both sides go through
    // parquet so the probe runs against real artifacts.)
    val t = Files.createTempDirectory("graft_anndel")
    try {
      def dump(df: DataFrame, name: String): String = {
        val p = t.resolve(name).toString
        df.write.parquet(p); p
      }
      val batch = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
      val dm = LlmPipeline.annProbeDecisions(spark,
        dump(keys, "mk"), dump(vecs, "mv"), batch).orderBy("vec_id")
      val dr = LlmPipeline.annProbeDecisions(spark,
        dump(rKeys, "rk"), dump(rVecs, "rv"), batch).orderBy("vec_id")
      assert(rowsEqual(dm, dr), "probe decisions diverge after takedown")
      // Non-vacuity: the takedown must have changed SOME decision
      // relative to the pre-delete index (fewer corpus neighbors).
      val d0 = LlmPipeline.annProbeDecisions(spark, keysPath, vecsPath, batch)
      assert(!rowsEqual(dm, d0),
        "takedown changed no probe decision — removal set too small to test")
    } finally LlmPipeline.deleteRecursively(t)
  }
}
