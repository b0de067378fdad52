package graft

import graft.queries.LlmPipeline

/** q190 conjunctive BM25 + WAND-style pruning (r15 — VERDICT r14
  * item 5). The oracle hash-checks the pruned ranking against the
  * from-scratch UNPRUNED conjunctive ranking, so the cross-engine law
  * already embeds losslessness; this spec pins the two Spark-side
  * halves the oracle cannot see:
  *
  *   - pruned == unpruned WITHIN Spark (the threshold argument holds
  *     on the real data: every true top-10 doc's optimistic bound
  *     clears θ);
  *   - the bound genuinely DROPS candidates — pruning that never fires
  *     would make the "WAND-style" claim decorative.
  */
class Bm25WandSpec extends SparkSpec {

  test("q190: pruned ranking == unpruned exact ranking; pruning drops candidates") {
    val pruned = LlmPipeline.bm25ConjunctiveCfg(spark, sfDir, prune = true)
      .collect().map(_.toString).toSeq
    val exact = LlmPipeline.bm25ConjunctiveCfg(spark, sfDir, prune = false)
      .collect().map(_.toString).toSeq
    assert(pruned == exact,
      s"WAND pruning changed the ranking (${pruned.size} vs ${exact.size} rows)")
    assert(pruned.nonEmpty, "conjunctive retrieval returned no rows — fixture degenerate")
    val (all, survivors) = LlmPipeline.bm25ConjunctiveCandidates(spark, sfDir)
    val nAll = all.count(); val nSurv = survivors.count()
    assert(nSurv < nAll,
      s"upper-bound pruning dropped nothing ($nSurv of $nAll candidates kept)")
    assert(nSurv >= 10,
      s"pruning kept fewer candidates than a top-10 needs ($nSurv)")
  }

  test("q192: MAXSCORE-pruned disjunctive ranking == unpruned; essential lists are a strict cut") {
    val pruned = LlmPipeline.bm25DisjunctiveCfg(spark, sfDir, prune = true)
      .collect().map(_.toString).toSeq
    val exact = LlmPipeline.bm25DisjunctiveCfg(spark, sfDir, prune = false)
      .collect().map(_.toString).toSeq
    assert(pruned == exact,
      s"MAXSCORE pruning changed the disjunctive ranking (${pruned.size} vs ${exact.size} rows)")
    assert(pruned.nonEmpty, "disjunctive retrieval returned no rows — fixture degenerate")
    val (all, surv) = LlmPipeline.bm25DisjunctiveCandidates(spark, sfDir)
    val nAll = all.count(); val nSurv = surv.count()
    assert(nSurv < nAll,
      s"essential-list pruning dropped nothing ($nSurv of $nAll candidates kept) — " +
        "on stopword-grade ubs at least one slot must go non-essential")
    assert(nSurv >= 10, s"pruning kept fewer candidates than a top-10 needs ($nSurv)")
  }

  test("q213: external batch with an OOV term — df=0 slot contributes nothing, pruning stays lossless, in-vocab slot still ranks") {
    // The real-request edge (VERDICT r18 item 7): every other
    // retrieval batch derives its terms from the stored index, so no
    // df=0 slot can occur; q213's query 3 carries 'zzqxv'.
    val root = LlmPipeline.ensurePostingsArtifact(spark, sfDir)
    val matched = LlmPipeline.externalMatchedFrom(spark,
      spark.read.parquet(LlmPipeline.ensureIndexArtifact(spark, sfDir)),
      spark.read.parquet(s"$root/postings"),
      spark.read.parquet(s"$root/stats"))
    import org.apache.spark.sql.functions.col
    // The OOV slot matches NOTHING: no posting row, no ub row, no
    // contribution — by construction, not by accident.
    assert(matched.filter(col("query_id") === 3 && col("tr") === 2).isEmpty,
      "OOV slot produced matched rows")
    assert(matched.filter(col("df") === 0).isEmpty,
      "a df=0 term leaked into the matched relation")
    // Pruning with a boundless slot absent from the ub census stays
    // lossless — the MAXSCORE split must not crash or over-prune.
    val pruned = LlmPipeline.bm25DisjunctiveRank(spark, matched, prune = true)
      .collect().map(_.toString).toSeq
    val exact = LlmPipeline.bm25DisjunctiveRank(spark, matched, prune = false)
      .collect().map(_.toString).toSeq
    assert(pruned == exact,
      s"MAXSCORE pruning changed the OOV-batch ranking (${pruned.size} vs ${exact.size})")
    // Query 3 still ranks on its in-vocabulary slot alone.
    val q3 = LlmPipeline.externalTermsRetrieval(spark, sfDir)
      .filter(col("query_id") === 3)
    assert(q3.count() == 10, "OOV query lost its in-vocab slot's results")
  }

  test("q216: OOV slot in an AND query makes the conjunction provably empty; pruning on the in-vocab query stays lossless") {
    // VERDICT r19 item 4: the df=0 edge in the BMW bound machinery. An
    // AND query with a term no doc contains can match nothing — the
    // rarest-slot candidate list is empty by construction — while the
    // all-in-vocab query must still rank a full top-10 under pruning.
    import org.apache.spark.sql.functions.col
    val root = LlmPipeline.ensurePostingsArtifact(spark, sfDir)
    val matched = LlmPipeline.externalMatchedFrom(spark,
      spark.read.parquet(LlmPipeline.ensureIndexArtifact(spark, sfDir)),
      spark.read.parquet(s"$root/postings"),
      spark.read.parquet(s"$root/stats"), LlmPipeline.ExternalConjTerms)
    assert(matched.filter(col("query_id") === 2 && col("tr") === 3).isEmpty,
      "the OOV slot produced matched rows")
    val pruned = LlmPipeline.bm25ConjunctiveRank(matched, prune = true)
      .collect().map(_.toString).toSeq
    val exact = LlmPipeline.bm25ConjunctiveRank(matched, prune = false)
      .collect().map(_.toString).toSeq
    assert(pruned == exact,
      s"pruning changed the external conjunctive ranking (${pruned.size} vs ${exact.size})")
    val res = LlmPipeline.externalConjunctiveRetrieval(spark, sfDir)
    assert(res.filter(col("query_id") === 2).isEmpty,
      "a conjunction containing an OOV term served results")
    assert(res.filter(col("query_id") === 1).count() == 10,
      "the in-vocab conjunction lost its top-10")
    assert(res.select("oov_conjunction_empty").head().getBoolean(0))
  }

  test("q217/q218: an OOV word empties its phrase and its fused query; in-vocab queries rank normally") {
    import org.apache.spark.sql.functions.col
    val ph = LlmPipeline.externalPhraseRetrieval(spark, sfDir)
    assert(ph.filter(col("query_id") === 3).isEmpty,
      "a phrase containing an OOV word matched documents")
    assert(ph.filter(col("query_id") === 1).count() > 0 &&
      ph.filter(col("query_id") === 2).count() > 0,
      "in-vocab external phrases matched nothing — fixture degenerate")
    val fr = LlmPipeline.externalFusedRank(spark, sfDir)
    assert(fr.filter(col("query_id") === 3).isEmpty,
      "a fused conjunctive query with an OOV slot served results")
    assert(fr.filter(col("query_id") === 1).count() == 10 &&
      fr.filter(col("query_id") === 2).count() == 10,
      "in-vocab fused queries lost their top-10")
  }

  test("q219: hybrid fusion degrades per-leg under an OOV lexical term — the ANN leg still fills the fused top-10") {
    import org.apache.spark.sql.functions.col
    val res = LlmPipeline.externalHybridRrf(spark, sfDir)
    val q3 = res.filter(col("query_id") === 3)
    assert(q3.count() == 10,
      "the OOV lexical term must not shrink the fused top-10")
    // Query 3's lexical leg ranks on its in-vocab slot alone — it still
    // contributes (some fused row carries a non-zero lex_rank), and the
    // ANN leg is untouched (some row carries a non-zero ann_rank).
    assert(q3.filter(col("lex_rank") > 0).count() > 0,
      "query 3's in-vocab lexical slot contributed nothing")
    assert(q3.filter(col("ann_rank") > 0).count() > 0,
      "query 3's ANN leg contributed nothing")
  }

  test("q190: every result doc matches all three of its query's terms (conjunctive semantics)") {
    import org.apache.spark.sql.functions._
    val res = LlmPipeline.bm25Conjunctive(spark, sfDir)
    // Re-derive the query terms the same way and check containment on
    // the raw corpus — AND semantics, independently of the scorer.
    val docs = graft.sources.Tables.documents(spark, sfDir)
      .filter(col("doc_id") % 4 =!= 0)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    val rows = res.select("query_id", "doc_id").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    val idx = spark.read.parquet(
      LlmPipeline.ensureIndexArtifact(spark, sfDir))
    val terms = idx.select(col("token"), col("df"))
      .orderBy(col("df").desc, col("token").asc).limit(6)
      .collect().map(_.getString(0)).zipWithIndex
      .map { case (t, i) => ((i % 2) + 1, t) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val tokSets = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
    rows.foreach { case (q, d) =>
      assert(terms(q).subsetOf(tokSets(d)),
        s"doc $d in query $q's top-10 misses a conjunctive term")
    }
  }

  /** q209 (r18 — VERDICT r17 item 6): the q190 pruning composed with
    * q204's fused round(bm25, 4) + integer-boost key. The bound
    * argument survives fusion because the boost is bounded by the
    * bucket table (≤ ProximityWindow), so the prune line is
    * θ − ProximityWindow − RankRoundSlack.
    */
  test("q209: WAND-pruned fused proximity ranking == unpruned q204; pruning drops candidates") {
    val pruned = LlmPipeline.proximityWandRank(spark, sfDir)
      .collect().map(_.toString).toSeq
    val exact = LlmPipeline.proximityBoostedRank(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(pruned == exact,
      s"fused-key pruning changed the proximity-boosted ranking " +
        s"(${pruned.size} vs ${exact.size} rows)")
    assert(pruned.nonEmpty, "fused retrieval returned no rows — fixture degenerate")
    val (all, survivors) = LlmPipeline.proximityWandCandidates(spark, sfDir)
    val nAll = all.count(); val nSurv = survivors.count()
    assert(nSurv < nAll,
      s"fused upper-bound pruning dropped nothing ($nSurv of $nAll candidates kept)")
    assert(nSurv >= 10,
      s"pruning kept fewer candidates than a top-10 needs ($nSurv)")
  }
}
