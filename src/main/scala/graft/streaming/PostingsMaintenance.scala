package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.queries.LlmPipeline

/** Streaming maintenance of the read-side inverted-index artifact
  * plane (r15 — VERDICT r14 item 4): the q188/q189 per-crawl folds,
  * upgraded from a nightly batch job to a live ingest stream. Each
  * micro-batch of crawled documents lands one idempotent GENERATION of
  * the full-postings plane —
  *
  *   - `postings/batch_id=b`  — (token, doc_id, tf, dl) for the
  *     batch's docs,
  *   - `positions/batch_id=b` — the (token, doc_id, pos) positional
  *     axis (q191's phrase probes),
  *   - `docstats/batch_id=b`  — the batch's (doc_id, dl) sidecar rows,
  *   - `stats/batch_id=b`     — ONE row (nd, ndl, toktot) counting the
  *     batch,
  *
  * and the read side unions generations late. The fold laws are
  * exactly q188/q189's: postings and docstats fold by ROW UNION (doc
  * sets are disjoint across batches — the crawl-shard model — and a
  * posting row is a pure function of its own doc's text, so the union
  * of per-batch builds equals the one-shot build of the union,
  * byte-for-byte), and the one-row stats fold by PURE ADDITION. Both
  * are associative and commutative, so chunking, replay order, and
  * compaction grouping cannot change any merged read — the
  * [[SketchMaintenance]] argument with exact row algebra instead of
  * sketch algebra.
  *
  * Idempotency and crash-safety ride the shared generation
  * conventions: per-batch Overwrite generations (a replayed batch
  * rewrites an identical generation), `_SUCCESS`-gated reads
  * ([[Generations]]), compaction that writes the new base FIRST, skips
  * the refold when the target generation is already committed (a
  * leftover input then means the CLEANUP crashed, not the fold —
  * ADVICE r14), and deletes inputs LAST.
  *
  * Precondition (the q188 disjointness contract): a document arrives
  * WHOLE in exactly one batch — per-batch `dl` is then the document's
  * global `dl`. Re-crawled/updated docs are a changelog problem
  * (q156/q157's axis), not a fold problem, and are out of scope here
  * exactly as they are for the nightly q188 fold.
  *
  * Scale shape: per batch, one batch-sized tokenize + two batch-sized
  * aggregates + four batch-sized writes — cost tracks the BATCH,
  * never the accumulated index. Reads and folds touch base + bounded
  * tail. At cluster scale the postings generations land bucketBy
  * (token) so the late union stays bucket-pruned under a term
  * In-filter (the [[graft.queries.LlmPipeline.ensurePostingsArtifact]]
  * layout note applies to every generation).
  *
  * No oracle (streaming rows are spec-gated per the survey contract):
  * PostingsStreamSpec proves chunked == single-batch == the nightly
  * one-shot build (rows byte-equal), replay idempotency, compaction
  * equality + crash-mid-cleanup recovery, and the READ-SIDE closure
  * law — a q181 BM25 retrieval against the streamed artifacts equals
  * the retrieval against the stored batch-built artifacts.
  */
object PostingsMaintenance {

  private val Axes = Seq("postings", "docstats", "stats", "positions")

  private def genIds(dir: java.nio.file.Path, prefix: String = "batch_id="): Seq[Long] =
    Generations.genIds(dir, prefix)

  /** Batch generations under `indexDir` whose postings, docstats AND
    * stats writes all committed — the only ones reads and folds touch.
    */
  private def completeBatchGens(indexDir: String): Seq[Long] =
    Generations.completeGenIds(
      java.nio.file.Paths.get(indexDir, Axes.head))
      .filter(b => Axes.tail.forall(a => Generations.isComplete(
        java.nio.file.Paths.get(indexDir, a, s"batch_id=$b"))))

  /** Base generations whose three axis writes all committed. */
  private def completeBases(indexDir: String): Seq[Long] =
    Generations.completeGenIds(
      java.nio.file.Paths.get(indexDir, s"${Axes.head}_base"), "gen=")
      .filter(g => Axes.tail.forall(a => Generations.isComplete(
        java.nio.file.Paths.get(indexDir, s"${a}_base", s"gen=$g"))))

  /** One micro-batch's index generation: the exact postings triple of
    * the batch's documents, Overwrite into the batch's own directories
    * — a replay rewrites identical generations (tokenization is
    * deterministic), so at-least-once delivery cannot double-count.
    */
  private[graft] def commitPostingsBatch(
      spark: SparkSession, batch: DataFrame,
      indexDir: String, batchId: Long): Unit = {
    val (postings, dl, stats) = LlmPipeline.postingsFor(batch)
    postings.write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/postings/batch_id=$batchId")
    dl.write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/docstats/batch_id=$batchId")
    stats.write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/stats/batch_id=$batchId")
    // The positional axis (q191's phrase probes) folds by the same
    // row-union law — a position row is a pure function of its own
    // doc's text.
    LlmPipeline.positionalPostingsFor(batch).write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/positions/batch_id=$batchId")
  }

  /** Start the index-maintenance stream: `input` is a streaming
    * DataFrame of (doc_id, text); each micro-batch lands one idempotent
    * postings-triple generation under `indexDir`. `compactEvery = N > 0`
    * folds the tail at `batchId - 1` every Nth batch — the committed
    * predecessor, per the [[SketchMaintenance.start]] cadence
    * discipline (compacting the batch's own id would truncate the
    * state its own replay rewrites).
    */
  def start(
      spark: SparkSession, input: DataFrame,
      indexDir: String, checkpointDir: String,
      compactEvery: Int = 0,
      manifestLog: Option[java.nio.file.Path] = None): StreamingQuery =
    input.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0) {
          // Retention (r20 — VERDICT r19 item 7): the fold must not
          // delete any directory a recent manifest binds, so a reader
          // pinned to the head or the previous manifest still resolves
          // after the compaction; the superseded inputs become garbage
          // only once the manifests advance past them, and a LATER
          // compaction's cleanup reclaims them (the q208 discipline).
          compactPostings(spark, indexDir, batchId - 1,
            manifestLog.map(StreamManifest.retainedPaths).getOrElse(Set.empty))
          // Bind the fresh base immediately (ADVICE r19): the head
          // manifest must not spend the batch-write window naming a
          // superseded frontier.
          manifestLog.foreach(commitIndexManifest(indexDir, _))
        }
        commitPostingsBatch(spark, batch, indexDir, batchId)
        // Cross-plane manifest (r19 — VERDICT r18 item 3): bind all
        // four axes + tombstones to the frontier this batch completed,
        // in one CAS, so a manifest reader never composes a torn pair.
        manifestLog.foreach(commitIndexManifest(indexDir, _))
      }
      .start()

  /** CAS-commit a manifest binding every axis of the streamed index to
    * its complete-generation frontier at one instant — the q200
    * discipline at batch cadence ([[StreamManifest]]). Bindings use
    * the [[graft.queries.PlaneChains]] path grammar (bare `;`-joined
    * directories), so [[mergedIndexAt]] shares the chain parser.
    */
  private[graft] def commitIndexManifest(
      indexDir: String, logDir: java.nio.file.Path): Unit = {
    val baseGen = completeBases(indexDir).maxOption
    val tail = completeBatchGens(indexDir)
      .filter(b => baseGen.forall(b > _)).sorted
    val tombs = Generations.completeGenIds(
      java.nio.file.Paths.get(indexDir, "tombstones")).sorted
    def chain(axis: String): String =
      (baseGen.map(g => s"$indexDir/${axis}_base/gen=$g").toSeq ++
        tail.map(b => s"$indexDir/$axis/batch_id=$b")).mkString(";")
    StreamManifest.commit(logDir,
      Axes.map(a => a -> chain(a)) :+
        ("tombstones" ->
          tombs.map(t => s"$indexDir/tombstones/batch_id=$t").mkString(";")))
  }

  /** [[mergedIndex]] resolved from the latest committed stream
    * manifest instead of live directory listings: (postings, docstats,
    * stats, positions) composed from the ONE frontier a single batch
    * commit published — the torn-free cross-plane read
    * (StreamManifestSpec's polling law). Same read algebra as
    * [[mergedIndex]]: row axes late-union + tombstone anti-join, stats
    * summed then presence-keyed subtraction.
    */
  private[graft] def mergedIndexAt(
      spark: SparkSession, logDir: java.nio.file.Path)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val m = StreamManifest.current(logDir)
    def unioned(axis: String): DataFrame = {
      val dirs = graft.queries.PlaneChains.paths(m(axis))
      require(dirs.nonEmpty, s"stream manifest binds no $axis generations")
      dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
    }
    val summed = unioned("stats").agg(sum("nd").as("nd"),
      sum("ndl").as("ndl"), sum("toktot").as("toktot"))
    val tombDirs = graft.queries.PlaneChains.paths(m.getOrElse("tombstones", ""))
    if (tombDirs.isEmpty)
      (unioned("postings"), unioned("docstats"), summed, unioned("positions"))
    else {
      val tomb = spark.read.parquet(tombDirs: _*)
        .select("doc_id").distinct()
      def live(axis: String): DataFrame = {
        val u = unioned(axis)
        u.join(broadcast(tomb), Seq("doc_id"), "left_anti")
          .select(u.columns.map(col).toSeq: _*)
      }
      val corr = unioned("docstats")
        .join(broadcast(tomb), Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("nd_r"), coalesce(sum("dl"), lit(0L)).as("tok_r"))
      val stats = summed.crossJoin(broadcast(corr))
        .select((col("nd") - col("nd_r")).as("nd"),
          (col("ndl") - col("nd_r")).as("ndl"),
          (col("toktot") - col("tok_r")).as("toktot"))
      (live("postings"), live("docstats"), stats, live("positions"))
    }
  }

  /** One takedown generation on the DELETE axis (r16 — VERDICT r15
    * item 1's streamed form): `ids` is a (doc_id) removal set;
    * Overwrite into `tombstones/batch_id=<tombGen>`, so a replayed
    * takedown rewrites an identical generation and the read side's
    * global DISTINCT makes overlapping tombstones (the same doc named
    * by two notices) subtract-once. Tombstone generations use their
    * own id space — they are never folded into postings bases and
    * never consumed: compaction PURGES their rows physically, and the
    * read-side anti-join over already-purged ids is a no-op, so
    * re-application is idempotent by construction and no
    * applied/unapplied bookkeeping is needed (the crash-mid-cleanup
    * ambiguity that bookkeeping would create is exactly what the
    * design avoids). The axis is delete-set-sized — a takedown list,
    * not data.
    *
    * Contract (matches [[graft.queries.LlmPipeline.applyIndexTakedown]]'s
    * ⊆-population contract): tombstoned ids name docs already ingested
    * WITH ≥ 1 token — an index takedown targets indexed content. The
    * stats subtraction keys on the doc's docstats row, so a tombstone
    * for a never-ingested id is a harmless no-op on every plane.
    */
  private[graft] def commitTombstones(
      spark: SparkSession, ids: DataFrame,
      indexDir: String, tombGen: Long): Unit =
    ids.select("doc_id").write.mode(SaveMode.Overwrite)
      .parquet(s"$indexDir/tombstones/batch_id=$tombGen")

  /** Every committed tombstone id, deduplicated — None when the delete
    * axis is empty so the no-takedown read path stays join-free.
    */
  private def tombstoneIds(
      spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val gens = Generations.completeGenIds(
      java.nio.file.Paths.get(indexDir, "tombstones")).sorted
    if (gens.isEmpty) None
    else Some(spark.read.parquet(
      gens.map(b => s"$indexDir/tombstones/batch_id=$b"): _*)
      .select("doc_id").distinct())
  }

  /** The read side: (postings, docstats, stats) over the latest
    * committed base (if any) + every committed batch generation past
    * it. postings/docstats are the late row union; stats reduce to ONE
    * row by addition. Generations at or below the base are excluded
    * even if still on disk (a crashed cleanup's leftovers) — the base
    * already contains them. Committed tombstones apply at read time:
    * row axes by anti-join against the broadcast delete set, stats by
    * subtracting the still-present tombstoned docs' docstats cells
    * (docs a prior compaction already purged no longer match, so their
    * cells — already subtracted into the base — are not subtracted
    * twice).
    */
  private[graft] def mergedIndex(
      spark: SparkSession, indexDir: String)
      : (DataFrame, DataFrame, DataFrame, DataFrame) = {
    val baseGen = completeBases(indexDir).maxOption
    val tail = completeBatchGens(indexDir)
      .filter(b => baseGen.forall(b > _)).sorted
    def unioned(axis: String): DataFrame = {
      val parts =
        baseGen.map(g => spark.read.parquet(s"$indexDir/${axis}_base/gen=$g")).toSeq ++
          (if (tail.isEmpty) Seq.empty
           else Seq(spark.read.parquet(
             tail.map(b => s"$indexDir/$axis/batch_id=$b"): _*)))
      require(parts.nonEmpty, s"mergedIndex: no $axis generations under $indexDir")
      parts.reduce(_ unionByName _)
    }
    val summed = unioned("stats").agg(sum("nd").as("nd"), sum("ndl").as("ndl"),
      sum("toktot").as("toktot"))
    tombstoneIds(spark, indexDir) match {
      case None =>
        (unioned("postings"), unioned("docstats"), summed, unioned("positions"))
      case Some(tomb) =>
        // The USING-join moves doc_id to the front; re-select the
        // axis's own column order (readers union/compare positionally).
        def live(axis: String): DataFrame = {
          val u = unioned(axis)
          u.join(broadcast(tomb), Seq("doc_id"), "left_anti")
            .select(u.columns.map(col).toSeq: _*)
        }
        val corr = unioned("docstats")
          .join(broadcast(tomb), Seq("doc_id"), "left_semi")
          .agg(count(lit(1)).as("nd_r"), coalesce(sum("dl"), lit(0L)).as("tok_r"))
        val stats = summed.crossJoin(broadcast(corr))
          .select((col("nd") - col("nd_r")).as("nd"),
            (col("ndl") - col("nd_r")).as("ndl"),
            (col("toktot") - col("tok_r")).as("toktot"))
        (live("postings"), live("docstats"), stats, live("positions"))
    }
  }

  /** BM25 ranked retrieval against the STREAMED artifacts — the q181
    * read path with the streamed triple in place of the stored one.
    * Term selection derives (token, df) from the merged postings (df =
    * posting rows per token — one row per (token, doc)), so the
    * streamed plane is self-sufficient; PostingsStreamSpec's closure
    * law pins this ranking equal to
    * [[graft.queries.LlmPipeline.bm25Retrieval]] over the same corpus.
    */
  private[graft] def bm25AgainstStream(
      spark: SparkSession, indexDir: String): DataFrame = {
    val (postings, _, stats, _) = mergedIndex(spark, indexDir)
    val idx = postings.groupBy("token").agg(count(lit(1)).as("df"))
    LlmPipeline.bm25AgainstArtifacts(idx, postings, stats)
  }

  /** Fold the current base (if any) and every committed generation
    * ≤ upTo into one new base per axis — write-first, committed-target
    * skip (ADVICE r14), inputs deleted last. postings/docstats fold by
    * plain row union (disjoint doc sets — no distinct needed, and none
    * wanted: the row multiset must stay byte-equal to the one-shot
    * build); stats fold to one summed row.
    */
  private[graft] def compactPostings(
      spark: SparkSession, indexDir: String, upTo: Long,
      retained: Set[java.nio.file.Path] = Set.empty): Unit = {
    val allOldBase = Axes.flatMap(a => genIds(
      java.nio.file.Paths.get(indexDir, s"${a}_base"), "gen="))
      .distinct.filter(_ < upTo)
    val oldBase = completeBases(indexDir).filter(_ < upTo)
    val foldIds = completeBatchGens(indexDir)
      .filter(b => b <= upTo && oldBase.maxOption.forall(b > _)).sorted
    val staleIds = Axes.flatMap(a => genIds(
      java.nio.file.Paths.get(indexDir, a))).distinct.filter(_ <= upTo).sorted
    // Retention (VERDICT r19 item 7): a superseded directory a recent
    // manifest still binds is NOT garbage — readers pinned to those
    // manifests resolve it. It stays on disk (excluded from reads by
    // the baseGen frontier filter) until a later compaction runs with
    // manifests that no longer bind it.
    def reclaim(p: java.nio.file.Path): Unit =
      if (!retained.contains(p.toAbsolutePath.normalize))
        LlmPipeline.deleteRecursively(p)
    def cleanup(): Unit = {
      staleIds.foreach(b => Axes.foreach(a => reclaim(
        java.nio.file.Paths.get(indexDir, a, s"batch_id=$b"))))
      allOldBase.foreach(g => Axes.foreach(a => reclaim(
        java.nio.file.Paths.get(indexDir, s"${a}_base", s"gen=$g"))))
    }
    if (Axes.forall(a => Generations.isComplete(
        java.nio.file.Paths.get(indexDir, s"${a}_base", s"gen=$upTo")))) {
      // All three axis bases at upTo committed with inputs still on
      // disk: a prior fold crashed mid-CLEANUP — the fold is complete.
      // Keep it; only finish the cleanup (refolding from the
      // partially-deleted inputs would truncate the index — ADVICE r14).
      cleanup()
      return
    }
    if (oldBase.isEmpty && foldIds.isEmpty)
      throw new IllegalStateException(
        s"compactPostings: nothing to fold at or below $upTo under $indexDir")
    // Refuse to fold past a possibly-in-flight batch (ADVICE r15): a
    // partial generation in (oldBase, upTo] may be a crashed batch a
    // stream replay rewrites at the same id; committing this base and
    // deleting the partial would strand the rewrite below baseGen.
    Generations.requireNoInflight(
      Axes.map(a => java.nio.file.Paths.get(indexDir, a)),
      oldBase.maxOption, upTo, "compactPostings")
    def folded(axis: String): DataFrame = {
      val parts =
        oldBase.maxOption.map(g =>
          spark.read.parquet(s"$indexDir/${axis}_base/gen=$g")).toSeq ++
          (if (foldIds.isEmpty) Seq.empty
           else Seq(spark.read.parquet(
             foldIds.map(b => s"$indexDir/$axis/batch_id=$b"): _*)))
      parts.reduce(_ unionByName _)
    }
    // Committed tombstones PURGE physically at fold time: row axes
    // anti-join the delete set, stats subtract the cells of tombstoned
    // docs still present in the folded docstats (docs an earlier fold
    // already purged are absent and so not subtracted twice). The
    // tombstone generations themselves are NOT consumed — the read
    // side's anti-join over purged ids is a no-op, so keeping them
    // needs no applied/unapplied bookkeeping and a tombstone that
    // races this fold is still applied at read time. The axis stays
    // delete-set-sized.
    val tomb = tombstoneIds(spark, indexDir)
    Axes.foreach { a =>
      val newBase = java.nio.file.Paths.get(indexDir, s"${a}_base", s"gen=$upTo")
      // Discard a markerless partial left by a crashed prior fold.
      LlmPipeline.deleteRecursively(newBase)
      val out = a match {
        case "stats" =>
          val summed = folded(a).agg(sum("nd").as("nd"), sum("ndl").as("ndl"),
            sum("toktot").as("toktot"))
          tomb.fold(summed) { t =>
            val corr = folded("docstats")
              .join(broadcast(t), Seq("doc_id"), "left_semi")
              .agg(count(lit(1)).as("nd_r"),
                coalesce(sum("dl"), lit(0L)).as("tok_r"))
            summed.crossJoin(broadcast(corr))
              .select((col("nd") - col("nd_r")).as("nd"),
                (col("ndl") - col("nd_r")).as("ndl"),
                (col("toktot") - col("tok_r")).as("toktot"))
          }
        case _ =>
          tomb.fold(folded(a)) { t =>
            // Re-select the axis's own column order (the USING-join
            // fronts doc_id; generations must stay union-compatible).
            val f = folded(a)
            f.join(broadcast(t), Seq("doc_id"), "left_anti")
              .select(f.columns.map(col).toSeq: _*)
          }
      }
      out.write.mode(SaveMode.Overwrite).parquet(newBase.toString)
    }
    cleanup()
  }
}
