package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 11 — VERDICT r10 item 3): empirical 100× scale
  * evidence for the stored-artifact maintenance family — q168
  * (incremental inverted-index merge) and the generation-history
  * family q164/q171 (time travel + VACUUM).
  *
  * The q168 claim is SHARPER than linearity: "merge cost tracks the
  * SHARD, never the corpus". The corpus construction isolates exactly
  * that: the standing corpus (doc_id % 4 != 0) is replicated N× with
  * per-replica doc_id offsets (multiples of 4, so the shard split is
  * preserved), while the NEW SHARD (doc_id % 4 == 0) stays the base
  * shard — only replica 0 contributes shard docs. At N× the nightly
  * artifact BUILD must grow (it tokenizes the corpus — that is its
  * job), but the per-crawl MERGE reads only the shard scan plus the
  * index-artifact leaf, so its time must stay ~flat. The harness
  * measures both and requires merge == rebuild at N× (the q149
  * full-rebuild contract held at scale).
  *
  * For q164/q171 the generation tables are built from `part`,
  * replicated N× with offsets that are multiples of 20 (preserving
  * both the % 10 = 7 delete stripe and the % 4 = 0 premium band), so
  * every per-generation summary must scale EXACTLY N× in rows and
  * premium counts — replica-identity requires, the ChangelogScale
  * discipline. Expected time ratio is ≈ linear (each generation write
  * is a full rewrite of N× data — the rewrite convention's cost by
  * design); the claim under test is that history depth (3 generations
  * + a vacuum) costs generation-LOCAL work, not history-times-corpus.
  *
  * Usage: `sbt "runMain graft.IndexScale [replicas]"` (default 100).
  * SPARK_GRAFT_CPUS as in Bench/ScaleCurve. Prints a markdown table
  * for BASELINE.md.
  */
object IndexScale {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDir = "/root/testdata/sf0.1"
    val bigDir = s"/tmp/graft_idxscale${replicas}x_${queries.SourcesOps.sanitizedAppId(spark)}"

    try {
      // A crashed prior run leaves bigDir (and its symlinks) behind —
      // parquet writes Overwrite fine, but createSymbolicLink would
      // throw FileAlreadyExistsException. Pre-clean unconditionally.
      queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(bigDir))
      // --- corpus: base shard + N× standing corpus ------------------------
      // Offsets are multiples of 4 (documents) / 20 (part) so every
      // id-derived predicate (% 4 shard split, % 10 delete stripe,
      // % 4 premium band) is replica-invariant.
      val docs = graft.sources.Tables.documents(spark, baseDir)
      val docOff = 400000000L
      docs.crossJoin(spark.range(replicas).select(col("id").as("rep")))
        .filter(col("rep") === 0 || col("doc_id") % 4 =!= 0)
        .select((col("doc_id") + col("rep") * docOff).as("doc_id"),
          col("text"), col("lang"), col("source"), col("n_chars"))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode(SaveMode.Overwrite).parquet(s"$bigDir/documents.parquet")
      val part = graft.sources.Tables.part(spark, baseDir)
      val partOff = 20000000L
      part.crossJoin(spark.range(replicas).select(col("id").as("rep")))
        .select((col("p_partkey") + col("rep") * partOff).as("p_partkey"),
          col("p_name"), col("p_brand"), col("p_type"), col("p_size"),
          col("p_retailprice"))
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode(SaveMode.Overwrite).parquet(s"$bigDir/part.parquet")
      // q164/q171 route through Tables.registerAll, which resolves every
      // fixture table eagerly — symlink the tables this harness does not
      // replicate to their base-scale files.
      Seq("lineitem", "orders", "customer", "supplier", "nation", "region",
        "events", "embeddings").foreach { t =>
        java.nio.file.Files.createSymbolicLink(
          java.nio.file.Paths.get(bigDir, s"$t.parquet"),
          java.nio.file.Paths.get(baseDir, s"$t.parquet"))
      }
      val nShardBase = docs.filter(col("doc_id") % 4 === 0).count()
      val nCorpusBig = spark.read.parquet(s"$bigDir/documents.parquet")
        .filter(col("doc_id") % 4 =!= 0).count()
      println(s"corpus at $bigDir: shard=$nShardBase docs (FIXED = base shard), " +
        s"standing corpus=$nCorpusBig docs (${replicas}x), part=${replicas}x")

      def time(f: => Unit): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      def noop(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()

      // Warm-up (JIT + codegen) at the smallest sf.
      queries.LlmPipeline.ensureIndexArtifact(spark, "/root/testdata/sf0.001")
      noop(queries.LlmPipeline.incrementalIndexMerge(spark, "/root/testdata/sf0.001"))
      queries.LlmPipeline.ensurePostingsArtifact(spark, "/root/testdata/sf0.001")
      noop(queries.LlmPipeline.incrementalPostingsMerge(spark, "/root/testdata/sf0.001"))
      noop(queries.LlmPipeline.incrementalDocStatsMerge(spark, "/root/testdata/sf0.001"))
      noop(queries.LlmPipeline.bm25Retrieval(spark, "/root/testdata/sf0.001"))
      noop(queries.LlmPipeline.bm25Conjunctive(spark, "/root/testdata/sf0.001"))
      noop(queries.LlmPipeline.bm25Disjunctive(spark, "/root/testdata/sf0.001"))
      noop(queries.LlmPipeline.phraseRetrieval(spark, "/root/testdata/sf0.001"))
      noop(queries.SqlGateway.generationTimeTravel(spark, "/root/testdata/sf0.001"))
      noop(queries.SqlGateway.generationVacuum(spark, "/root/testdata/sf0.001"))

      println(s"\n| step | sf0.1 (s) | ${replicas}x (s) | ratio | expectation |")
      println("|---|---|---|---|---|")
      val buildBase = time(queries.LlmPipeline.ensureIndexArtifact(spark, baseDir))
      val buildBig = time(queries.LlmPipeline.ensureIndexArtifact(spark, bigDir))
      println(f"| q168 artifact build (nightly) | $buildBase%.1f | $buildBig%.1f " +
        f"| ${buildBig / buildBase}%.1f | ~linear (tokenizes the corpus) |")
      val mergeBase = time(noop(queries.LlmPipeline.incrementalIndexMerge(spark, baseDir)))
      val mergeBig = time(noop(queries.LlmPipeline.incrementalIndexMerge(spark, bigDir)))
      println(f"| q168 shard merge (per-crawl) | $mergeBase%.1f | $mergeBig%.1f " +
        f"| ${mergeBig / mergeBase}%.1f | ~flat (tracks the shard) |")
      // r14: the full-postings artifact family (q188/q189 + q181's read).
      val pbBase = time(queries.LlmPipeline.ensurePostingsArtifact(spark, baseDir))
      val pbBig = time(queries.LlmPipeline.ensurePostingsArtifact(spark, bigDir))
      println(f"| q188 postings artifact build (nightly) | $pbBase%.1f | $pbBig%.1f " +
        f"| ${pbBig / pbBase}%.1f | ~linear (tokenizes the corpus — its job) |")
      val pmBase = time(noop(queries.LlmPipeline.incrementalPostingsMerge(spark, baseDir)))
      val pmBig = time(noop(queries.LlmPipeline.incrementalPostingsMerge(spark, bigDir)))
      println(f"| q188 postings shard merge (per-crawl) | $pmBase%.1f | $pmBig%.1f " +
        f"| ${pmBig / pmBase}%.1f | ~flat compute (shard tokenize; corpus leaf streams through) |")
      val dsBase = time(noop(queries.LlmPipeline.incrementalDocStatsMerge(spark, baseDir)))
      val dsBig = time(noop(queries.LlmPipeline.incrementalDocStatsMerge(spark, bigDir)))
      println(f"| q189 doc-stats/corpus-stats fold (per-crawl) | $dsBase%.1f | $dsBig%.1f " +
        f"| ${dsBig / dsBase}%.1f | ~flat compute (stats fold by addition; sidecar leaf streams) |")
      // q181 on the replica-identity corpus: every query term's df grows
      // N× here (stop words replicate with the docs), so the read cost
      // tracks Σ df of the 6 query terms — the contract is that it
      // NEVER tracks total corpus tokens (~30–50× larger than Σ df).
      // The flat-in-corpus leg (terms whose df stays fixed) is measured
      // in the incremental-ingest section below.
      val bmIdBase = time(noop(queries.LlmPipeline.bm25Retrieval(spark, baseDir)))
      val bmIdBig = time(noop(queries.LlmPipeline.bm25Retrieval(spark, bigDir)))
      println(f"| q181 BM25 query batch (df grows ${replicas}x) | $bmIdBase%.1f | $bmIdBig%.1f " +
        f"| ${bmIdBig / bmIdBase}%.1f | ~Σ df of query terms (reads postings, never the corpus) |")
      // r15: the retrieval-family reads over the same artifacts — all
      // bounded by the query terms' (positional) postings volume.
      val cjBase = time(noop(queries.LlmPipeline.bm25Conjunctive(spark, baseDir)))
      val cjBig = time(noop(queries.LlmPipeline.bm25Conjunctive(spark, bigDir)))
      println(f"| q190 conjunctive BMW batch (df grows ${replicas}x) | $cjBase%.1f | $cjBig%.1f " +
        f"| ${cjBig / cjBase}%.1f | ~Σ df (pruned pivot over In-filtered postings) |")
      val djBase = time(noop(queries.LlmPipeline.bm25Disjunctive(spark, baseDir)))
      val djBig = time(noop(queries.LlmPipeline.bm25Disjunctive(spark, bigDir)))
      println(f"| q192 disjunctive MAXSCORE batch (df grows ${replicas}x) | $djBase%.1f | $djBig%.1f " +
        f"| ${djBig / djBase}%.1f | ~Σ df of the essential lists |")
      val phBase = time(noop(queries.LlmPipeline.phraseRetrieval(spark, baseDir)))
      val phBig = time(noop(queries.LlmPipeline.phraseRetrieval(spark, bigDir)))
      println(f"| q191 phrase batch (positional df grows ${replicas}x) | $phBase%.1f | $phBig%.1f " +
        f"| ${phBig / phBase}%.1f | ~Σ positional df (one (query, doc, pos) equi join) |")
      // Well-formedness at N× lives HERE: replica-identity keeps the
      // query terms the base tokens, so conjunctive/phrase matches
      // exist in every replica. (On the suffixed corpus below the tied
      // per-replica dfs make the derived terms span replicas — the
      // intersections are legitimately empty there and only the probe
      // cost is measured.)
      require(queries.LlmPipeline.bm25Conjunctive(spark, bigDir).count() == 20,
        s"q190 degenerate at ${replicas}x")
      require(queries.LlmPipeline.bm25Disjunctive(spark, bigDir).count() == 20,
        s"q192 degenerate at ${replicas}x")
      require(queries.LlmPipeline.phraseRetrieval(spark, bigDir).count() == 30,
        s"q191 degenerate at ${replicas}x")
      // r16: index-side takedown (q193-class). A takedown notice is
      // EXTERNAL and fixed-size — it names specific docs — so the
      // first leg holds the notice constant while the corpus grows
      // N×; the second sweeps the notice ~N× at the fixed big corpus.
      // Cost model: the application is anti/semi joins over the
      // postings leaf (ONE pass — the q188-fold cost class the purge
      // amortizes into at compaction), never a corpus re-tokenize;
      // the notice itself rides a broadcast, so notice size must be
      // nearly free.
      val noticeBase = docs
        .filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 17 === 3)
        .select("doc_id")
      val nNotice = noticeBase.count()
      def takedownRead(d: String, rem: org.apache.spark.sql.DataFrame): Unit = {
        val root = queries.LlmPipeline.ensurePostingsArtifact(spark, d)
        val (idx, postings, _, _, stats) = queries.LlmPipeline.applyIndexTakedown(
          spark, root, queries.LlmPipeline.ensureIndexArtifact(spark, d), rem)
        noop(queries.LlmPipeline.bm25AgainstArtifacts(idx, postings, stats))
      }
      noop(queries.LlmPipeline.indexTakedown(spark, "/root/testdata/sf0.001")) // warm-up
      val tdBase = time(takedownRead(baseDir, noticeBase))
      val tdBig = time(takedownRead(bigDir, noticeBase))
      println(f"| q193 takedown apply + post-delete ranking ($nNotice-doc notice) " +
        f"| $tdBase%.1f | $tdBig%.1f | ${tdBig / tdBase}%.1f " +
        "| ~one postings-leaf pass (df/head repair) — the q188-fold class; never re-tokenizes |")
      val noticeBig = spark.read.parquet(s"$bigDir/documents.parquet")
        .filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 17 === 3)
        .select("doc_id")
      val nNoticeBig = noticeBig.count()
      val tdBigWide = time(takedownRead(bigDir, noticeBig))
      println(f"| q193 at ${replicas}x, notice $nNotice -> $nNoticeBig docs " +
        f"| $tdBig%.1f | $tdBigWide%.1f | ${tdBigWide / tdBig}%.1f " +
        "| ~flat (notice rides a broadcast; the leaf pass dominates) |")
      val ttvBase = time(noop(queries.SqlGateway.generationTimeTravel(spark, baseDir)))
      val ttvBig = time(noop(queries.SqlGateway.generationTimeTravel(spark, bigDir)))
      println(f"| q164 generation history build+read | $ttvBase%.1f | $ttvBig%.1f " +
        f"| ${ttvBig / ttvBase}%.1f | ~linear (full rewrites by design) |")
      val vacBase = time(noop(queries.SqlGateway.generationVacuum(spark, baseDir)))
      val vacBig = time(noop(queries.SqlGateway.generationVacuum(spark, bigDir)))
      println(f"| q171 history + VACUUM | $vacBase%.1f | $vacBig%.1f " +
        f"| ${vacBig / vacBase}%.1f | ~linear |")

      // --- contract requires at N× ----------------------------------------
      // q168: merge == full rebuild on the N× corpus, exactly.
      val merged = queries.LlmPipeline.incrementalIndexMerge(spark, bigDir)
      val rebuilt = queries.LlmPipeline.invertedIndex(spark, bigDir)
      val d1 = merged.exceptAll(rebuilt).count()
      val d2 = rebuilt.exceptAll(merged).count()
      println(s"\nq168 merge == rebuild at ${replicas}x: ${d1 == 0 && d2 == 0}")
      require(d1 == 0 && d2 == 0, s"merge diverged from rebuild at ${replicas}x ($d1/$d2 rows)")
      // q188: postings merge == full rebuild on the N× corpus, exactly
      // (row union over disjoint doc sets — no cell may drift).
      val pMerged = queries.LlmPipeline.incrementalPostingsMerge(spark, bigDir)
      val (pRebuilt, _, _) = queries.LlmPipeline.postingsFor(
        spark.read.parquet(s"$bigDir/documents.parquet"))
      val p1 = pMerged.exceptAll(pRebuilt).count()
      val p2 = pRebuilt.exceptAll(pMerged).count()
      println(s"q188 postings merge == rebuild at ${replicas}x: ${p1 == 0 && p2 == 0}")
      require(p1 == 0 && p2 == 0,
        s"postings merge diverged from rebuild at ${replicas}x ($p1/$p2 rows)")
      // q164: replica-identity — summaries exactly N× the base.
      val tb = queries.SqlGateway.generationTimeTravel(spark, baseDir).collect()
      val tg = queries.SqlGateway.generationTimeTravel(spark, bigDir).collect()
      (0 until 3).foreach { i =>
        require(tg(i).getLong(1) == replicas * tb(i).getLong(1),
          s"q164 gen ${i + 1} rows not ${replicas}x")
        require(math.abs(tg(i).getDouble(2) - replicas * tb(i).getDouble(2)) < 1e-2,
          s"q164 gen ${i + 1} total_price not ${replicas}x")
        if (!tb(i).isNullAt(3))
          require(tg(i).getLong(3) == replicas * tb(i).getLong(3),
            s"q164 gen ${i + 1} premium count not ${replicas}x")
      }
      // q171: same statuses, retained summaries exactly N×.
      val vb = queries.SqlGateway.generationVacuum(spark, baseDir).collect()
      val vg = queries.SqlGateway.generationVacuum(spark, bigDir).collect()
      (0 until 3).foreach { i =>
        require(vb(i).getString(1) == vg(i).getString(1) &&
          vb(i).getBoolean(2) == vg(i).getBoolean(2) && vg(i).getBoolean(3),
          s"q171 gen ${i + 1} status/contract drifted at ${replicas}x")
        if (!vb(i).isNullAt(4))
          require(vg(i).getLong(4) == replicas * vb(i).getLong(4),
            s"q171 gen ${i + 1} rows not ${replicas}x")
      }
      println(s"q164/q171 replica-identity at ${replicas}x: all summaries exactly ${replicas}x, " +
        "statuses and contract booleans unchanged — all hold")

      // --- incremental-ingest family: q177 / q174 / q179 (r12) -------------
      // A SECOND corpus dir, because these families need replica
      // INDEPENDENCE, not replica identity:
      //   - documents: corpus docs token-suffixed per replica (the
      //     ScaleCurve idiom — replicas share no shingles, so the pair
      //     graph grows exactly N×, never N²), shard (doc_id % 4 == 0)
      //     FIXED = rep 0 only;
      //   - embeddings: corpus vectors rotated per replica (rotation
      //     preserves the norm; rotated isotropic vectors decorrelate,
      //     so buckets spread instead of stacking N deep), with a sign
      //     flip past rotation 63 so no two replicas are identical;
      //     shard (vec_id % 4 == 0) FIXED = rep 0 only.
      incScale(spark, baseDir, replicas)
    } finally {
      queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(bigDir))
      queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(
        s"/tmp/graft_idxscale_inc${replicas}x_${queries.SourcesOps.sanitizedAppId(spark)}"))
    }
    spark.stop()
  }

  private def incScale(spark: SparkSession, baseDir: String, replicas: Int): Unit = {
    // The rotate+sign-flip family yields 126 distinct transforms
    // (rotations 1..63 × two signs); at replicas ≥ 128 rep r would
    // repeat rep r−63's exact vectors and silently stack buckets,
    // voiding the decorrelation premise — refuse rather than mislead.
    require(replicas <= 127,
      s"incremental-ingest corpus supports at most 127 replicas (got $replicas)")
    val bigDirInc =
      s"/tmp/graft_idxscale_inc${replicas}x_${queries.SourcesOps.sanitizedAppId(spark)}"
    queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(bigDirInc))
    val docs = graft.sources.Tables.documents(spark, baseDir)
    val docOff = 400000000L
    docs.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .filter(col("rep") === 0 || col("doc_id") % 4 =!= 0)
      .select((col("doc_id") + col("rep") * docOff).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(transform(split(col("text"), " "),
            t => concat(t, lit("r"), col("rep").cast("string"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$bigDirInc/documents.parquet")
    val embs = graft.sources.Tables.embeddings(spark, baseDir)
    val vecOff = 400000000L
    embs.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .filter(col("rep") === 0 || col("vec_id") % 4 =!= 0)
      .withColumn("rot", (((col("rep") - 1) % 63) + 1).cast("int"))
      .withColumn("sgn", when(col("rep") >= 64, lit(-1.0f)).otherwise(lit(1.0f)))
      .select((col("vec_id") + col("rep") * vecOff).as("vec_id"),
        when(col("rep") === 0, col("embedding")).otherwise(
          expr("transform(concat(slice(embedding, rot + 1, 64 - rot), " +
            "slice(embedding, 1, rot)), x -> x * sgn)")).as("embedding"),
        col("label"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$bigDirInc/embeddings.parquet")
    val nDocsBig = spark.read.parquet(s"$bigDirInc/documents.parquet").count()
    val nVecsBig = spark.read.parquet(s"$bigDirInc/embeddings.parquet").count()
    // bits ~ log n: the stored index a 100× corpus ships is wider, so
    // per-bucket occupancy — and with it per-probe candidate cost —
    // stays ~flat (the discipline q160's scaladoc names; measured here).
    val bitsBig = queries.LlmPipeline.MpBits +
      math.ceil(math.log(replicas.toDouble) / math.log(2.0)).toInt
    println(s"\nincremental-ingest corpus at $bigDirInc: docs=$nDocsBig, vecs=$nVecsBig " +
      s"(shards FIXED = rep 0); big index width $bitsBig bits vs base ${queries.LlmPipeline.MpBits}")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Warm-up at the smallest sf.
    queries.LlmPipeline.prepareIncrementalCc(spark, "/root/testdata/sf0.001")
    noop(queries.LlmPipeline.incrementalComponents(spark, "/root/testdata/sf0.001"))
    noop(queries.LlmPipeline.annAdmission(spark, "/root/testdata/sf0.001"))
    noop(queries.LlmPipeline.semanticDedupAnn(spark, "/root/testdata/sf0.001"))

    // Nightly artifacts, off-clock (the bench-excluded prepares).
    queries.LlmPipeline.prepareIncrementalCc(spark, baseDir)
    queries.LlmPipeline.prepareIncrementalCc(spark, bigDirInc)
    queries.LlmPipeline.ensureMpAnnIndex(spark, baseDir)
    queries.LlmPipeline.ensureMpAnnIndex(spark, baseDir, bitsBig)
    queries.LlmPipeline.ensureMpAnnIndex(spark, bigDirInc, bitsBig)
    queries.LlmPipeline.ensureIndexArtifact(spark, baseDir)
    queries.LlmPipeline.ensureIndexArtifact(spark, bigDirInc)
    queries.LlmPipeline.ensurePostingsArtifact(spark, baseDir)
    queries.LlmPipeline.ensurePostingsArtifact(spark, bigDirInc)

    println(s"\n| step | sf0.1 (s) | ${replicas}x (s) | ratio | expectation |")
    println("|---|---|---|---|---|")
    val rbBase = time(noop(queries.LlmPipeline.dedupClusters(spark, baseDir)))
    val rbBig = time(noop(queries.LlmPipeline.dedupClusters(spark, bigDirInc)))
    println(f"| q101 CC full rebuild (nightly) | $rbBase%.1f | $rbBig%.1f " +
      f"| ${rbBig / rbBase}%.1f | ~linear (iterates the corpus graph) |")
    val mgBase = time(noop(queries.LlmPipeline.incrementalComponents(spark, baseDir)))
    val mgBig = time(noop(queries.LlmPipeline.incrementalComponents(spark, bigDirInc)))
    println(f"| q177 component merge (per-crawl) | $mgBase%.1f | $mgBig%.1f " +
      f"| ${mgBig / mgBase}%.1f | ~flat (quotient sized by the delta; corpus = ONE relabel join) |")
    val prBase = time(noop(queries.LlmPipeline.annAdmissionCfg(
      spark, baseDir, queries.LlmPipeline.MpBits)))
    val prBig = time(noop(queries.LlmPipeline.annAdmissionCfg(spark, bigDirInc, bitsBig)))
    println(f"| q174 ANN shard admission (per-crawl) | $prBase%.1f | $prBig%.1f " +
      f"| ${prBig / prBase}%.1f | ~flat (fixed shard probes a log-n-wider stored index) |")
    // Radius 1 (unbudgeted) for cross-round comparability with the r12
    // record: the radius is a constant mask-count factor orthogonal to
    // n-scaling (see semanticDedupAnnCfg's doc).
    val sdBase = time(noop(queries.LlmPipeline.semanticDedupAnnCfg(
      spark, baseDir, queries.LlmPipeline.MpBits, 1, Long.MaxValue)))
    val sdBig = time(noop(queries.LlmPipeline.semanticDedupAnnCfg(
      spark, bigDirInc, bitsBig, 1, Long.MaxValue)))
    println(f"| q179 semantic dedup on ANN edges (radius 1) | $sdBase%.1f | $sdBig%.1f " +
      f"| ${sdBig / sdBase}%.1f | ~linear (bucket-bounded candidates, never n^2) |")
    // The SHIPPED operating point (r13, VERDICT item 3): radius 2 with
    // the Hamming-ordered per-probe candidate budget. The budget binds
    // at this scale (~11.6k mean per-probe volume vs 8 192), capping
    // candidate volume at n·budget; the broadcast verify keeps the
    // candidate stream sort-free (the r12 spill is gone by design).
    val sd2Base = time(noop(queries.LlmPipeline.semanticDedupAnnCfg(
      spark, baseDir, queries.LlmPipeline.MpBits)))
    val sd2Big = time(noop(queries.LlmPipeline.semanticDedupAnnCfg(
      spark, bigDirInc, bitsBig)))
    println(f"| q179 SHIPPED point (radius 2, budget ${queries.LlmPipeline.SemDedupProbeBudget}) " +
      f"| $sd2Base%.1f | $sd2Big%.1f " +
      f"| ${sd2Big / sd2Base}%.1f | ~linear (budget caps per-probe candidates) |")

    // r16: IVF-PQ (q198) — the compressed ANN read at N×, next to the
    // uncompressed IVF comparator at the same coarse nprobe. The claim
    // under test: candidate scoring reads 4-bit CODES, not 256-byte
    // vectors — so the stored-candidate bytes shrink ~an order of
    // magnitude and the probe stays cell-fraction-bounded.
    def dirBytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      if (!java.nio.file.Files.isDirectory(root)) 0L
      else scala.util.Using.resource(java.nio.file.Files.walk(root)) { s =>
        s.filter(java.nio.file.Files.isRegularFile(_))
          .mapToLong(java.nio.file.Files.size(_)).sum()
      }
    }
    noop(queries.LlmPipeline.ivfPqAnn(spark, "/root/testdata/sf0.001")) // warm-up
    queries.LlmPipeline.preparePqIndex(spark, baseDir)
    val pqPrepBig = time(queries.LlmPipeline.preparePqIndex(spark, bigDirInc))
    val pqBase = time(noop(queries.LlmPipeline.ivfPqAnn(spark, baseDir)))
    val pqBig = time(noop(queries.LlmPipeline.ivfPqAnn(spark, bigDirInc)))
    println(f"| q198 IVF-PQ probe (ADC over codes + exact re-rank) | $pqBase%.1f | $pqBig%.1f " +
      f"| ${pqBig / pqBase}%.1f | ~linear in probed cells' CODE rows (4-byte codes, not vectors) |")
    val unBase = time(noop(queries.LlmPipeline.ivfAnnCfg(
      spark, baseDir, queries.LlmPipeline.PqNprobe)))
    val unBig = time(noop(queries.LlmPipeline.ivfAnnCfg(
      spark, bigDirInc, queries.LlmPipeline.PqNprobe)))
    println(f"| uncompressed IVF comparator (same nprobe, full vectors) | $unBase%.1f | $unBig%.1f " +
      f"| ${unBig / unBase}%.1f | the full-vector scan the codes replace |")
    val pqRootBig = queries.LlmPipeline.ensurePqIndex(spark, bigDirInc)
    val codeBytes = dirBytes(s"$pqRootBig/codes") + dirBytes(s"$pqRootBig/cells")
    val vecBytes = dirBytes(s"$bigDirInc/embeddings.parquet")
    println(f"q198 stored-candidate bytes at ${replicas}x: codes+cells " +
      f"${codeBytes / 1e6}%.1f MB vs raw vectors ${vecBytes / 1e6}%.1f MB " +
      f"(${vecBytes.toDouble / codeBytes}%.1fx smaller; PQ codebook training " +
      f"off-clock with the nightly builds, $pqPrepBig%.1f s at ${replicas}x)")

    // q181 on the suffixed corpus: replica tokens are distinct, so the
    // top-6 query terms' Σ df does NOT grow with the corpus — this
    // isolates the index-size axis. r13's corpus-scan read path
    // measured 2.8 here; the postings read must be ~flat (the pushed
    // term In-filter touches only matching row groups / buckets).
    val bmBase = time(noop(queries.LlmPipeline.bm25Retrieval(spark, baseDir)))
    val bmBig = time(noop(queries.LlmPipeline.bm25Retrieval(spark, bigDirInc)))
    println(f"| q181 BM25 query batch (fixed Σ df) | $bmBase%.1f | $bmBig%.1f " +
      f"| ${bmBig / bmBase}%.1f | ~flat (reads only the query terms' postings; r13 corpus scan: 2.8) |")
    // r15: the suffixed corpus keeps the query terms' (positional) df
    // FIXED while the index grows 100x — all three new reads must stay
    // ~flat like q181's.
    val cjBase2 = time(noop(queries.LlmPipeline.bm25Conjunctive(spark, baseDir)))
    val cjBig2 = time(noop(queries.LlmPipeline.bm25Conjunctive(spark, bigDirInc)))
    println(f"| q190 conjunctive BMW batch (fixed Σ df) | $cjBase2%.1f | $cjBig2%.1f " +
      f"| ${cjBig2 / cjBase2}%.1f | ~flat |")
    val djBase2 = time(noop(queries.LlmPipeline.bm25Disjunctive(spark, baseDir)))
    val djBig2 = time(noop(queries.LlmPipeline.bm25Disjunctive(spark, bigDirInc)))
    println(f"| q192 disjunctive MAXSCORE batch (fixed Σ df) | $djBase2%.1f | $djBig2%.1f " +
      f"| ${djBig2 / djBase2}%.1f | ~flat |")
    val phBase2 = time(noop(queries.LlmPipeline.phraseRetrieval(spark, baseDir)))
    val phBig2 = time(noop(queries.LlmPipeline.phraseRetrieval(spark, bigDirInc)))
    println(f"| q191 phrase batch (fixed positional Σ df) | $phBase2%.1f | $phBig2%.1f " +
      f"| ${phBig2 / phBase2}%.1f | ~flat |")
    // Disjunctive retrieval stays well-formed on the suffixed corpus
    // (any-term semantics). Conjunctive/phrase intersections are
    // legitimately EMPTY here — the tied per-replica dfs make the
    // derived terms span replicas (no doc carries two replicas'
    // tokens), so the rows above measure the probe pipeline's cost,
    // not result production; their well-formedness require lives on
    // the replica-identity corpus.
    require(queries.LlmPipeline.bm25Disjunctive(spark, bigDirInc).count() == 20,
      s"q192 degenerate at ${replicas}x")

    // --- r17: the atomic multi-plane takedown COMMIT (q201-class) --------
    // The durable form of the q193 apply: stage all ELEVEN plane folds
    // as candidate generations + ONE manifest CAS. Cost model: the
    // plane writes dominate and track the ARTIFACT sizes (each fold is
    // one anti-join/subtraction pass over its leaf — the nightly-fold
    // cost class); the notice rides a broadcast; the commit itself is
    // one 11-line file CAS regardless of N. Nightly builds (band/ANN/
    // PQ indexes) are off-clock as everywhere else.
    queries.LlmPipeline.ensureBandIndex(spark, baseDir)
    queries.LlmPipeline.ensureBandIndex(spark, bigDirInc)
    def commitLeg(d: String, bits: Int, rem: org.apache.spark.sql.DataFrame): Double = {
      val root = queries.LlmPipeline.ensurePostingsArtifact(spark, d)
      val idxPath = queries.LlmPipeline.ensureIndexArtifact(spark, d)
      val (bandsPath, shinglesPath) = queries.LlmPipeline.ensureBandIndex(spark, d)
      val (keysPath, vecsPath) = queries.LlmPipeline.ensureMpAnnIndex(spark, d, bits)
      val pqRoot = queries.LlmPipeline.ensurePqIndex(spark, d)
      val (pairsPath, labelsPath, repsPath) = queries.LlmPipeline.ensureCcPlanes(spark, d)
      val logDir = java.nio.file.Files.createTempDirectory("graft_is_tdlog")
      val planes = java.nio.file.Files.createTempDirectory("graft_is_tdpl")
      try {
        require(queries.SqlGateway.occTryCommitManifest(logDir, -1L, Seq(
          "index" -> idxPath, "postings" -> s"$root/postings",
          "positions" -> s"$root/positions", "docstats" -> s"$root/docstats",
          "stats" -> s"$root/stats", "bands" -> bandsPath,
          "shingles" -> shinglesPath, "ann_keys" -> keysPath,
          "ann_vecs" -> vecsPath, "pq_cells" -> s"$pqRoot/cells",
          "pq_codes" -> s"$pqRoot/codes", "pairs" -> pairsPath,
          "labels" -> labelsPath, "reps" -> repsPath)))
        time {
          val (won, _) = queries.LlmPipeline.commitTakedownGeneration(
            spark, planes.toString, logDir, rem, "t1")
          require(won, "unopposed takedown commit lost")
        }
      } finally {
        queries.LlmPipeline.deleteRecursively(logDir)
        queries.LlmPipeline.deleteRecursively(planes)
      }
    }
    val noticeInc = graft.sources.Tables.documents(spark, baseDir)
      .filter(col("doc_id") % 4 =!= 0 && col("doc_id") % 17 === 3)
      .select("doc_id").localCheckpoint()
    val nNoticeInc = noticeInc.count()
    val tcBase = commitLeg(baseDir, queries.LlmPipeline.MpBits, noticeInc)
    val tcBig = commitLeg(bigDirInc, bitsBig, noticeInc)
    println(f"| q201 multi-plane takedown commit ($nNoticeInc-doc notice, 14 planes + 1 CAS) " +
      f"| $tcBase%.1f | $tcBig%.1f | ${tcBig / tcBase}%.1f " +
      "| ~artifact-leaf passes + writes (the nightly-fold class); the CAS is one file |")

    // --- r17: component-plane takedown (q202-class) ----------------------
    // The re-label fold vs the full CC rebuild it replaces: untouched
    // components keep stored rows (anti-join), affected components
    // re-run min-label CC on surviving edges — work tracks the
    // NOTICE'S components, so the leg must sit far below the q101
    // rebuild measured above and grow sublinearly.
    def ccTakedownLeg(d: String, rem: org.apache.spark.sql.DataFrame): Double = {
      val labels = spark.read.parquet(queries.LlmPipeline.ensureCcArtifact(spark, d))
      val pairs = queries.LlmPipeline.lshPairGraph(spark, d).select("id1", "id2")
        .filter(col("id1") % 4 =!= 0 && col("id2") % 4 =!= 0)
      time(noop(queries.LlmPipeline.applyCcTakedown(labels, pairs, rem)))
    }
    noop(queries.LlmPipeline.ccTakedown(spark, "/root/testdata/sf0.001")) // warm-up
    val ccTdBase = ccTakedownLeg(baseDir, noticeInc)
    val ccTdBig = ccTakedownLeg(bigDirInc, noticeInc)
    println(f"| q202 CC-plane takedown (fixed notice; vs q101 rebuild row above) " +
      f"| $ccTdBase%.1f | $ccTdBig%.1f | ${ccTdBig / ccTdBase}%.1f " +
      "| ~affected components (notice-sized), never the corpus graph |")

    // --- r18: transactional shard ADMISSION (q207-class) + retention -----
    // --- vacuum (q208-class) ----------------------------------------------
    // Admission cost model: each text plane is REWRITTEN as a new
    // generation (the generation-rewrite convention — postings/
    // positions/docstats row union is corpus-sized, the nightly-fold
    // class, expected ~linear); the shard-derived folds, the quotient
    // label merge, and the CAS stay shard-sized. The q208 row is
    // STORAGE: commit a takedown ON TOP of the admission, vacuum at
    // the head, and measure the superseded admission generation + the
    // expired manifests actually reclaimed — the bytes that without
    // q208 accrete on every commit, forever.
    def admissionVacuumLeg(d: String): (Double, Long, Double) = {
      val pqRoot = queries.LlmPipeline.ensurePqIndex(spark, d)
      val logDir = java.nio.file.Files.createTempDirectory("graft_is_adlog")
      val planes = java.nio.file.Files.createTempDirectory("graft_is_adpl")
      try {
        queries.LlmPipeline.bootstrapPlanesManifest(spark, d, logDir)
        val shardDocs = graft.sources.Tables.documents(spark, d)
          .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
          .localCheckpoint()
        val shardEmb = graft.sources.Tables.embeddings(spark, d)
          .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
          .localCheckpoint()
        val tAdmit = time {
          val (won, _) = queries.LlmPipeline.commitAdmissionGeneration(
            spark, planes.toString, logDir, shardDocs, shardEmb, d, pqRoot, "a1")
          require(won, "unopposed admission commit lost")
        }
        // A takedown commit on top (folds FROM the admission's
        // committed planes) supersedes the a1 generation entirely.
        val (won2, _) = queries.LlmPipeline.commitTakedownGeneration(
          spark, planes.toString, logDir, noticeInc, "t1")
        require(won2, "unopposed takedown commit lost")
        val before = dirBytes(planes.toString)
        var expired = 0L; var orphans = 0L
        val tVac = time {
          val (e, o) = queries.SqlGateway.vacuumManifestLog(
            logDir, planes, retainFrom = 2L)
          expired = e; orphans = o
        }
        // Expected orphan count derives from the plane family size
        // (ADVICE r18 — a hard-coded 14 breaks silently on the next
        // plane addition): the vacuum reclaims exactly the superseded
        // a1 admission generation, one directory per bound plane.
        val nPlanes = queries.LlmPipeline.TakedownPlanes.size.toLong
        require(expired == 2 && orphans == nPlanes,
          s"vacuum reclaimed ($expired manifests, $orphans dirs) — expected (2, $nPlanes)")
        // The head must still read consistently from retained planes.
        require(queries.LlmPipeline.manifestPlanesConsistent(spark, logDir, 2L),
          "post-vacuum head read inconsistent")
        (tAdmit, before - dirBytes(planes.toString), tVac)
      } finally {
        queries.LlmPipeline.deleteRecursively(logDir)
        queries.LlmPipeline.deleteRecursively(planes)
      }
    }
    val (adBase, vbBase, tvBase) = admissionVacuumLeg(baseDir)
    val (adBig, vbBig, tvBig) = admissionVacuumLeg(bigDirInc)
    println(f"| q207 admission commit (fixed shard, 14 planes + 1 CAS) " +
      f"| $adBase%.1f | $adBig%.1f | ${adBig / adBase}%.1f " +
      "| ~plane rewrites (the generation-rewrite convention's nightly-fold class); shard folds + CAS stay shard-sized |")
    println(f"| q208 manifest vacuum at head (2 expired manifests, 14 superseded dirs) " +
      f"| $tvBase%.2f | $tvBig%.2f | ${tvBig / tvBase}%.1f " +
      "| driver-side file ops — independent of plane bytes |")
    println(f"q208 storage reclaimed at head retention: " +
      f"${vbBase / 1048576.0}%.1f MB at sf0.1 -> ${vbBig / 1048576.0}%.1f MB at ${replicas}x " +
      "(the superseded admission generation — accretes per commit without the vacuum); " +
      "post-vacuum head read consistent at both scales")

    // --- r19: DELTA-BINDING transactions (q210/q212/q211-class) ----------
    // The VERDICT r18 item-1 fix measured: an admission now stages
    // SHARD-SIZED delta generations and a takedown NOTICE-SIZED
    // tombstones (vs the r18 rewrite convention's corpus-sized planes
    // — the q207/q201 rows above), so both legs must be ~FLAT in
    // corpus size with staged bytes orders below the rewrite's. The
    // corpus-proportional fold is now its own COMPACTION transaction
    // (q211-class, nightly-fold cadence) — measured separately, where
    // ~linear is the expected and correct shape.
    def deltaLegs(d: String): (Double, Long, Double, Long, Double, Long) = {
      val pqRoot = queries.LlmPipeline.ensurePqIndex(spark, d)
      val logDir = java.nio.file.Files.createTempDirectory("graft_is_ddlog")
      val planes = java.nio.file.Files.createTempDirectory("graft_is_ddpl")
      try {
        queries.LlmPipeline.bootstrapPlanesManifest(spark, d, logDir)
        val shardDocs = graft.sources.Tables.documents(spark, d)
          .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
          .localCheckpoint()
        val shardEmb = graft.sources.Tables.embeddings(spark, d)
          .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
          .localCheckpoint()
        val tAdmit = time {
          val (won, _) = queries.LlmPipeline.commitAdmissionDeltas(
            spark, planes.toString, logDir, shardDocs, shardEmb, d, pqRoot, "a1")
          require(won, "unopposed delta-admission commit lost")
        }
        val admitBytes = dirBytes(planes.toString)
        val tTd = time {
          val (won, _) = queries.LlmPipeline.commitTakedownTombstones(
            spark, planes.toString, logDir, noticeInc, "t1")
          require(won, "unopposed tombstone commit lost")
        }
        val tdBytes = dirBytes(planes.toString) - admitBytes
        val preCompact = dirBytes(planes.toString)
        val tCompact = time {
          val (won, folded, _) = queries.LlmPipeline.compactManifest(
            spark, planes.toString, logDir, "c1")
          require(won && folded == queries.LlmPipeline.TakedownPlanes.size,
            s"compaction lost or partial (folded=$folded)")
        }
        val compactBytes = dirBytes(planes.toString) - preCompact
        (tAdmit, admitBytes, tTd, tdBytes, tCompact, compactBytes)
      } finally {
        queries.LlmPipeline.deleteRecursively(logDir)
        queries.LlmPipeline.deleteRecursively(planes)
      }
    }
    val (daBase, abBase, dtBase, tbBase, dcBase, cbBase) = deltaLegs(baseDir)
    val (daBig, abBig, dtBig, tbBig, dcBig, cbBig) = deltaLegs(bigDirInc)
    println(f"| q210 DELTA admission commit (fixed shard, 14 chains + 1 CAS) " +
      f"| $daBase%.1f | $daBig%.1f | ${daBig / daBase}%.1f " +
      "| ~flat: staged bytes are shard-sized; corpus planes only scanned |")
    println(f"| q212 TOMBSTONE takedown commit (fixed notice, 14 chains + 1 CAS) " +
      f"| $dtBase%.1f | $dtBig%.1f | ${dtBig / dtBase}%.1f " +
      "| ~flat: staged bytes are notice-sized; physical purge deferred to compaction |")
    println(f"| q211 compaction transaction (fold 14 chains to fresh bases) " +
      f"| $dcBase%.1f | $dcBig%.1f | ${dcBig / dcBase}%.1f " +
      "| ~linear BY DESIGN — the one corpus-proportional write, on cadence, not per commit |")
    println(f"q210 staged bytes: ${abBase / 1048576.0}%.1f MB at sf0.1 -> " +
      f"${abBig / 1048576.0}%.1f MB at ${replicas}x (vs the r18 rewrite convention's " +
      "full-plane generations — the q208 reclaim row above measured those at " +
      "corpus scale); " +
      f"q212 staged bytes: ${tbBase / 1048576.0}%.2f MB -> ${tbBig / 1048576.0}%.2f MB; " +
      f"q211 compacted-base bytes: ${cbBase / 1048576.0}%.1f MB -> ${cbBig / 1048576.0}%.1f MB")
    require(abBig < abBase * 4,
      s"delta admission staged bytes grew corpus-proportionally ($abBase -> $abBig)")

    // Multi-writer admission throughput (VERDICT r18 item 4): four
    // disjoint quarter-shards through one manifest, 1 writer serially
    // vs 4 concurrent threads (CAS losers restage shard-sized deltas
    // against the winner's chain). Base dir only — the law is writer
    // contention, not corpus scaling (OccSpec proves serializability;
    // this row prices it).
    def throughput(concurrent: Boolean): Double = {
      val pqRoot = queries.LlmPipeline.ensurePqIndex(spark, baseDir)
      val logDir = java.nio.file.Files.createTempDirectory("graft_is_mwlog")
      val planes = java.nio.file.Files.createTempDirectory("graft_is_mwpl")
      try {
        queries.LlmPipeline.bootstrapPlanesManifest(spark, baseDir, logDir)
        val shards = (0 until 4).map { i =>
          (graft.sources.Tables.documents(spark, baseDir)
             .filter(col("doc_id") % 4 === 0 && (col("doc_id") / 4) % 4 === i)
             .select("doc_id", "text").localCheckpoint(),
           graft.sources.Tables.embeddings(spark, baseDir)
             .filter(col("vec_id") % 4 === 0 && (col("vec_id") / 4) % 4 === i)
             .select("vec_id", "embedding").localCheckpoint())
        }
        def writer(i: Int): Unit = {
          val (sd, se) = shards(i)
          var done = false; var attempt = 0
          while (!done && attempt < 12) {
            attempt += 1
            val (baseGen, bindings) = queries.LlmPipeline.stageAdmissionDeltas(
              spark, planes.toString, logDir, sd, se, baseDir, pqRoot,
              s"w${i}_$attempt")
            done = queries.SqlGateway.occTryCommitManifest(logDir, baseGen, bindings)
          }
          require(done, s"writer $i never committed")
        }
        time {
          if (!concurrent) (0 until 4).foreach(writer)
          else {
            val ts = (0 until 4).map(i => new Thread(() => writer(i)))
            ts.foreach(_.start()); ts.foreach(_.join())
          }
          require(queries.SqlGateway.occCurrentGen(logDir) == 4L,
            "four admissions must land four generations")
        }
      } finally {
        queries.LlmPipeline.deleteRecursively(logDir)
        queries.LlmPipeline.deleteRecursively(planes)
      }
    }
    val tSeq = throughput(concurrent = false)
    val tConc = throughput(concurrent = true)
    println(f"admission throughput at sf0.1 (4 quarter-shard commits): " +
      f"serial $tSeq%.1f s (${4 * 60.0 / tSeq}%.1f commits/min) vs " +
      f"4 concurrent writers $tConc%.1f s (${4 * 60.0 / tConc}%.1f commits/min) — " +
      "lost-race restaging is shard-sized, so contention costs retries, not corpus folds")

    // --- contract requires at N× ------------------------------------------
    // q181: retrieval stays well-formed at the N× corpus.
    val bm = queries.LlmPipeline.bm25Retrieval(spark, bigDirInc).collect()
    require(bm.length == 30 && bm.forall(_.getDouble(3) > 0),
      s"q181 degenerate at ${replicas}x (${bm.length} rows)")
    // q177: quotient merge == full CC rebuild on the N× corpus, exactly
    // (the q168 merge==rebuild discipline on the component artifact).
    val merged = queries.LlmPipeline.incrementalComponents(spark, bigDirInc)
    val rebuilt = queries.LlmPipeline.dedupClusters(spark, bigDirInc)
    val d1 = merged.exceptAll(rebuilt).count()
    val d2 = rebuilt.exceptAll(merged).count()
    println(s"\nq177 merge == rebuild at ${replicas}x: ${d1 == 0 && d2 == 0}")
    require(d1 == 0 && d2 == 0,
      s"q177 merge diverged from rebuild at ${replicas}x ($d1/$d2 rows)")
    // q174: at EQUAL index width, growing the corpus can only ADD
    // partners (rep-0 index entries are identical, bucketing is a pure
    // function of the pair) — admission decisions are monotone.
    val aBase = queries.LlmPipeline.annAdmissionCfg(spark, baseDir, bitsBig)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val aBig = queries.LlmPipeline.annAdmissionCfg(spark, bigDirInc, bitsBig)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    require(aBase.keySet.subsetOf(aBig.keySet),
      s"q174 lost admitted vectors at ${replicas}x")
    require(aBase.forall { case (v, n) => aBig(v) >= n },
      s"q174 partner counts shrank at ${replicas}x")
    println(s"q174 monotone admission at ${replicas}x (equal bits $bitsBig): " +
      s"base ${aBase.size} admitted vecs all kept, counts never shrink — holds")
    // q179: non-degenerate at N× and the representative convention
    // holds — at the SHIPPED (radius 2, budgeted) point.
    val sd = queries.LlmPipeline.semanticDedupAnnCfg(spark, bigDirInc, bitsBig)
    val nClusters = sd.filter(col("kept")).count()
    val nRows = sd.count()
    require(nClusters > 0 && nRows > nClusters,
      s"q179 degenerate at ${replicas}x ($nClusters clusters / $nRows rows)")
    println(s"q179 at ${replicas}x (shipped point): $nRows clustered vectors " +
      s"in $nClusters clusters")
    // Budget law at N×: the Hamming-ordered spend admits every
    // radius-≤1 mask-bucket before any radius-2 one, and per-probe
    // radius-1 volume (~1.9k mean here) sits far below the budget —
    // so the budgeted radius-2 pair set must CONTAIN the unbudgeted
    // radius-1 pair set. Pair sets are materialized once each
    // (driver holds only counts).
    val lawDir = s"/tmp/graft_idxscale_r2law_${queries.SourcesOps.sanitizedAppId(spark)}"
    queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(lawDir))
    queries.LlmPipeline.multiProbeVerifiedPairs(spark, bigDirInc, bitsBig, 1, Long.MaxValue)
      .select("id1", "id2")
      .write.mode(SaveMode.Overwrite).parquet(s"$lawDir/r1")
    queries.LlmPipeline.multiProbeVerifiedPairs(spark, bigDirInc, bitsBig,
      queries.LlmPipeline.SemDedupProbeHamming, queries.LlmPipeline.SemDedupProbeBudget)
      .select("id1", "id2")
      .write.mode(SaveMode.Overwrite).parquet(s"$lawDir/r2")
    val r1p = spark.read.parquet(s"$lawDir/r1")
    val r2p = spark.read.parquet(s"$lawDir/r2")
    val n1 = r1p.count(); val n2 = r2p.count()
    val lost = r1p.exceptAll(r2p).count()
    println(s"q179 budget law at ${replicas}x: radius-1 pairs $n1, budgeted radius-2 " +
      s"pairs $n2, radius-1 pairs lost under budget: $lost")
    // Hamming-ordered spend admits every radius-≤1 mask-bucket of a
    // probe whose k ≤ 1 volume fits the budget; only a probe sitting in
    // a pathologically dense bucket region can lose radius-1 pairs.
    // Require the loss negligible and REPORT the exact count — the
    // measured number goes in BASELINE.md.
    require(lost <= math.max(1L, n1 / 500),
      s"budgeted radius-2 dropped $lost of $n1 radius-1 pairs (> 0.2%) — " +
        "budget cut materially into the radius-1 prefix")
    require(n2 >= n1, s"budgeted radius-2 found fewer pairs ($n2) than radius 1 ($n1)")

    // --- q179 budget-dial sweep (r15 — VERDICT r14 item 2, carried ------
    // --- from r13 item 5): where does the per-probe candidate budget ----
    // --- start costing radius-2 recall at the 100× index width? --------
    // The Hamming-ordered spend admits whole mask-buckets per probe in
    // radius order, so the budgeted pair set is MONOTONE in the budget
    // (a larger budget admits a per-probe superset of buckets); the
    // generous 32768 point — ~3× the measured ~11.6k mean per-probe
    // volume at this scale, so it almost never binds — serves as the
    // radius-2 reference, and recall_b = |pairs_b| / |pairs_ref| is
    // exact under monotonicity (subset inclusion is additionally
    // spot-verified at the shipped 16384 point and at 8192). Unbudgeted radius 2 at
    // this width is the r12 configuration that spilled > 70 GB and
    // died — the budget exists precisely so the reference never has to
    // run unbounded.
    val budgets = Seq(1024L, 2048L, 4096L, 8192L, 16384L, 32768L)
    val pairCounts = budgets.map { b =>
      val t0 = System.nanoTime()
      queries.LlmPipeline.multiProbeVerifiedPairs(spark, bigDirInc, bitsBig,
          queries.LlmPipeline.SemDedupProbeHamming, b)
        .select("id1", "id2")
        .write.mode(SaveMode.Overwrite).parquet(s"$lawDir/b$b")
      val dt = (System.nanoTime() - t0) / 1e9
      val n = spark.read.parquet(s"$lawDir/b$b").count()
      (b, n, dt)
    }
    val nRef = pairCounts.last._2
    println(s"\nq179 budget sweep at ${replicas}x, bits=$bitsBig, radius 2 " +
      s"(reference = budget 32768, $nRef verified pairs):")
    println("| budget | verified pairs | recall vs 32768 | time (s) |")
    println("|---|---|---|---|")
    pairCounts.foreach { case (b, n, dt) =>
      println(f"| $b | $n | ${n.toDouble / nRef}%.4f | $dt%.1f |")
    }
    // Monotone-subset spot check at the SHIPPED point (16384 — the r15
    // knee SemDedupProbeBudget is pinned at) and at the 8192 point
    // below it: each budget's pair set must be contained in the 32768
    // reference, or the recall column above is meaningless.
    Seq(8192L, 16384L).foreach { b =>
      val extra = spark.read.parquet(s"$lawDir/b$b")
        .exceptAll(spark.read.parquet(s"$lawDir/b32768")).count()
      require(extra == 0,
        s"budget $b produced $extra pairs outside the 32768 reference — " +
          "the Hamming-ordered spend is not monotone in the budget")
    }
    queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(lawDir))

    ccStreamScale(spark, baseDir, bigDirInc, replicas)
    annCcStreamScale(spark, baseDir, bigDirInc, bitsBig, replicas)
    postingsStreamScale(spark, baseDir)
  }

  /** Streaming postings maintenance vs accumulated stream depth (r15):
    * the per-batch commit writes only its OWN generations and reads
    * nothing accumulated, so its cost must be FLAT in the number of
    * prior generations; the merged read pays for the tail until
    * compaction folds it. Measured on sf0.1's standing corpus split
    * into 32 disjoint batches (doc_id % 32 — each doc in exactly one
    * batch, the fold precondition).
    */
  private def postingsStreamScale(spark: SparkSession, baseDir: String): Unit = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docs = graft.sources.Tables.documents(spark, baseDir)
      .filter(col("doc_id") % 4 =!= 0).select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_postscale")
    try {
      val dir = tmp.resolve("index").toString
      // Warm-up commit (JIT) on the smallest sf.
      graft.streaming.PostingsMaintenance.commitPostingsBatch(spark,
        graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
          .filter(col("doc_id") % 4 =!= 0).select("doc_id", "text"),
        tmp.resolve("warm").toString, 0L)
      val times = (0 until 32).map { i =>
        time(graft.streaming.PostingsMaintenance.commitPostingsBatch(spark,
          docs.filter(col("doc_id") % 32 === i), dir, i.toLong))
      }
      println(f"\nstreaming postings commit vs depth (32 batches, sf0.1 standing corpus): " +
        f"batch 0 ${times.head}%.2f s, batch 31 ${times.last}%.2f s, " +
        f"ratio ${times.last / times.head}%.2f (expectation ~flat — a commit " +
        "writes only its own generations)")
      require(times.last < 3 * times.head + 1.0,
        s"commit cost grew with stream depth (${times.head} -> ${times.last})")
      def readCount(): (Long, Double) = {
        var n = 0L
        val t = time { n = graft.streaming.PostingsMaintenance
          .mergedIndex(spark, dir)._1.count() }
        (n, t)
      }
      val (nTail, tTail) = readCount()
      graft.streaming.PostingsMaintenance.compactPostings(spark, dir, 31L)
      val (nBase, tBase) = readCount()
      require(nTail == nBase, s"compaction changed the merged postings ($nTail -> $nBase)")
      println(f"merged-postings read: 32-generation tail $tTail%.2f s -> " +
        f"compacted base $tBase%.2f s ($nTail rows unchanged) — the read-side " +
        "cost the compaction cadence exists to bound")
      // Closure at sf0.1: the live plane reproduces the stored-artifact
      // ranking on the full standing corpus.
      val live = graft.streaming.PostingsMaintenance.bm25AgainstStream(spark, dir)
        .collect().map(_.toString).toSeq
      val stored = queries.LlmPipeline.bm25Retrieval(spark, baseDir)
        .collect().map(_.toString).toSeq
      require(live == stored, "streamed-plane BM25 diverged from the stored-artifact ranking at sf0.1")
      println("BM25 closure at sf0.1: ranking over the 32-batch streamed plane == stored-artifact ranking — holds")
    } finally queries.LlmPipeline.deleteRecursively(tmp)
  }

  /** Embedding-side streaming CC per-batch cost vs corpus size (r14 —
    * VERDICT r13 item 3's measurement leg, the ccStreamScale protocol
    * on the vector axis): stream the SAME fixed two-batch vector shard
    * into the 1× and N× corpora (stored index at bits ~ log n for the
    * big one) and measure each commit. Probe cost is bucket-keyed
    * (flat at ~flat per-bucket occupancy), the state write is
    * delta-sized, and the corpus-sized index/vector leaves stream
    * under broadcast batch sides — no corpus shuffle, no corpus write.
    */
  private def annCcStreamScale(
      spark: SparkSession, baseDir: String, bigDirInc: String,
      bitsBig: Int, replicas: Int): Unit = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val docsBase = graft.sources.Tables.embeddings(spark, baseDir)
    val b0 = docsBase.filter(col("vec_id") % 8 === 0).select("vec_id", "embedding")
    val b1 = docsBase.filter(col("vec_id") % 4 === 0 && col("vec_id") % 8 =!= 0)
      .select("vec_id", "embedding")

    def run(dir: String, bits: Int): (Double, Double, Long, Long, Long) = {
      val (keys, vecs) = queries.LlmPipeline.ensureMpAnnIndex(spark, dir, bits)
      val cc = queries.LlmPipeline.ensureAnnCcArtifact(spark, dir, bits)
      val tmp = java.nio.file.Files.createTempDirectory("graft_annccscale")
      try {
        val hist = tmp.resolve("hist").toString
        val labels = tmp.resolve("labels").toString
        graft.streaming.StreamingAdmission.initAnnCc(spark, cc, hist, labels)
        val t0 = time(graft.streaming.StreamingAdmission.commitAnnCcBatch(
          spark, keys, vecs, hist, labels, b0, 0L, bits))
        val t1 = time(graft.streaming.StreamingAdmission.commitAnnCcBatch(
          spark, keys, vecs, hist, labels, b1, 1L, bits))
        val w0 = spark.read.parquet(s"$labels/delta/batch_id=0").count()
        val w1 = spark.read.parquet(s"$labels/delta/batch_id=1").count()
        val total = graft.streaming.StreamingAdmission
          .currentLabels(spark, labels).count()
        require(w0 < total && w1 < total,
          s"an ANN delta rewrote the labeling ($w0/$w1 of $total rows)")
        (t0, t1, w0, w1, total)
      } finally queries.LlmPipeline.deleteRecursively(tmp)
    }
    // Warm-up at the smallest sf.
    run("/root/testdata/sf0.001", queries.LlmPipeline.MpBits)
    val (t0b, t1b, w0b, w1b, totB) = run(baseDir, queries.LlmPipeline.MpBits)
    val (t0g, t1g, w0g, w1g, totG) = run(bigDirInc, bitsBig)
    println(f"\n| streaming ANN CC commit, batch 0 | $t0b%.1f | $t0g%.1f " +
      f"| ${t0g / t0b}%.1f | ~flat (delta state write + bucket-keyed index probes) |")
    println(f"| streaming ANN CC commit, batch 1 | $t1b%.1f | $t1g%.1f " +
      f"| ${t1g / t1b}%.1f | ~flat |")
    println(s"streaming ANN CC delta rows at sf0.1: batch0=$w0b batch1=$w1b " +
      s"(labeling $totB rows); at ${replicas}x: batch0=$w0g batch1=$w1g " +
      s"(labeling $totG rows) — writes track the batch and the components it bridges")
  }

  /** Streaming CC maintenance per-batch cost vs corpus size (r13 —
    * VERDICT r12 item 1's measurement leg). The r12 scale-killer was
    * the full-labeling rewrite per micro-batch; the r13 delta chain
    * writes only the labels a batch CHANGES. Stream the SAME fixed
    * two-batch shard into the 1× and N× corpora and measure each
    * commit: probe cost is bucket-keyed (flat), the state write is
    * delta-sized (flat — the in-run law re-checks written ≤ |batch| +
    * |swept corpus ids| at N×), and the only corpus-sized touches are
    * leaf scans with delta-sized build sides (no corpus shuffle, no
    * corpus write).
    */
  private def ccStreamScale(
      spark: SparkSession, baseDir: String, bigDirInc: String,
      replicas: Int): Unit = {
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // Nightly artifacts, off-clock (band index + corpus labeling).
    val (bandsBase, shBase) = queries.LlmPipeline.ensureBandIndex(spark, baseDir)
    val (bandsBig, shBig) = queries.LlmPipeline.ensureBandIndex(spark, bigDirInc)
    // The FIXED shard, split into two micro-batches — identical for
    // both corpora (shard docs are rep-0 only by construction).
    val docs = graft.sources.Tables.documents(spark, baseDir)
    val b0 = docs.filter(col("doc_id") % 8 === 0).select("doc_id", "text")
    val b1 = docs.filter(col("doc_id") % 4 === 0 && col("doc_id") % 8 =!= 0)
      .select("doc_id", "text")
    val nB1 = b1.count()

    def run(dir: String, bands: String, shingles: String)
        : (Double, Double, Long, Long, Long) = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_ccscale")
      try {
        val hist = tmp.resolve("hist").toString
        val labels = tmp.resolve("labels").toString
        graft.streaming.StreamingAdmission.initCc(spark,
          queries.LlmPipeline.ensureCcArtifact(spark, dir), hist, labels)
        val t0 = time(graft.streaming.StreamingAdmission.commitCcBatch(
          spark, bands, shingles, hist, labels, b0, 0L))
        val t1 = time(graft.streaming.StreamingAdmission.commitCcBatch(
          spark, bands, shingles, hist, labels, b1, 1L))
        val w0 = spark.read.parquet(s"$labels/delta/batch_id=0").count()
        val w1 = spark.read.parquet(s"$labels/delta/batch_id=1").count()
        val total = graft.streaming.StreamingAdmission
          .currentLabels(spark, labels).count()
        // In-run delta law at this scale: batch 1's write is bounded by
        // the batch plus the corpus ids actually swept into a merged
        // component — never a labeling rewrite.
        val prev1 = graft.streaming.StreamingAdmission
          .resolveLabels(spark, labels, 0L)
          .select(col("id"), col("label").as("pl"))
        val cur1 = graft.streaming.StreamingAdmission
          .resolveLabels(spark, labels, 1L)
          .select(col("id"), col("label").as("cl"))
        val changedOld = prev1.join(cur1, "id")
          .filter(col("pl") =!= col("cl")).count()
        require(w1 <= nB1 + changedOld,
          s"batch-1 delta $w1 rows > |batch| $nB1 + swept corpus ids $changedOld")
        require(w0 < total && w1 < total,
          s"a delta rewrote the labeling ($w0/$w1 of $total rows)")
        (t0, t1, w0, w1, total)
      } finally queries.LlmPipeline.deleteRecursively(tmp)
    }
    // Warm-up at the smallest sf (JIT for the streaming path).
    val (bandsW, shW) = queries.LlmPipeline.ensureBandIndex(spark, "/root/testdata/sf0.001")
    queries.LlmPipeline.ensureCcArtifact(spark, "/root/testdata/sf0.001")
    run("/root/testdata/sf0.001", bandsW, shW)

    val (t0b, t1b, w0b, w1b, totB) = run(baseDir, bandsBase, shBase)
    val (t0g, t1g, w0g, w1g, totG) = run(bigDirInc, bandsBig, shBig)
    println(f"\n| streaming CC commit, batch 0 | $t0b%.1f | $t0g%.1f " +
      f"| ${t0g / t0b}%.1f | ~flat (delta state write + bucket-keyed probes) |")
    println(f"| streaming CC commit, batch 1 | $t1b%.1f | $t1g%.1f " +
      f"| ${t1g / t1b}%.1f | ~flat |")
    println(s"streaming CC delta rows at sf0.1: batch0=$w0b batch1=$w1b " +
      s"(labeling $totB rows); at ${replicas}x: batch0=$w0g batch1=$w1g " +
      s"(labeling $totG rows) — writes track the batch, not the corpus")
    require(w0g < 3 * w0b + nB1 && w1g < 3 * w1b + nB1,
      s"delta writes grew with the corpus ($w0b->$w0g, $w1b->$w1g)")
  }
}
