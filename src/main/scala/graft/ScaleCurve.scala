package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (VERDICT r4 item 6): empirical scale-curve evidence for the
  * LSH dedup path. The 100-TB claims for q75/q96/q101 are design
  * arguments (banded equi-join, bucket cap, per-round checkpointing);
  * this measures them: build a corpus 10× sf0.1 and record runtime at
  * both scales. Near-linear growth (ratio ≈ 10, not ≈ 100) is the
  * evidence that no quadratic or unbounded-bucket stage survives.
  *
  * Corpus construction (deterministic, no RNG):
  *   - 10 replicas of the sf0.1 documents (5,000 → 50,000 docs). Every
  *     token in replica r > 0 is suffixed with the replica id, so
  *     replicas share NO shingles: each is an independent universe with
  *     the fixture's exact near-dup structure — workload grows exactly
  *     10×, making the expected-linear baseline well-defined.
  *   - plus a 2,000-doc boilerplate family (one shared 61-token text,
  *     unique last token per doc): every band bucket of the family is
  *     degenerate (≫ LshBucketCap), so the run exercises the 512-cap
  *     under real skew — without the cap this family alone would emit
  *     ~2M pairs per band from one task.
  *
  * Usage: `sbt "runMain graft.ScaleCurve [replicas]"` — replicas
  * defaults to 10; pass 100 for the second curve point (520k docs).
  * SPARK_GRAFT_CPUS sets parallelism (default 32, the bench record
  * config). Prints a markdown table for BASELINE.md.
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val replicas = if (args.nonEmpty) args(0).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val baseDir = "/root/testdata/sf0.1"
    val bigDir = s"/tmp/graft_scale${replicas}x_${queries.SourcesOps.sanitizedAppId(spark)}"

    // --- corpus generation -------------------------------------------------
    val base = graft.sources.Tables.documents(spark, baseDir)
    val replicaDocs = base
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(
        (col("doc_id") + col("rep") * 1000000L).as("doc_id"),
        when(col("rep") === 0, col("text"))
          .otherwise(array_join(
            transform(split(col("text"), " "),
              t => concat(t, lit("r"), col("rep").cast("string"))), " "))
          .as("text"),
        col("lang"), col("source"), col("n_chars"))
    val boilerText = (1 to 61).map(i => s"boiler$i").mkString(" ")
    val boiler = spark.range(2000).select(
      (col("id") + 1000000000L).as("doc_id"),
      concat(lit(boilerText + " tail"), col("id").cast("string")).as("text"),
      lit("en").as("lang"), lit("boiler").as("source"),
      lit(boilerText.length + 8).cast("long").as("n_chars"))
    replicaDocs.unionAll(boiler)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$bigDir/documents.parquet")
    val nBig = spark.read.parquet(s"$bigDir/documents.parquet").count()
    println(s"corpus: base=5000+fixture-dups, big=$nBig docs (${replicas}x + skew family) at $bigDir")
    // Replica-only twin (no boilerplate family) for the EXACT-join probe:
    // an exact-threshold similarity join must emit every qualifying pair,
    // so a degenerate near-identical family forces Ω(|family|²) OUTPUT —
    // inherent to exactness, not a plan defect (the capped LSH path is
    // the degenerate-data answer). The linear-scaling claim for q135 is
    // therefore measured on the linear-workload corpus.
    val cleanDir = s"${bigDir}_clean"
    replicaDocs
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$cleanDir/documents.parquet")

    // --- measurement -------------------------------------------------------
    val probes: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "q75_minhash_lsh" -> queries.LlmPipeline.minhashLsh _,
      "q96_curation_pipeline" -> queries.LlmPipeline.curationPipeline _,
      "q101_dedup_clusters" -> queries.LlmPipeline.dedupClusters _,
      // r7: PageRank shares the memoized pair graph with q75/q101 above,
      // so its row prices the ITERATIONS (5 joins + partial aggs on the
      // big graph), not a rebuild — the marginal cost a pipeline pays to
      // add centrality on an already-persisted graph.
      "q151_pagerank" -> queries.LlmPipeline.pagerankCentrality _)

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up (JIT + codegen) on the small fixture.
    probes.foreach { case (_, fn) => time(fn, "/root/testdata/sf0.01") }

    println(s"| query | sf0.1 (s) | ${replicas}x (s) | ratio (linear = $replicas) |")
    println("|---|---|---|---|")
    // NOTE (r6): q75 and q101 share the session-memoized pair graph, so
    // in this measurement order q75's row carries the one-time graph
    // build and q101's row is the marginal cost on top of it (the CC
    // rounds) — exactly the split a production pipeline sees when it
    // persists the pair graph between stages. q96 builds its own
    // (survivor-set) graph and is unaffected.
    probes.foreach { case (name, fn) =>
      val tBase = time(fn, baseDir)
      val tBig = time(fn, bigDir)
      println(f"| $name | $tBase%.1f | $tBig%.1f | ${tBig / tBase}%.1f |")
    }
    // The LSH probes are done with the shared graphs — free all three
    // dirs' cached pair graphs NOW (deterministic unpersist), so the
    // memory-heavy exact-join phase below runs with zero pinned blocks.
    // The sanity block at the end rebuilds baseDir's graph once; that
    // section is untimed, so determinism of the measured rows is
    // unaffected.
    queries.LlmPipeline.clearPairGraphCache(spark)
    // Exact prefix-filter join on the replica-only corpus (see cleanDir
    // note above); pair-count linearity is require-checked below.
    locally {
      val fn = queries.LlmPipeline.prefixFilterJoin _
      time(fn, "/root/testdata/sf0.01")
      val tBase = time(fn, baseDir)
      val tBig = time(fn, cleanDir)
      println(f"| q135_prefix_filter_join (clean corpus) | $tBase%.1f | $tBig%.1f | ${tBig / tBase}%.1f |")
      val basePairs135 = fn(spark, baseDir).count()
      val bigPairs135 = fn(spark, cleanDir).count()
      println(s"q135 pairs: base=$basePairs135 big=$bigPairs135 " +
        s"(exactly ${replicas}x: ${bigPairs135 == replicas * basePairs135})")
      require(bigPairs135 == replicas * basePairs135,
        s"q135 pair count is not exactly ${replicas}x base")
    }

    // Adversarial-skew point for the EXACT join (r6, VERDICT item 6):
    // run q135 on the corpus WITH the boilerplate family. Every family
    // pair shares 58 of 62 shingles (J ≈ 0.94), so the operator's
    // contract forces C(2000,2) = 1,999,000 OUTPUT pairs — Ω(|family|²)
    // is inherent to exactness, not a plan defect. What IS avoidable is
    // verification work beyond the qualifying output: the require below
    // pins post-filter family candidates == family output (ratio 1.0),
    // i.e. the PPJoin length+positional filters leave ZERO wasted
    // verify-join work on the degenerate family — the quantified
    // "inherent vs avoidable" split.
    locally {
      graft.functions.NativeFunctions.register(spark)
      // Full-corpus wall-clock (same noop-write protocol as the rows
      // above — a filtered count() would let Catalyst push the family
      // predicate into candidate generation and time a pruned plan).
      val tSkew = time(queries.LlmPipeline.prefixFilterJoin _, bigDir)
      val famOut = queries.LlmPipeline.prefixFilterJoin(spark, bigDir)
        .filter(col("id1") >= 1000000000L).count()
      val shBig = graft.sources.Tables.documents(spark, bigDir)
        .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
        .select("doc_id", "sh")
      val famCand = queries.LlmPipeline.ppjoinCandidates(shBig)
        .filter(col("id1") >= 1000000000L).count()
      println(f"| q135_prefix_filter_join (${replicas}x + skew family) | — | $tSkew%.1f | output-bound |")
      println(s"q135 skew family: candidates=$famCand output=$famOut " +
        f"(candidate-to-output ratio ${famCand.toDouble / famOut}%.3f)")
      require(famOut == 1999000L, s"family output $famOut != C(2000,2)")
      require(famCand == famOut,
        s"post-filter family candidates $famCand != qualifying output $famOut — avoidable verify work")
    }

    // Incremental dedup (q144, r7): the per-crawl ingest pattern —
    // 25% of the corpus is the "new shard", the rest is read as the
    // STORED band index + shingle table written by the prepare step
    // (ensureBandIndex; at 100 TB that write happened at the previous
    // ingest). Measured on the SKEW corpus (the boilerplate family
    // splits 1:3 across new/old, so degenerate index buckets exist and
    // are capped at write time). Prepare is timed separately for
    // honesty: the incremental row is the cost a crawl actually pays —
    // shingle+band the shard, probe the index, verify candidates.
    locally {
      val fn = queries.LlmPipeline.incrementalDedup _
      queries.LlmPipeline.prepareIncrementalDedup(spark, "/root/testdata/sf0.01")
      time(fn, "/root/testdata/sf0.01") // warm
      def prep(dir: String): Double = {
        val t0 = System.nanoTime()
        queries.LlmPipeline.prepareIncrementalDedup(spark, dir)
        (System.nanoTime() - t0) / 1e9
      }
      val pBase = prep(baseDir)
      val tBase = time(fn, baseDir)
      val pBig = prep(bigDir)
      val tBig = time(fn, bigDir)
      println(f"| q144_incremental_dedup (${replicas}x + skew, stored index) | $tBase%.1f | $tBig%.1f | ${tBig / tBase}%.1f |")
      println(f"q144 one-time index build (prepare, excluded): sf0.1 $pBase%.1f s, ${replicas}x $pBig%.1f s")
    }

    // Sanity: replica pairs must be EXACTLY 10x the fixture's q75 pair
    // count (disjoint shingle universes), and the boilerplate family —
    // whose every band bucket is degenerate — must stay within the cap's
    // worst-case bound of cap·(cap−1)/2 pairs per band x 16 bands
    // (members kept per bucket can differ across bands, so the union
    // bound is per-band, not global). Without the cap it would approach
    // 2000·1999/2 ≈ 2.0M pairs emitted from single tasks.
    graft.functions.NativeFunctions.register(spark)
    val basePairs = queries.LlmPipeline.minhashLsh(spark, baseDir).count()
    val sh = graft.sources.Tables.documents(spark, bigDir)
      .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh")
    val pairs = queries.LlmPipeline.lshNearDupPairs(sh)
      .select(col("id1"), col("id2")).persist()
    val boilerPairs = pairs.filter(col("id1") >= 1000000000L).count()
    val repPairs = pairs.filter(col("id1") < 1000000000L).count()
    val cap = queries.LlmPipeline.LshBucketCap.toLong
    val bound = 16L * cap * (cap - 1) / 2
    println(s"pairs: replicas=$repPairs (= $replicas x base $basePairs: ${repPairs == replicas * basePairs}), " +
      s"boiler=$boilerPairs (16-band cap bound $bound: ${boilerPairs <= bound})")
    require(repPairs == replicas * basePairs, s"replica pair count is not exactly ${replicas}x base")
    require(boilerPairs <= bound, "bucket cap bound violated")
    pairs.unpersist()
    // Release the per-dir memoized pair graphs this run pinned (ADVICE
    // r6): ScaleCurve touches 4+ fixture dirs in one session.
    queries.LlmPipeline.clearPairGraphCache(spark)
    spark.stop()
  }
}
