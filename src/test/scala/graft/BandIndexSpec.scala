package graft

import org.apache.spark.sql.functions._

/** Guards for the q144 stored band index (VERDICT r6 item 1):
  *
  *  1. The degenerate-bucket cap is enforced AT WRITE TIME by
  *     [[graft.queries.LlmPipeline.cappedBandIndex]] — a stored index can
  *     never hand a probe task an unbounded (band, bsig) bucket, and the
  *     kept members are the deterministic lowest doc_ids.
  *  2. A probe against a capped degenerate bucket is output-bounded
  *     (≤ |new members| · cap candidate rows instead of
  *     |new| · |old bucket|) while the keep/reject DECISION for every
  *     probing new doc is preserved — the loss contract documented on
  *     [[graft.queries.LlmPipeline.incrementalDedup]].
  *  3. The q144 result computed from the PERSISTED artifacts
  *     (ensureBandIndex parquet round-trip) equals the result of banding
  *     the standing corpus in-query — storage changes nothing but cost.
  */
class BandIndexSpec extends SparkSpec {
  import spark.implicits._

  /** m byte-identical boilerplate shingle sets: every one of the 16 band
    * buckets is degenerate with all m members.
    */
  private def boilerplate(ids: Seq[Long]) = {
    graft.functions.NativeFunctions.register(spark)
    ids.toDF("doc_id")
      .withColumn("sh", expr("shingle_hash64(array('a b c', 'b c d', 'c d e'))"))
  }

  test("the PERSISTED production index respects LshBucketCap (the constant, not a literal)") {
    // The adversarial tests below drive the mechanism with a tiny cap;
    // this one pins the production wiring: the index ensureBandIndex
    // actually writes to disk is bounded by the named constant, so a
    // future edit that hardcodes a different literal in the write path
    // fails here.
    val (bandsPath, _) = queries.LlmPipeline.ensureBandIndex(spark, sfDir)
    val widest = spark.read.parquet(bandsPath)
      .groupBy("band", "bsig").count()
      .agg(max("count")).head.getLong(0)
    assert(widest <= queries.LlmPipeline.LshBucketCap,
      s"stored band index has a bucket of $widest members — exceeds " +
        s"LshBucketCap=${queries.LlmPipeline.LshBucketCap}")
  }

  test("index buckets are capped at write time to the lowest doc_ids") {
    val oldIds = (0L until 800L).filter(_ % 4 != 0) // 600 standing-corpus docs
    val cap = 8
    val idx = queries.LlmPipeline.cappedBandIndex(boilerplate(oldIds), cap)
    val bucketSizes = idx.groupBy("band", "bsig").count()
      .agg(max("count")).as[Long].head()
    assert(bucketSizes == cap,
      s"write-time cap violated: widest stored bucket has $bucketSizes members, cap is $cap")
    val kept = idx.select("doc_id").distinct().as[Long].collect().toSet
    assert(kept == oldIds.take(cap).toSet,
      s"cap must keep the deterministic lowest doc_ids; kept=$kept")
  }

  test("degenerate index bucket: probe output is bounded, keep/reject decision preserved") {
    val oldIds = (0L until 800L).filter(_ % 4 != 0)
    val newIds = (0L until 200L).filter(_ % 4 == 0) // 50 probing docs
    val cap = 8
    val idx = queries.LlmPipeline.cappedBandIndex(boilerplate(oldIds), cap)
    val probe = queries.LlmPipeline.lshBands(boilerplate(newIds))
      .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
      .join(idx.select(col("doc_id").as("old_id"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select("new_id", "old_id").distinct()
    val candidates = probe.count()
    // Uncapped this bucket family would emit 50 · 600 = 30,000 distinct
    // candidates; the write-time cap bounds it to 50 · cap.
    assert(candidates == newIds.size.toLong * cap,
      s"probe emitted $candidates candidates, expected ${newIds.size * cap}")
    // Every probing doc still finds partners — the boilerplate it
    // near-duplicates is represented by the kept members, so the
    // keep-first policy rejects exactly the same new docs as the
    // uncapped index would.
    val decided = probe.select("new_id").distinct().count()
    assert(decided == newIds.size.toLong,
      s"only $decided of ${newIds.size} probing docs found an old partner — decision changed")
  }

  test("q144 from the persisted index equals the in-query band build (sf0.001)") {
    graft.functions.NativeFunctions.register(spark)
    val stored = queries.LlmPipeline.incrementalDedup(spark, sfDir)
      .as[(Long, Long, Long)].collect().toSeq
    // The pre-r7 shape: band the standing corpus inside the query.
    val sh = graft.sources.Tables.documents(spark, sfDir)
      .withColumn("sh", expr("shingle_hash64(word_shingles(text, 3))"))
      .select("doc_id", "sh")
    val shNew = sh.filter(col("doc_id") % 4 === 0)
    val shOld = sh.filter(col("doc_id") % 4 =!= 0)
    val cand = queries.LlmPipeline.lshBands(shNew)
      .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
      .join(queries.LlmPipeline.lshBands(shOld)
          .select(col("doc_id").as("old_id"), col("band"), col("bsig")),
        Seq("band", "bsig"))
      .select("new_id", "old_id").distinct()
    val nDupOld = cand
      .join(shNew.select(col("doc_id").as("new_id"), col("sh").as("sh_n")), "new_id")
      .join(shOld.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), "old_id")
      .filter(expr("jaccard_sim(sh_n, sh_o)") >= 0.5)
      .groupBy(col("new_id").as("doc_id")).agg(count(lit(1)).as("n_dup_old"))
    val nDupNew = queries.LlmPipeline.lshNearDupPairs(shNew)
      .groupBy(col("id2").as("doc_id")).agg(count(lit(1)).as("n_dup_new"))
    val inline = nDupOld.join(nDupNew, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("n_dup_old"), lit(0L)).as("n_dup_old"),
        coalesce(col("n_dup_new"), lit(0L)).as("n_dup_new"))
      .orderBy("doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(stored == inline,
      "persisted-index q144 diverged from the in-query band build")
  }
}
