package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.LlmPipeline

/** IVF codebook maintenance (r15 — VERDICT r14 item 3): the stored
  * k-means codebook meets the shard-admission discipline every other
  * artifact plane already has. The production story: the codebook is
  * trained nightly on the standing corpus; a newly crawled vector
  * shard is admitted by ASSIGNMENT against the stored codebook (one
  * O(|shard|·k) broadcast argmin — no retrain on the ingest path), and
  * the law that makes that sound is a pinned DRIFT CONTRACT —
  * retraining with the shard included moves only a bounded fraction of
  * assignments, so queries against the maintained (stale-codebook)
  * index keep their recall target until the next nightly retrain.
  *
  * The shard here is the newest quarter of the fixture EXCLUDING the
  * seed vectors (vec_id < k are the corpus's oldest rows by
  * construction — they exist from day one, so both trainings share
  * their seeds, exactly as production retrains do). The retrained
  * codebook over the full population IS the stored q95/q161 artifact's
  * recurrence, so the drift law ties the maintenance path to the
  * oracle-verified artifact directly.
  */
class IvfMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.01"

  test("shard admission is total and deterministic; retrain moves only a bounded assignment fraction") {
    val q = LlmPipeline.ivfQuantizedVecs(spark, dir).localCheckpoint()
    val shard = q.filter(col("vec_id") % 4 === 0 && col("vec_id") >= LlmPipeline.IvfCells)
    val corpus = q.exceptAll(shard)
    val cbOld = LlmPipeline.trainIvfCodebook(corpus, LlmPipeline.IvfCells)
    val cbNew = LlmPipeline.trainIvfCodebook(q, LlmPipeline.IvfCells)
    // Admission: every shard vector lands in exactly one cell, and the
    // assignment is a pure function (re-running it is bit-identical).
    val adm = LlmPipeline.ivfAssign(shard, cbOld)
      .as[(Long, Long)].collect().sorted
    assert(adm.length == shard.count(), "shard admission dropped or duplicated vectors")
    val adm2 = LlmPipeline.ivfAssign(shard, cbOld)
      .as[(Long, Long)].collect().sorted
    assert(adm.sameElements(adm2), "shard admission is not deterministic")
    // Drift contract: assignments under the stale (corpus-trained)
    // codebook vs the retrained (full-population) one. Measured at
    // sf0.01: agreement 0.766 (383/500) — near-isotropic fixture
    // vectors make k-means genuinely sensitive to a 25% population
    // change, so the band is pinned at ≥ 0.7 as drift TELEMETRY; the
    // binding operational contract is the recall law below (the
    // maintained index keeps the q161 target — measured 0.933).
    val aOld = LlmPipeline.ivfAssign(q, cbOld)
      .select(col("vec_id"), col("cell").as("m"))
    val aNew = LlmPipeline.ivfAssign(q, cbNew)
      .select(col("vec_id"), col("cell").as("r"))
    val j = aOld.join(aNew, "vec_id").localCheckpoint()
    val n = j.count()
    val agree = j.filter(col("m") === col("r")).count()
    info(s"retrain assignment agreement: $agree/$n = ${agree.toDouble / n}")
    assert(n == q.count(), "assignment lost vectors")
    assert(agree.toDouble / n >= 0.7,
      s"retrain moved ${n - agree} of $n assignments (agreement ${agree.toDouble / n} < 0.7) " +
        "— the stale-codebook admission window is unsound")
  }

  test("queries against the maintained (stale) codebook keep the q161 recall target") {
    graft.functions.NativeFunctions.register(spark)
    val q = LlmPipeline.ivfQuantizedVecs(spark, dir).localCheckpoint()
    // Trained at q161's SHIPPED k (16 since the r16 re-pin) so the law
    // gates the operating point actually served.
    val shard = q.filter(col("vec_id") % 4 === 0 && col("vec_id") >= LlmPipeline.IvfRecallK)
    val cbOld = LlmPipeline.trainIvfCodebook(q.exceptAll(shard), LlmPipeline.IvfRecallK)
    val e = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("d"))
      .withColumn("nrm", expr("sqrt(dot_product(d, d))"))
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("p_id"), col("d").as("pd"), col("nrm").as("pnrm"))
    val w = Window.partitionBy("p_id").orderBy(col("sim").desc, col("c_id").asc)
    val exactTop3 = e.select(col("vec_id").as("c_id"), col("d").as("cd"), col("nrm").as("cnrm"))
      .crossJoin(broadcast(probes))
      .filter(col("c_id") =!= col("p_id"))
      .withColumn("sim", expr("dot_product(pd, cd)") / (col("pnrm") * col("cnrm")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    // The q161 operating point (k=16, nprobe=2 — the r16 re-pin)
    // against the STALE codebook — i.e. searching an index whose
    // newest quarter was admitted by assignment only. The recall
    // target must hold through the admission window.
    val got = LlmPipeline.ivfAnnCfgWith(spark, dir,
        LlmPipeline.IvfRecallNprobe, cbOld)
      .select("p_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = (got & exactTop3).size.toDouble / exactTop3.size
    info(s"maintained-codebook recall@3: ${(got & exactTop3).size}/${exactTop3.size} = $recall")
    assert(recall >= 0.8,
      s"recall@3 under the maintained codebook = $recall < 0.8 — shard admission " +
        "without retrain broke the search contract")
  }

  test("PQ shard admission is a pure re-encode: admitted generations match the stored index bit-for-bit") {
    // The compressed plane's ingest path (r16): a shard admits by two
    // broadcast argmins against the STALE nightly codebooks — no
    // retrain. Encoding is a pure function of (vector, codebooks), so
    // admitting vectors the index already holds must reproduce their
    // stored cells/codes exactly — the determinism that makes
    // at-least-once admission idempotent and the admission window
    // sound (the recall drift story is q161's, gated above).
    val root = LlmPipeline.ensurePqIndex(spark, dir)
    val shard = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id") % 4 === 0)
      .select("vec_id", "embedding")
    assert(shard.count() > 0)
    val (cells, codes) = LlmPipeline.pqAdmitShard(spark, root, dir, shard)
    val storedCells = spark.read.parquet(s"$root/cells")
      .join(shard.select("vec_id"), Seq("vec_id"), "left_semi")
    val storedCodes = spark.read.parquet(s"$root/codes")
      .join(shard.select("vec_id"), Seq("vec_id"), "left_semi")
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(eq(cells, storedCells.select(cells.columns.map(col).toSeq: _*)),
      "admitted coarse cells != stored index rows")
    assert(eq(codes, storedCodes.select(codes.columns.map(col).toSeq: _*)),
      "admitted PQ codes != stored index rows")
  }

  test("packed PQ codes roundtrip losslessly (the stored layout is 4 bytes/vector)") {
    val root = LlmPipeline.ensurePqIndex(spark, dir)
    val q8 = LlmPipeline.pqSubVecs(LlmPipeline.ivfQuantizedVecs(spark, dir))
    val subcb = spark.read.parquet(s"$root/subcb")
    val exploded = LlmPipeline.pqAssign(q8, subcb).withColumnRenamed("cell", "code")
    val roundtrip = LlmPipeline.unpackPqCodes(LlmPipeline.packPqCodes(exploded))
    def eq(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty
    assert(eq(roundtrip, exploded.select("vec_id", "j", "code")),
      "unpack(pack(codes)) != codes — the binary layout is lossy")
    // And the stored plane really is one 4-byte value per vector.
    val stored = spark.read.parquet(s"$root/codes")
    assert(stored.schema("codes").dataType ==
      org.apache.spark.sql.types.BinaryType, "stored codes are not BinaryType")
    val badLen = stored.filter(length(col("codes")) =!= LlmPipeline.PqM / 2).count()
    assert(badLen == 0, s"$badLen stored code rows are not ${LlmPipeline.PqM / 2} bytes")
  }

  test("PQ reads against a stale-codebook mixed index keep the recall target (VERDICT r16 item 7)") {
    // The PQ admission window's BINDING contract (the coarse plane's
    // law two tests up, extended to the compressed read): a shard
    // admitted via pqAdmitShard under STALE sub-codebooks serves q198
    // queries from the mixed index, and recall@3 vs the exact answer
    // must clear the shipped gate until the nightly retrain. Without
    // this, the purity law would be the only PQ admission contract —
    // determinism without a quality floor.
    graft.functions.NativeFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val t = java.nio.file.Files.createTempDirectory("graft_pqstale")
    try {
      val cbOld = LlmPipeline.buildStalePqIndex(spark, dir, t.toString)
      val e = graft.sources.Tables.embeddings(spark, dir)
        .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("d"))
        .withColumn("nrm", expr("sqrt(dot_product(d, d))"))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("p_id"), col("d").as("pd"), col("nrm").as("pnrm"))
      val w = Window.partitionBy("p_id").orderBy(col("sim").desc, col("c_id").asc)
      val exactTop3 = e.select(col("vec_id").as("c_id"), col("d").as("cd"), col("nrm").as("cnrm"))
        .crossJoin(broadcast(probes))
        .filter(col("c_id") =!= col("p_id"))
        .withColumn("sim", expr("dot_product(pd, cd)") / (col("pnrm") * col("cnrm")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select("p_id", "c_id").as[(Long, Long)].collect().toSet
      val got = LlmPipeline.ivfPqAnnAgainst(spark, dir, t.toString,
          coarseOverride = Some(cbOld))
        .select("p_id", "c_id").as[(Long, Long)].collect().toSet
      val recall = (got & exactTop3).size.toDouble / exactTop3.size
      info(s"stale-codebook PQ recall@3: ${(got & exactTop3).size}/${exactTop3.size} = $recall")
      assert(recall >= 0.8,
        s"PQ recall@3 under stale codebooks = $recall < 0.8 — the compressed " +
          "admission window broke the search contract")
    } finally LlmPipeline.deleteRecursively(t)
  }

  test("the k dial: a k=16 codebook trains 16 live cells and assignment stays total") {
    val q = LlmPipeline.ivfQuantizedVecs(spark, dir).localCheckpoint()
    val cb16 = LlmPipeline.trainIvfCodebook(q, 16).localCheckpoint()
    assert(cb16.count() == 16, "k=16 training lost cells")
    val assigned = LlmPipeline.ivfAssign(q, cb16)
    assert(assigned.count() == q.count(), "k=16 assignment lost vectors")
    val live = assigned.select("cell").distinct().count()
    info(s"k=16 live cells: $live")
    assert(live >= 12,
      s"only $live of 16 cells attract vectors — k outgrew the fixture's structure " +
        "(RecallCurve's k sweep picks the shipped point; this guards degeneracy)")
  }
}
