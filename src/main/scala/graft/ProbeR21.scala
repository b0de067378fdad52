package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.{LlmPipeline, PlaneChains, SqlGateway}
import graft.sources.Tables

/** r21 phase-level probe for the transaction-contract queries (scratch
  * measurement tool; not part of the bench surface). Times each phase
  * of q210's body so the optimization targets the real cost.
  */
object ProbeR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    // prepare (bench-excluded in the real bench)
    LlmPipeline.prepareTakedownCommit(spark, sfDir)
    val pqRoot = LlmPipeline.ensurePqIndex(spark, sfDir)

    if (sys.env.get("PROBE_Q179").contains("1")) {
      (1 to 2).foreach { round =>
        println(s"--- q179 phase split, round $round ---")
        val pairs = t("multiProbeVerifiedPairs noop") {
          val p = LlmPipeline.multiProbeVerifiedPairs(spark, sfDir,
            LlmPipeline.MpBits, LlmPipeline.SemDedupProbeHamming,
            LlmPipeline.SemDedupProbeBudget).select("id1", "id2")
          p.write.format("noop").mode("overwrite").save()
          p
        }
        val edges = pairs.union(
          pairs.select(col("id2").as("id1"), col("id1").as("id2")))
        val labels = t("minLabelComponents") {
          LlmPipeline.minLabelComponents(edges)
        }
        // Instrumented copy of the loop: per-round timing + round count.
        t("CC loop instrumented") {
          val e2 = edges.persist()
          var labs = e2.select(col("id1").as("id")).distinct()
            .withColumn("label", col("id"))
            .localCheckpoint()
          def labelSum(df: org.apache.spark.sql.DataFrame) =
            df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
          var prevSum = labelSum(labs)
          var converged = false
          var rounds = 0
          while (!converged && rounds < 64) {
            val t0 = System.nanoTime()
            val prop = e2.join(labs, e2("id1") === labs("id"))
              .select(col("id2").as("id"), col("label"))
            val next = labs.select("id", "label").union(prop)
              .groupBy("id").agg(min("label").as("label"))
              .localCheckpoint()
            val nextSum = labelSum(next)
            labs = next
            converged = nextSum.compareTo(prevSum) == 0
            prevSum = nextSum
            rounds += 1
            println(f"PROBE   cc round $rounds ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
          e2.unpersist()
          rounds
        }
        t("sizes + join + orderBy noop") {
          val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
          labels.join(sizes, "label")
            .select(col("id").as("vec_id"), col("label").as("cluster"),
              col("cluster_size"), (col("id") === col("label")).as("kept"))
            .orderBy("vec_id")
            .write.format("noop").mode("overwrite").save()
        }
      }
      spark.stop()
      return
    }

    (1 to 2).foreach { round =>
      println(s"--- q210 phase split, round $round ---")
      val logDir = java.nio.file.Files.createTempDirectory("graft-probe-log-")
      val planesRoot = java.nio.file.Files.createTempDirectory("graft-probe-pl-")
      t("bootstrapPlanesManifest") {
        LlmPipeline.bootstrapPlanesManifest(spark, sfDir, logDir)
      }
      val shardDocs = t("shardDocs localCheckpoint") {
        Tables.documents(spark, sfDir)
          .filter(col("doc_id") % 4 === 0).select("doc_id", "text")
          .localCheckpoint()
      }
      val shardEmb = t("shardEmb localCheckpoint") {
        Tables.embeddings(spark, sfDir)
          .filter(col("vec_id") % 4 === 0).select("vec_id", "embedding")
          .localCheckpoint()
      }
      // Inline copy of stageAdmissionDeltasPartial with per-step timers.
      locally {
        graft.functions.NativeFunctions.register(spark)
        val baseGen = SqlGateway.occCurrentGen(logDir)
        val m = SqlGateway.occManifestAt(logDir, baseGen)
        def res(p: String) = PlaneChains.resolve(spark, p, m(p))
        import PlaneChains.{Elem, U, A, M, O}
        val sd = shardDocs
        val (shardPostings, shardDl, shardStats) =
          t("postingsFor(shard)")(LlmPipeline.postingsFor(sd))
        val positionsD = LlmPipeline.positionalPostingsFor(sd)
        val idxD = LlmPipeline.admissionIdxDelta(sd)
        val shardSh = LlmPipeline.shingledFor(sd)
        val shardBands = LlmPipeline.lshBands(shardSh)
        val bands0 = res("bands")
        val sh0 = res("shingles")
        val candOldNew = shardBands
          .select(col("doc_id").as("new_id"), col("band"), col("bsig"))
          .join(bands0.select(col("doc_id").as("old_id"), col("band"), col("bsig")),
            Seq("band", "bsig"))
          .select("new_id", "old_id").distinct()
        val verifiedOldNew = candOldNew
          .join(broadcast(shardSh.select(col("doc_id").as("new_id"), col("sh").as("sh_n"))),
            "new_id")
          .join(sh0.select(col("doc_id").as("old_id"), col("sh").as("sh_o")), "old_id")
          .withColumn("jaccard", expr("jaccard_sim(sh_n, sh_o)"))
          .filter(col("jaccard") >= 0.5)
          .select(least(col("new_id"), col("old_id")).as("id1"),
            greatest(col("new_id"), col("old_id")).as("id2"), col("jaccard"))
        val deltaPairs = t("deltaPairs localCheckpoint") {
          verifiedOldNew
            .unionByName(LlmPipeline.lshNearDupPairs(shardSh).select("id1", "id2", "jaccard"))
            .localCheckpoint()
        }
        val labels0 = res("labels")
        val deltaEdges = deltaPairs.select("id1", "id2")
        val labelDeltas = t("labelDeltas localCheckpoint") {
          LlmPipeline.mergeComponentDeltas(labels0, deltaEdges).localCheckpoint()
        }
        val labelsD = labelDeltas.select(col("id"), col("cluster").as("label"))
          .withColumn("retract", lit(false))
        val affClusters = labelDeltas.select(col("cluster").as("label")).distinct()
        val staleLabels = labels0
          .join(broadcast(labelDeltas.select("id")), Seq("id"), "left_semi")
          .select("label").unionByName(affClusters).distinct()
        val touchedMembers = labels0
          .join(broadcast(affClusters), Seq("label"), "left_semi")
          .select("id", "label")
          .unionByName(labelDeltas.select(col("id"), col("cluster").as("label")))
        val docstatsM = res("docstats").unionByName(shardDl)
        val electRows = t("electRows localCheckpoint") {
          LlmPipeline.electRepresentatives(
            touchedMembers, docstatsM.select(col("doc_id").as("id"), col("dl")))
            .localCheckpoint()
        }
        val repsD = electRows.withColumn("retract", lit(false))
          .unionByName(staleLabels
            .join(electRows.select("label"), Seq("label"), "left_anti")
            .select(col("label"), lit(null).cast("long").as("rep_id"),
              lit(null).cast("long").as("cluster_size"), lit(true).as("retract")))
        val textOuts: Seq[(String, PlaneChains.Kind, org.apache.spark.sql.DataFrame)] = Seq(
          ("index", M, idxD), ("postings", U, shardPostings),
          ("positions", U, positionsD), ("docstats", U, shardDl),
          ("stats", A, shardStats),
          ("bands", U, shardBands.select("doc_id", "band", "bsig")),
          ("shingles", U, shardSh), ("pairs", U, deltaPairs),
          ("labels", O, labelsD), ("reps", O, repsD))
        val annOuts = t("annOuts define (pqAdmitShard)") {
          val shardVecs = LlmPipeline.mpVecsFor(shardEmb)
          val keysD = LlmPipeline.mpKeysFor(shardVecs, LlmPipeline.MpBits)
          val (cellsD, codesD) = LlmPipeline.pqAdmitShard(spark, pqRoot, sfDir, shardEmb)
          Seq(("ann_keys", U, shardVecs), ("ann_vecs", U, shardVecs),
            ("pq_cells", U, cellsD), ("pq_codes", U, codesD))
        }
        t("14 staged writes (sequential)") {
          (textOuts ++ annOuts).zipWithIndex.foreach { case ((p, k, df), i) =>
            df.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
              .parquet(s"$planesRoot/probe-$p")
          }
        }
        t("occTryCommitManifest") {
          SqlGateway.occTryCommitManifest(logDir, baseGen,
            LlmPipeline.TakedownPlanes.map(p => p -> m(p)))
        }
      }
      // Real commit so the audit phases below see generation 1.
      t("commitAdmissionDeltas (real)") {
        LlmPipeline.commitAdmissionDeltas(
          spark, planesRoot.toString, logDir, shardDocs, shardEmb, sfDir,
          pqRoot, "a1")
      }
      val finalGen = SqlGateway.occCurrentGen(logDir)
      t("consistency audit gen0") {
        LlmPipeline.manifestPlanesConsistent(spark, logDir, 0L)
      }
      t("consistency audit gen1") {
        LlmPipeline.manifestPlanesConsistent(spark, logDir, 1L)
      }
      val mF = SqlGateway.occManifestAt(logDir, finalGen)
      def resF(p: String) = PlaneChains.resolve(spark, p, mF(p))
      t("shard_missing counts (9 planes)") {
        def missingDoc(plane: String): Long =
          shardDocs.select("doc_id")
            .join(resF(plane).select("doc_id").distinct(),
              Seq("doc_id"), "left_anti").count()
        def missingVec(plane: String): Long =
          shardEmb.select("vec_id")
            .join(resF(plane).select("vec_id").distinct(),
              Seq("vec_id"), "left_anti").count()
        Seq("postings", "positions", "docstats", "bands", "shingles")
          .map(missingDoc).sum +
          Seq("ann_keys", "ann_vecs", "pq_cells", "pq_codes")
            .map(missingVec).sum
      }
      t("staged/base dirBytes") {
        val stagedBytes = PlaneChains.dirBytes(planesRoot)
        val m0 = SqlGateway.occManifestAt(logDir, 0L)
        LlmPipeline.TakedownPlanes.map(p => PlaneChains.paths(m0(p))
          .map(pp => PlaneChains.dirBytes(java.nio.file.Paths.get(pp))).sum)
          .sum + stagedBytes
      }
      t("bm25 read-back + localCheckpoint") {
        LlmPipeline.bm25AgainstArtifacts(
            resF("index"), resF("postings"), resF("stats"))
          .select(col("query_id"), col("rank"), col("doc_id"), col("score_r"))
          .orderBy("query_id", "rank")
          .localCheckpoint()
      }
      LlmPipeline.deleteRecursively(logDir)
      LlmPipeline.deleteRecursively(planesRoot)
    }
    spark.stop()
  }
}
