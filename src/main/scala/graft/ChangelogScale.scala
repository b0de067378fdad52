package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (round 9; window family added round 10): empirical scale
  * evidence for the two per-user-window families over the event log —
  * the changelog maintenance family (q114 compaction, q115 SCD2 build,
  * q124 incremental agg, q157 SCD2 merge) and the analytic window
  * family sharing the same (user_id → ts, event_id) partitioning
  * discipline (q40 lag/lead, q41 running sum, q42 trailing range
  * frame, q62 session windows, q94 funnel, q139 transition matrix,
  * q166 sequence motifs, q167 sessionized motifs) —
  * the companion to ScaleCurve's LSH curve. These operators' 100-TB
  * claims are LINEARITY claims (each is one key-partitioned shuffle +
  * in-partition sorts; no stage accumulates unbounded per-key state),
  * so the expected ratio at N× data is ≈ N, and the red flag is
  * super-linear growth (a window or join whose cost bends upward with
  * log size).
  *
  * Corpus construction (deterministic, no RNG): N replicas of the
  * sf0.1 events log with per-replica user_id/event_id offsets —
  * disjoint key universes, so workload grows exactly N× and per-key
  * history depth (the window length) stays FIXED: the measurement
  * isolates volume scaling from history-depth scaling. The replica
  * offsets keep (ts, event_id) ordering within every key identical to
  * the fixture's, so all four operators compute replica-identical
  * results — require-checked via row counts (q115 rows must be exactly
  * N× the base build).
  *
  * Usage: `sbt "runMain graft.ChangelogScale [replicas]"` (default
  * 100). SPARK_GRAFT_CPUS as in Bench/ScaleCurve. Prints a markdown
  * table for BASELINE.md.
  */
object ChangelogScale {
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
    val bigDir = s"/tmp/graft_chlog${replicas}x_${queries.SourcesOps.sanitizedAppId(spark)}"

    // --- corpus: N disjoint replicas of the event log ---------------------
    // The N-replica corpus is multi-GB: delete it even on a failed
    // require rather than leak one /tmp directory per run (ADVICE r9).
    try {
    val base = graft.sources.Tables.events(spark, baseDir)
    base.crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(
        (col("event_id") + col("rep") * 1000000000000L).as("event_id"),
        col("ts"),
        (col("user_id") + col("rep") * 1000000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$bigDir/events.parquet")
    val nBig = spark.read.parquet(s"$bigDir/events.parquet").count()
    println(s"corpus: base=${base.count()} events, big=$nBig (${replicas}x, disjoint users) at $bigDir")

    val probes: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "q114_log_compaction" -> queries.Changelog.logCompaction _,
      "q115_scd2_history" -> queries.Changelog.scd2History _,
      "q124_incremental_agg" -> queries.Changelog.incrementalAgg _,
      "q157_scd2_merge" -> queries.Changelog.scd2Merge _,
      // Analytic window family (VERDICT r9 item 6): same per-user
      // partitioning, disjoint-user replicas ⇒ exact-N× invariants.
      "q40_lag_lead" -> queries.Windows.lagLead _,
      "q41_running_sum" -> queries.Windows.runningSum _,
      "q42_trailing_7d" -> queries.Windows.trailing7d _,
      "q62_session_windows" -> queries.Sessions.sessionWindows _,
      "q94_funnel" -> queries.Sessions.funnel _,
      "q139_transition_matrix" -> queries.Sessions.transitionMatrix _,
      "q166_sequence_motifs" -> queries.Sessions.sequenceMotifs _,
      "q167_session_motifs" -> queries.Sessions.sessionMotifs _,
      "q173_session_funnel_classes" -> queries.Sessions.sessionFunnelClasses _,
      "q175_session_define_motifs" -> queries.Sessions.sessionDefineMotifs _,
      "q180_session_skip_motifs" -> queries.Sessions.sessionSkipMotifs _,
      "q182_sketch_maintenance" -> queries.Aggregates.sketchMaintenance _,
      "q183_quantile_maintenance" -> queries.Aggregates.quantileMaintenance _,
      "q184_freq_sketch_maintenance" -> queries.Aggregates.freqSketchMaintenance _)

    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // Warm-up (JIT + codegen) at the smallest sf.
    probes.foreach { case (_, fn) => time(fn, "/root/testdata/sf0.001") }

    println(s"| query | sf0.1 (s) | ${replicas}x (s) | ratio (linear = $replicas) |")
    println("|---|---|---|---|")
    probes.foreach { case (name, fn) =>
      val tBase = time(fn, baseDir)
      val tBig = time(fn, bigDir)
      println(f"| $name | $tBase%.1f | $tBig%.1f | ${tBig / tBase}%.1f |")
    }

    // Replica-identity requires: disjoint keys ⇒ exact N× row counts,
    // and the merge must still equal the rebuild at N× (the q157
    // contract does not degrade with volume).
    val baseRows = queries.Changelog.scd2History(spark, baseDir).count()
    val bigRows = queries.Changelog.scd2History(spark, bigDir).count()
    println(s"q115 rows: base=$baseRows big=$bigRows (exactly ${replicas}x: ${bigRows == replicas * baseRows})")
    require(bigRows == replicas * baseRows, s"SCD2 row count is not exactly ${replicas}x base")
    val mergeDiff = queries.Changelog.scd2Merge(spark, bigDir)
      .exceptAll(queries.Changelog.scd2History(spark, bigDir)).count()
    println(s"q157 merge == rebuild at ${replicas}x: ${mergeDiff == 0}")
    require(mergeDiff == 0, s"merge diverged from rebuild at ${replicas}x ($mergeDiff rows)")

    // Window-family invariants: disjoint-user replicas make every
    // per-user window replica-local, so outputs must scale EXACTLY N× —
    // per-event outputs (q41) and session counts (q62) by row count,
    // and the q139 transition matrix cell-by-cell (same key set, every
    // count exactly N× the base count). Any off-by-anything here means
    // a window leaked across the replica boundary.
    val wBase = queries.Windows.runningSum(spark, baseDir).count()
    val wBig = queries.Windows.runningSum(spark, bigDir).count()
    require(wBig == replicas * wBase, s"q41 rows: big=$wBig != $replicas x $wBase")
    val sBase = queries.Sessions.sessionWindows(spark, baseDir).count()
    val sBig = queries.Sessions.sessionWindows(spark, bigDir).count()
    require(sBig == replicas * sBase, s"q62 sessions: big=$sBig != $replicas x $sBase")
    val mBase = queries.Sessions.transitionMatrix(spark, baseDir)
      .withColumnRenamed("n", "n_base")
    val mBig = queries.Sessions.transitionMatrix(spark, bigDir)
      .withColumnRenamed("n", "n_big")
    val badCells = mBase.join(mBig, Seq("prev_type", "next_type"), "full")
      .filter(col("n_big").isNull || col("n_base").isNull ||
        col("n_big") =!= col("n_base") * replicas)
      .count()
    require(badCells == 0, s"q139 matrix: $badCells cells not exactly ${replicas}x base")
    // q166: disjoint-user replicas keep every symbol sequence identical
    // to its base user's, so user count AND motif totals must be
    // exactly Nx (a boundary leak would splice sequences and change
    // motif counts, not just row counts).
    val qmBase = queries.Sessions.sequenceMotifs(spark, baseDir)
      .agg(count(lit(1)).as("n"), sum("n_vcp").as("v"), sum("n_pattern").as("p")).head()
    val qmBig = queries.Sessions.sequenceMotifs(spark, bigDir)
      .agg(count(lit(1)).as("n"), sum("n_vcp").as("v"), sum("n_pattern").as("p")).head()
    require(qmBig.getLong(0) == replicas * qmBase.getLong(0),
      s"q166 users: big=${qmBig.getLong(0)} != $replicas x ${qmBase.getLong(0)}")
    require(qmBig.getLong(1) == replicas * qmBase.getLong(1) &&
      qmBig.getLong(2) == replicas * qmBase.getLong(2),
      s"q166 motif totals not exactly ${replicas}x base")
    // q167: sessions are replica-local too, so session count and
    // within-session motif totals must also be exactly Nx.
    val smBase = queries.Sessions.sessionMotifs(spark, baseDir)
      .agg(count(lit(1)).as("n"), sum("n_vcp").as("v")).head()
    val smBig = queries.Sessions.sessionMotifs(spark, bigDir)
      .agg(count(lit(1)).as("n"), sum("n_vcp").as("v")).head()
    require(smBig.getLong(0) == replicas * smBase.getLong(0) &&
      smBig.getLong(1) == replicas * smBase.getLong(1),
      s"q167 session/motif totals not exactly ${replicas}x base")
    // q173: the funnel-class counts (exclusion/alternation/abandonment)
    // are session-local, so sessions and all three class totals must be
    // exactly Nx as well.
    val fcBase = queries.Sessions.sessionFunnelClasses(spark, baseDir)
      .agg(count(lit(1)).as("n"), sum("n_conv").as("c"), sum("n_assist").as("a"),
        sum("n_abandoned").as("ab")).head()
    val fcBig = queries.Sessions.sessionFunnelClasses(spark, bigDir)
      .agg(count(lit(1)).as("n"), sum("n_conv").as("c"), sum("n_assist").as("a"),
        sum("n_abandoned").as("ab")).head()
    require((0 to 3).forall(i => fcBig.getLong(i) == replicas * fcBase.getLong(i)),
      s"q173 session/class totals not exactly ${replicas}x base")
    // q175: the DEFINE alphabet is row-local, so its motif totals are
    // session-local too — exactly Nx.
    val dmBase = queries.Sessions.sessionDefineMotifs(spark, baseDir)
      .agg(count(lit(1)).as("n"), sum("n_premium_conv").as("pc"),
        sum("n_upsell").as("u")).head()
    val dmBig = queries.Sessions.sessionDefineMotifs(spark, bigDir)
      .agg(count(lit(1)).as("n"), sum("n_premium_conv").as("pc"),
        sum("n_upsell").as("u")).head()
    require((0 to 2).forall(i => dmBig.getLong(i) == replicas * dmBase.getLong(i)),
      s"q175 session/motif totals not exactly ${replicas}x base")
    // q180: bounded/skip/reluctant counts are session-local string
    // functions of replica-identical sequences — exactly Nx.
    val skBase = queries.Sessions.sessionSkipMotifs(spark, baseDir)
      .agg(count(lit(1)).as("n"), sum("n_burst_conv").as("b"),
        sum("n_skip_conv").as("s"), sum("n_conv_reluctant").as("r")).head()
    val skBig = queries.Sessions.sessionSkipMotifs(spark, bigDir)
      .agg(count(lit(1)).as("n"), sum("n_burst_conv").as("b"),
        sum("n_skip_conv").as("s"), sum("n_conv_reluctant").as("r")).head()
    require((0 to 3).forall(i => skBig.getLong(i) == replicas * skBase.getLong(i)),
      s"q180 session/motif totals not exactly ${replicas}x base")
    // q182: disjoint-user replicas make the exact distinct count exactly
    // Nx, and both sketch contract cells must still hold at Nx distinct
    // values (the sketch is well past sparse mode there — the regime the
    // fixture alone cannot reach).
    val skm = queries.Aggregates.sketchMaintenance(spark, bigDir).collect()
    val skmBase = queries.Aggregates.sketchMaintenance(spark, baseDir).collect()
    require(skm.head.getLong(2) == replicas * skmBase.head.getLong(2),
      s"q182 exact_total not exactly ${replicas}x base")
    require(skm.forall(r => r.getBoolean(3) && r.getBoolean(4)),
      s"q182 sketch contract cells flipped at ${replicas}x")
    // q183: replicas copy the VALUE column verbatim, so the N× corpus
    // has the identical value distribution — exact percentiles must
    // match the base run's to within one interpolation gap (continuous
    // percentiles of an N-replicated multiset can shift by at most the
    // adjacent-element gap, ≤ a few cents at these densities), while
    // n_events scales exactly N× and the KLL contract cells hold on a
    // 100×-longer stream (the many-compactions regime the fixture
    // alone cannot reach).
    val klq = queries.Aggregates.quantileMaintenance(spark, bigDir).collect()
    val klqBase = queries.Aggregates.quantileMaintenance(spark, baseDir).collect()
    require(klq.length == klqBase.length, s"q183 group count drifted at ${replicas}x")
    klq.zip(klqBase).foreach { case (b, s) =>
      require(b.getLong(1) == replicas * s.getLong(1),
        s"q183 n_events not exactly ${replicas}x for ${s.getString(0)}")
      require(math.abs(b.getDouble(2) - s.getDouble(2)) <= 0.05 &&
        math.abs(b.getDouble(3) - s.getDouble(3)) <= 0.05 &&
        math.abs(b.getDouble(4) - s.getDouble(4)) <= 0.05,
        s"q183 exact percentiles drifted at ${replicas}x for ${s.getString(0)} — " +
          "the replicated distribution must be percentile-identical up to one gap")
    }
    require(klq.forall(r => r.getBoolean(5) && r.getBoolean(6)),
      s"q183 KLL contract cells flipped at ${replicas}x")
    // q184: disjoint-user replicas copy each base user's event multiset
    // onto N fresh ids, so per-user counts are UNCHANGED while n grows
    // N× — at N ≥ 8 the base maximum count exists on ≥ N users and the
    // exact top-8 must be eight ties at exactly that count. The CM
    // contract cells must hold with N× the collision mass in every
    // cell (the deep-counter regime the fixture cannot reach), and the
    // never-underestimate/bit-identity theorems are load-bearing there.
    val cmBig = queries.Aggregates.freqSketchMaintenance(spark, bigDir).collect()
    val cmBase = queries.Aggregates.freqSketchMaintenance(spark, baseDir).collect()
    require(cmBig.head.getLong(2) == replicas * cmBase.head.getLong(2),
      s"q184 n_events not exactly ${replicas}x base")
    if (replicas >= 8) {
      val baseTop = cmBase.head.getLong(1)
      require(cmBig.forall(_.getLong(1) == baseTop),
        s"q184 top-8 at ${replicas}x not all at the base top count $baseTop: " +
          cmBig.map(_.getLong(1)).mkString(","))
    }
    require(cmBig.forall(r => r.getBoolean(3) && r.getBoolean(4) && r.getBoolean(5)),
      s"q184 CM contract cells flipped at ${replicas}x")
    // --- q185: theta set algebra on an N× lineitem corpus ----------------
    // Its own replica corpus (lineitem, not events): l_partkey offsets
    // are disjoint per replica while timestamps are copied verbatim, so
    // every exact set cardinality (per-year, intersection, difference,
    // union) must scale EXACTLY N×. At N× the sketches are in deep
    // estimation mode (≈ 2M keys/year vs k = 4096 retained), where the
    // fixture-calibrated ±2 % point cells are no longer the honest
    // claim — the scale law is that the TRUTH stays inside each
    // sketch's OWN [lb(3σ), ub(3σ)] interval, which widens with depth
    // automatically (theta_bounds / theta_intersect_bounds /
    // theta_anotb_bounds). Fixture-cell values at N× are printed for
    // the record, not required.
    val liDir = s"$bigDir/li_corpus"
    val liBase = graft.sources.Tables.lineitem(spark, baseDir)
    liBase
      .crossJoin(spark.range(replicas).select(col("id").as("rep")))
      .select(liBase.columns.map {
        case "l_partkey" => (col("l_partkey") + col("rep") * 100000000L).as("l_partkey")
        case c => col(c)
      }: _*)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$liDir/lineitem.parquet")
    def timeQ185(dir: String): Double = {
      val t0 = System.nanoTime()
      queries.Aggregates.setSketchMaintenance(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val t185Base = timeQ185(baseDir)
    val t185Big = timeQ185(liDir)
    println(f"| q185_set_sketch_maintenance | $t185Base%.1f | $t185Big%.1f " +
      f"| ${t185Big / t185Base}%.1f |")
    val exBig = queries.Aggregates.thetaYearExact(spark, liDir).head()
    val exBase = queries.Aggregates.thetaYearExact(spark, baseDir).head()
    (0 to 4).foreach { i =>
      require(exBig.getLong(i) == replicas * exBase.getLong(i),
        s"q185 exact field $i not exactly ${replicas}x: " +
          s"${exBig.getLong(i)} vs $replicas x ${exBase.getLong(i)}")
    }
    val skRow = queries.Aggregates.thetaYearSketches(spark, liDir)
      .select(
        expr("theta_bounds(ska)").as("ba"), expr("theta_bounds(skb)").as("bb"),
        expr("theta_intersect_bounds(ska, skb)").as("bi"),
        expr("theta_anotb_bounds(ska, skb)").as("bd"),
        expr("theta_bounds(mu)").as("bu")).head()
    def inBounds(b: Seq[Double], exact: Long): Boolean =
      exact >= b(0) && exact <= b(2)
    val boundsOk = Seq(
      ("a", skRow.getSeq[Double](0), exBig.getLong(0)),
      ("b", skRow.getSeq[Double](1), exBig.getLong(1)),
      ("inter", skRow.getSeq[Double](2), exBig.getLong(2)),
      ("diff", skRow.getSeq[Double](3), exBig.getLong(3)),
      ("union", skRow.getSeq[Double](4), exBig.getLong(4)))
    boundsOk.foreach { case (name, b, exact) =>
      println(f"q185 $name at ${replicas}x: exact=$exact est=${b(1)}%.1f " +
        f"bounds=[${b(0)}%.1f, ${b(2)}%.1f] relerr=${math.abs(b(1) - exact) / math.max(1L, exact)}%.4f")
      require(inBounds(b, exact),
        s"q185 $name truth $exact outside the sketch's own 3-sigma bounds " +
          s"[${b(0)}, ${b(2)}] at ${replicas}x")
    }
    val cells185 = queries.Aggregates.setSketchMaintenance(spark, liDir).head()
    println(s"q185 fixture-calibrated cells at ${replicas}x (recorded, not required): " +
      s"ab=${cells185.getBoolean(7)} inter=${cells185.getBoolean(8)} " +
      s"diff=${cells185.getBoolean(9)} union=${cells185.getBoolean(10)}")

    println(s"window-family invariants: q41 rows ${replicas}x, q62 sessions ${replicas}x, " +
      s"q139 matrix cell-exact ${replicas}x, q166 users+motifs ${replicas}x, " +
      s"q167 sessions+motifs ${replicas}x, q173 sessions+classes ${replicas}x, " +
      s"q175 DEFINE motifs ${replicas}x, q180 skip motifs ${replicas}x, " +
      s"q182 exact ${replicas}x distinct + contract cells — all hold")
    } finally {
      queries.LlmPipeline.deleteRecursively(java.nio.file.Paths.get(bigDir))
    }
    spark.stop()
  }
}
