package graft

import java.nio.file.Files

import graft.queries.{LlmPipeline, SqlGateway}
import graft.sources.Tables

/** Durable command-log recovery (q159 — VERDICT r9 item 3): the
  * reference's `commitIndex` semantics (replication.go:88-103) say a
  * node that crashed mid-apply recovers by re-applying its PERSISTED
  * log, and the recovered state must equal a clean single replay.
  * Modeled here as: the warehouse dir + the parquet command log are
  * the durable store; a `spark.newSession()` is the restarted node
  * (all session-scoped state — temp views, in-flight commands — gone;
  * the durable store intact).
  */
class DurableCommandLogSpec extends SparkSpec {

  private def finalState(s: org.apache.spark.sql.SparkSession): Seq[String] =
    s.sql(SqlGateway.durableFinalQuery).collect().map(_.toString).toSeq

  test("q159: replay after partial apply equals replay-once (commitIndex idempotence)") {
    val tmp = Files.createTempDirectory("graft-cmdlog-spec-")
    try {
      val logPath = tmp.resolve("cmdlog.parquet").toString
      SqlGateway.writeCommandLog(spark, logPath)
      // The log round-trips durably: ordered read-back gives exactly
      // the authored command sequence.
      val readBack = spark.read.parquet(logPath)
        .orderBy("seq").select("command").collect().map(_.getString(0)).toSeq
      assert(readBack == SqlGateway.durableLog, "persisted log lost ordering or content")

      // Session A ("pre-crash node"): applies a strict prefix — the
      // crash lands after commitIndex=4 of 6, mid derivation chain.
      Tables.registerAll(spark, sfDir)
      SqlGateway.resetManagedLocations(spark, SqlGateway.durableLogTables)
      SqlGateway.durableLogTables.foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
      SqlGateway.applyLog(spark, SqlGateway.durableLog.take(4))
      // The crash point is real: the final generation does not exist yet.
      assert(!spark.catalog.tableExists("dlog_seg_v2"),
        "partial apply unexpectedly produced the final generation")
      assert(spark.catalog.tableExists("dlog_seg"))

      // Session B ("restarted node"): recovery is a pure function of
      // the durable log — replay everything over the partially-applied
      // store. Idempotent DROP+CTAS pairs make re-applying entries 1-4
      // converge instead of corrupting.
      val s2 = spark.newSession()
      SqlGateway.replayFrom(s2, sfDir, logPath)
      val recovered = finalState(s2)

      // Reference: replay-once over a CLEAN store in a third session.
      val s3 = spark.newSession()
      Tables.registerAll(s3, sfDir)
      SqlGateway.durableLogTables.foreach(t => s3.sql(s"DROP TABLE IF EXISTS $t"))
      SqlGateway.replayFrom(s3, sfDir, logPath)
      val replayOnce = finalState(s3)

      assert(recovered == replayOnce,
        "recovery over partially-applied state diverged from a clean replay")
      assert(recovered.nonEmpty)
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("q159: a second full replay is a fixpoint (re-apply below commitIndex is safe)") {
    val tmp = Files.createTempDirectory("graft-cmdlog-spec2-")
    try {
      val logPath = tmp.resolve("cmdlog.parquet").toString
      SqlGateway.writeCommandLog(spark, logPath)
      val s = spark.newSession()
      SqlGateway.replayFrom(s, sfDir, logPath)
      val once = finalState(s)
      SqlGateway.replayFrom(s, sfDir, logPath)
      assert(finalState(s) == once, "replaying the full log twice changed state")
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("q178: replay-from-snapshot equals replay-from-genesis at EVERY compaction point, across sessions") {
    val tmp = Files.createTempDirectory("graft-cmdlog-spec3-")
    try {
      val logPath = tmp.resolve("cmdlog.parquet").toString
      SqlGateway.writeCommandLog(spark, logPath)
      val sGen = spark.newSession()
      SqlGateway.replayFrom(sGen, sfDir, logPath)
      val genesis = finalState(sGen)
      val m = SqlGateway.durableLog.size.toLong
      (0L to m).foreach { n =>
        val snapDir = Files.createTempDirectory(s"graft-cmdlog-snap$n-")
        try {
          val compacted =
            SqlGateway.compactCommandLog(spark, sfDir, logPath, snapDir, n)
          // The q159 law re-based on the snapshot: a RESTARTED node
          // (fresh session, durable store intact) recovering purely
          // from the compacted log lands on the genesis final state.
          val s2 = spark.newSession()
          SqlGateway.replayFrom(s2, sfDir, compacted)
          assert(finalState(s2) == genesis,
            s"compaction at seq $n diverged from the genesis replay")
          // Re-replaying the compacted log over the just-applied state
          // must be a fixpoint — this is where a restore block that
          // dropped only LIVE tables breaks: a bare CREATE in the
          // verbatim suffix whose guarding DROP was truncated would
          // collide with the table the first replay left behind.
          SqlGateway.replayFrom(s2, sfDir, compacted)
          assert(finalState(s2) == genesis,
            s"second replay of the compacted log (seq $n) is not a fixpoint")
          // The tail survives verbatim; the restore block is one DROP
          // per managed table plus one CTAS per table live at n
          // (live(n) = n/2 for this log's DROP/CTAS pairing).
          val log = s2.read.parquet(compacted)
            .select("seq", "snap_seq").collect()
          assert(log.forall(_.getLong(1) == n))
          assert(log.count(_.getLong(0) > n) == (m - n))
          assert(log.count(_.getLong(0) <= n) ==
            SqlGateway.durableLogTables.size + (n / 2).toInt)
        } finally LlmPipeline.deleteRecursively(snapDir)
      }
    } finally LlmPipeline.deleteRecursively(tmp)
  }

  test("q178: reads of truncated history fail closed naming the snapshot; at/past it they answer") {
    val tmp = Files.createTempDirectory("graft-cmdlog-spec4-")
    try {
      val logPath = tmp.resolve("cmdlog.parquet").toString
      SqlGateway.writeCommandLog(spark, logPath)
      val snapAt = 4L
      val compacted =
        SqlGateway.compactCommandLog(spark, sfDir, logPath, tmp, snapAt)
      val s = spark.newSession()
      (0L until snapAt).foreach { q =>
        val e = intercept[IllegalStateException] {
          SqlGateway.replayCompactedTo(s, sfDir, compacted, q)
        }
        assert(e.getMessage.contains(s"seq $snapAt"),
          s"fail-closed error for seq $q must name the earliest reconstructible seq")
      }
      // At the snapshot point the state is exactly the snapshot: the
      // final generation does not exist yet (commands 5-6 not applied).
      SqlGateway.replayCompactedTo(s, sfDir, compacted, snapAt)
      assert(s.catalog.tableExists("dlog_seg"))
      assert(!s.catalog.tableExists("dlog_seg_v2"),
        "state at the snapshot seq must not include later commands")
      // Past it, the tail applies and the full state is reachable.
      val sGen = spark.newSession()
      SqlGateway.replayFrom(sGen, sfDir, logPath)
      SqlGateway.replayCompactedTo(s, sfDir, compacted, SqlGateway.durableLog.size.toLong)
      assert(finalState(s) == finalState(sGen))
    } finally LlmPipeline.deleteRecursively(tmp)
  }
}
