package graft

import org.apache.spark.sql.functions._

import graft.queries.Changelog
import graft.sources.Tables

/** Structural laws for the change-log maintenance family (q114–q116):
  * invariants that hold on any log, independent of the fixtures the
  * cross-engine oracle checks.
  */
class ChangelogSpec extends SparkSpec {

  test("q114: compaction emits at most one row per user and it is the true last op") {
    val state = Changelog.logCompaction(spark, sfDir).collect()
    assert(state.map(_.getLong(0)).distinct.length == state.length, "duplicate user in compacted state")
    // Replay on the driver: last op per user by (ts, event_id).
    val log = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val lastOp = log.groupBy(_._1).map { case (u, ops) => u -> ops.maxBy(o => (o._3, o._2)) }
    val surviving = lastOp.filter(_._2._4 != "error").keySet
    assert(state.map(_.getLong(0)).toSet == surviving, "compacted key set != replay")
    state.foreach { r =>
      val (_, eid, ts, tpe) = lastOp(r.getLong(0))
      assert(r.getLong(1) == eid && r.getLong(2) == ts && r.getString(3) == tpe,
        s"user ${r.getLong(0)}: compacted row is not the last op")
    }
    // Op counts conserve the log.
    assert(state.map(_.getLong(5)).sum ==
      log.groupBy(_._1).filter { case (u, _) => surviving(u) }.map(_._2.length.toLong).sum)
  }

  test("q115: SCD2 intervals chain per user and versions are dense") {
    val hist = Changelog.scd2History(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3), r.getLong(4)))
    hist.groupBy(_._1).foreach { case (u, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to sorted.length), s"user $u versions not dense")
      sorted.sliding(2).foreach {
        case Array((_, _, _, to), (_, _, from2, _)) =>
          assert(to == from2, s"user $u: interval chain broken ($to != $from2)")
        case _ =>
      }
      val (_, _, _, lastTo) = sorted.last
      assert(lastTo == -1L, s"user $u: current version not open")
      sorted.dropRight(1).foreach { case (_, v, from, to) =>
        assert(from <= to, s"user $u v$v: negative-length interval")
      }
    }
  }

  test("q116: diff actions match the derivation rules exactly") {
    val actions = Changelog.snapshotDiff(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val keys = Tables.customer(spark, sfDir).select("c_custkey").collect().map(_.getLong(0))
    val inserts = keys.filter(_ % 101 == 0)
    val deletes = keys.filter(_ % 97 == 0)
    val updates = keys.filter(k => k % 97 != 0 && k % 5 == 0)
    val keeps = keys.filter(k => k % 97 != 0 && k % 5 != 0)
    def check(name: String, ks: Array[Long], shift: Long = 0L): Unit = actions.get(name) match {
      case Some((n, sum)) =>
        assert(n == ks.length && sum == ks.map(_ + shift).sum, s"$name mismatch")
      case None => assert(ks.isEmpty, s"$name missing but ${ks.length} keys expected")
    }
    check("insert", inserts, 1000000L)
    check("delete", deletes)
    check("update", updates)
    check("keep", keeps)
  }

  test("q124: snapshot+delta merge is indistinguishable from a full recompute") {
    val merged = Changelog.incrementalAgg(spark, sfDir)
      .select("user_id", "n_ops", "v_sum_e4")
    val direct = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ops"),
        sum(round(col("value") * 10000).cast("long")).as("v_sum_e4"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "incremental merge diverges from the direct aggregate")
    // Both sides of the split contribute: a degenerate cutoff (all rows
    // on one side) would make the merge test vacuous.
    val sides = Changelog.incrementalAgg(spark, sfDir)
      .agg(sum("n_snap"), sum("n_delta")).head()
    assert(sides.getLong(0) > 0 && sides.getLong(1) > 0,
      s"degenerate cutoff: snap=${sides.getLong(0)} delta=${sides.getLong(1)}")
  }

  test("q157: incremental SCD2 merge equals the full q115 rebuild row-for-row") {
    val merged = Changelog.scd2Merge(spark, sfDir)
    val rebuild = Changelog.scd2History(spark, sfDir)
    assert(merged.exceptAll(rebuild).isEmpty && rebuild.exceptAll(merged).isEmpty,
      "merge(snapshot, batch) diverged from rebuild(whole log)")
    // Non-vacuity: the batch must actually touch existing keys (close
    // open intervals + continue versions) AND the snapshot must hold
    // keys the batch never touches (pass-through path).
    val perKey = merged.groupBy("user_id")
      .agg(max(col("version")).as("max_v"),
        sum(when(col("valid_to_us") === -1L, 1).otherwise(0)).as("n_open"))
    assert(perKey.filter(col("n_open") =!= 1).count() == 0,
      "every key must end with exactly one open interval")
    assert(perKey.filter(col("max_v") > 1).count() > 0,
      "no key has more than one version — the continuation path is untested")
  }
}
