package graft

import org.apache.spark.sql.functions._

import graft.queries.Temporal
import graft.sources.Tables

class TemporalSpec extends SparkSpec {

  test("q121: offset-0 cohort counts sum to the distinct user count") {
    // Every user is by definition active on their own cohort day, so the
    // offset-0 column of the retention matrix must partition the users.
    val ret = Temporal.cohortRetention(spark, sfDir).cache()
    try {
      val day0 = ret.filter(col("offset_d") === 0)
        .agg(sum("n_users")).head().getLong(0)
      val users = Tables.events(spark, sfDir)
        .select("user_id").distinct().count()
      assert(day0 == users, s"offset-0 total $day0 != $users distinct users")
      // Retention never exceeds the cohort's day-0 size.
      val bad = ret.as("r")
        .join(ret.filter(col("offset_d") === 0)
          .select(col("cohort_d"), col("n_users").as("c0")), Seq("cohort_d"))
        .filter(col("n_users") > col("c0")).count()
      assert(bad == 0, s"$bad cells larger than their cohort's day-0 size")
    } finally ret.unpersist()
  }

  test("q122: grid is gapless per user and fill propagates the last value") {
    val filled = Temporal.gapFillDaily(spark, sfDir).cache()
    try {
      // Contiguity: per user, row count == span between min and max day.
      val spans = filled.groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          (datediff(max(col("d")), min(col("d"))) + 1).as("span"))
      assert(spans.filter(col("n") =!= col("span")).count() == 0,
        "calendar grid has holes")
      // Forward fill: v_fill is only null before a user's first observed
      // day — and day one is always observed (grid starts at min(d) of
      // the OBSERVED series), so never null at all.
      assert(filled.filter(col("v_fill").isNull).count() == 0)
      // Non-gap rows carry their own observed value; gap rows carry the
      // previous row's fill (checked via lag over the same order).
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy("d")
      val lagged = filled.withColumn("prev_fill", lag(col("v_fill"), 1).over(w))
      assert(lagged.filter(col("is_gap") === 1 &&
        col("v_fill") =!= col("prev_fill")).count() == 0,
        "a gap row's fill differs from the previous day's value")
    } finally filled.unpersist()
  }

  test("q139: transitions conserve events (rows minus one per active user)") {
    import graft.queries.Sessions
    import graft.sources.Tables
    val m = Sessions.transitionMatrix(spark, sfDir)
    val total = m.agg(sum("n")).head().getLong(0)
    val events = Tables.events(spark, sfDir).count()
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(total == events - users,
      s"transition mass $total != events $events - users $users")
    // Matrix marginal symmetry: outgoing mass of a type equals its
    // event count minus last-events; just check non-negativity and
    // type closure instead (exact marginals need per-user tails).
    assert(m.filter(col("n") <= 0).count() == 0)
  }

  test("q141: TWAP is bounded by each user's min/max observed value") {
    import graft.queries.Temporal
    import graft.sources.Tables
    val twap = Temporal.timeWeightedAvg(spark, sfDir)
    val bounds = Tables.events(spark, sfDir)
      .groupBy("user_id")
      .agg(min(round(col("value"), 4)).as("vmin"), max(round(col("value"), 4)).as("vmax"))
    val bad = twap.join(bounds, "user_id")
      .filter(col("twap") < col("vmin") - 0.0001 || col("twap") > col("vmax") + 0.0001)
      .count()
    assert(bad == 0, s"$bad users with TWAP outside their value range")
    // Total held time per user is positive.
    assert(twap.filter(col("total_us") <= 0).count() == 0)
  }

  test("q166: motif counts match a pure-Scala rebuild of every user's sequence") {
    import graft.queries.Sessions
    val got = Sessions.sequenceMotifs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toList
    // Independent reference: collect the raw events, rebuild each
    // sequence in plain Scala with java.util.regex, compare exactly.
    val symOf = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val expected = evs.groupBy(_._1).toList.map { case (u, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(r => symOf(r._4)).mkString
      def countLit(s: String, m: String): Int = {
        var i = 0; var n = 0; var idx = s.indexOf(m)
        while (idx >= 0) { n += 1; i = idx + m.length; idx = s.indexOf(m, i) }
        n
      }
      val matcher = java.util.regex.Pattern.compile("vc+p").matcher(seq)
      var np = 0
      while (matcher.find()) np += 1
      (u, seq.length, countLit(seq, "vcp"), np)
    }.sortBy(_._1)
    assert(got == expected)
    // The variable-length motif must be doing work beyond the literal:
    // at least one user has a vc...cp run the literal scan cannot see.
    assert(got.map(_._4).sum > got.map(_._3).sum,
      "fixture must exercise the c+ repetition path")
  }

  test("q167: session split only removes motifs, and session ids agree with q62") {
    import graft.queries.Sessions
    val perSession = Sessions.sessionMotifs(spark, sfDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_vcp").as("s_vcp"), sum("n_pattern").as("s_pat"))
    val perUser = Sessions.sequenceMotifs(spark, sfDir)
      .select(col("user_id"), col("n_vcp"), col("n_pattern"))
    // Greedy non-overlapping counting is maximal for a single pattern,
    // so counting within segments can never exceed the unsplit count.
    val violations = perSession.join(perUser, "user_id")
      .filter(col("s_vcp") > col("n_vcp") || col("s_pat") > col("n_pattern"))
      .count()
    assert(violations == 0, s"$violations users gained motifs by splitting")
    // Same gap rule as q62 ⇒ identical session partitioning per user.
    val q62Sessions = Sessions.sessionWindows(spark, sfDir)
      .groupBy("user_id").agg(count(lit(1)).as("n62"))
    val mismatched = perSession.join(q62Sessions, "user_id")
      .filter(col("n_sessions") =!= col("n62")).count()
    assert(mismatched == 0, s"$mismatched users with session-count mismatch vs q62")
  }

  test("q142: monthly revenue deltas telescope back to the series") {
    import graft.queries.Temporal
    val m = Temporal.momRevenue(spark, sfDir).collect()
    // Sum of deltas == last month minus first month (telescoping), within
    // double tolerance of the decimal-exact series.
    val deltas = m.drop(1).map(_.getDouble(3)).sum
    assert(math.abs(deltas - (m.last.getDouble(1) - m.head.getDouble(1))) < 1e-6)
    assert(m.head.isNullAt(3) && m.head.isNullAt(4), "first month must have null deltas")
  }
}
