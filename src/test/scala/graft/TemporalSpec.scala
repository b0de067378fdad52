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

  test("q173: funnel-class counts match a pure-Scala rebuild of every session sequence") {
    import graft.queries.Sessions
    val got = Sessions.sessionFunnelClasses(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toList
    // Independent reference: sessionize in plain Scala (same 4-hour gap
    // rule), then count all three pattern classes with java.util.regex.
    val symOf = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val gapUs = 4L * 3600L * 1000000L
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def reCount(s: String, p: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(s)
      var n = 0
      while (m.find()) n += 1
      n
    }
    val expected = evs.groupBy(_._1).toList.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sids = ordered.scanLeft((0L, 0L)) { case ((sid, prevTs), r) =>
        (if (sid == 0 || r._2 - prevTs >= gapUs) sid + 1 else sid, r._2)
      }.drop(1).map(_._1)
      ordered.zip(sids).groupBy(_._2).toList.map { case (sid, srows) =>
        val seq = srows.map(x => symOf(x._1._4)).mkString
        (u, sid, srows.map(_._1._2).min, seq.length,
          reCount(seq, "v[^p]*p"), reCount(seq, "v(c|s)+p"), reCount(seq, "v[^p]*$"))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
    // Fixture non-degeneracy: every pattern class must fire somewhere,
    // and the anchored abandoned flag stays boolean.
    assert(got.map(_._5).sum > 0, "exclusion class v[^p]*p never fired")
    assert(got.map(_._6).sum > 0, "alternation class v(c|s)+p never fired")
    assert(got.map(_._7).sum > 0, "abandoned class v[^p]*$ never fired")
    assert(got.forall(t => t._7 == 0 || t._7 == 1), "n_abandoned must be 0/1")
    // The exclusion span counts at least as many conversions as the
    // assisted form: every v(c|s)+p match contains a v[^p]*p-countable
    // purchase, and exclusion also admits direct v→p conversions.
    val perSession = got.map(t => (t._5, t._6))
    assert(perSession.forall { case (conv, assist) => assist <= conv },
      "assisted conversions exceeded exclusion-span conversions in some session")
  }

  test("q175: DEFINE-predicate motifs match a pure-Scala rebuild, and the DEFINE split refines q173 exactly") {
    import graft.queries.Sessions
    val got = Sessions.sessionDefineMotifs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toList
    // Independent reference: sessionize + DEFINE alphabet in plain
    // Scala, count with java.util.regex.
    val gapUs = 4L * 3600L * 1000000L
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("value"))
      .collect()
      // value is nullable: NULL → NaN so NaN >= 50 is false, matching
      // the query side's SQL NULL semantics (ADVICE r11).
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]).getOrElse(Double.NaN)))
    def sym(t: String, v: Double): String = t match {
      case "purchase" => if (v >= 50) "P" else "p"
      case "view" => "v"
      case "click" => "c"
      case _ => "o"
    }
    def reCount(s: String, p: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(s)
      var n = 0
      while (m.find()) n += 1
      n
    }
    val expected = evs.groupBy(_._1).toList.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sids = ordered.scanLeft((0L, 0L)) { case ((sid, prevTs), r) =>
        (if (sid == 0 || r._2 - prevTs >= gapUs) sid + 1 else sid, r._2)
      }.drop(1).map(_._1)
      ordered.zip(sids).groupBy(_._2).toList.map { case (sid, srows) =>
        val seq = srows.map(x => sym(x._1._4, x._1._5)).mkString
        (u, sid, srows.map(_._1._2).min, seq.length,
          reCount(seq, "v[^Pp]*P"), reCount(seq, "v[^Pp]*[Pp]"),
          reCount(seq, "p[^Pp]*P"))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
    // Refinement law: splitting the purchase symbol by the DEFINE
    // predicate must not perturb the coarser alphabet's matches —
    // n_any_conv equals q173's n_conv in every session.
    val anyConv = got.map(t => ((t._1, t._2), t._6)).toMap
    val q173Conv = Sessions.sessionFunnelClasses(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    assert(anyConv == q173Conv,
      "DEFINE refinement changed the coarse conversion counts")
    // Dominance + fixture non-degeneracy for the DEFINE-only motifs.
    assert(got.forall(t => t._5 <= t._6), "premium conversions exceeded total conversions")
    assert(got.map(_._5).sum > 0, "premium-conversion motif never fired")
    assert(got.map(_._7).sum > 0, "upsell motif never fired")
  }

  test("q180: skip-mode motifs match a pure-Scala rebuild; reluctant == greedy; skip-to-next >= skip-past-last") {
    import graft.queries.Sessions
    val got = Sessions.sessionSkipMotifs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toList
    val symOf = Map("view" -> "v", "click" -> "c", "purchase" -> "p",
      "signup" -> "s").withDefaultValue("e")
    val gapUs = 4L * 3600L * 1000000L
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    def reCount(s: String, p: String): Int = {
      val m = java.util.regex.Pattern.compile(p).matcher(s)
      var n = 0
      while (m.find()) n += 1
      n
    }
    val expected = evs.groupBy(_._1).toList.flatMap { case (u, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val sids = ordered.scanLeft((0L, 0L)) { case ((sid, prevTs), r) =>
        (if (sid == 0 || r._2 - prevTs >= gapUs) sid + 1 else sid, r._2)
      }.drop(1).map(_._1)
      ordered.zip(sids).groupBy(_._2).toList.map { case (sid, srows) =>
        val seq = srows.map(x => symOf(x._1._4)).mkString
        // SKIP TO NEXT ROW reference: one overlapping match per v that
        // still has a purchase ahead of it.
        val skip = seq.indices.count(i =>
          seq.charAt(i) == 'v' && seq.indexOf('p', i) >= 0)
        (u, sid, srows.map(_._1._2).min, seq.length,
          reCount(seq, "v[^p]{2,6}p"), skip, reCount(seq, "v[^p]*?p"))
      }
    }.sortBy(t => (t._1, t._2))
    assert(got == expected)
    // Cross-query laws vs q173 (same sessions by construction):
    val q173 = Sessions.sessionFunnelClasses(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(4))).toMap
    got.foreach { t =>
      val conv = q173((t._1, t._2))
      // Reluctant and greedy extents coincide when the excluded class
      // cannot cross the terminator: both stop at the FIRST p.
      assert(t._7 == conv,
        s"reluctant v[^p]*?p diverged from greedy in session (${t._1},${t._2})")
      // Every non-overlapping match contains >= 1 starting row.
      assert(t._6 >= conv,
        s"SKIP TO NEXT ROW counted fewer than SKIP PAST LAST ROW in (${t._1},${t._2})")
    }
    // Non-degeneracy: the bounded quantifier fires, and skip-to-next
    // counts strictly more than skip-past-last somewhere (overlap does
    // real work on the fixture).
    assert(got.map(_._5).sum > 0, "bounded quantifier v[^p]{2,6}p never fired")
    // ... and the bounds genuinely bind: some session has unbounded
    // conversions the bounded form excludes.
    assert(got.exists(t => q173((t._1, t._2)) > t._5),
      "the {2,6} bounds never excluded anything — quantifier is vacuous")
    assert(got.map(_._6).sum > got.map(t => q173((t._1, t._2))).sum,
      "skip-to-next never exceeded skip-past-last anywhere")
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
