package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.Row

import graft.sources.{Schemas, Tables}

/** Guards the unit-adaptive events timestamp read (Tables.events,
  * SURVEY.md §7.4).
  *
  * History: the fixture generator has shipped `events.ts` as INT64
  * TIMESTAMP(NANOS) (early generations, needing a LongType + `div 1000`
  * shim) and INT64 TIMESTAMP(MICROS) (current, read natively). Round 8's
  * regression: the reader assumed ns while the fixture had become µs, every
  * event landed in January 1970, 15 oracle rows went red — and this suite
  * stayed green because its only shim test compared the shim against its
  * own raw read (self-consistent under ANY unit). The fixture-truth test
  * below is the missing invariant: whatever the physical encoding,
  * timestamps must land in a plausible epoch range, so a unit error fails
  * in-suite instead of at the oracle.
  */
class EventsShimSpec extends SparkSpec {

  test("fixture truth: shimmed event timestamps land in a plausible epoch at every sf") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val Row(minY: Int, maxY: Int) = Tables.events(spark, dir)
          .agg(year(min(col("ts"))), year(max(col("ts")))).head
        assert(minY >= 2020 && maxY <= 2035,
          s"$dir: events.ts spans years [$minY, $maxY] — outside the plausible " +
            "[2020, 2035] fixture epoch. A ~1000× unit error (ns shim applied to a " +
            "µs fixture lands in 1970; µs native read of a ns fixture lands in " +
            "~55978) means Tables.events picked the wrong read path for this " +
            "fixture generation.")
      }
  }

  test("unit adaptivity: µs-native and ns-long fixtures of the same instants read identically") {
    // Two physical encodings of the same three instants, written to
    // separate dirs so the (session, dir) relation memo keeps them apart.
    val microsOfInstant = Seq(
      1704067200000000L, // 2024-01-01T00:00:00Z
      1704070800123456L, // 2024-01-01T01:00:00.123456Z
      1706659199999999L) // 2024-01-30T23:59:59.999999Z
    val base = Files.createTempDirectory("events-unit-adaptive").toString

    def row(i: Int, ts: Any): Row =
      Row(i.toLong, ts, 42L, "click", 1.0, "{}")

    // µs generation: a real TimestampType column → parquet TIMESTAMP(MICROS).
    val tsRows = microsOfInstant.zipWithIndex.map { case (us, i) =>
      row(i, java.sql.Timestamp.from(java.time.Instant.EPOCH.plusNanos(us * 1000L)))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(tsRows, 1), Schemas.events)
      .write.mode("overwrite").parquet(s"$base/us/events.parquet")

    // ns generation: plain INT64 of nanosecond epochs (the shim path).
    val nsRows = microsOfInstant.zipWithIndex.map { case (us, i) => row(i, us * 1000L) }
    spark.createDataFrame(spark.sparkContext.parallelize(nsRows, 1), Schemas.eventsRaw)
      .write.mode("overwrite").parquet(s"$base/ns/events.parquet")

    def readMicros(dir: String): Seq[(Long, Long)] =
      Tables.events(spark, dir)
        .select(col("event_id"), unix_micros(col("ts")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq

    val native = readMicros(s"$base/us")
    val shimmed = readMicros(s"$base/ns")
    val expected = microsOfInstant.zipWithIndex.map { case (us, i) => (i.toLong, us) }
    assert(native == expected, s"µs-native read mismatch: $native")
    assert(shimmed == expected, s"ns-shim read mismatch: $shimmed")

    // And the schema the rest of the engine sees is identical either way.
    assert(Tables.events(spark, s"$base/us").schema ==
      Tables.events(spark, s"$base/ns").schema)
  }

  test("a mis-divided read of the current fixture would fail the epoch invariant") {
    // Pin the detection logic itself: applying the ns shim to the current
    // µs fixture must produce implausible (1970) years — i.e. the
    // fixture-truth test above genuinely discriminates, it is not
    // vacuously green.
    val misRead = spark.read.schema(Schemas.eventsRaw)
      .parquet(Tables.path(sfDir, "events"))
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val Row(maxY: Int) = misRead.agg(year(max(col("ts")))).head
    assert(maxY < 2020,
      s"ns shim applied to the current fixture gives max year $maxY — expected a " +
        "pre-2020 implausible epoch; if this fails the fixture changed encoding again")
  }

  test("every fixture table reads with its explicit schema and is non-empty") {
    val readers: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
      "lineitem" -> Tables.lineitem(spark, sfDir),
      "orders" -> Tables.orders(spark, sfDir),
      "customer" -> Tables.customer(spark, sfDir),
      "supplier" -> Tables.supplier(spark, sfDir),
      "part" -> Tables.part(spark, sfDir),
      "nation" -> Tables.nation(spark, sfDir),
      "region" -> Tables.region(spark, sfDir),
      "events" -> Tables.events(spark, sfDir),
      "documents" -> Tables.documents(spark, sfDir),
      "embeddings" -> Tables.embeddings(spark, sfDir))
    readers.foreach { case (name, df) =>
      assert(df.limit(1).count() == 1, s"$name is empty or unreadable")
    }
  }
}
