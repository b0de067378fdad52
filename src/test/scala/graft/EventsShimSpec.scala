package graft

import org.apache.spark.sql.functions._

import graft.sources.{Schemas, Tables}

/** Guards the events nanosecond-timestamp shim (Tables.events,
  * SURVEY.md §7.4; ADVICE r1): `ts div 1000` truncates toward zero,
  * which equals floor division only for non-negative epochs — so assert
  * the fixture invariant and the shim's exact µs arithmetic.
  */
class EventsShimSpec extends SparkSpec {

  test("raw event timestamps are all post-epoch (div == floor division)") {
    val minTs = spark.read.schema(Schemas.eventsRaw)
      .parquet(Tables.path(sfDir, "events"))
      .agg(min(col("ts"))).head.getLong(0)
    assert(minTs > 0L, s"pre-epoch ns timestamp $minTs would make `div 1000` diverge from floor")
  }

  test("shim truncates ns to µs exactly") {
    val row = spark.read.schema(Schemas.eventsRaw)
      .parquet(Tables.path(sfDir, "events"))
      .select(col("event_id"), col("ts"))
      .orderBy("event_id").limit(1).head
    val rawNs = row.getLong(1)
    val shimmed = Tables.events(spark, sfDir)
      .filter(col("event_id") === row.getLong(0))
      .select(unix_micros(col("ts"))).head.getLong(0)
    assert(shimmed == rawNs / 1000L,
      s"shim produced $shimmed µs from $rawNs ns")
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
