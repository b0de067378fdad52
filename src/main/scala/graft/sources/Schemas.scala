package graft.sources

import org.apache.spark.sql.types._

/** Explicit StructType schemas for the fixture corpus (FIXTURES.md).
  *
  * Schemas are fixed and explicit — never inferred — so column pruning at
  * the scan is stable (only `ReadSchema` columns are fetched), which is the
  * behavior we need at 100 TB. The one exception is the `events.ts`
  * physical encoding, which has shipped as both INT64 TIMESTAMP(NANOS)
  * (unreadable by Spark 4.x without a LongType shim, SURVEY.md §7.4) and
  * INT64 TIMESTAMP(MICROS) across fixture generations — Tables.events
  * probes the parquet footer once per (session, dir) and picks [[events]]
  * or [[eventsRaw]] accordingly.
  *
  * The reference system (harshitster/Distributed-Database-for-SQL) has no
  * type system at all — its sole record type is an opaque command string
  * (reference src/raft/node.go:16-19); this module is the capability-closure
  * type system SURVEY.md §1.2 mandates.
  */
object Schemas {

  val lineitem: StructType = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampType)))

  val orders: StructType = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampType),
    StructField("o_orderpriority", StringType)))

  val customer: StructType = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier: StructType = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part: StructType = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val nation: StructType = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val region: StructType = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  /** Raw read schema for a nanosecond-generation `events` fixture: `ts`
    * stored as INT64 TIMESTAMP(NANOS), typed LongType here so the
    * vectorized parquet reader accepts it; Tables.events converts to a µs
    * TimestampType column (SURVEY.md §7.4). Kept alongside [[events]]
    * because a 100-TB table accretes files from every generation of its
    * writer — Tables.events picks the right one per fixture from the
    * parquet footer.
    */
  val eventsRaw: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Native read schema for a microsecond-generation `events` fixture:
    * `ts` stored as INT64 TIMESTAMP(MICROS), which Spark reads directly
    * as TimestampType (session TZ UTC) — no shim arithmetic needed.
    */
  val events: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
}
