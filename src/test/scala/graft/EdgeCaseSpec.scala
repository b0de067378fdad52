package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator edge cases over in-memory inputs (SURVEY.md §5.2 item 2):
  * nulls in join keys and aggregates, empty inputs, duplicate keys,
  * single-row frames, ranking ties.
  */
class EdgeCaseSpec extends SparkSpec {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private def df(rows: Seq[Row], schema: StructType) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

  private val kv = StructType(Seq(
    StructField("k", LongType, nullable = true),
    StructField("v", DoubleType, nullable = true)))

  test("null join keys never match (inner drops, outer null-pads)") {
    val a = df(Seq(Row(1L, 1.0), Row(null, 2.0)), kv)
    val b = df(Seq(Row(1L, 10.0), Row(null, 20.0)), kv)
    assert(a.join(b, Seq("k"), "inner").count() == 1)
    assert(a.join(b, Seq("k"), "left").count() == 2)
    assert(a.join(b, Seq("k"), "full").count() == 3)
    // Null-safe equality DOES match nulls.
    assert(a.alias("a").join(b.alias("b"),
      col("a.k") <=> col("b.k")).count() == 2)
  }

  test("aggregates over empty input: count 0, sum/avg null, grouped agg empty") {
    val empty = df(Seq.empty, kv)
    val r = empty.agg(count(lit(1)).as("n"), sum("v").as("s"), avg("v").as("a")).head
    assert(r.getLong(0) == 0 && r.isNullAt(1) && r.isNullAt(2))
    assert(empty.groupBy("k").count().count() == 0)
  }

  test("aggregates skip null values; count(col) vs count(*) differ") {
    val d = df(Seq(Row(1L, 1.0), Row(1L, null), Row(1L, 3.0)), kv)
    val r = d.groupBy("k").agg(
      count(lit(1)).as("n_rows"), count(col("v")).as("n_vals"),
      sum("v").as("s"), avg("v").as("a")).head
    assert(r.getLong(1) == 3 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 4.0 && r.getDouble(4) == 2.0)
  }

  test("dedup on fully-duplicate input keeps exactly one row") {
    val d = df(Seq.fill(5)(Row(7L, 1.0)), kv)
    assert(d.distinct().count() == 1)
    val w = Window.partitionBy("k").orderBy("v")
    assert(d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).count() == 1)
  }

  test("window frames on a single-row partition") {
    val d = df(Seq(Row(1L, 5.0)), kv)
    val w = Window.partitionBy("k").orderBy("v")
    val r = d.select(
      lag("v", 1).over(w).as("prev"),
      lead("v", 1).over(w).as("next"),
      sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)).as("s"),
      avg("v").over(w.rowsBetween(-1, 1)).as("m")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
    assert(r.getDouble(2) == 5.0 && r.getDouble(3) == 5.0)
  }

  test("ranking ties: rank gaps, dense_rank none, row_number total") {
    val d = df(Seq(Row(1L, 1.0), Row(1L, 1.0), Row(1L, 2.0)), kv)
    val w = Window.partitionBy("k").orderBy("v")
    val rows = d.select(
      rank().over(w).as("r"),
      dense_rank().over(w).as("dr"),
      row_number().over(w).as("rn")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).sortBy(_._3)
    assert(rows.map(_._1).toSeq == Seq(1, 1, 3), "rank skips after ties")
    assert(rows.map(_._2).toSeq == Seq(1, 1, 2), "dense_rank does not skip")
    assert(rows.map(_._3).toSeq == Seq(1, 2, 3), "row_number is total")
  }

  test("set ops with duplicate rows: distinct vs all semantics") {
    val a = df(Seq(Row(1L, 1.0), Row(1L, 1.0), Row(2L, 2.0)), kv)
    val b = df(Seq(Row(1L, 1.0)), kv)
    assert(a.intersect(b).count() == 1)
    assert(a.intersectAll(b).count() == 1)
    assert(a.except(b).count() == 1)     // {2} — distinct semantics
    assert(a.exceptAll(b).count() == 2)  // one (1,1) survives + (2,2)
  }

  test("explode drops null/empty arrays; explode_outer keeps the row") {
    import org.apache.spark.sql.Row
    val schema = StructType(Seq(
      StructField("k", LongType),
      StructField("xs", ArrayType(LongType), nullable = true)))
    val d = df(Seq(
      Row(1L, Seq(10L, 20L)),
      Row(2L, Seq.empty[Long]),
      Row(3L, null)), schema)
    assert(d.select(col("k"), explode(col("xs"))).count() == 2)
    val outer = d.select(col("k"), explode_outer(col("xs")).as("x")).collect()
    assert(outer.length == 4)
    assert(outer.count(_.isNullAt(1)) == 2) // empty + null both null-padded
    assert(d.select(col("k"), posexplode_outer(col("xs"))).count() == 4)
  }

  test("empty join sides and empty windows are safe") {
    val empty = df(Seq.empty, kv)
    val d = df(Seq(Row(1L, 1.0)), kv)
    assert(d.join(empty, Seq("k"), "inner").count() == 0)
    assert(d.join(empty, Seq("k"), "left").count() == 1)
    assert(empty.withColumn("rn",
      row_number().over(Window.partitionBy("k").orderBy("v"))).count() == 0)
  }
}
