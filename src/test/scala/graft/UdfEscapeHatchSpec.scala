package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Scalar UDF escape hatch (SURVEY.md §2.2.10 first row): supported, but
  * deliberately used by ZERO engine queries — a Scala UDF is opaque to
  * Catalyst (no pushdown through it, no codegen, boxing per row). This
  * spec demonstrates the capability and pins the reason to avoid it.
  */
class UdfEscapeHatchSpec extends SparkSpec {

  test("scalar UDF works but blocks filter pushdown; built-in is pushdown-eligible") {
    val isHigh = udf((d: Double) => d > 0.05)
    val viaUdf = Tables.lineitem(spark, sfDir).filter(isHigh(col("l_discount")))
    val viaBuiltin = Tables.lineitem(spark, sfDir).filter(col("l_discount") > 0.05)
    assert(viaUdf.count() == viaBuiltin.count())

    import org.apache.spark.sql.execution.ExplainMode
    def scanFilters(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
        .linesIterator.filter(_.contains("PushedFilters")).mkString
    // Built-in predicate reaches the scan; the UDF predicate cannot.
    assert(scanFilters(viaBuiltin).contains("GreaterThan(l_discount"),
      "built-in predicate should push to parquet")
    assert(!scanFilters(viaUdf).contains("l_discount"),
      "UDF predicate unexpectedly pushed down (update the guidance if Spark learned this)")
  }
}
