package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Scalar function families (SURVEY.md §2.2.8): string, date/time, math,
  * array + higher-order functions, map, JSON, hash.
  *
  * Scale notes: every function here is a built-in Catalyst expression with
  * codegen — projections stay inside WholeStageCodegen and never break the
  * pipeline. No UDFs anywhere; JSON extraction uses Jackson-backed
  * built-ins (still codegen-compatible); HOF lambdas compile to expression
  * trees, not closures.
  */
object Scalars extends QueryPack {

  /** String functions over part. */
  def stringFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        length(col("p_name")).as("name_len"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        instr(col("p_name"), "a").as("a_pos"),
        levenshtein(col("p_brand"), col("p_type")).as("lev_bt"),
        regexp_extract(col("p_name"), "([a-z]+)$", 1).as("last_word_re"),
        trim(concat(lit("  "), col("p_brand"), lit("  "))).as("brand_trim"))
      .orderBy("p_partkey")

  private val stringFuncsSql =
    """SELECT p_partkey,
      |  p_brand || ':' || p_type AS brand_type,
      |  substring(p_name, 1, 8) AS name_prefix,
      |  length(p_name) AS name_len,
      |  upper(p_brand) AS brand_up,
      |  lower(p_type) AS type_lo,
      |  lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
      |  string_split(p_name, ' ')[1] AS first_word,
      |  replace(p_name, ' ', '_') AS name_us,
      |  instr(p_name, 'a') AS a_pos,
      |  levenshtein(p_brand, p_type) AS lev_bt,
      |  regexp_extract(p_name, '([a-z]+)$', 1) AS last_word_re,
      |  trim('  ' || p_brand || '  ') AS brand_trim
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Date/time functions over orders. */
  def dateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey"),
        unix_micros(date_trunc("month", col("o_orderdate"))).as("month_start_us"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(to_date(lit("1998-12-31")), to_date(col("o_orderdate"))).as("days_to_end"),
        date_add(to_date(col("o_orderdate")), 30).as("ship_by"),
        unix_micros(col("o_orderdate")).as("epoch_us"),
        unix_micros(make_timestamp(
          year(col("o_orderdate")), month(col("o_orderdate")), dayofmonth(col("o_orderdate")),
          lit(12), lit(0), lit(0))).as("noon_us"))
      .orderBy("o_orderkey")

  private val dateFuncsSql =
    """SELECT o_orderkey,
      |  epoch_us(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)) AS month_start_us,
      |  year(o_orderdate) AS y,
      |  month(o_orderdate) AS m,
      |  day(o_orderdate) AS d,
      |  quarter(o_orderdate) AS q,
      |  dayofweek(o_orderdate) + 1 AS dow,
      |  datediff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS days_to_end,
      |  CAST(o_orderdate AS DATE) + 30 AS ship_by,
      |  epoch_us(o_orderdate) AS epoch_us,
      |  epoch_us(make_timestamp(year(o_orderdate), month(o_orderdate), day(o_orderdate),
      |                          12, 0, 0)) AS noon_us
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin

  /** Math functions over a deterministic key-modulo sample of lineitem —
    * the function coverage doesn't need every row, and a full-width
    * 600k-row global sort dominated the bench at sf0.1.
    */
  def mathFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(pmod(col("l_orderkey"), lit(10)) === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(pow(lit(1.0) + col("l_discount"), 2), 4).as("disc_sq"),
        round(exp(col("l_discount")), 4).as("disc_exp"),
        round(log(col("l_extendedprice")), 4).as("price_ln"),
        round(log10(col("l_extendedprice")), 4).as("price_log10"),
        signum(col("l_extendedprice") - 30000.0).cast("int").as("price_sign"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_abs"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"))
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")

  private val mathFuncsSql =
    """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
      |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
      |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
      |  round(sqrt(l_extendedprice), 4) AS price_sqrt,
      |  round(pow(1.0 + l_discount, 2), 4) AS disc_sq,
      |  round(exp(l_discount), 4) AS disc_exp,
      |  round(ln(l_extendedprice), 4) AS price_ln,
      |  round(log10(l_extendedprice), 4) AS price_log10,
      |  CAST(sign(l_extendedprice - 30000.0) AS INTEGER) AS price_sign,
      |  round(abs(l_discount - 0.05), 4) AS disc_abs,
      |  l_orderkey % 7 AS key_mod
      |FROM lineitem
      |WHERE l_orderkey % 10 = 0
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin

  /** Array functions + higher-order functions over the 64-d embeddings
    * (the HOF toolkit all §2.2.11 vector math builds on). Float elements
    * are cast to double before any arithmetic (FIXTURES.md).
    */
  def arrayHofs(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .withColumn("d", expr("transform(embedding, x -> cast(x as double))"))
      .select(
        col("vec_id"),
        size(col("embedding")).as("dim"),
        expr("round(aggregate(slice(d, 1, 4), 0D, (a, x) -> a + x), 4)").as("head4_sum"),
        expr("size(filter(d, x -> x > 0))").as("n_pos"),
        expr("exists(d, x -> x > 0.25)").as("any_big"),
        expr("round(aggregate(d, 0D, (a, x) -> a + abs(x)), 4)").as("l1_norm"),
        expr("round(aggregate(zip_with(d, d, (x, y) -> x * y), 0D, (a, x) -> a + x), 4)").as("sq_norm"),
        round(array_max(col("d")), 4).as("max_v"),
        round(element_at(sort_array(col("d")), 1), 4).as("min_v"),
        expr("round(aggregate(flatten(array(slice(d, 1, 2), slice(d, 3, 2))), 0D, (a, x) -> a + x), 4)")
          .as("flat4_sum"))
      .orderBy("vec_id")

  private val arrayHofsSql =
    """SELECT vec_id,
      |  len(embedding) AS dim,
      |  round(list_sum(d[1:4]), 4) + 0 AS head4_sum,
      |  len(list_filter(d, x -> x > 0)) AS n_pos,
      |  len(list_filter(d, x -> x > 0.25)) > 0 AS any_big,
      |  round(list_sum(list_transform(d, x -> abs(x))), 4) AS l1_norm,
      |  round(list_sum(list_transform(d, x -> x * x)), 4) AS sq_norm,
      |  round(list_max(d), 4) AS max_v,
      |  round(list_min(d), 4) AS min_v,
      |  round(list_sum(flatten([d[1:2], d[3:4]])), 4) + 0 AS flat4_sum
      |FROM (SELECT vec_id, embedding,
      |        list_transform(embedding, x -> CAST(x AS DOUBLE)) AS d
      |      FROM embeddings)
      |ORDER BY vec_id""".stripMargin

  /** Map functions: construct, extract, enumerate keys. The oracle states
    * the equivalent flat semantics (map round-trip is Spark-side).
    */
  def mapFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("m", map(lit("lang"), col("lang"), lit("source"), col("source")))
      .select(
        col("doc_id"),
        element_at(col("m"), "lang").as("m_lang"),
        element_at(col("m"), "source").as("m_source"),
        size(map_keys(col("m"))).as("n_keys"),
        array_join(sort_array(map_keys(col("m"))), ",").as("keys_csv"),
        element_at(map_from_arrays(array(lit("n_chars")), array(col("n_chars"))), "n_chars").as("mfa_chars"))
      .orderBy("doc_id")

  private val mapFuncsSql =
    """SELECT doc_id,
      |  lang AS m_lang,
      |  source AS m_source,
      |  2 AS n_keys,
      |  'lang,source' AS keys_csv,
      |  n_chars AS mfa_chars
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** JSON extraction over events.props (both the path-string form and the
    * schema-ful from_json form).
    */
  def jsonFuncs(spark: SparkSession, dir: String): DataFrame = {
    val schema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(spark, dir)
      .select(
        col("event_id"), col("user_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        from_json(col("props"), schema).getField("k").as("k_int"))
      // Derive from the parsed value — parsing props again per derived
      // column doubles the JSON cost for nothing.
      .withColumn("k_bucket", pmod(col("k_int"), lit(10)))
      .orderBy("event_id")
  }

  private val jsonFuncsSql =
    """SELECT event_id, user_id,
      |  json_extract_string(props, '$.k') AS k_str,
      |  CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
      |  CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Hash functions with cross-engine definitions (md5 / sha256). xxhash64
    * — Spark-specific — is exercised as the MinHash primitive in q75.
    */
  def hashFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        md5(col("c_name")).as("h_md5"),
        sha2(col("c_name"), 256).as("h_sha256"))
      .orderBy("c_custkey")

  private val hashFuncsSql =
    """SELECT c_custkey,
      |  md5(c_name) AS h_md5,
      |  sha256(c_name) AS h_sha256
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q50_string_funcs", stringFuncs, Some(stringFuncsSql)),
    QueryDef("q51_date_funcs", dateFuncs, Some(dateFuncsSql)),
    QueryDef("q52_math_funcs", mathFuncs, Some(mathFuncsSql)),
    QueryDef("q53_array_hofs", arrayHofs, Some(arrayHofsSql), headline = true),
    QueryDef("q54_map_funcs", mapFuncs, Some(mapFuncsSql)),
    QueryDef("q55_json_funcs", jsonFuncs, Some(jsonFuncsSql)),
    QueryDef("q56_hash_funcs", hashFuncs, Some(hashFuncsSql)))
}
