package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, QueryPack}
import graft.sources.Tables

/** Data-profiling / diagnostics operators — the introspection surface a
  * production engine runs BEFORE committing to a plan at 100 TB:
  * join-key skew profiling (q117 — decides salting vs AQE skew-join vs
  * broadcast, cf. the q19 salted top-k this repo already ships) and
  * ANALYZE-style per-column statistics (q118 — the catalog stats a
  * cost-based optimizer consumes).
  *
  * Scale notes:
  *   - The skew profile is a groupBy on the join key (one shuffle,
  *     map-side partial aggregation) followed by a scalar summary
  *     broadcast back over the tiny top-k — never a driver loop.
  *   - The column profile runs one column-pruned scan per column
  *     (ReadSchema shows exactly one column each), so at 100 TB each
  *     stat reads only its own parquet column chunks; exact NDV is the
  *     demo (oracle-checkable), approx_count_distinct is the documented
  *     scale path (q37 covers the sketch itself).
  */
object Profiling extends QueryPack {

  /** Join-key skew profile (q117): per-key frequencies of the
    * orders⋈customer key, the global skew summary (max/avg ratio), and
    * the top-10 heavy hitters. The summary is a 1-row aggregate
    * broadcast-joined onto the top-k — the output a skew-mitigation
    * planner (or operator) reads to pick a strategy.
    */
  def keySkewProfile(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.orders(spark, dir).groupBy("o_custkey").count()
    val summary = counts.agg(
      count(lit(1)).as("n_keys"),
      sum("count").as("n_rows"),
      max("count").as("max_rows"))
      .withColumn("skew_ratio",
        round(col("max_rows") * col("n_keys") / col("n_rows"), 4))
    counts.orderBy(col("count").desc, col("o_custkey")).limit(10)
      .crossJoin(broadcast(summary))
      .select(col("o_custkey").as("hot_key"), col("count").as("key_rows"),
        col("n_keys"), col("n_rows"), col("skew_ratio"))
      .orderBy(col("key_rows").desc, col("hot_key"))
  }

  private val keySkewProfileSql =
    """WITH counts AS (
      |  SELECT o_custkey, count(*) AS key_rows FROM orders GROUP BY o_custkey),
      |summary AS (
      |  SELECT count(*) AS n_keys, CAST(sum(key_rows) AS BIGINT) AS n_rows,
      |    CAST(max(key_rows) AS BIGINT) AS max_rows
      |  FROM counts)
      |SELECT o_custkey AS hot_key, key_rows, n_keys, n_rows,
      |  round(max_rows * n_keys / CAST(n_rows AS DOUBLE), 4) AS skew_ratio
      |FROM (SELECT * FROM counts ORDER BY key_rows DESC, o_custkey LIMIT 10), summary
      |ORDER BY key_rows DESC, hot_key""".stripMargin

  /** ANALYZE-style column statistics (q118): row count, null count,
    * exact NDV, and (for integer/date columns) min/max as BIGINT —
    * epoch days for dates, NULL where min/max has no integer form.
    * One column-pruned scan per column, unioned: the per-column stats
    * jobs a catalog runs, each reading only its own parquet column.
    */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    def stat(name: String, minMax: Option[org.apache.spark.sql.Column]): DataFrame =
      orders.agg(
        count(lit(1)).as("n"),
        sum(col(name).isNull.cast("long")).as("n_null"),
        count_distinct(col(name)).as("ndv"),
        min(minMax.getOrElse(lit(null).cast("long"))).as("min_v"),
        max(minMax.getOrElse(lit(null).cast("long"))).as("max_v"))
        .select(lit(name).as("column"), col("n"), col("n_null"), col("ndv"),
          col("min_v").cast("long"), col("max_v").cast("long"))
    Seq(
      stat("o_orderkey", Some(col("o_orderkey"))),
      stat("o_custkey", Some(col("o_custkey"))),
      stat("o_orderstatus", None),
      stat("o_totalprice", None),
      stat("o_orderdate", Some(unix_micros(col("o_orderdate")))),
      stat("o_orderpriority", None))
      .reduce(_ unionAll _)
      .orderBy("column")
  }

  private val columnProfileSql =
    """SELECT 'o_orderkey' AS "column", count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      |  count(DISTINCT o_orderkey) AS ndv,
      |  CAST(min(o_orderkey) AS BIGINT) AS min_v, CAST(max(o_orderkey) AS BIGINT) AS max_v
      |FROM orders
      |UNION ALL SELECT 'o_custkey', count(*),
      |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(DISTINCT o_custkey),
      |  CAST(min(o_custkey) AS BIGINT), CAST(max(o_custkey) AS BIGINT) FROM orders
      |UNION ALL SELECT 'o_orderstatus', count(*),
      |  CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(DISTINCT o_orderstatus), NULL, NULL FROM orders
      |UNION ALL SELECT 'o_totalprice', count(*),
      |  CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(DISTINCT o_totalprice), NULL, NULL FROM orders
      |UNION ALL SELECT 'o_orderdate', count(*),
      |  CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(DISTINCT o_orderdate),
      |  epoch_us(CAST(min(o_orderdate) AS TIMESTAMP)),
      |  epoch_us(CAST(max(o_orderdate) AS TIMESTAMP)) FROM orders
      |UNION ALL SELECT 'o_orderpriority', count(*),
      |  CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  count(DISTINCT o_orderpriority), NULL, NULL FROM orders
      |ORDER BY "column"""".stripMargin

  /** Replica anti-entropy fingerprints (q123): the consistency check a
    * replicated store runs between replicas — the one distributed-
    * systems behavior the reference's Raft replication loop
    * (reference src/raft/replication.go:11-103) exists to guarantee,
    * re-expressed as a relational operator. Each replica is reduced to
    * one order-independent fingerprint per key bucket (XOR of
    * engine-neutral Rabin-Karp row hashes + row count), and the two
    * fingerprint tables join on bucket to flag divergent buckets.
    *
    * Replica B is derived from A by deterministic rules (drop keys
    * ≡0 mod 499, +0.01 balance for keys ≡0 mod 250) so both engines
    * build identical inputs; in production B is the other replica's
    * scan. XOR is commutative/associative ⇒ the fingerprint needs no
    * sort, aggregates map-side, and ships 16 rows per replica no
    * matter the table size — this is how you diff two 100-TB replicas
    * with one tiny shuffle each and zero row movement between sites.
    */
  /** One replica's rows with the engine-neutral Rabin-Karp row hash
    * and key bucket (shared by q123's fingerprints and q138's repair
    * drill-down).
    */
  private def hashedReplica(rep: DataFrame): DataFrame = rep
    .withColumn("row_str", concat_ws("|",
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long")))
    .withColumn("row_h", expr("shingle_hash64(array(row_str))[0]"))
    .withColumn("bucket", col("c_custkey") % 16)
    .select("c_custkey", "bucket", "row_h")

  /** Replica A (the table) and B (deterministically diverged: keys
    * ≡0 mod 499 dropped, balances of keys ≡0 mod 250 bumped 0.01).
    */
  private def replicas(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val a = Tables.customer(spark, dir)
    val b = a.filter(col("c_custkey") % 499 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 250 === 0, col("c_acctbal") + 0.01)
          .otherwise(col("c_acctbal")))
    (a, b)
  }

  def replicaFingerprint(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    def fingerprint(rep: DataFrame): DataFrame = hashedReplica(rep)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), expr("bit_xor(row_h)").as("fp"))
    val (a, b) = replicas(spark, dir)
    fingerprint(a).as("a")
      .join(fingerprint(b).withColumnRenamed("n", "n_b")
        .withColumnRenamed("fp", "fp_b"), Seq("bucket"), "full_outer")
      .select(col("bucket"), col("n").as("n_a"), col("n_b"),
        col("fp").as("fp_a"), col("fp_b"),
        (col("n") === col("n_b") && col("fp") === col("fp_b"))
          .cast("int").as("consistent"))
      .orderBy("bucket")
  }

  private val replicaFingerprintSql =
    """WITH hashed_a AS (
      |  SELECT c_custkey % 16 AS bucket,
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 131 + c) % 1000000007) * 1000000009 +
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 137 + c) % 1000000009) AS row_h
      |  FROM (
      |    SELECT c_custkey,
      |      concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment,
      |        CAST(round(c_acctbal * 100) AS BIGINT)) AS row_str
      |    FROM customer)),
      |hashed_b AS (
      |  SELECT c_custkey % 16 AS bucket,
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 131 + c) % 1000000007) * 1000000009 +
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 137 + c) % 1000000009) AS row_h
      |  FROM (
      |    SELECT c_custkey,
      |      concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment,
      |        CAST(round((c_acctbal + CASE WHEN c_custkey % 250 = 0 THEN 0.01 ELSE 0 END) * 100) AS BIGINT)) AS row_str
      |    FROM customer WHERE c_custkey % 499 <> 0)),
      |fp_a AS (SELECT bucket, count(*) AS n_a, bit_xor(row_h) AS fp_a FROM hashed_a GROUP BY bucket),
      |fp_b AS (SELECT bucket, count(*) AS n_b, bit_xor(row_h) AS fp_b FROM hashed_b GROUP BY bucket)
      |SELECT bucket, n_a, n_b, fp_a, fp_b,
      |  CAST(n_a = n_b AND fp_a = fp_b AS INT) AS consistent
      |FROM fp_a FULL OUTER JOIN fp_b USING (bucket)
      |ORDER BY bucket""".stripMargin

  /** Contingency table with chi-square cells (q133): the lang × source
    * cross-tabulation of the documents corpus, with each cell's
    * expected count under independence and its chi-square contribution
    * — the dependence diagnostic a data-mix designer (or a CBO
    * reasoning about correlated columns) reads before assuming two
    * dimensions are independent. All counts are exact integers from
    * one cells-level aggregate; marginals re-aggregate the CELLS (not
    * the corpus — the second pass touches |lang|×|source| rows), and
    * the float math is a fixed chain of IEEE ops ((row·col)/total,
    * (n−e)²/e) identical in both engines, rounded once at output.
    */
  def contingency(spark: SparkSession, dir: String): DataFrame = {
    val cells = Tables.documents(spark, dir)
      .groupBy("lang", "source").agg(count(lit(1)).as("n"))
    val rowM = cells.groupBy("lang").agg(sum("n").as("row_n"))
    val colM = cells.groupBy("source").agg(sum("n").as("col_n"))
    val total = cells.agg(sum("n").as("total"))
    cells.join(rowM, "lang").join(colM, "source")
      .crossJoin(broadcast(total))
      .withColumn("e", col("row_n") * col("col_n") / col("total"))
      .select(col("lang"), col("source"), col("n"), col("row_n"), col("col_n"),
        round(col("e"), 4).as("expected"),
        round((col("n") - col("e")) * (col("n") - col("e")) / col("e"), 4)
          .as("chi2_cell"))
      .orderBy("lang", "source")
  }

  private val contingencySql =
    """WITH cells AS (
      |  SELECT lang, source, count(*) AS n FROM documents GROUP BY lang, source),
      |rowm AS (SELECT lang, CAST(sum(n) AS BIGINT) AS row_n FROM cells GROUP BY lang),
      |colm AS (SELECT source, CAST(sum(n) AS BIGINT) AS col_n FROM cells GROUP BY source),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM cells)
      |SELECT lang, source, n, row_n, col_n,
      |  round(row_n * col_n / total, 4) AS expected,
      |  round((n - row_n * col_n / total) * (n - row_n * col_n / total)
      |        / (row_n * col_n / total), 4) AS chi2_cell
      |FROM cells JOIN rowm USING (lang) JOIN colm USING (source), tot
      |ORDER BY lang, source""".stripMargin

  /** Replica repair drill-down (q138): the second half of the
    * anti-entropy protocol q123 starts. Fingerprints identify the
    * divergent buckets; this operator then compares ROWS — but only
    * inside those buckets — and emits the repair work list: keys
    * missing from the follower and keys whose row hash changed. The
    * two-phase shape is the whole point at 100 TB: phase 1 moves 16
    * fingerprint rows per replica, phase 2 joins only the divergent
    * slice (here 2/16 buckets), never the full tables — the
    * relational rendering of a Merkle-tree sync, which is what the
    * reference's Raft log replication
    * (reference src/raft/replication.go:11-103) would need the moment
    * a follower falls behind snapshot transfer.
    */
  def replicaRepair(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.NativeFunctions.register(spark)
    val (a, b) = replicas(spark, dir)
    val ha = hashedReplica(a)
    val hb = hashedReplica(b)
    val divergent = ha.groupBy("bucket")
      .agg(count(lit(1)).as("n_a"), expr("bit_xor(row_h)").as("fp_a"))
      .join(hb.groupBy("bucket")
        .agg(count(lit(1)).as("n_b"), expr("bit_xor(row_h)").as("fp_b")),
        Seq("bucket"), "full_outer")
      .filter(!(col("n_a") <=> col("n_b")) || !(col("fp_a") <=> col("fp_b")))
      .select("bucket")
    ha.join(broadcast(divergent), "bucket")
      .withColumnRenamed("row_h", "h_a")
      .join(hb.select(col("c_custkey"), col("row_h").as("h_b")),
        Seq("c_custkey"), "left_outer")
      .withColumn("action",
        when(col("h_b").isNull, "copy_missing")
          .when(col("h_a") =!= col("h_b"), "overwrite_changed"))
      .filter(col("action").isNotNull)
      .select("c_custkey", "bucket", "action")
      .orderBy("c_custkey")
  }

  private val replicaRepairSql =
    """WITH hashed_a AS (
      |  SELECT c_custkey, c_custkey % 16 AS bucket,
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 131 + c) % 1000000007) * 1000000009 +
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 137 + c) % 1000000009) AS row_h
      |  FROM (
      |    SELECT c_custkey,
      |      concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment,
      |        CAST(round(c_acctbal * 100) AS BIGINT)) AS row_str
      |    FROM customer)),
      |hashed_b AS (
      |  SELECT c_custkey, c_custkey % 16 AS bucket,
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 131 + c) % 1000000007) * 1000000009 +
      |    list_reduce(
      |      [CAST(ascii(row_str[i]) AS BIGINT) for i in range(1, strlen(row_str) + 1)],
      |      (a, c) -> (a * 137 + c) % 1000000009) AS row_h
      |  FROM (
      |    SELECT c_custkey,
      |      concat_ws('|', c_custkey, c_name, c_nationkey, c_mktsegment,
      |        CAST(round((c_acctbal + CASE WHEN c_custkey % 250 = 0 THEN 0.01 ELSE 0 END) * 100) AS BIGINT)) AS row_str
      |    FROM customer WHERE c_custkey % 499 <> 0)),
      |divergent AS (
      |  SELECT bucket
      |  FROM (SELECT bucket, count(*) AS n_a, bit_xor(row_h) AS fp_a
      |        FROM hashed_a GROUP BY bucket) fa
      |  FULL OUTER JOIN (SELECT bucket, count(*) AS n_b, bit_xor(row_h) AS fp_b
      |                   FROM hashed_b GROUP BY bucket) fb USING (bucket)
      |  WHERE n_a IS DISTINCT FROM n_b OR fp_a IS DISTINCT FROM fp_b)
      |SELECT a.c_custkey, a.bucket,
      |  CASE WHEN b.row_h IS NULL THEN 'copy_missing'
      |       WHEN a.row_h <> b.row_h THEN 'overwrite_changed' END AS action
      |FROM hashed_a a
      |JOIN divergent USING (bucket)
      |LEFT JOIN hashed_b b ON a.c_custkey = b.c_custkey
      |WHERE b.row_h IS NULL OR a.row_h <> b.row_h
      |ORDER BY a.c_custkey""".stripMargin

  override def all: Seq[QueryDef] = Seq(
    QueryDef("q117_key_skew_profile", keySkewProfile, Some(keySkewProfileSql)),
    QueryDef("q118_column_profile", columnProfile, Some(columnProfileSql)),
    QueryDef("q123_replica_fingerprint", replicaFingerprint,
      Some(replicaFingerprintSql)),
    QueryDef("q133_contingency_chi2", contingency, Some(contingencySql)),
    QueryDef("q138_replica_repair", replicaRepair, Some(replicaRepairSql)),
    QueryDef("q140_dq_audit", dqAudit, Some(dqAuditSql)))

  /** Data-quality audit (q140): the Deequ/dbt-test constraint suite as
    * one relational program — key uniqueness, referential integrity
    * both directions of the star, domain ranges, and non-null checks,
    * each reported as (constraint, n_checked, n_violations). Every
    * check is a scan-local aggregate or an anti-join on the FK —
    * shapes that run at any scale (the FK anti-join is the same
    * semi-family plan as q10/q11, broadcast when the dim side is
    * small, shuffle otherwise). A warehouse gates its loads on exactly
    * this query; violations here are 0 by construction of the
    * fixtures, which the oracle proves cross-engine (a nonzero row
    * would hash-mismatch loudly).
    */
  def dqAudit(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    def check(name: String, checked: DataFrame => DataFrame, base: DataFrame): DataFrame = {
      val total = base.agg(count(lit(1)).as("n_checked"))
      val bad = checked(base).agg(count(lit(1)).as("n_violations"))
      total.crossJoin(bad).select(lit(name).as("constraint"),
        col("n_checked"), col("n_violations"))
    }
    Seq(
      check("orderkey_unique",
        df => df.groupBy("o_orderkey").agg(count(lit(1)).as("c"))
          .filter(col("c") > 1), orders),
      check("orders_custkey_fk",
        df => df.join(customer, col("o_custkey") === col("c_custkey"),
          "left_anti"), orders),
      check("lineitem_orderkey_fk",
        df => df.join(orders, col("l_orderkey") === col("o_orderkey"),
          "left_anti"), lineitem),
      check("discount_in_range",
        df => df.filter(col("l_discount") < 0 || col("l_discount") > 1), lineitem),
      check("quantity_positive",
        df => df.filter(col("l_quantity") <= 0), lineitem),
      check("custname_not_null",
        df => df.filter(col("c_name").isNull), customer))
      .reduce(_ unionAll _)
      .orderBy("constraint")
  }

  private val dqAuditSql =
    """SELECT 'orderkey_unique' AS "constraint",
      |  (SELECT count(*) FROM orders) AS n_checked,
      |  (SELECT count(*) FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1)) AS n_violations
      |UNION ALL SELECT 'orders_custkey_fk', (SELECT count(*) FROM orders),
      |  (SELECT count(*) FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
      |UNION ALL SELECT 'lineitem_orderkey_fk', (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem l WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
      |UNION ALL SELECT 'discount_in_range', (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_discount < 0 OR l_discount > 1)
      |UNION ALL SELECT 'quantity_positive', (SELECT count(*) FROM lineitem),
      |  (SELECT count(*) FROM lineitem WHERE l_quantity <= 0)
      |UNION ALL SELECT 'custname_not_null', (SELECT count(*) FROM customer),
      |  (SELECT count(*) FROM customer WHERE c_name IS NULL)
      |ORDER BY "constraint"""".stripMargin
}
