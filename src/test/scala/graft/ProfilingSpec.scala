package graft

import org.apache.spark.sql.functions._

import graft.queries.Profiling
import graft.sources.Tables

class ProfilingSpec extends SparkSpec {

  test("q123: inconsistent buckets are exactly the buckets holding a divergent key") {
    // Recompute the expected divergent bucket set straight from the
    // replica-B derivation rules: a bucket diverges iff it contains a
    // dropped key (mod 499) or a perturbed key (mod 250).
    val cust = Tables.customer(spark, sfDir)
    val expected = cust
      .filter(col("c_custkey") % 499 === 0 || col("c_custkey") % 250 === 0)
      .select((col("c_custkey") % 16).as("bucket")).distinct()
      .collect().map(_.getLong(0)).toSet
    val got = Profiling.replicaFingerprint(spark, sfDir)
      .filter(col("consistent") === 0)
      .select("bucket").collect().map(_.getLong(0)).toSet
    assert(got == expected, s"divergent buckets $got != expected $expected")
    assert(expected.nonEmpty, "fixture has no divergent key — test is vacuous")
  }

  test("q123: fingerprints are order-independent (XOR law)") {
    // Same rows in a different partition layout must produce identical
    // per-bucket fingerprints — the property that lets two replicas
    // fingerprint independently without a common sort order.
    val a = Profiling.replicaFingerprint(spark, sfDir)
      .select("bucket", "fp_a").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reshuffled = Tables.customer(spark, sfDir).repartition(7)
    // Rebuild replica A's fingerprint from the reshuffled scan.
    graft.functions.NativeFunctions.register(spark)
    val b = reshuffled
      .withColumn("row_str", concat_ws("|",
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"), round(col("c_acctbal") * 100).cast("long")))
      .withColumn("row_h", expr("shingle_hash64(array(row_str))[0]"))
      .groupBy((col("c_custkey") % 16).as("bucket"))
      .agg(expr("bit_xor(row_h)").as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "fingerprint depends on partition layout")
  }

  test("q133: marginals are consistent and cell counts partition the corpus") {
    import graft.queries.Profiling
    val t = Profiling.contingency(spark, sfDir).cache()
    try {
      val total = Tables.documents(spark, sfDir).count()
      assert(t.agg(sum("n")).head().getLong(0) == total)
      // Row marginal: the sum of a lang's cells equals its row_n on
      // every cell of that lang (and symmetrically for columns).
      assert(t.groupBy("lang").agg(sum("n").as("s"), max("row_n").as("m"), min("row_n").as("m2"))
        .filter(col("s") =!= col("m") || col("s") =!= col("m2")).count() == 0)
      assert(t.groupBy("source").agg(sum("n").as("s"), max("col_n").as("m"), min("col_n").as("m2"))
        .filter(col("s") =!= col("m") || col("s") =!= col("m2")).count() == 0)
      // chi-square contributions are non-negative.
      assert(t.filter(col("chi2_cell") < 0).count() == 0)
    } finally t.unpersist()
  }

  test("q138: the repair list is exactly the diverged keys, all inside flagged buckets") {
    import graft.queries.Profiling
    val repair = Profiling.replicaRepair(spark, sfDir).cache()
    try {
      // Ground truth from the replica-B derivation rules.
      val missing = Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 499 === 0)
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      val changed = Tables.customer(spark, sfDir)
        .filter(col("c_custkey") % 250 === 0 && col("c_custkey") % 499 =!= 0)
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      val gotMissing = repair.filter(col("action") === "copy_missing")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      val gotChanged = repair.filter(col("action") === "overwrite_changed")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      assert(gotMissing == missing, s"missing-key list $gotMissing != $missing")
      assert(gotChanged == changed, s"changed-key list $gotChanged != $changed")
      // Drill-down discipline: every repair row sits in a bucket the
      // fingerprint phase flagged.
      val flagged = Profiling.replicaFingerprint(spark, sfDir)
        .filter(col("consistent") === 0)
        .select("bucket").collect().map(_.getLong(0)).toSet
      val outside = repair.filter(!col("bucket").isin(flagged.toSeq: _*)).count()
      assert(outside == 0, s"$outside repair rows outside flagged buckets")
    } finally repair.unpersist()
  }

  test("q140: fixture passes every constraint and checked counts match table sizes") {
    import graft.queries.Profiling
    val audit = Profiling.dqAudit(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(audit.keySet == Set("orderkey_unique", "orders_custkey_fk",
      "lineitem_orderkey_fk", "discount_in_range", "quantity_positive",
      "custname_not_null"))
    assert(audit.values.forall(_._2 == 0L), s"fixture violates constraints: $audit")
    val nOrders = Tables.orders(spark, sfDir).count()
    val nLine = Tables.lineitem(spark, sfDir).count()
    assert(audit("orderkey_unique")._1 == nOrders)
    assert(audit("lineitem_orderkey_fk")._1 == nLine)
  }
}
