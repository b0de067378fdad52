package graft

import java.nio.file.Files

import graft.queries.SqlGateway

/** The reference's replicated log carries SQL command strings applied in
  * commit order (node.go:16-19, replication.go:88-103). The engine-side
  * equivalent is SqlGateway.applyLog: an ordered sequence of DDL/DML
  * commands over the session catalog. This spec replays such a log and
  * asserts the final state is exactly the ordered application.
  */
class SqlCommandLogSpec extends SparkSpec {

  test("an ordered SQL command log (CREATE/INSERT/SELECT) applies deterministically") {
    val loc = Files.createTempDirectory("graft_cmdlog").toString
    SqlGateway.applyLog(spark, Seq(
      "CREATE OR REPLACE TEMPORARY VIEW cmdlog_seed AS " +
        "SELECT * FROM VALUES (1, 'a'), (2, 'b') AS t(id, tag)",
      s"CREATE TABLE cmdlog_tbl (id INT, tag STRING) USING parquet LOCATION '$loc/tbl'",
      "INSERT INTO cmdlog_tbl SELECT * FROM cmdlog_seed",
      "INSERT INTO cmdlog_tbl VALUES (3, 'c')"))
    try {
      val got = spark.sql("SELECT id, tag FROM cmdlog_tbl ORDER BY id")
        .collect().map(r => (r.getInt(0), r.getString(1))).toSeq
      assert(got == Seq((1, "a"), (2, "b"), (3, "c")))
    } finally {
      spark.sql("DROP TABLE IF EXISTS cmdlog_tbl")
      spark.sql("DROP VIEW IF EXISTS cmdlog_seed")
    }
  }

  test("q156 DML log: CTAS + INSERT rebuild the full table; the v2 rewrite applies the delete") {
    try {
      val result = SqlGateway.dmlApply(spark, sfDir).collect().map(_.toString).toSeq
      assert(result.nonEmpty)
      // After replay: mat holds ALL orders (CTAS batch + INSERT batch)…
      val nOrders = graft.sources.Tables.orders(spark, sfDir).count()
      assert(spark.table("dml_orders_mat").count() == nOrders,
        "CTAS + INSERT INTO must reconstruct exactly the source rows")
      // …and the delete-shaped generation rewrite removed exactly the
      // predicate's rows, keeping everything else.
      val v2 = spark.table("dml_orders_v2")
      assert(v2.filter("price > 400000").count() == 0,
        "v2 generation must not contain deleted rows")
      val survivors = spark.table("dml_orders_mat").filter("NOT (price > 400000)").count()
      assert(v2.count() == survivors,
        "v2 generation must keep every non-matching row")
      // Replay is idempotent from a clean store (re-applying the log
      // yields the same final answer — the reference re-applies its log
      // on recovery).
      val again = SqlGateway.dmlApply(spark, sfDir).collect().map(_.toString).toSeq
      assert(again == result)
    } finally {
      spark.sql("DROP TABLE IF EXISTS dml_orders_mat")
      spark.sql("DROP TABLE IF EXISTS dml_orders_v2")
    }
  }

  test("q162 UPDATE log: the rewrite updates exactly the predicate's rows and keeps the rest byte-identical") {
    try {
      val result = SqlGateway.updateApply(spark, sfDir).collect().map(_.toString).toSeq
      assert(result.nonEmpty)
      val mat = spark.table("upd_cust_mat")
      val v2 = spark.table("upd_cust_v2")
      // Row count preserved — UPDATE rewrites, never drops.
      assert(v2.count() == mat.count(), "UPDATE generation must keep every row")
      // Exactly the predicate's rows carry the audit flag and the new
      // value; no negative balance survives.
      assert(v2.filter("updated = 1").count() == mat.filter("acctbal < 0").count(),
        "updated-flag count must equal the predicate count")
      assert(v2.filter("acctbal < 0").count() == 0, "no negative balance may survive the UPDATE")
      assert(v2.filter("updated = 1 AND acctbal <> 0").count() == 0,
        "every updated row must carry the SET value")
      // Untouched rows pass through unchanged (anti-join on full row).
      val untouchedChanged = mat.filter("acctbal >= 0")
        .exceptAll(v2.filter("updated = 0").drop("updated")).count()
      assert(untouchedChanged == 0, "non-matching rows must be byte-identical across generations")
      // Clean-store replay converges to the same answer.
      val again = SqlGateway.updateApply(spark, sfDir).collect().map(_.toString).toSeq
      assert(again == result)
    } finally {
      spark.sql("DROP TABLE IF EXISTS upd_cust_mat")
      spark.sql("DROP TABLE IF EXISTS upd_cust_v2")
    }
  }

  test("q164: every generation stays queryable after the pointer swap, with its own schema") {
    try {
      val res = SqlGateway.generationTimeTravel(spark, sfDir).collect()
      assert(res.length == 3)
      val iRows = res(0).fieldIndex("n_rows")
      val iPrem = res(0).fieldIndex("n_premium")
      val n = res.map(_.getLong(iRows))
      assert(n(0) > n(1), "the DELETE-shaped g2 rewrite must drop rows")
      assert(n(1) == n(2), "the ALTER-shaped g3 rewrite must preserve row count")
      assert(res(0).isNullAt(iPrem) && res(1).isNullAt(iPrem),
        "n_premium must be NULL before the column exists")
      assert(!res(2).isNullAt(iPrem) && res(2).getLong(iPrem) > 0)
      // Schema history through the pointer table: band exists only at g3.
      assert(!SqlGateway.timeTravelRead(spark, 1).columns.contains("band"))
      assert(!SqlGateway.timeTravelRead(spark, 2).columns.contains("band"))
      assert(SqlGateway.timeTravelRead(spark, 3).columns.contains("band"))
      // The superseded g1 generation still answers the ORIGINAL query:
      // its row count equals the raw source (rewrites never mutate it).
      val src = graft.sources.Tables.part(spark, sfDir).count()
      assert(SqlGateway.timeTravelRead(spark, 1).count() == src)
      // Replaying the whole log converges (DROP IF EXISTS + CTAS pairs).
      val again = SqlGateway.generationTimeTravel(spark, sfDir).collect()
      assert(again.map(_.toString).toSeq == res.map(_.toString).toSeq)
    } finally {
      Seq("ttv_part_g1", "ttv_part_g2", "ttv_part_g3", "ttv_generations")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("q171 VACUUM: expired generations fail closed with a clear error; retained ones still answer; replay converges") {
    try {
      val res = SqlGateway.generationVacuum(spark, sfDir).collect()
      assert(res.length == 3)
      // The retention law: exactly the generations below the retention
      // point expire, and their storage is really gone.
      assert(res.map(r => (r.getInt(0), r.getString(1))).toSeq ==
        Seq((1, "expired"), (2, "retained"), (3, "retained")))
      assert(res.forall(_.getBoolean(3)), "storage_ok must hold for every generation")
      assert(!spark.catalog.tableExists("vac_part_g1"),
        "the expired generation's table must be dropped")
      // Fail-closed time travel: reading the expired generation throws
      // an error that says WHAT happened and names the earliest
      // retained generation — not a bare table-not-found.
      val err = intercept[IllegalStateException](SqlGateway.vacuumAwareRead(spark, 1))
      assert(err.getMessage.contains("expired by VACUUM") &&
        err.getMessage.contains("earliest retained generation is 2"), err.getMessage)
      // Retained generations — including the SUPERSEDED g2 — still
      // answer q164's original queries against the raw source.
      val srcRows = graft.sources.Tables.part(spark, sfDir)
        .filter("NOT (p_partkey % 10 = 7)").count()
      assert(SqlGateway.vacuumAwareRead(spark, 2).count() == srcRows)
      assert(SqlGateway.vacuumAwareRead(spark, 3).count() == srcRows)
      assert(SqlGateway.vacuumAwareRead(spark, 3).columns.contains("band"))
      // The current generation is untouched by VACUUM: its summary row
      // matches the q164 family's g3 shape (premium count present).
      assert(res(2).getLong(6) > 0, "current generation must keep its premium count")
      // Replaying the whole history+VACUUM log over the vacuumed state
      // converges (every command is DROP IF EXISTS + CTAS).
      val again = SqlGateway.generationVacuum(spark, sfDir).collect()
      assert(again.map(_.toString).toSeq == res.map(_.toString).toSeq)
    } finally {
      Seq("vac_part_g1", "vac_part_g2", "vac_part_g3", "vac_generations",
        "vac_generations_v2").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("a query command through the gateway equals the DataFrame surface") {
    val viaSql = SqlGateway.sqlCommand(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(viaSql.nonEmpty)
    // Same command re-issued must be deterministic (pure read).
    val again = SqlGateway.sqlCommand(spark, sfDir)
      .collect().map(_.toString).toSeq
    assert(viaSql == again)
  }
}
