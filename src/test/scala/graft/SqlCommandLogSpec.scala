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
