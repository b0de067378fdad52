package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query in the engine's surface: the Spark program and,
  * when the semantics are ANSI-SQL-expressible, the DuckDB oracle SQL the
  * driver hash-compares against (SURVEY.md §5.2). Queries without an oracle
  * (approx sketches, hash-based LSH, streaming state) get a weaker
  * rows-only check from the driver plus ScalaTest property specs.
  *
  * Determinism contract (SURVEY.md §7.4 / FIXTURES.md): every query ends in
  * a total ORDER BY; floating aggregates rounded to 4 decimals on both
  * sides; aliases identical on both sides (driver sorts columns by name).
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    headline: Boolean = false,
    /** One-time setup excluded from benchmarking (e.g. q102's bucketed
      * table writes — one-time ETL in production, so charging it to the
      * measured join misrepresents the operator). `fn` must still be
      * self-contained without it: prepare is an idempotent memo hit.
      */
    prepare: Option[(SparkSession, String) => Unit] = None,
    /** Plan-audit surrogate (VERDICT r17 item 7): for transaction
      * queries whose `fn` does its work in side-effecting staged
      * writes and returns a localCheckpoint'ed read-back (q201/q207),
      * the physical plan of `fn`'s result says nothing about the
      * transaction — PlanAudit would record an all-zeros row. This
      * relation is the SAME fold-plus-read composition as ONE
      * declarative plan (built by the identical fold helpers the stage
      * path runs), so PLANS.md and the PlanSpec corpus-scan-free pins
      * cover the transaction path.
      */
    planAudit: Option[(SparkSession, String) => DataFrame] = None)

/** A themed group of queries (one per SURVEY.md §2.2 area). */
trait QueryPack {
  def all: Seq[QueryDef]
}

/** JSON string escaping shared by the driver-facing JSON emitters
  * (Verify's oracle_sql.json, Bench's metric line): backslash, quote,
  * and ALL control chars (<0x20) — a tab or CR in builder-authored SQL
  * or an exception message would otherwise make the driver's json.load
  * fail and silently zero the round's correctness/bench signal.
  */
private[graft] object JsonEscape {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
