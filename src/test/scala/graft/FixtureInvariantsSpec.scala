package graft

import org.apache.spark.sql.functions._

/** Central fixture invariants that several cross-engine oracles lean on
  * silently (ADVICE r4): assert them ONCE, loudly, so a future fixture
  * regeneration that breaks an assumption fails here with a named
  * reason instead of as an opaque oracle hash mismatch.
  *
  * ASCII-only document text: the q79 SimHash oracle hashes per-CHARACTER
  * code points (`ascii(gram[i])`) while the Spark-side kernel hashes
  * UTF-8 BYTES, and its DuckDB loop bound is strlen (bytes) against
  * character indexing — identical only while every text is pure ASCII
  * (bytes == chars == code points). q88's rolling hash and q103's char
  * sums share the same latent assumption.
  */
class FixtureInvariantsSpec extends SparkSpec {

  test("documents.text is pure ASCII at every fixture scale (q79/q88/q103 oracle precondition)") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .foreach { dir =>
        val docs = graft.sources.Tables.documents(spark, dir)
        val nonAscii = docs
          .filter(not(col("text").rlike("^[\\x20-\\x7e]*$")))
          .count()
        assert(nonAscii == 0,
          s"$dir: $nonAscii documents contain non-printable-ASCII characters — " +
            "the q79/q88/q103 byte-vs-character oracle equivalence no longer holds; " +
            "switch those oracles to byte iteration before regenerating fixtures")
      }
  }
}
