package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Staleness gate for the committed PLANS.md (ADVICE r6): PlanAudit's
  * own completeness require is tautological — it counts the rows it
  * just generated. This spec parses the COMMITTED file instead, so a
  * query surface that grows (or a renamed query) fails CI until
  * `sbt "runMain graft.PlanAudit"` is re-run and the regenerated file
  * committed.
  */
class PlansFileSpec extends SparkSpec {

  test("committed PLANS.md rows equal the registered query surface") {
    val path = Paths.get("PLANS.md")
    assert(Files.exists(path), "PLANS.md missing — run `sbt \"runMain graft.PlanAudit\"`")
    // A trailing `*` marks a transaction query audited via its plan
    // surrogate (QueryDef.planAudit — r18); the name is still the row.
    val rowName = """^\|\s*(q\d+\w*)\*?\s*\|""".r
    val audited = Files.readAllLines(path).asScala
      .flatMap(l => rowName.findFirstMatchIn(l).map(_.group(1))).toSet
    val registered = SparkEntry.queries.keySet
    val missing = registered -- audited
    val stale = audited -- registered
    assert(missing.isEmpty && stale.isEmpty,
      s"PLANS.md is stale — re-run PlanAudit and commit. " +
        s"unaudited=${missing.toSeq.sorted.take(5)} ghost-rows=${stale.toSeq.sorted.take(5)}")
  }
}
