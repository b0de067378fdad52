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

  test("no data-sized cartesian anywhere in the committed PLANS.md (cart1row/cartData split — r19)") {
    // VERDICT r18 item 5: the legitimate one-row stats-attachment
    // crossJoins (cart1row — a side with provable logical maxRows ≤ 8)
    // must not be the noise an accidental data×data cartesian hides
    // in. PlanAudit splits the census; this pin keeps cartData at ZERO
    // for every registered query.
    // The one deliberate exception: q15 IS the cross-join operator
    // (SURVEY §2.2.3 "Cross") — a cartesian over the 5-row region dim
    // is its semantics, not an accident; everything else must be 0.
    val deliberate = Set("q15_cross_join_regions")
    val lines = Files.readAllLines(Paths.get("PLANS.md")).asScala
    val rowName = """^\|\s*(q\d+\w*)\*?\s*\|""".r
    val offenders = lines.flatMap { l =>
      rowName.findFirstMatchIn(l).flatMap { m =>
        val cells = l.split("\\|").map(_.trim)
        // cells: "", name, hashEx, rangeEx, SMJ, BHJ, BNLJ, cart1row,
        // cartData, pushdown
        if (cells.length >= 10 && cells(8).forall(_.isDigit) &&
            cells(8).toInt > 0 && !deliberate(m.group(1)))
          Some(s"${m.group(1)} cartData=${cells(8)}")
        else None
      }
    }
    assert(offenders.isEmpty,
      s"data-sized cartesians in PLANS.md: ${offenders.mkString(", ")}")
    // The split itself must be present (a stale pre-split file would
    // vacuously pass): the header names both columns.
    assert(lines.exists(l => l.contains("cart1row") && l.contains("cartData")),
      "PLANS.md predates the cartesian split — re-run PlanAudit")
  }
}
