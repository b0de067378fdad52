package graft

class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query names are unique and oracle keys are a subset") {
    val names = SparkEntry.defs.map(_.name)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("registry regression guard: every pack stays registered") {
    // Round 1's worst defect was silently-unregistered packs. Exact
    // counts force any change here to be deliberate.
    assert(SparkEntry.defs.size == 211,
      s"query count ${SparkEntry.defs.size} != 211 — update this guard deliberately")
    assert(SparkEntry.oracleSql.size == 210,
      s"oracle count ${SparkEntry.oracleSql.size} != 210 — update this guard deliberately")
    // One representative per pack must be present.
    val reps = Seq("q01_", "q10_", "q20_", "q26_", "q30_", "q40_", "q50_", "q60_", "q65_", "q70_", "q80_", "q91_", "q114_", "q117_", "q121_")
    val names = SparkEntry.defs.map(_.name)
    reps.foreach(p => assert(names.exists(_.startsWith(p)), s"no query with prefix $p — pack unregistered?"))
    assert(SparkEntry.headlineQueries.nonEmpty)
  }

  test("every query runs and returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("oracle column aliases match the Spark schema (sorted-by-name compare)") {
    // The driver sorts columns by name before hashing; mismatched aliases
    // are the most common silent failure. Cheap structural guard: every
    // query's schema has no auto-generated names like sum(x) or round(x, 4).
    SparkEntry.queries.foreach { case (name, fn) =>
      val cols = fn(spark, sfDir).columns
      cols.foreach { c =>
        assert(!c.contains("("), s"$name has unaliased column '$c'")
      }
    }
  }
}
