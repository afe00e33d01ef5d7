package graft

/** The driver contract's own invariants — a wiring mistake here (a query
  * without its oracle entry, an oracle for a renamed query) silently
  * downgrades or zeroes the round's correctness gate, so the contract is
  * asserted directly.
  */
class EntryConsistencySpec extends SparkSpec {

  /** The only queries allowed to ship without a DuckDB oracle, each with a
    * documented necessity (see SURVEY §2).
    */
  private val rowsOnlyByNecessity = Set.empty[String]
  // EMPTY as of round 8: ann_ivf's MLlib KMeans quantizer (the last entry —
  // its centroids were not reproducible outside Spark) was replaced by the
  // deterministic seeded quantizer, which carries a full DuckDB oracle.

  test("every query has an oracle, or is a documented rows-only exception") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      rowsOnlyByNecessity
    assert(missing.isEmpty,
      s"queries silently downgraded to rows-only: ${missing.toSeq.sorted}")
  }

  test("every oracle belongs to a live query, and none is blank") {
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles without queries: ${orphaned.toSeq.sorted}")
    val blank = SparkEntry.oracleSql.collect { case (k, v) if v.trim.isEmpty => k }
    assert(blank.isEmpty, s"blank oracle sql: $blank")
  }

  test("the rows-only exception list is tight (no stale entries)") {
    assert(rowsOnlyByNecessity.subsetOf(SparkEntry.queries.keySet))
    // an entry that GAINED an oracle must leave the exception list
    assert((rowsOnlyByNecessity & SparkEntry.oracleSql.keySet).isEmpty)
  }

  test("every query plans and executes at sf0.001") {
    val dir = "/root/testdata/sf0.001"
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).limit(1).collect(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(spark).limit(1).collect().nonEmpty)
  }
}
