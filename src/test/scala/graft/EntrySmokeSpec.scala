package graft

/** Smoke: the driver contract — entry() yields rows; every declared query
  * runs at sf0.001 and every query has either an oracle or a documented
  * reason to be rows-only. */
class EntrySmokeSpec extends SparkSpec {

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    val empties = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val n = fn(spark, sf).count()
        if (n == 0) Some(name) else None
    }
    assert(empties.isEmpty, s"queries with 0 rows: $empties")
  }

  test("oracle coverage: every query name has an oracle entry") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    // non-SQL-expressible ops may be rows-only; keep the list explicit
    // q82: sketch outputs (HLL++, approx percentile) are engine-specific by
    // design — accuracy is asserted against exact counts in SketchSpec
    val allowedRowsOnly = Set("q82_approx_agg")
    assert((missing -- allowedRowsOnly).isEmpty,
      s"queries without oracle: ${missing -- allowedRowsOnly}")
  }
}
