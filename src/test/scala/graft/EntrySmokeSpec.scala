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
    // since round 3 EVERY query is oracle-checked — q82 outputs exact
    // columns + boolean accuracy verdicts instead of raw sketch estimates
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }
}
