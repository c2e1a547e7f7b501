package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Bench's run-merging and report/JSON formatting — the
  * code that round 7 broke without compiling (a tuple-arity pattern in the
  * headline collect) and that nothing on the test path executed. These are
  * pure functions on purpose: every failure-labelling branch (run2 failed,
  * both failed, rows mismatch) is asserted without launching Spark. */
class BenchReportSpec extends AnyFunSuite {

  private val ok1 = Seq(("qa", 2.0, 10L), ("qb", 5.0, 20L))

  test("mergeRuns takes min seconds over successful runs, keeps agreed rows") {
    val merged = Bench.mergeRuns(ok1, Seq(("qa", 1.5, 10L), ("qb", 6.0, 20L)))
    assert(merged === Seq(("qa", 1.5, 10L, 10L, 10L), ("qb", 5.0, 20L, 20L, 20L)))
  }

  test("mergeRuns marks a query failed if EITHER run failed (never the fast abort time)") {
    // run 2 failed fast (0.1s abort): sec must come from the successful run
    val merged = Bench.mergeRuns(Seq(("qa", 2.0, 10L)), Seq(("qa", 0.1, -1L)))
    assert(merged === Seq(("qa", 2.0, -1L, 10L, -1L)))
    // both failed: min of failed times, still marked failed
    val both = Bench.mergeRuns(Seq(("qa", 0.3, -1L)), Seq(("qa", 0.2, -1L)))
    assert(both === Seq(("qa", 0.2, -1L, -1L, -1L)))
  }

  test("mergeRuns flags nondeterministic row counts as -2, never prefers run 2") {
    val merged = Bench.mergeRuns(Seq(("qa", 2.0, 10L)), Seq(("qa", 1.0, 11L)))
    assert(merged === Seq(("qa", 1.0, -2L, 10L, 11L)))
  }

  test("bytesSource: run2 steady-state, labelled run1 fallback, both-failed label") {
    assert(Bench.bytesSource("qa", 10L, 10L) === ("qa#2", ""))
    assert(Bench.bytesSource("qa", 10L, -1L) === ("qa#1", " (run1: run2 failed)"))
    assert(Bench.bytesSource("qa", -1L, -1L)
      === ("qa#1", " (both runs failed; bytes are partial)"))
  }

  test("reportLine carries the rows-mismatch flag and hides rows/s on failure") {
    val mism = Bench.reportLine("qa", 1.0, -2L, 10L, 11L, 42L, "")
    assert(mism.contains("ROWS-MISMATCH(run1=10,run2=11)"))
    assert(mism.contains("rows/s=?"))
    val fine = Bench.reportLine("qa", 2.0, 10L, 10L, 10L, 42L, "")
    assert(fine.contains("rows/s=5") && !fine.contains("MISMATCH"))
  }

  test("resultsJson: headline filtering, parseable shape, totals over ALL queries") {
    val results = Seq(
      ("q91_dup_groups", 2.5, 100L, 100L, 100L),   // in headline
      ("q00_project_rename", 0.5, 10L, 10L, 10L))  // not in headline
    val headline = Bench.resultsJson(results, "/sf", onlyHeadline = true)
    val full = Bench.resultsJson(results, "/sf", onlyHeadline = false)
    // total includes non-headline queries even in the headline JSON
    assert(headline.contains("\"value\":3.000"))
    assert(headline.contains("\"q91_dup_groups\":2.500"))
    assert(!headline.contains("q00_project_rename"))
    assert(full.contains("q00_project_rename"))
    // one line, no raw control chars, balanced braces — the driver tails this
    assert(!headline.contains("\n"))
    assert(headline.count(_ == '{') === headline.count(_ == '}'))
  }

  test("resultsJson sentinels: full JSON carries checkpoint times and " +
      "per-sentinel max/min spread; the headline (driver contract) " +
      "adds ONLY the steady spread") {
    val results = Seq(("q91_dup_groups", 2.5, 100L, 100L, 100L))
    val sent = Seq(
      "q15_agg_groupby@r1p0" -> 0.25, "q15_agg_groupby@r1p50" -> 0.50,
      "q20_sql_passthrough@r1p0" -> 1.0, "q20_sql_passthrough@r1p50" -> 1.0,
      "q15_agg_groupby@r2p25" -> 0.30, "q15_agg_groupby@r2p50" -> 0.60,
      "q20_sql_passthrough@r2p25" -> 1.0, "q20_sql_passthrough@r2p75" -> 1.0)
    val full = Bench.resultsJson(results, "/sf", onlyHeadline = false, sent)
    assert(full.contains("\"q15_agg_groupby@r1p0\":0.250"))
    assert(full.contains("\"q15_agg_groupby\":2.000"), full)   // raw spread incl. r1
    assert(full.contains("\"q20_sql_passthrough\":1.000"))     // flat
    assert(full.count(_ == '{') === full.count(_ == '}'))
    // r19: the headline self-attributes the driver's window — the STEADY
    // spread (r2 mid-suite checkpoints only) rides as one additive field;
    // raw per-checkpoint times and the warmup-polluted raw spread stay
    // out of the driver contract line
    val headline = Bench.resultsJson(results, "/sf", onlyHeadline = true, sent)
    assert(headline.contains("\"sentinel_spread_steady\":"))
    assert(headline.contains("\"q15_agg_groupby\":2.000"), headline) // 0.6/0.3
    assert(!headline.contains("@r1p0") && !headline.contains("@r2p25"))
    assert(!headline.contains("\"sentinels\"") &&
      !headline.contains("\"sentinel_spread\":"))
    assert(headline.count(_ == '{') === headline.count(_ == '}'))
    // sentinel-free invocation (no sentinels recorded): headline unchanged
    val bare = Bench.resultsJson(results, "/sf", onlyHeadline = true)
    assert(!bare.contains("sentinel"))
  }
}
