package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Approximate sketches (no cross-engine oracle — HLL implementations
  * differ by design): accuracy asserted against the exact answer. */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact on lineitem keys") {
    val li = Sources.table(spark, sf, "lineitem")
    val r = li.agg(
      count_distinct(col("l_partkey")).as("exact"),
      approx_count_distinct(col("l_partkey"), 0.02).as("approx")).head
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"exact=$exact approx=$approx")
  }

  test("approx percentile brackets the exact percentile") {
    val li = Sources.table(spark, sf, "lineitem")
    val r = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("approx")).head
    val (exact, approx) = (r.getDouble(0), r.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.05)
  }
}
