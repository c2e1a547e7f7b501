package graft

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter): when a
  * shuffle join has a selective build side, Spark can build a bloom filter
  * of the build-side join keys and push a `might_contain` predicate into
  * the probe-side scan — rows that cannot join are dropped BEFORE the
  * probe side shuffles. At 100 TB this is the difference between shuffling
  * the whole fact table and shuffling the ~matching slice; it composes
  * with every equi-join in this library without code changes, which is why
  * the engine relies on the optimizer rule rather than hand-rolled filter
  * plumbing. The thresholds are size-based (the rule only pays for a bloom
  * build when the probe side is big), so the spec lowers them to fire on
  * test-sized data — asserting the rule DOES engage on this plan shape.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("selective shuffle join injects a bloom might_contain on the probe side") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // fire on test-sized tables: no minimum probe-side scan size...
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // ...and allow the small build side
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "64MB")
      // force a shuffle join — runtime filters don't apply to broadcasts
      // (a broadcast probe never shuffles, there is nothing to save)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      val li = Sources.table(spark, sf, "lineitem")
      val o = Sources.table(spark, sf, "orders")
        .where(col("o_orderpriority") === "1-URGENT" && col("o_orderkey") < 100)
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority").agg(sum(col("l_quantity")).as("q"))
      val plan = joined.queryExecution.optimizedPlan.toString()
      assert(plan.contains("bloom_filter_agg") || plan.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$plan")
      assert(joined.collect().nonEmpty) // and the filtered plan still runs
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
