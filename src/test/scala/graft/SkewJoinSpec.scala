package graft

import org.apache.spark.sql.functions._

/** AQE skew-join handling: a hot join key whose shuffle partition dwarfs the
  * median gets split into advisory-sized sub-partitions at runtime — the
  * no-code-change answer to key skew at 100 TB (the salted-agg pattern in
  * q44 remains for aggregations, where AQE can't split groups). Thresholds
  * are lowered here so a ~10 MB local shuffle trips the same machinery that
  * defaults trip at 256 MB on a cluster. */
class SkewJoinSpec extends SparkSpec {

  test("AQE marks and splits the skewed partition of a sort-merge join") {
    val c = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> c.getOption(k))
    try {
      c.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      c.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
      c.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

      // 90% of left rows share key 0, with an incompressible payload, so
      // key 0's shuffle partition is far beyond threshold x median.
      val left = spark.range(200000).select(
        when(col("id") < 180000, 0L).otherwise(col("id") % 50).as("k"),
        md5(col("id").cast("string")).as("payload"))
      val right = spark.range(50).select(col("id").as("k"),
        md5(col("id").cast("string")).as("tag"))
      val joined = left.join(right, "k")

      // collect() (not count()) so THIS Dataset's AdaptiveSparkPlan is the
      // one that executes and finalizes — count() builds a separate plan.
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-handled join in:\n${plan.take(3000)}")
    } finally saved.foreach {
      case (k, Some(v)) => c.set(k, v)
      case (k, None) => c.unset(k)
    }
  }
}
