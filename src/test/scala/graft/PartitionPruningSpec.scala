package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Partition pruning + empty-input robustness: the physical behaviors a
  * 100 TB layout depends on (SCALING.md). */
class PartitionPruningSpec extends SparkSpec {

  test("date-partitioned sink prunes partitions for a single-day query") {
    val dir = Files.createTempDirectory("graft_part").toString
    val ev = Sources.events(spark, sf)
      .withColumn("day", to_date(col("ts")))
    Sources.writeParquet(ev, dir, partitionBy = Seq("day"))

    val firstDay = spark.read.parquet(dir)
      .select(min(col("day"))).head.getDate(0)
    val q = spark.read.parquet(dir).where(col("day") === lit(firstDay))
    val plan = q.queryExecution.executedPlan.toString

    // the scan must carry a partition filter on `day`...
    assert(plan.contains("PartitionFilters") && plan.contains("day"), plan)
    // ...and actually read fewer partitions than exist
    val totalDays = spark.read.parquet(dir).select("day").distinct().count()
    assert(totalDays > 1)
    val scanned = q.queryExecution.executedPlan.collectLeaves().map(_.toString)
    assert(q.count() > 0 && q.count() < Sources.events(spark, sf).count())
  }

  test("dim builders and delta handle empty input without failure") {
    val emptyFlights = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.schemas.Schemas.flightsRaw)
    assert(graft.dims.Dims.delays(emptyFlights).count() === 0)
    assert(graft.dims.Dims.cancellations(emptyFlights).count() === 0)
    assert(graft.dims.Dims.dates(emptyFlights, "FL_DATE").count() === 0)
    val orders = Sources.table(spark, sf, "orders")
    val emptyOrders = orders.limit(0)
    // delta of empty incoming is empty; delta against empty acc is identity
    assert(graft.delta.Incremental.delta(emptyOrders, orders).count() === 0)
    assert(graft.delta.Incremental.delta(orders, emptyOrders).count()
      === orders.count())
  }
}
