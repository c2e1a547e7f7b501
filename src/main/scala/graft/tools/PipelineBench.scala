package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Graft
import graft.pipeline.Pipeline
import graft.schemas.Schemas
import graft.sources.Sources

/** End-to-end ETL throughput on a BTS-August-2018-scale synthetic fact
  * source (~700k flights, 29 cols — the reference's workload size; the real
  * CSV is an absent blob). Prints one JSON line with build+publish seconds.
  *
  * The reference executes this workload as ~20 Airflow tasks, each a
  * single-threaded pandas process round-tripping whole tables through
  * XCom/Postgres. Here it is one lazy plan: synthesize -> 6 dims -> quality
  * gates -> fact with broadcast FK joins -> parquet warehouse.
  */
object PipelineBench {

  /** Deterministic BTS-shaped flights source, generated distributed
    * (spark.range — no driver-side data). */
  def syntheticFlights(spark: SparkSession, n: Long): DataFrame = {
    val codes = typedlit(Seq("JFK", "LAX", "ORD", "ATL", "DFW", "DEN",
      "SFO", "SEA", "MIA", "BOS"))
    val i = col("id")
    val airport = (idx: org.apache.spark.sql.Column) =>
      element_at(codes, (idx % 10 + 1).cast(IntegerType))
    spark.range(0, n)
      .select(
        concat(lit("2018-08-"), lpad((i % 28 + 1).cast(StringType), 2, "0"))
          .as("FL_DATE"),
        (lit(19000L) + i % 40).as("OP_CARRIER_AIRLINE_ID"),
        concat(lit("N"), i % 9999).as("TAIL_NUM"),
        (i % 7000).as("OP_CARRIER_FL_NUM"),
        (i % 400).as("ORIGIN_AIRPORT_ID"),
        (i % 400).as("ORIGIN_AIRPORT_SEQ_ID"),
        (i % 90).as("ORIGIN_CITY_MARKET_ID"),
        airport(i).as("ORIGIN"),
        ((i + 3) % 400).as("DEST_AIRPORT_ID"),
        ((i + 3) % 400).as("DEST_AIRPORT_SEQ_ID"),
        ((i + 3) % 90).as("DEST_CITY_MARKET_ID"),
        airport(i + 3).as("DEST"),
        (i % 24 * 100 + i % 60).as("CRS_DEP_TIME"),
        when(i % 13 === 0, lit(null).cast(LongType))
          .otherwise(i % 24 * 100 + (i + 5) % 60).as("DEP_TIME"),
        when(i % 13 === 0, lit(null).cast(DoubleType))
          .otherwise((i % 120).cast(DoubleType) - 30).as("DEP_DELAY"),
        greatest((i % 120).cast(DoubleType) - 30, lit(0.0)).as("DEP_DELAY_NEW"),
        when(i % 17 === 0, lit(null).cast(LongType))
          .otherwise((i + 2) % 24 * 100 + i % 60).as("ARR_TIME"),
        when(i % 17 === 0, lit(null).cast(DoubleType))
          .otherwise((i % 150).cast(DoubleType) - 40).as("ARR_DELAY"),
        greatest((i % 150).cast(DoubleType) - 40, lit(0.0)).as("ARR_DELAY_NEW"),
        (i % 50 === 0).cast(DoubleType).as("CANCELLED"),
        when(i % 50 === 0, element_at(typedlit(Seq("A", "B", "C", "D")),
          (i % 4 + 1).cast(IntegerType))).as("CANCELLATION_CODE"),
        (lit(60.0) + (i % 300)).as("CRS_ELAPSED_TIME"),
        when(i % 11 === 0, lit(null).cast(DoubleType))
          .otherwise(lit(65.0) + (i % 300)).as("ACTUAL_ELAPSED_TIME"),
        when(i % 5 === 0, (i % 45).cast(DoubleType)).as("CARRIER_DELAY"),
        when(i % 7 === 0, (i % 30).cast(DoubleType)).as("WEATHER_DELAY"),
        when(i % 3 === 0, (i % 25).cast(DoubleType)).as("NAS_DELAY"),
        lit(0.0).as("SECURITY_DELAY"),
        when(i % 9 === 0, (i % 60).cast(DoubleType)).as("LATE_AIRCRAFT_DELAY"),
        lit(null).cast(StringType).as("Unnamed: 28"))
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("SPARK_GRAFT_FLIGHTS", "700000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]").appName("pipeline-bench"),
      cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = java.nio.file.Files.createTempDirectory("graft_plbench").toString
    val airportsRaw = Sources.csv(spark,
      "/root/reference/rawdata/Airports", Schemas.airportsRaw)
    val carriersRaw = Sources.csv(spark,
      "/root/reference/rawdata/Air Carriers", Schemas.carriersRaw)
    val flights = syntheticFlights(spark, n)

    val t0 = System.nanoTime()
    val counts = Pipeline.run(spark, flights, airportsRaw, carriersRaw, out)
    val sec = (System.nanoTime() - t0) / 1e9
    val rps = (n / sec).toLong
    println(s"""{"metric":"pipeline_e2e","flights":$n,"value":$sec,"unit":"sec","rows_per_sec":$rps,"tables":${counts.size},"fact_rows":${counts("flights")}}""")
    spark.stop()
  }
}
