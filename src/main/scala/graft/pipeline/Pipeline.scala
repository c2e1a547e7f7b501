package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.delta.Incremental
import graft.dims.Dims
import graft.fact.FlightFact
import graft.quality.Quality
import graft.sources.Sources

/** The reference's entire Airflow DAG (SURVEY.md §3.1) as ONE lazy Spark
  * composition: extract -> dimension builds -> quality gates -> fact
  * assembly -> incremental delta -> curated sinks.
  *
  * Where the reference serializes every task boundary through XCom/Postgres
  * (a full table round-trip per arrow), here each arrow is just a DataFrame
  * reference: Catalyst plans the whole graph at once, and with broadcast
  * dimension joins the main ETL executes with zero wide shuffles until the
  * fact write (SURVEY.md §3.1 "thread/process/node boundaries").
  */
object Pipeline {

  /** All curated outputs of one run, still lazy. */
  final case class Warehouse(
      airports: DataFrame, carriers: DataFrame, time: DataFrame,
      dates: DataFrame, cancellations: DataFrame, delays: DataFrame,
      flights: DataFrame)

  /** Build every curated table from the raw inputs (no I/O triggered). */
  def build(spark: SparkSession, flightsRaw: DataFrame,
            airportsRaw: DataFrame, carriersRaw: DataFrame): Warehouse = {
    val airports = Dims.airports(airportsRaw)
    val dates = Dims.dates(flightsRaw, "FL_DATE")
    val delays = Dims.delays(flightsRaw)
    Warehouse(
      airports = airports,
      carriers = Dims.carriers(carriersRaw),
      time = Dims.time(spark),
      dates = dates,
      cancellations = Dims.cancellations(flightsRaw),
      delays = delays,
      flights = FlightFact.build(flightsRaw, airports, dates, delays))
  }

  /** Quality gates for every dimension (single scan per table); returns the
    * union of violations — empty means the warehouse is publishable. */
  def qualityReport(w: Warehouse): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val reports = Seq(
      "airports" -> Quality.report(w.airports, Quality.presets.airportDim),
      "date" -> Quality.report(w.dates, Quality.presets.dateDim),
      "delays" -> Quality.report(w.delays, Quality.presets.delayDim),
      "time" -> Quality.report(w.time, Quality.presets.timeDim))
    reports.map { case (t, r) => r.withColumn("table", lit(t)) }
      .reduce(_ unionByName _)
      .select("table", "rule_name", "violations")
  }

  /** Incremental publish of one curated table: anti-join the accumulated
    * parquet, append only the delta (the reference's add_changes_to_* x6,
    * ET:333-499, with intended — not inverted — emptiness semantics). */
  def publishIncremental(spark: SparkSession, table: DataFrame,
                         path: String): Long = {
    val delta = readAccumulated(spark, path) match {
      case Some(acc) => Incremental.delta(table, acc)
      case None => table
    }
    // persist so count + write execute the (expensive) anti-join once
    delta.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = delta.count()
      if (n > 0) delta.write.mode("append").parquet(path)
      n
    } finally delta.unpersist()
  }

  /** The accumulated table, or None when there is genuinely no data yet:
    * path absent, or present but with no readable parquet layout (an
    * interrupted first write leaving only _temporary raises
    * AnalysisException at schema inference). Anything else — transient FS
    * errors, corrupt footers at execution — PROPAGATES: treating those as
    * "first run" would append the whole table as duplicates. */
  private[graft] def readAccumulated(spark: SparkSession,
                                     path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val exists = p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    if (!exists) None
    else
      try Some(spark.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
  }

  /** Full run: build, assert quality, publish all tables incrementally under
    * `outDir`, register SQL views. Returns per-table appended row counts. */
  def run(spark: SparkSession, flightsRaw: DataFrame, airportsRaw: DataFrame,
          carriersRaw: DataFrame, outDir: String): Map[String, Long] = {
    val w = build(spark, flightsRaw, airportsRaw, carriersRaw)
    val violations = qualityReport(w)
      .where(org.apache.spark.sql.functions.col("violations") > 0)
    require(violations.isEmpty,
      s"quality gate failed:\n${violations.collect().mkString("\n")}")
    val tables = Map(
      "airports" -> w.airports, "air_carriers" -> w.carriers,
      "time" -> w.time, "date" -> w.dates,
      "cancelations" -> w.cancellations, "delays" -> w.delays,
      "flights" -> w.flights)
    val counts = tables.map { case (name, df) =>
      name -> publishIncremental(spark, df, s"$outDir/$name")
    }
    graft.warehouse.Warehouse.registerStar(spark, outDir)
    counts
  }
}
