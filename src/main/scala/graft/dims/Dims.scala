package graft.dims

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.ColumnOps._

/** Star-schema dimension builders (SURVEY.md §2, dims; reference
  * dags/extract_and_tranform.py — ET).
  *
  * Every builder is a lazy DataFrame transformation built purely from
  * codegen'd built-ins; surrogate keys are pinned to explicit orderings
  * (the pandas `df.index` has no distributed equivalent — SURVEY.md §7.4).
  * Dimensions are small (<10k rows), so the single global `row_number`
  * window is deliberate and broadcast-join-friendly downstream.
  */
object Dims {

  /** AirportDim (ET:62-99): parse "City, ST: Airport Name" descriptions,
    * dedup, surrogate-key by code order (= file order: the raw file is
    * code-sorted, so ids match the reference's insertion-order index). */
  def airports(raw: DataFrame): DataFrame = {
    val parsed = raw
      .withColumn("name", airportName(col("Description")))
      .withColumn("city", airportCity(col("Description")))
      .withColumn("country", airportCountry(col("Description")))
      .withColumnRenamed("Code", "airport_code")
      .drop("Description")
      .dropDuplicates()
    withSurrogateKey(parsed, "airport_id_pk", col("airport_code"))
      .select("airport_id_pk", "airport_code", "name", "city", "country")
  }

  /** CarrierDim (ET:102-124): "Name: SHORTCUT" parsing; the natural key
    * `Code` is kept as the pk (ET:122 — reference reuses it, J5). */
  def carriers(raw: DataFrame): DataFrame =
    raw
      .withColumn("name", carrierName(col("Description")))
      .withColumn("shortcut", carrierShortcut(col("Description")))
      .withColumnRenamed("Code", "air_carrier_id_pk")
      .select("air_carrier_id_pk", "name", "shortcut")

  /** TimeDim generator (G1, ET:213-252): one row per minute of day.
    * `spark.range` replaces the 1440-iteration Python loop; entirely
    * deterministic, no input. */
  def time(spark: SparkSession): DataFrame =
    spark.range(0, 24 * 60)
      .withColumn("hour", (col("id") / 60).cast(IntegerType))
      .withColumn("minute", (col("id") % 60).cast(IntegerType))
      .select(
        col("id").as("time_id_pk"),
        fullTime(col("hour"), col("minute")).as("full_time"),
        col("hour"),
        timeOfDay(col("hour")).as("time_of_the_day"))

  /** DateDim (G2, ET:127-191): distinct flight dates -> components + flags +
    * surrogate key. `cap` mirrors the reference's `[:10]` dev-time truncation
    * (ET:184, documented bug #9); pass None for the intended "all dates".
    * Faithful quarter bug (ET:157) is exposed via `faithfulQuarter`. */
  def dates(src: DataFrame, dateCol: String,
            cap: Option[Int] = None,
            faithfulQuarter: Boolean = false): DataFrame = {
    val d = col("full_date")
    val distinctDates = src
      .select(to_date(col(dateCol)).as("full_date"))
      .where(d.isNotNull).distinct()
    val capped = cap.fold(distinctDates)(n =>
      distinctDates.orderBy(d).limit(n))
    val q = if (faithfulQuarter) quarterFaithful(d) else quarterIntended(d)
    withSurrogateKey(capped, "date_id_pk", d)
      .select(
        col("date_id_pk"),
        dateDay(d).as("day"),
        dateMonth(d).as("month"),
        dateYear(d).as("year"),
        isWorkDay(d).as("is_work_day"),
        // faithful naming: the reference calls the weekend flag "is_weekday"
        isWeekend(d).as("is_weekday"),
        q.as("quarter"),
        d)
  }

  /** CancellationDim (ET:256-266): distinct (CANCELLED, CANCELLATION_CODE)
    * pairs + surrogate key. */
  def cancellations(flightsRaw: DataFrame): DataFrame = {
    val pairs = flightsRaw
      .select(
        col("CANCELLED").as("is_canceled"),
        col("CANCELLATION_CODE").as("cancellation_code"))
      .dropDuplicates()
    withSurrogateKey(pairs, "cancelation_id_pk",
        col("is_canceled").asc_nulls_first, col("cancellation_code").asc_nulls_first)
      .select("cancelation_id_pk", "is_canceled", "cancellation_code")
  }

  /** Columns of the delay dimension's natural key (the 6 delay values). */
  val delayValueCols: Seq[String] = Seq(
    "carrier_delay", "weather_delay", "nas_delay",
    "security_delay", "late_aircraft_delay", "other_type_delay")

  /** DelayDim (ET:269-288): impute ACTUAL from CRS elapsed, zero-fill,
    * derive other_type_delay = ACTUAL - CRS, dedup the 6 delay values,
    * surrogate-key by value order (the reference's positional `df.index`
    * key dangles post-dedup — bug #10; value-ordering is the deterministic
    * distributed replacement, and FlightFact recovers the FK by value join). */
  def delays(flightsRaw: DataFrame): DataFrame = {
    val imputed = flightsRaw
      .select(
        col("CRS_ELAPSED_TIME").cast(DoubleType).as("crs"),
        col("ACTUAL_ELAPSED_TIME").cast(DoubleType).as("actual"),
        col("CARRIER_DELAY").cast(DoubleType).as("carrier_delay"),
        col("WEATHER_DELAY").cast(DoubleType).as("weather_delay"),
        col("NAS_DELAY").cast(DoubleType).as("nas_delay"),
        col("SECURITY_DELAY").cast(DoubleType).as("security_delay"),
        col("LATE_AIRCRAFT_DELAY").cast(DoubleType).as("late_aircraft_delay"))
      .withColumn("actual", coalesce(col("actual"), col("crs")))
      .na.fill(0.0)
      .withColumn("other_type_delay", col("actual") - col("crs"))
      .drop("crs", "actual")
      .dropDuplicates()
    withSurrogateKey(imputed, "delay_id_pk", delayValueCols.map(col): _*)
      .select(("delay_id_pk" +: delayValueCols).map(col): _*)
  }
}
