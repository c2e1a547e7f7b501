package graft

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.pipeline.Pipeline
import graft.schemas.Schemas
import graft.sources.Sources

/** End-to-end warehouse run: reference rawdata dims + synthetic BTS-shaped
  * fact through build -> quality gate -> incremental publish -> SQL. */
class PipelineSpec extends SparkSpec {

  private lazy val flightsRaw = {
    val rows = (0 until 300).map { i =>
      val date = f"2018-08-${(i % 28) + 1}%02d"
      Row(date, 19000L + (i % 5), s"N$i", 100L + i,
        1L, 1L, 1L, Seq("JFK", "LAX", "ORD")(i % 3),
        2L, 2L, 2L, Seq("LAX", "ORD", "JFK")(i % 3),
        900L + (i % 60), 905L + (i % 60), 5.0, 5.0,
        1130L, (i % 90) - 30.0, 0.0, 0.0, null,
        150.0, 155.0, 3.0, 0.0, 1.0, 0.0, 2.0, null)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), Schemas.flightsRaw)
  }

  test("full pipeline publishes all 7 curated tables and answers SQL") {
    val out = Files.createTempDirectory("graft_wh").toString
    val airportsRaw =
      Sources.csv(spark, "/root/reference/rawdata/Airports", Schemas.airportsRaw)
    val carriersRaw =
      Sources.csv(spark, "/root/reference/rawdata/Air Carriers", Schemas.carriersRaw)

    val counts = Pipeline.run(spark, flightsRaw, airportsRaw, carriersRaw, out)
    assert(counts("flights") === 300)
    assert(counts("airports") === 6510)
    assert(counts("air_carriers") === 1656)
    assert(counts("time") === 1440)
    assert(counts("date") === 28)

    // the star schema answers SQL: flights per arrival airport name
    val top = spark.sql(
      """SELECT a.name, count(*) AS n
        |FROM flights f JOIN airports a ON f.arrival_airport_id_fk = a.airport_id_pk
        |GROUP BY a.name ORDER BY n DESC, a.name LIMIT 3""".stripMargin).collect()
    assert(top.map(_.getLong(1)).sum === 300)

    // re-run over the same input: incremental delta appends NOTHING
    val counts2 = Pipeline.run(spark, flightsRaw, airportsRaw, carriersRaw, out)
    assert(counts2.values.sum === 0, s"re-run appended rows: $counts2")
  }
}
