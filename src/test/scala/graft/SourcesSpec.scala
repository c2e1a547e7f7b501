package graft

import graft.sources.Sources
import graft.warehouse.Warehouse

/** Source/sink surface (S6/S7): JDBC writer builder and catalog metadata. */
class SourcesSpec extends SparkSpec {

  test("S6: jdbc writer builds with url/table/batch options (no driver offline)") {
    val df = Sources.table(spark, sf, "region")
    // building the writer must not touch the (absent) driver or network
    val w = Sources.jdbcWriter(df, "jdbc:sqlserver://example:1433;db=wh",
      "dbo.region", Map("user" -> "u"))
    assert(w != null)
  }

  test("S7: SHOW TABLES lists registered star-schema views") {
    Warehouse.registerTestdata(spark, sf)
    val names = Sources.listTables(spark)
      .select("tableName").collect().map(_.getString(0)).toSet
    assert(Set("lineitem", "orders", "events", "documents").subsetOf(names))
  }

  test("csv reader honors explicit schema and quoting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    import spark.implicits._
    val src = Seq((1L, "a,b \"quoted\""), (2L, "plain")).toDF("id", "s")
    Sources.writeCsv(src, dir + "/t")
    val back = Sources.csv(spark, dir + "/t", src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }
}
