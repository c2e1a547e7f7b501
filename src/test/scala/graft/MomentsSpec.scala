package graft

import org.apache.spark.sql.functions._

/** Exact-moments derivation: stddev and corr computed from q89's DECIMAL
  * sufficient statistics agree with Spark's float aggregates — proving the
  * order-independent statistics carry the same information. */
class MomentsSpec extends SparkSpec {

  test("stddev/corr derived from exact moments match the built-ins") {
    val li = graft.sources.Sources.table(spark, sf, "lineitem")
    val m = li.agg(
      count(lit(1)).as("n"),
      sum(col("l_quantity").cast("decimal(38,4)")).as("sq"),
      sum((col("l_quantity") * col("l_quantity")).cast("decimal(38,4)")).as("sq2"),
      sum(col("l_extendedprice").cast("decimal(38,4)")).as("sp"),
      sum((col("l_extendedprice") * col("l_extendedprice")).cast("decimal(38,4)")).as("sp2"),
      sum((col("l_extendedprice") * col("l_quantity")).cast("decimal(38,4)")).as("spq"))
      .head()
    val n = m.getLong(0).toDouble
    val (sq, sq2) = (m.getDecimal(1).doubleValue(), m.getDecimal(2).doubleValue())
    val (sp, sp2) = (m.getDecimal(3).doubleValue(), m.getDecimal(4).doubleValue())
    val spq = m.getDecimal(5).doubleValue()

    val derivedStd = math.sqrt((sq2 - sq * sq / n) / (n - 1))
    val derivedCorr = (spq - sq * sp / n) /
      math.sqrt((sq2 - sq * sq / n) * (sp2 - sp * sp / n))

    val b = li.agg(stddev_samp(col("l_quantity")),
      corr(col("l_quantity"), col("l_extendedprice"))).head()
    assert(math.abs(derivedStd - b.getDouble(0)) / b.getDouble(0) < 1e-9)
    assert(math.abs(derivedCorr - b.getDouble(1)) < 1e-9)
  }
}
