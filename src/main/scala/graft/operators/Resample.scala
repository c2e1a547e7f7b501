package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series resampling with linear interpolation: project an irregular
  * (key, ts, value) series onto a fixed-interval grid, interpolating each
  * grid point between its nearest observations (LOCF backward + NOCB
  * forward), exact at observation-aligned points.
  *
  * Composition (no range join, no explosion): grid rows union with
  * observations, ONE keyed sort, two windows (`last(..., ignoreNulls)`
  * backward for the previous observation, `first(..., ignoreNulls)` over
  * the following frame for the next), then the interpolation formula on
  * grid rows only. Cost at scale: one shuffle on the key + a sort — the
  * same shape as the as-of join (this IS an as-of join in both directions
  * plus arithmetic).
  */
object Resample {

  /** Hourly linear interpolation of `valueCol` per `keyCol`. Output:
    * (key, grid_ts, value_interp) for every full hour spanned by the key's
    * own observations. Assumes ts has microsecond precision. */
  def hourlyLinear(events: DataFrame, keyCol: String, tsCol: String,
                   valueCol: String): DataFrame = {
    val k = col(keyCol)
    // per-key hourly grid
    val grid = events.groupBy(k)
      .agg(date_trunc("hour", min(col(tsCol))).as("lo"),
        date_trunc("hour", max(col(tsCol))).as("hi"))
      .select(k, explode(sequence(col("lo"), col("hi"),
        expr("INTERVAL 1 HOUR"))).as("ts"))
      .withColumn("is_grid", lit(1))
      .withColumn("v", lit(null).cast(DoubleType))
    val obs = events.select(k, col(tsCol).as("ts"),
      lit(0).as("is_grid"), col(valueCol).cast(DoubleType).as("v"))

    // observations sort BEFORE grid points at equal ts, so an exactly
    // aligned observation is its grid point's "previous" neighbor (us == pt
    // zeroes the linear term, so the grid point reproduces the observed
    // value exactly). `v` as the final key breaks ties between same-ts
    // observations deterministically — without it, last()/first() over the
    // tied rows would be partition-order dependent. (Null-v rows sort
    // differently across engines but are invisible to every ignoreNulls
    // window below.)
    val w = Window.partitionBy(k).orderBy(col("ts"), col("is_grid"), col("v"))
    val back = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)

    val us = unix_micros(col("ts"))
    // neighbor timestamps must track the same rows as the ignoreNulls value
    // windows: an observation with a null value contributes neither its
    // value nor its timestamp (else pv/pt could come from different rows)
    val obsUs = when(col("is_grid") === 0 && col("v").isNotNull, us)
    val withNeighbors = grid.unionByName(obs)
      .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
      .withColumn("pt", last(obsUs, ignoreNulls = true).over(back))
      .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("nt", first(obsUs, ignoreNulls = true).over(fwd))

    withNeighbors
      .where(col("is_grid") === 1)
      .withColumn("value_interp",
        when(col("pt").isNull, col("nv"))
          .when(col("nt").isNull, col("pv"))
          // for surviving grid rows nt > pt always (an aligned observation
          // sorts before its grid point, so the forward frame only sees
          // strictly-later observations) — no nt == pt guard needed
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            (us - col("pt")) / (col("nt") - col("pt"))))
      .select(k, col("ts").as("grid_ts"), col("value_interp"))
  }
}
