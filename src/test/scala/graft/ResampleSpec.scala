package graft

import java.sql.Timestamp

import graft.operators.Resample

/** Linear-interpolation resample semantics on a hand-built series:
  * interpolated interior points, LOCF/NOCB at the edges, exactness at
  * observation-aligned grid points, and per-key grid isolation. */
class ResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("hourly grid interpolates linearly between neighboring observations") {
    // key 1: obs at 10:00 (v=10) and 12:00 (v=30); grid 10,11,12.
    // key 2: obs at 09:30 (v=5) and 10:30 (v=7); grid 09:00, 10:00.
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 10.0),
      (1L, ts("2024-01-01 12:00:00"), 30.0),
      (2L, ts("2024-01-01 09:30:00"), 5.0),
      (2L, ts("2024-01-01 10:30:00"), 7.0)
    ).toDF("user_id", "ts", "value")

    val got = Resample.hourlyLinear(events, "user_id", "ts", "value")
      .as[(Long, Timestamp, Double)].collect()
      .map { case (k, t, v) => (k, t.toString) -> v }.toMap

    assert(got.size === 5)
    // aligned observations are exact
    assert(got((1L, "2024-01-01 10:00:00.0")) === 10.0)
    assert(got((1L, "2024-01-01 12:00:00.0")) === 30.0)
    // midpoint of 10->30 over two hours
    assert(got((1L, "2024-01-01 11:00:00.0")) === 20.0)
    // 09:00 precedes key 2's first obs -> NOCB to 5.0
    assert(got((2L, "2024-01-01 09:00:00.0")) === 5.0)
    // 10:00 is the midpoint of 09:30(5) -> 10:30(7)
    assert(got((2L, "2024-01-01 10:00:00.0")) === 6.0)
  }

  test("null-valued observations are transparent to interpolation") {
    // the null obs at 11:00 must NOT become a neighbor timestamp: 11:00 and
    // 12:00 still interpolate 10:00(10) -> 13:00(40) linearly
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), Some(10.0)),
      (1L, ts("2024-01-01 11:00:00"), None),
      (1L, ts("2024-01-01 13:00:00"), Some(40.0))
    ).toDF("user_id", "ts", "value")
    val got = Resample.hourlyLinear(events, "user_id", "ts", "value")
      .as[(Long, Timestamp, Double)].collect()
      .map { case (_, t, v) => t.toString -> v }.toMap
    assert(got === Map(
      "2024-01-01 10:00:00.0" -> 10.0,
      "2024-01-01 11:00:00.0" -> 20.0,
      "2024-01-01 12:00:00.0" -> 30.0,
      "2024-01-01 13:00:00.0" -> 40.0))
  }

  test("single-observation key yields one constant grid point") {
    val events = Seq((9L, ts("2024-01-01 03:15:00"), 42.0))
      .toDF("user_id", "ts", "value")
    val got = Resample.hourlyLinear(events, "user_id", "ts", "value")
      .as[(Long, Timestamp, Double)].collect().toSeq
    assert(got === Seq((9L, ts("2024-01-01 03:00:00"), 42.0)))
  }
}
