package graft

import java.sql.Timestamp

import graft.operators.AsOfJoin

/** As-of join semantics on a hand-built example (backward, equal-ts
  * visible, null before first right row, key isolation). */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of picks latest right row at-or-before each left ts") {
    val left = Seq(
      (1L, 100L, ts("2024-01-01 09:00:00")), // before any right -> null
      (2L, 100L, ts("2024-01-01 10:00:00")), // == r1 ts -> r1 (equal visible)
      (3L, 100L, ts("2024-01-01 11:30:00")), // between r1, r2 -> r1
      (4L, 100L, ts("2024-01-01 12:00:01")), // after r2 -> r2
      (5L, 200L, ts("2024-01-01 23:00:00"))  // other key, no rights -> null
    ).toDF("id", "k", "ts")
    val right = Seq(
      (100L, ts("2024-01-01 10:00:00"), "r1"),
      (100L, ts("2024-01-01 12:00:00"), "r2"),
      (300L, ts("2024-01-01 00:00:00"), "other-key")
    ).toDF("k", "rts", "tag")

    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts", Seq("tag"))
      .select("id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got === Map(
      1L -> None, 2L -> Some("r1"), 3L -> Some("r1"),
      4L -> Some("r2"), 5L -> None))
  }

  test("as-of result keeps exactly the left row count") {
    val events = graft.sources.Sources.events(spark, sf)
    val signups = events.where($"event_type" === "signup")
      .groupBy("user_id", "ts")
      .agg(org.apache.spark.sql.functions.max($"event_id").as("signup_event"))
    val out = AsOfJoin.backward(events, signups,
      Seq("user_id"), "ts", "ts", Seq("signup_event"))
    assert(out.count() === events.count())
  }
}
