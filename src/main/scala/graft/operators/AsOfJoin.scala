package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the single most recent right row
  * with `right.ts <= left.ts` within equal keys (time-series point-in-time
  * lookup; DuckDB/kdb `ASOF JOIN`, pandas `merge_asof`).
  *
  * Spark has no native as-of operator. Preference order from the build
  * brief: (a) compose existing ops — which suffices here, so no custom
  * `SparkPlan` is warranted:
  *
  * The naive composition (theta-join on `r.ts <= l.ts` + keep max) is a
  * range join: it explodes to |matches| rows per left row before pruning —
  * quadratic per key, unusable at scale. Instead this implementation is
  * union + single sort + last-observation-carried-forward:
  *
  *   1. tag right rows 0 and left rows 1,
  *   2. union on (keys, ts, tag),
  *   3. one window over (keys ORDER BY ts, tag) propagating the last
  *      non-null right payload (`last(_, ignoreNulls=true)`),
  *   4. keep left rows.
  *
  * Cost at 100 TB: ONE shuffle on the key columns + a sort — same shape as
  * any keyed window; no row explosion, skew handled by AQE like any other
  * shuffle. Tag order (right=0 < left=1) makes an exactly-equal timestamp
  * visible to the left row, matching `ON l.ts >= r.ts` semantics.
  *
  * Right rows must be unique per (keys, ts) — pre-aggregate duplicates or
  * results are tie-ambiguous (same requirement DuckDB imposes for
  * deterministic ASOF output).
  */
object AsOfJoin {

  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               payload: Seq[String]): DataFrame = {
    require(payload.forall(p => !left.columns.contains(p)),
      s"payload columns ${payload.mkString(",")} must not collide with left columns")
    require(!(left.columns ++ right.columns).exists(Set("__ts", "__tag")),
      "__ts/__tag are reserved working-column names")
    val leftCols = left.columns
    // right side: keys + ts + payload, tagged 0
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("__ts")) ++ payload.map(col): _*)
      .withColumn("__tag", lit(0))
    // left side: all left columns + nulls for payload, tagged 1
    val l = payload.foldLeft(
      left.withColumn("__ts", col(leftTs)).withColumn("__tag", lit(1))) {
      (df, p) => df.withColumn(p, lit(null).cast(r.schema(p).dataType))
    }
    val unioned = l.select(
      (keys.map(col) :+ col("__ts") :+ col("__tag")) ++
        payload.map(col) ++ leftCols.filterNot(keys.contains).map(col): _*)
    val rPadded = leftCols.filterNot(keys.contains).foldLeft(r) {
      (df, c) => df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select(unioned.columns.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val locf = payload.foldLeft(unioned.unionByName(rPadded)) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    locf.where(col("__tag") === 1)
      .select(leftCols.toIndexedSeq.map(col) ++ payload.map(col): _*)
  }
}
