package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

import graft.text.TextOps

/** Deterministic per-key downsampling: keep at most k rows per key, chosen
  * by a stable 60-bit content-hash order — "cap documents per domain", the
  * standard anti-head-domination step in web-scale training corpora.
  *
  * Unlike `TABLESAMPLE`/`rand()` sampling this is reproducible across runs,
  * engines, and partitionings (the hash is a pure function of the row id),
  * so a re-run of the pipeline selects the same sample. Cost: one shuffle
  * on the key + per-partition sort, the same shape as any groupwise top-k;
  * rank never exceeds k per key, so AQE handles moderate key skew, and a
  * pathological head key can reuse the salted-agg pattern.
  */
object Downsample {

  /** Deterministic train/val/test assignment (80/10/10) from a stable hash
    * of the row id — the ONE definition both q68 (split accounting) and
    * q85 (curation funnel) use, so the two can never silently diverge. */
  def splitLabel(id: Column): Column = {
    val bucket = pmod(
      TextOps.hash64(concat(lit("split#"), id.cast(StringType))), lit(100))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  /** Cap rows per `keyCol` at k, ordered by hash of `idCol` (id as the
    * final tiebreak makes the selection total and deterministic). Output
    * keeps all input columns plus `sample_rank` in [1, k]. */
  def capPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val h = TextOps.hash64(concat(lit("cap#"), col(idCol).cast(StringType)))
    val w = Window.partitionBy(col(keyCol)).orderBy(h.asc, col(idCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .where(col("sample_rank") <= k)
  }
}
