package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.similarity.Similarity

/** A/B probe for the ANN-PQ composition queries (r19 optimization
  * round): the q163/q165/q171 final plans carry 30-70 joins and 16-36
  * re-derived scans because every shared frame (codebooks, codes,
  * candidate lists) is inlined per reference — is the wall planning/
  * re-derivation (fixed by truncating with eager localCheckpoints of
  * the small shared frames) or genuine execution? Not a graded surface.
  *
  * Usage: runMain graft.tools.PqProbe [sfDir] [repeats]
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    // Graft.configure: probes must run under the graded surface's exact
    // session config — notably the STATIC codegen-cache sizing, silently
    // ignored if set after getOrCreate (r20 advisor fix)
    val spark = graft.Graft.configure(SparkSession.builder()
      .appName("graft-pqprobe").master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pqprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    def e = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
    def q171(snap: DataFrame => DataFrame): DataFrame = {
      val cents = e.where(col("id") < 8).select(col("id").as("cid"), col("vec"))
      val res = Similarity.ivfResidualize(e, cents)
      val cb = snap(Similarity.pqCodebooks(
        res.where(col("id").between(10, 13)).select("id", "vec"), 4))
      val codes = snap(Similarity.pqEncode(res, cb, 4))
      val queries = e.where(col("id").between(100, 104))
      val adcTopC = snap(Similarity.pqAdcTopKResidual(
        queries, codes, cb, cents, 12, 4, nprobe = 2))
      Similarity.pqRefine(queries, e, adcTopC, 3).orderBy("query_id", "rank")
    }
    def q163(snap: DataFrame => DataFrame): DataFrame = {
      val cents = e.where(col("id") < 8).select(col("id").as("cid"), col("vec"))
      val cb = snap(Similarity.pqCodebooks(e.where(col("id") < 4), 4))
      val codes = snap(Similarity.pqEncode(e, cb, 4))
      val queries = e.where(col("id").between(100, 104))
      val cand = snap(Similarity.ivfAssignN(queries, cents, 2)
        .select(col("id").as("query_id"), col("cid"))
        .join(Similarity.ivfAssign(e, cents)
          .select(col("id").as("neighbor_id"), col("cid")), Seq("cid"))
        .select("query_id", "neighbor_id"))
      Similarity.pqAdcTopK(queries, codes, cb, 3, 4, Some(cand))
        .orderBy("query_id", "rank")
    }
    val plain: DataFrame => DataFrame = df => df
    val ckpt: DataFrame => DataFrame = df => df.localCheckpoint(true)
    for (rep <- 1 to repeats) {
      println(s"[pqprobe] --- repeat $rep ---")
      spark.catalog.clearCache()
      t("q163 plain") { q163(plain).collect() }
      t("q163 ckpt ") { q163(ckpt).collect() }
      t("q171 plain") { q171(plain).collect() }
      t("q171 ckpt ") { q171(ckpt).collect() }
    }
    spark.stop()
  }
}
