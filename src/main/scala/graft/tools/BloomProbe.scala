package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Phase attribution for q180 (r19 optimization round): how much of the
  * screened decontamination wall is the bitmap build (eval shingle
  * count + word-table collect, two driver actions) vs the probe scan vs
  * the exact sliver pass + anti join. Not a graded surface.
  *
  * Usage: runMain graft.tools.BloomProbe [sfDir] [repeats]
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    val spark = graft.Graft.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[bloomprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (rep <- 1 to repeats) {
      println(s"[bloomprobe] --- repeat $rep ---")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val train = docs.where(col("doc_id") % 10 =!= 0)
      val evalDocs = docs.where(col("doc_id") % 10 === 0)
      t("eval shingle count (bitmap sizing)") {
        Dedup.shingles(evalDocs, "doc_id", "text", 3)
          .select(col("shingle")).distinct().count()
      }
      val flagged = t("bloom build + flagged plan (driver actions)") {
        Dedup.contaminationBloom(train, evalDocs, "doc_id", "text", 3)
          .where(col("bloom_contaminated")).select(col("doc_id"))
      }
      t("flagged count (probe scan)") { flagged.count() }
      t("full q180 shape (count)") {
        Dedup.decontaminateBloom(train, evalDocs, "doc_id", "text", 3, 5)
          .select("doc_id", "source").orderBy("doc_id").count()
      }
      t("exact q124 shape (count)") {
        Dedup.decontaminate(train, evalDocs, "doc_id", "text", 3, 5)
          .select("doc_id", "source").orderBy("doc_id").count()
      }
    }
    spark.stop()
  }
}
