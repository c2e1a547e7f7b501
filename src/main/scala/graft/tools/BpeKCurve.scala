package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Sources

/** Focused BPE-training k-curve measurement (r16): wall vs merge count
  * for [[graft.text.Bpe.learnMerges]]'s two execution paths, without
  * paying for the full [[ScaleRehearsal]]. The claim under test: the
  * post-groupBy histogram is vocab-bounded, so the DISTRIBUTED loop's
  * per-round cost is ~2 vocab-sized Spark jobs — driver-orchestration
  * overhead, flat in corpus size but linear in k — while the DRIVER
  * fast path pays ~vocab×avg_word_len per round in-process after one
  * collect. Both paths are bit-identical (BpeSpec); rows land in
  * SCALING.md's k-curve table.
  *
  * Usage: runMain graft.tools.BpeKCurve <sfDir> [cpus]
  */
object BpeKCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .appName("graft-bpe-kcurve").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[kcurve] $label wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val prepped = Sources.table(spark, sfDir, "documents").select(
      lower(substring(regexp_replace(col("text"), "[^A-Za-z ]", ""),
        1, 200)).as("bpe_text"))
      .persist()
    val nDocs = prepped.count()
    val nTypes = prepped
      .select(explode(expr(
        "regexp_extract_all(bpe_text, ' ?[a-z]+| +', 0)")).as("w"))
      .select("w").distinct().count()
    println(s"[kcurve] sfDir=$sfDir docs=$nDocs word_types=$nTypes")
    for (k <- Seq(6, 64, 256, 1024))
      timed(s"driver path k=$k") {
        val n = graft.text.Bpe.learnMerges(prepped, "bpe_text", k).count()
        println(s"[kcurve]   learned=$n")
      }
    for (k <- Seq(6, 64, 256))
      timed(s"distributed path k=$k") {
        val n = graft.text.Bpe.learnMerges(prepped, "bpe_text", k,
          maxDriverTypes = 0L).count()
        println(s"[kcurve]   learned=$n")
      }
    spark.stop()
  }
}
