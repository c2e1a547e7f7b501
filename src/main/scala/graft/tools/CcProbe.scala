package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Phase/round timing probe for the connectedComponents loop — the r19
  * optimization round's attribution tool: where does a CC-family query's
  * wall-clock actually go (candidate-pair materialization vs per-round
  * join+checkpoint cost vs round count)? Prints per-phase seconds and
  * per-round (round, changed, sec) lines. Not part of any graded
  * surface.
  *
  * Usage: runMain graft.tools.CcProbe [sfDir] [repeats]
  */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 2
    // Graft.configure: probes must run under the graded surface's exact
    // session config — notably the STATIC codegen-cache sizing, silently
    // ignored if set after getOrCreate (r20 advisor fix)
    val spark = graft.Graft.configure(SparkSession.builder()
      .appName("graft-ccprobe").master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (rep <- 1 to repeats) {
      println(s"[ccprobe] --- repeat $rep ---")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .where(col("doc_id") < 256)
      val pairs = t("simhash+banding (count)") {
        val p = Dedup.simhashBandedDups(
          Dedup.simhash(docs, "doc_id", "text", 16),
          "doc_id", 16, 3, probeParts = 0)
        p.count(); p
      }
      var last = System.nanoTime()
      val labels = t("connectedComponents total") {
        Dedup.connectedComponents(pairs, onRound = Some { (r, changed) =>
          val now = System.nanoTime()
          println(f"[ccprobe]   round $r changed=$changed ${(now - last) / 1e9}%.3fs")
          last = now
        })
      }
      t("labels count") { labels.count() }
    }
    spark.stop()
  }
}
