package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.multimodal.Audio

/** Phase attribution for q175/q176 (r19 optimization round): how much
  * of the audio near-dup wall is synth+fingerprint evaluation vs the
  * banding join, and does AQE stage reuse deduplicate the fingerprint
  * subtree across the two join sides? Not part of any graded surface.
  *
  * Usage: runMain graft.tools.AudioProbe [sfDir] [repeats]
  */
object AudioProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    // Graft.configure: probes must run under the graded surface's exact
    // session config — notably the STATIC codegen-cache sizing, silently
    // ignored if set after getOrCreate (r20 advisor fix)
    val spark = graft.Graft.configure(SparkSession.builder()
      .appName("graft-audioprobe").master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[audioprobe] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    for (rep <- 1 to repeats) {
      println(s"[audioprobe] --- repeat $rep ---")
      spark.catalog.clearCache()
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id").where(col("doc_id") < 2000)
      def sigs = Audio.audioEnergyFingerprint(Audio.synthWavPcmBytes(docs, "doc_id"))
        .where(col("afp").isNotNull)
        .select(col("media_id").as("id"), col("afp").as("simhash"))
      t("synth bytes only (count)") {
        Audio.synthWavPcmBytes(docs, "doc_id")
          .write.format("noop").mode("overwrite").save()
      }
      t("fingerprint (noop)") {
        sigs.write.format("noop").mode("overwrite").save()
      }
      t("banding on checkpointed sigs (count)") {
        Dedup.simhashBandedDups(sigs.localCheckpoint(true), "id", 64, 2).count()
      }
      t("full q176 shape (count)") {
        Dedup.simhashBandedDups(sigs, "id", 64, 2).orderBy("id_a", "id_b").count()
      }
    }
    spark.stop()
  }
}
