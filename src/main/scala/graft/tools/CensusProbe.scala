package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal

/** Attribution probe for q133 (r19 optimization round): which parser
  * family (image header reads vs A/V chunk-walk folds) carries the
  * census wall, and how much is synth vs parse. Not a graded surface.
  *
  * Usage: runMain graft.tools.CensusProbe [sfDir] [repeats]
  */
object CensusProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    // Graft.configure: probes must run under the graded surface's exact
    // session config — notably the STATIC codegen-cache sizing, silently
    // ignored if set after getOrCreate (r20 advisor fix)
    val spark = graft.Graft.configure(SparkSession.builder()
      .appName("graft-censusprobe").master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[census] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    for (rep <- 1 to repeats) {
      println(s"[census] --- repeat $rep ---")
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      t("img synth only") { noop(Seq(
        Multimodal.synthImageBytes(d, "doc_id"),
        Multimodal.synthWebImageBytes(d, "doc_id"),
        Multimodal.synthBmpIcoBytes(d, "doc_id"),
        Multimodal.synthTiffBytes(d, "doc_id"),
        Multimodal.synthIsobmffBytes(d, "doc_id")).reduce(_ unionByName _)) }
      t("img synth+dims") { noop(Multimodal.imageDims(Seq(
        Multimodal.synthImageBytes(d, "doc_id"),
        Multimodal.synthWebImageBytes(d, "doc_id"),
        Multimodal.synthBmpIcoBytes(d, "doc_id"),
        Multimodal.synthTiffBytes(d, "doc_id"),
        Multimodal.synthIsobmffBytes(d, "doc_id")).reduce(_ unionByName _))
        .select("format", "width")) }
      t("img synth+dims (JVM rung)") { noop(Multimodal.imageDimsFast(Seq(
        Multimodal.synthImageBytes(d, "doc_id"),
        Multimodal.synthWebImageBytes(d, "doc_id"),
        Multimodal.synthBmpIcoBytes(d, "doc_id"),
        Multimodal.synthTiffBytes(d, "doc_id"),
        Multimodal.synthIsobmffBytes(d, "doc_id")).reduce(_ unionByName _))
        .select("format", "width")) }
      t("av synth only") { noop(Seq(
        Multimodal.synthAvBytes(d, "doc_id"),
        Multimodal.synthAudioBytes(d, "doc_id"),
        Multimodal.synthOggBytes(d, "doc_id"),
        Multimodal.synthWebmBytes(d, "doc_id")).reduce(_ unionByName _)) }
      t("av synth+meta") { noop(Multimodal.avMetadata(Seq(
        Multimodal.synthAvBytes(d, "doc_id"),
        Multimodal.synthAudioBytes(d, "doc_id"),
        Multimodal.synthOggBytes(d, "doc_id"),
        Multimodal.synthWebmBytes(d, "doc_id")).reduce(_ unionByName _))
        .select("av_format", "width", "duration_ms")) }
      t("av synth+meta (JVM rung)") { noop(
        graft.multimodal.AvFast.avMetadataFast(Seq(
          Multimodal.synthAvBytes(d, "doc_id"),
          Multimodal.synthAudioBytes(d, "doc_id"),
          Multimodal.synthOggBytes(d, "doc_id"),
          Multimodal.synthWebmBytes(d, "doc_id")).reduce(_ unionByName _))
        .select("av_format", "width", "duration_ms")) }
    }
    spark.stop()
  }
}
