package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: times the optimizer/codegen cost of filtering on
  * parsed-metadata columns (the plan-size pathology being chased). */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Graft.configure(
      SparkSession.builder().master("local[8]"), 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("nocp"))
      spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    import spark.implicits._
    val neg = spark.range(-64, 0).toDF("doc_id")
    def timed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val parsed = graft.multimodal.Multimodal.imageDims(
      graft.multimodal.Multimodal.synthBmpIcoBytes(neg, "doc_id"))
    timed("count only") { parsed.count() }
    val filtered = parsed.where(!($"format".isin("bmp", "ico") &&
      $"width".isNotNull && $"height".isNotNull))
    timed("where: analyze") { filtered.queryExecution.analyzed }
    timed("where: optimize") { filtered.queryExecution.optimizedPlan }
    timed("where: physical") { filtered.queryExecution.executedPlan }
    timed("where: execute") { filtered.count() }
    val parsed2 = graft.multimodal.Multimodal.imageDims(
      graft.multimodal.Multimodal.synthExifJpegBytes(neg, "doc_id"))
    timed("exif where") {
      parsed2.where(!($"format" === "jpeg" && $"orientation".isNotNull))
        .count()
    }
    // q137 end-to-end at a given sf dir (the zoff let-binding check)
    args.find(_.startsWith("/")).foreach { dir =>
      val q = graft.SparkEntry.queries("q137_archive_metadata")
      timed("q137 warm-up") { q(spark, dir).count() }
      timed("q137 steady") { q(spark, dir).count() }
    }
    spark.stop()
  }
}
