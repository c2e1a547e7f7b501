package graft

import org.apache.spark.sql.functions._

import graft.text.HashClassifier

class HashClassifierSpec extends SparkSpec {
  import spark.implicits._

  test("scoreText: vocab hits, OOV hash buckets, exact integer sums, " +
      "empty/NULL text, plan exchange-free") {
    val df = Seq(
      (1L, "fast fast slow"),             // 800+800-800 = 800, n=3
      (2L, "  Fast\tSLOW "),              // case/whitespace: 800-800=0
      (3L, "zzzunknownzzz"),              // pure OOV: hash bucket
      (4L, ""),                           // empty -> NULLs
      (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = HashClassifier.scoreText(df, "text",
      HashClassifier.demoVocab)
    val got = out.select($"doc_id", $"n_tokens", $"milli_sum",
      $"cls_score", $"cls_label")
      .as[(Long, Long, Option[Long], Option[Double], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    assert(got(0) === ((1L, 3L, Some(800L), Some(800.0 / 3000.0),
      Some(true))))
    assert(got(1) === ((2L, 2L, Some(0L), Some(0.0), Some(false))))
    // OOV weight is the documented md5 arithmetic, in [-100, 100]
    val oov = got(2)._3.get
    assert(oov === HashClassifier.oovMilli("zzzunknownzzz") && oov.abs <= 100)
    assert(got(3) === ((4L, 0L, None, None, None)))
    assert(got(4) === ((5L, 0L, None, None, None)))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    // threshold shifts the label, not the score
    val strict = HashClassifier.scoreText(df, "text",
      HashClassifier.demoVocab, threshold = 0.5)
      .where($"doc_id" === 1L).select($"cls_label").as[Boolean].head()
    assert(!strict) // 0.267 < 0.5
    intercept[IllegalArgumentException] {
      HashClassifier.scoreText(df.withColumnRenamed("text", "cls_score")
        .withColumnRenamed("doc_id", "text"), "text", Map("a" -> 1))
    }
  }

  test("milli_sum is order-free and exactly reproducible across " +
      "repartitionings") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select("doc_id", "text").where($"doc_id" < 200)
    def run(df: org.apache.spark.sql.DataFrame) =
      HashClassifier.scoreText(df, "text", HashClassifier.demoVocab)
        .select($"doc_id", $"milli_sum", $"cls_score")
        .as[(Long, Option[Long], Option[Double])].collect().toSet
    assert(run(docs) === run(docs.repartition(13)))
  }
}
