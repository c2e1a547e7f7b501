package graft

import org.apache.spark.sql.functions._

import graft.operators.Downsample
import graft.similarity.Similarity
import graft.text.TextOps

/** Corpus-curation operators: text normalization (stopword removal +
  * adjacent-duplicate collapse), deterministic per-domain cap, and uniform
  * scalar quantization of embeddings. */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("collapseAdjacent keeps first of each run, preserves non-adjacent dups") {
    val got = Seq("a a b b b a c").toDF("text")
      .select(TextOps.collapseAdjacent(TextOps.tokens(col("text"))))
      .as[Seq[String]].head()
    assert(got === Seq("a", "b", "a", "c"))
  }

  test("removeStopwords drops all occurrences, keeps order and duplicates") {
    val got = Seq("the big big cat in the hat").toDF("text")
      .select(TextOps.removeStopwords(TextOps.tokens(col("text")), Seq("the", "in")))
      .as[Seq[String]].head()
    assert(got === Seq("big", "big", "cat", "hat"))
  }

  test("quantizeUniform maps [min,max] onto [0,255] codes, exact at ends") {
    val got = Seq(Tuple1(Array(0f, 0.5f, 1f)), Tuple1(Array(3f, 3f, 3f)))
      .toDF("embedding")
      .select(Similarity.quantizeUniform(col("embedding")))
      .as[Seq[Long]].collect()
    assert(got(0) === Seq(0L, 127L, 255L)) // 0.5 -> floor(127.5)
    assert(got(1) === Seq(0L, 0L, 0L))     // constant vector guard
  }

  test("quantizeUniform reconstruction error is bounded by one step") {
    val e = graft.sources.Sources.table(spark, sf, "embeddings")
      .select(col("embedding"),
        array_min(col("embedding")).cast("double").as("lo"),
        array_max(col("embedding")).cast("double").as("hi"),
        Similarity.quantizeUniform(col("embedding")).as("codes"))
    val maxErr = e.select(max(aggregate(
      zip_with(col("embedding"), col("codes"), (x, q) =>
        abs(x.cast("double") - (col("lo") + q * (col("hi") - col("lo")) / 255.0))),
      lit(0.0), (acc, d) => greatest(acc, d)))).as[Double].head()
    val maxStep = e.select(max((col("hi") - col("lo")) / 255.0)).as[Double].head()
    assert(maxErr <= maxStep + 1e-12) // floor quantization: error < one step
  }

  test("capPerKey keeps at most k rows per key, deterministically") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select("doc_id", "source")
    val capped = Downsample.capPerKey(docs, "source", "doc_id", 5)
    val perKey = capped.groupBy("source").count().as[(String, Long)].collect()
    assert(perKey.forall(_._2 <= 5))
    // reproducible: a differently-partitioned input selects the same rows
    val again = Downsample.capPerKey(docs.repartition(7), "source", "doc_id", 5)
    assert(capped.orderBy("source", "sample_rank").collect()
      === again.orderBy("source", "sample_rank").collect())
  }
}
