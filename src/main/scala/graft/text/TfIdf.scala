package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level TF-IDF term scoring — the relevance/importance signal a
  * training-data pipeline uses for quality filtering, domain-relevance
  * ranking, and DSIR-style importance weighting (select documents whose
  * high-TFIDF terms match a target domain), complementing the pure
  * per-document signals in [[TextOps]] (which need no cross-document
  * state). Reference analogue: none — beyond-reference operator; the
  * reference's text handling is single-table pandas column derivation
  * (dags/extract_and_tranform.py:84-120).
  *
  * SCALE DESIGN. Three shuffles, every one bounded by the distinct
  * (doc, term) table — the raw text never leaves the scan stage:
  *   1. groupBy(doc, term) for term frequencies — map-side partial
  *      aggregation collapses repeated terms before the exchange;
  *   2. a window over doc for document length — hash(doc) exchange of
  *      (doc, term, tf) triples only;
  *   3. a window over term for document frequency — hash(term) exchange
  *      of the same triples. A skewed term ("the") concentrates its
  *      rows on one partition, but the per-term row count is bounded by
  *      |docs| (post-aggregation, one row per (doc,term)), the same
  *      bound every term-partitioned stage in this module lives with.
  * The corpus size joins in as a broadcast single-row aggregate, so the
  * whole computation is ONE lazy DAG — no driver-side count action, and
  * Catalyst sees through it for pushdown.
  *
  * tf is length-normalized (tf_count / doc_len); idf is the smoothed
  * log form ln((N+1)/(df+1)) + 1 (sklearn's smooth_idf), strictly
  * positive so rare-term scores stay ordered above stopword scores.
  * Scores are raw doubles: ln() is not bit-reproducible across engines
  * (unlike +,-,*,/ and sqrt, which are correctly rounded by IEEE 754),
  * so oracle-gated exhibits must round — see q105's 6-decimal gate.
  */
object TfIdf {

  /** One row per (document, distinct term) with tf/df/score components:
    * (doc_id, term, tf_count, doc_len, df, n_docs, tfidf). Tokenization
    * is [[TextOps.tokens]] (lowercase, whitespace split) for parity with
    * every other text operator and its DuckDB oracle twin. */
  def scores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextOps.tokens(col(textCol))).as("term"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf_count"))
      .withColumn("doc_len",
        sum(col("tf_count")).over(Window.partitionBy("doc_id")))
      .withColumn("df", count(lit(1)).over(Window.partitionBy("term")))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        (col("tf_count") / col("doc_len")) *
          (log((col("n_docs") + lit(1)) / (col("df") + lit(1))) + lit(1)))
      .select("doc_id", "term", "tf_count", "doc_len", "df", "n_docs", "tfidf")
  }

  /** Top-k characteristic terms per document by TF-IDF, rank 1 = most
    * characteristic. Ranking uses the 6-decimal-rounded score with the
    * term string as tie-break, so the ranking is deterministic AND
    * engine-portable (raw ln() ulp differences cannot reorder it);
    * Spark plans the per-doc limit as WindowGroupLimit, keeping the
    * top-k selection map-side before the rank exchange. */
  def topTerms(docs: DataFrame, idCol: String, textCol: String,
               k: Int): DataFrame =
    scores(docs, idCol, textCol)
      .withColumn("tfidf_r6", round(col("tfidf"), 6))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("tfidf_r6").desc, col("term"))))
      .where(col("rank") <= k)
      .select("doc_id", "rank", "term", "tf_count", "doc_len", "df",
        "tfidf_r6")
}
