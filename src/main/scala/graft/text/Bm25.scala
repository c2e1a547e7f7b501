package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Okapi BM25 relevance ranking of documents against a fixed query-term
  * set — the retrieval-grade cousin of [[TfIdf]]: where TF-IDF scores a
  * term's importance WITHIN a document, BM25 ranks documents against a
  * query with tf saturation (k1) and document-length normalization (b),
  * the signal a curation pipeline uses to pull domain-relevant documents
  * out of a web-scale corpus (query = a handful of domain anchor terms).
  * Reference analogue: none — beyond-reference operator; the reference
  * has no cross-document text statistics at all.
  *
  * SCALE DESIGN. The query-term filter lands BEFORE the first exchange,
  * so every shuffle is bounded by |docs| x |queryTerms| rows of
  * (id, term, counts) — the raw text never leaves the scan stage:
  *   1. doc_len is `size(tokens)` — computed in the scan projection,
  *      no shuffle at all (unlike a groupBy-over-exploded-tokens);
  *   2. groupBy(doc, term) over the FILTERED explode — map-side partial
  *      aggregation collapses repeats before the exchange;
  *   3. df and the corpus stats (N, total length) are query-term-sized /
  *      single-row aggregates, broadcast back in — no re-exchange of the
  *      per-doc side.
  *
  * EXACTNESS AT THE ORACLE BOUNDARY. ln() is not bit-reproducible across
  * engines, so each (doc, term) contribution is rounded to integer
  * MICRO-UNITS (x 1e6, BIGINT) and per-doc totals are INTEGER sums —
  * exact and order-independent, immune to the FP-addition-order
  * divergence a double sum would reintroduce (the same reasoning as
  * q105's 6-decimal gate, pushed one step further because BM25 SUMS the
  * rounded values). All double literals (k1=1.2, b=0.75) appear as the
  * SAME decimal literals in the DuckDB oracle: both engines parse them
  * to the identical nearest double, and +,-,*,/ are correctly rounded,
  * so the pre-round arithmetic agrees to the last ulp except for ln's.
  */
object Bm25 {

  /** Per-(doc, query-term) BM25 contribution in micro-units:
    * (doc_id, term, tf, df, doc_len, n_docs, score_micro) with
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5))         (Lucene form)
    * tfn = (tf * (k1+1)) / (tf + k1 * (1 - b + (b * doc_len) / avgdl))
    * score_micro = round(idf * tfn * 1e6) as BIGINT. */
  def termScores(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String]): DataFrame = {
    require(queryTerms.nonEmpty, "BM25 needs at least one query term")
    val base = docs.select(col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("toks"))
      .withColumn("doc_len", size(col("toks")).cast(LongType))
    val stats = base.agg(sum(col("doc_len")).as("len_sum"),
      count(lit(1)).as("n_docs"))
    val tf = base
      .select(col("doc_id"), col("doc_len"), explode(col("toks")).as("term"))
      .where(col("term").isin(queryTerms: _*))
      .groupBy("doc_id", "doc_len", "term").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // avgdl via len_sum/n_docs (NOT avg(): engines disagree on avg()'s
    // internal accumulation; an explicit exact-integer-sum-then-divide
    // is one correctly-rounded division on both sides)
    val avgdl = col("len_sum").cast("double") / col("n_docs")
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val tfn = (col("tf") * lit(2.2)) /
      (col("tf") + lit(1.2) * (lit(0.25) + (lit(0.75) * col("doc_len")) / avgdl))
    tf.join(broadcast(df_), "term")
      .crossJoin(broadcast(stats))
      .withColumn("score_micro",
        round(idf * tfn * lit(1000000.0), 0).cast(LongType))
      .select("doc_id", "term", "tf", "df", "doc_len", "n_docs",
        "score_micro")
  }

  /** Top-k documents by total BM25 score against `queryTerms`, ties
    * broken by doc_id: (doc_id, doc_len, n_hit_terms, score_micro,
    * score). Documents matching no query term never reach the shuffle
    * (they score 0 and are out of ranking scope by construction). */
  def rank(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k: Int): DataFrame =
    termScores(docs, idCol, textCol, queryTerms)
      .groupBy("doc_id", "doc_len")
      .agg(count(lit(1)).as("n_hit_terms"),
        sum(col("score_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
      .withColumn("score", col("score_micro").cast("double") / lit(1000000.0))
      .select("doc_id", "doc_len", "n_hit_terms", "score_micro", "score")
}
