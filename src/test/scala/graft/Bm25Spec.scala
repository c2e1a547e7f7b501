package graft

/** BM25 ranking (graft.text.Bm25): hand-computed fixture + ranking
  * properties. Expected micro-scores replicate the operator's exact
  * double-op order in plain Scala — same JVM, same IEEE ops, same
  * Math.log — so equality is exact, not approximate. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // N=3, len_sum=10, avgdl=10/3; df(spark)=1, df(join)=2
  private def fixture = Seq(
    (1L, "spark join spark"),
    (2L, "join the table"),
    (3L, "the the the the")).toDF("doc_id", "text")

  private def micro(tf: Long, df: Long, docLen: Long,
                    nDocs: Long, lenSum: Long): Long = {
    val avgdl = lenSum.toDouble / nDocs
    val idf = math.log(1.0 + (nDocs - df + 0.5) / (df + 0.5))
    val tfn = (tf * 2.2) / (tf + 1.2 * (0.25 + (0.75 * docLen) / avgdl))
    math.round(idf * tfn * 1000000.0)
  }

  test("termScores matches the hand-computed Lucene-form BM25") {
    val got = graft.text.Bm25.termScores(fixture, "doc_id", "text",
        Seq("spark", "join"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(6))).toMap
    assert(got.size === 3) // (1,spark),(1,join),(2,join)
    assert(got((1L, "spark")) === ((2L, 1L, 3L, micro(2, 1, 3, 3, 10))))
    assert(got((1L, "join")) === ((1L, 2L, 3L, micro(1, 2, 3, 3, 10))))
    assert(got((2L, "join")) === ((1L, 2L, 3L, micro(1, 2, 3, 3, 10))))
  }

  test("rank sums per-term micro-scores and orders with doc_id tie-break") {
    val top = graft.text.Bm25.rank(fixture, "doc_id", "text",
        Seq("spark", "join"), 10)
      .select("doc_id", "n_hit_terms", "score_micro")
      .as[(Long, Long, Long)].collect()
    // doc 3 matches nothing -> absent; doc 1 (two terms, one rare)
    // outranks doc 2 (one common term)
    assert(top.map(_._1).toSeq === Seq(1L, 2L))
    assert(top(0)._2 === 2L && top(1)._2 === 1L)
    assert(top(0)._3 === micro(2, 1, 3, 3, 10) + micro(1, 2, 3, 3, 10))
    assert(top(1)._3 === micro(1, 2, 3, 3, 10))
  }

  test("rank plans as TakeOrderedAndProject, not a global sort") {
    // the top-k must stay a bounded-heap operator: a full Sort before the
    // limit would shuffle-sort every scored doc at corpus scale
    val top = graft.text.Bm25.rank(fixture, "doc_id", "text",
      Seq("spark", "join"), 10)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("longer documents score lower for the same tf (length norm)") {
    val docs = Seq((1L, "spark x"), (2L, "spark x x x x x x x"))
      .toDF("doc_id", "text")
    val byDoc = graft.text.Bm25.rank(docs, "doc_id", "text",
        Seq("spark"), 10)
      .select("doc_id", "score_micro").as[(Long, Long)].collect().toMap
    assert(byDoc(1L) > byDoc(2L))
  }

  test("differential: random corpora match a plain-Scala reference exactly") {
    // same JVM, same IEEE op order, same Math.log -> micro-scores must be
    // EQUAL, not approximately equal
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = Seq("spark", "join", "window", "the", "fast", "row")
    val qterms = Seq("spark", "join")
    val docGen = Gen.chooseNum(1, 8)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val corpusGen = Gen.chooseNum(2, 7)
      .flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) })
    val p = Prop.forAll(corpusGen) { corpus =>
      val want: Map[(Long, String), Long] = {
        val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
        val lens = toks.map { case (id, ts) => id -> ts.size.toLong }.toMap
        val n = corpus.size.toLong
        val avgdl = lens.values.sum.toDouble / n
        val tf = toks.flatMap { case (id, ts) =>
          ts.filter(qterms.contains).map(t => (id, t)) }
          .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        val dfm = tf.keys.toSeq.map(_._2).groupBy(identity)
          .map { case (t, o) => t -> o.size.toLong }
        tf.map { case ((id, t), f) =>
          val idf = math.log(1.0 + (n - dfm(t) + 0.5) / (dfm(t) + 0.5))
          val tfn = (f * 2.2) / (f + 1.2 * (0.25 + (0.75 * lens(id)) / avgdl))
          (id, t) -> math.round(idf * tfn * 1000000.0)
        }
      }
      val got = graft.text.Bm25
        .termScores(corpus.toDF("doc_id", "text"), "doc_id", "text", qterms)
        .select("doc_id", "term", "score_micro")
        .as[(Long, String, Long)].collect()
        .map { case (id, t, m) => (id, t) -> m }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(10).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }
}
