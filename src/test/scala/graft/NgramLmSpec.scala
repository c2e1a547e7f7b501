package graft

/** Bigram-LM NLL scoring (graft.text.NgramLm): hand-computed fixture +
  * the quality-signal property (common bigrams -> low NLL). Expected
  * micro-NLLs replicate the operator's double-op order in plain Scala —
  * same JVM, same Math.log — so equality is exact. */
class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  // doc 1: bigrams "a b" x2, "b a"; doc 2: "b c"; doc 3: single token —
  // no bigram row, but its token still counts in the unigram model.
  // uni: a=2, b=3, c=1, x=1 -> V=4; bgc: "a b"=2, "b a"=1, "b c"=1.
  private def fixture = Seq(
    (1L, "a b a b"), (2L, "b c"), (3L, "x")).toDF("doc_id", "text")

  private def nllMicro(cBg: Long, cW1: Long, vSize: Long): Long =
    math.round(-math.log((cBg + 1.0) / (cW1 + vSize)) * 1000000.0)

  test("bigramNll matches the hand-computed add-one bigram model") {
    val got = graft.text.NgramLm.bigramNll(fixture, "doc_id", "text")
      .select("doc_id", "n_bigrams", "nll_micro_sum", "mean_nll")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(1L, 2L)) // doc 3 has no bigrams
    val d1Sum = nllMicro(2, 2, 4) * 2 + nllMicro(1, 3, 4)
    assert(got(0) === ((1L, 3L, d1Sum, (d1Sum.toDouble / 3) / 1000000.0)))
    val d2Sum = nllMicro(1, 3, 4)
    assert(got(1) === ((2L, 1L, d2Sum, (d2Sum.toDouble / 1) / 1000000.0)))
  }

  test("bigrams form in the projection: no window operator in the plan") {
    // the scaladoc's scale claim — zip_with over the token array, never a
    // positional lag/window (which would shuffle-sort every raw token)
    val df = graft.text.NgramLm.bigramNll(fixture, "doc_id", "text")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("differential: random corpora match a plain-Scala reference exactly") {
    // per-distinct-bigram micro-NLL x tf (operator) must equal the
    // per-occurrence sum (reference) — integer micro-units, exact
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val vocab = Seq("a", "b", "c", "d", "e")
    val docGen = Gen.chooseNum(1, 9)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf(vocab)))
    val corpusGen = Gen.chooseNum(2, 6)
      .flatMap(n => Gen.listOfN(n, docGen))
      .map(_.zipWithIndex.map { case (ts, i) => (i.toLong, ts.mkString(" ")) })
    val p = Prop.forAll(corpusGen) { corpus =>
      val want: Map[Long, (Long, Long)] = {
        val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
        val uni = toks.flatMap(_._2).groupBy(identity)
          .map { case (w, o) => w -> o.size.toLong }
        val v = uni.size.toLong
        val bgs = toks.collect { case (id, ts) if ts.size >= 2 =>
          id -> ts.sliding(2).map(_.mkString(" ")).toSeq }
        val bgc = bgs.flatMap(_._2).groupBy(identity)
          .map { case (b, o) => b -> o.size.toLong }
        bgs.map { case (id, bs) =>
          val s = bs.map { b =>
            math.round(-math.log((bgc(b) + 1.0) /
              (uni(b.split(" ")(0)) + v)) * 1000000.0)
          }.sum
          id -> (bs.size.toLong, s)
        }.toMap
      }
      val got = graft.text.NgramLm
        .bigramNll(corpus.toDF("doc_id", "text"), "doc_id", "text")
        .select("doc_id", "n_bigrams", "nll_micro_sum")
        .as[(Long, Long, Long)].collect()
        .map { case (id, n, s) => id -> ((n, s)) }.toMap
      got == want
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(10).withWorkers(1), p)
    assert(res.passed, res.status.toString)
  }

  test("documents of corpus-common bigrams score lower than rare ones") {
    // "p q" appears in 5 docs; doc 99's bigrams are corpus-unique
    val docs = ((1L to 5L).map(i => (i, "p q p q p q")) :+
      (99L, "u v w z")).toDF("doc_id", "text")
    val byDoc = graft.text.NgramLm.bigramNll(docs, "doc_id", "text")
      .select("doc_id", "mean_nll").as[(Long, Double)].collect().toMap
    assert(byDoc(1L) < byDoc(99L))
  }
}
