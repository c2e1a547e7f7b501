package graft

import org.apache.spark.sql.functions._

/** Repetition quality signals (graft.text.Repetition): hand-computed
  * fixtures, short-doc edge cases, and the zero-shuffle plan pin. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("ngramArray builds space-joined windows, empty below n") {
    val got = Seq("a b c d", "a b", "a").toDF("t")
      .select(graft.text.Repetition.ngramArray(
        graft.text.TextOps.tokens(col("t")), 3).as("g"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
  }

  test("ngramStats matches a hand-computed bigram fixture") {
    // "a b a b c": bigrams [a b, b a, a b, b c] -> m=4, distinct=3,
    // top = "a b" x2, dup-covered = 2
    val df = Seq((1L, "a b a b c"), (2L, "x y z"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = graft.text.Repetition.ngramStats(df, "doc_id", "text", 2)
      .orderBy("doc_id").collect()
    val r1 = got(0)
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3), r1.getLong(4))
      === ((4L, 3L, 2L, 2L)))
    assert(r1.getDouble(5) === 0.5 && r1.getDouble(6) === 0.5)
    val r2 = got(1) // all-unique bigrams: top run 1, dup 0
    assert((r2.getLong(1), r2.getLong(2), r2.getLong(3), r2.getLong(4))
      === ((2L, 2L, 1L, 0L)))
    assert(r2.getDouble(5) === 0.5 && r2.getDouble(6) === 0.0)
    val r3 = got(2) // 1 token, no bigrams: 0 counts, null stats
    assert(r3.getLong(1) === 0L && r3.getLong(2) === 0L)
    assert(r3.isNullAt(3) && r3.isNullAt(4) && r3.isNullAt(5) && r3.isNullAt(6))
  }

  test("ngramStats plans with zero shuffle (no Exchange)") {
    val df = graft.sources.Sources.table(spark, sf, "documents")
    val plan = graft.text.Repetition.ngramStats(df, "doc_id", "text", 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(2000))
  }

  test("boilerplateProfile flags grams shared by >= minDocs docs") {
    // trigram "x y z" appears in docs 1,2,3 (and twice in doc 1);
    // everything else is unique to its doc
    val df = Seq(
      (1L, "x y z q x y z"), // trigrams: x y z, y z q, z q x, q x y, x y z
      (2L, "x y z a b"),     // x y z, y z a, z a b
      (3L, "p x y z r"),     // p x y, x y z, y z r
      (4L, "m n o p q")      // no shared grams
    ).toDF("doc_id", "text")
    val got = graft.text.Repetition
      .boilerplateProfile(df, "doc_id", "text", 3, 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(if (r.isNullAt(3)) null else r.getDouble(3))))
    assert(got(0) === ((1L, 5L, 2L, Some(0.4))))
    assert(got(1) === ((2L, 3L, 1L, Some(1.0 / 3.0))))
    assert(got(2) === ((3L, 3L, 1L, Some(1.0 / 3.0))))
    assert(got(3) === ((4L, 3L, 0L, Some(0.0))))
  }

  test("boilerplateProfile reports docs below n tokens with 0/null") {
    val df = Seq((1L, "a b c d"), (2L, "hi")).toDF("doc_id", "text")
    val got = graft.text.Repetition
      .boilerplateProfile(df, "doc_id", "text", 3, 2)
      .orderBy("doc_id").collect()
    assert(got(1).getLong(1) === 0L && got(1).getLong(2) === 0L)
    assert(got(1).isNullAt(3))
  }

  test("topNgrams ranks by df then total, counts multiplicity, cuts at k") {
    val df = Seq(
      (1L, "x y x y x y"), // bigrams: "x y"x3, "y x"x2
      (2L, "x y a b"),     // "x y", "y a", "a b"
      (3L, "a b x y"),     // "a b", "b x", "x y"
      (4L, "a b c")        // "a b", "b c"
    ).toDF("doc_id", "text")
    val got = graft.text.Repetition.topNgrams(df, "doc_id", "text", 2, 3)
      .as[(String, Long, Long)].collect().toSeq
    // df: "x y" 3 docs (5 occ), "a b" 3 docs (3 occ), then singles —
    // "y x" has total 2, beating df-1/total-1 grams; k=3 cuts after it
    assert(got === Seq(("x y", 3L, 5L), ("a b", 3L, 3L), ("y x", 1L, 2L)))
  }

  test("topNgrams plans a TakeOrderedAndProject, not a global sort") {
    val df = graft.sources.Sources.table(spark, sf, "documents")
    val plan = graft.text.Repetition.topNgrams(df, "doc_id", "text", 3, 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }
}
