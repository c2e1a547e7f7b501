package graft

import org.apache.spark.sql.functions._

/** Corpus TF-IDF (graft.text.TfIdf): hand-computed fixture + plan shape. */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs: "a a b" / "b c" / "c"  =>  N=3, df(a)=1, df(b)=2, df(c)=2
  private def fixture =
    Seq((1L, "a a b"), (2L, "b c"), (3L, "c")).toDF("doc_id", "text")

  test("scores match the smoothed-idf definition on a hand-computed corpus") {
    val got = graft.text.TfIdf.scores(fixture, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got.size === 5) // (1,a),(1,b),(2,b),(2,c),(3,c)
    val idf1 = math.log(4.0 / 2.0) + 1 // df=1
    val idf2 = math.log(4.0 / 3.0) + 1 // df=2
    assert(got((1L, "a")) === ((2L, 3L, 1L, 3L, 2.0 / 3.0 * idf1)))
    assert(got((1L, "b")) === ((1L, 3L, 2L, 3L, 1.0 / 3.0 * idf2)))
    assert(got((2L, "c")) === ((1L, 2L, 2L, 3L, 1.0 / 2.0 * idf2)))
    assert(got((3L, "c")) === ((1L, 1L, 2L, 3L, 1.0 / 1.0 * idf2)))
  }

  test("topTerms ranks by rounded score with term tie-break, map-side limit") {
    val top = graft.text.TfIdf.topTerms(fixture, "doc_id", "text", 1)
    val byDoc = top.select("doc_id", "term").as[(Long, String)]
      .collect().toMap
    // doc 1: a (rare, frequent) beats b; doc 2: b vs c tie on score
    // (same tf, same df) -> term tie-break picks "b"; doc 3: only c
    assert(byDoc === Map(1L -> "a", 2L -> "b", 3L -> "c"))
    // the rank<=k filter must plan as WindowGroupLimit (top-k pruned
    // map-side before the rank exchange), not filter-after-full-sort
    val plan = top.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
  }
}
