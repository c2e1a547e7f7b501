package graft

import org.apache.spark.sql.functions._

import graft.operators.RedirectResolve

class RedirectResolveSpec extends SparkSpec {
  import spark.implicits._

  private def resolve(edges: Seq[(String, String)], maxHops: Int = 32,
                      universe: Option[Seq[String]] = None) =
    RedirectResolve.resolveRedirects(
      edges.toDF("src", "dst"), "src", "dst", maxHops,
      universe.map(u => u.toDF("url")))
      .select($"url", $"final_url", $"n_hops", $"unresolved")
      .as[(String, Option[String], Option[Long], Boolean)]
      .collect().map { case (u, f, h, x) => u -> ((f, h, x)) }.toMap

  test("chains collapse to their final URL with exact hop counts; " +
      "loops and loop-feeders flag unresolved") {
    val got = resolve(Seq(
      ("a", "b"), ("b", "c"), ("c", "d"),     // 3-hop chain
      ("x", "y"), ("y", "x"),                 // 2-cycle
      ("w", "x"),                             // enters the cycle
      ("s", "s")))                            // self-loop: already final
    assert(got("a") === ((Some("d"), Some(3L), false)))
    assert(got("b") === ((Some("d"), Some(2L), false)))
    assert(got("c") === ((Some("d"), Some(1L), false)))
    assert(got("d") === ((Some("d"), Some(0L), false))) // terminal
    assert(got("x") === ((None, None, true)))
    assert(got("y") === ((None, None, true)))
    assert(got("w") === ((None, None, true)))
    assert(got("s") === ((Some("s"), Some(0L), false)))
  }

  test("duplicate outgoing edges pick min(dst) deterministically; the " +
      "universe adds edge-free URLs as their own destinations") {
    val got = resolve(Seq(("a", "z"), ("a", "b"), ("b", "c")),
      universe = Some(Seq("a", "lonely")))
    assert(got("a") === ((Some("c"), Some(2L), false))) // b < z
    assert(got("lonely") === ((Some("lonely"), Some(0L), false)))
    // a universe that OMITS edge-interior nodes cannot lose them: the
    // node set is universe ∪ edge endpoints, so b/c/z still report
    assert(got("b") === ((Some("c"), Some(1L), false)))
    assert(got("c") === ((Some("c"), Some(0L), false)))
    assert(got("z") === ((Some("z"), Some(0L), false)))
  }

  test("a chain of exactly maxHops resolves; far longer ones flag; " +
      "round count is logarithmic") {
    val chain = (0 until 16).map(i => (s"n$i", s"n${i + 1}"))
    val atCap = resolve(chain, maxHops = 16)
    assert(atCap("n0") === ((Some("n16"), Some(16L), false)))
    // a 40-hop chain under maxHops=8 (doubled span reaches 8 < 40):
    // the head cannot resolve and must flag, not silently truncate
    val long = (0 until 40).map(i => (s"m$i", s"m${i + 1}"))
    val capped = resolve(long, maxHops = 8)
    assert(capped("m0") === ((None, None, true)))
    // the tail inside the resolved span still resolves exactly
    assert(capped("m38") === ((Some("m40"), Some(2L), false)))
  }

  test("resolution agrees with a driver-side reference walk on the " +
      "q156 synth shape") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 400).select($"doc_id")
    val m4c = pmod($"doc_id", lit(4))
    val r40c = pmod($"doc_id", lit(40))
    def u(c: org.apache.spark.sql.Column) =
      concat(lit("u"), c.cast("string"))
    val edges = docs.where(m4c =!= 0)
      .select(u($"doc_id").as("src"),
        u(when(r40c === 37, $"doc_id" + 1)
          .otherwise($"doc_id" - 1)).as("dst"))
    val got = RedirectResolve.resolveRedirects(edges, "src", "dst",
      maxHops = 8, universe = Some(docs.select(u($"doc_id").as("url"))))
      .select($"url", $"final_url", $"n_hops", $"unresolved")
      .as[(String, Option[String], Option[Long], Boolean)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // independent reference: follow the same edge function in Scala
    val edgeMap = (0L until 400L).filter(_ % 4 != 0)
      .map(i => s"u$i" -> (if (i % 40 == 37) s"u${i + 1}" else s"u${i - 1}"))
      .toMap
    for (i <- 0L until 400L) {
      var cur = s"u$i"; var hops = 0L; var ok = true
      val seen = scala.collection.mutable.Set.empty[String]
      while (ok && edgeMap.contains(cur)) {
        if (!seen.add(cur) || hops > 8) ok = false
        else { cur = edgeMap(cur); hops += 1 }
      }
      val want = if (ok) ((Some(cur), Some(hops), false))
        else ((None, None, true))
      assert(got(s"u$i") === want, s"diverged at u$i")
    }
  }
}
