package graft

import org.apache.spark.sql.functions._

/** SemDeDup-style clustered semantic near-dup
  * (graft.similarity.Similarity.clusteredNearDups): planted two-cluster
  * fixture, the Voronoi-boundary miss that defines the approximation, and
  * the probeParts pin contract. */
class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  // Two axis clusters + a near-dup pair STRADDLING the Voronoi boundary:
  // v12 leans to cluster 0, v22 to cluster 1, yet cos(v12, v22) ~ 0.998.
  private def vecs = Seq(
    (10L, Seq(1.0f, 0.1f, 0f, 0f)),
    (11L, Seq(0.9f, 0.2f, 0f, 0f)),
    (12L, Seq(0.75f, 0.7f, 0f, 0f)),
    (20L, Seq(0.1f, 1.0f, 0f, 0f)),
    (21L, Seq(0.2f, 0.9f, 0f, 0f)),
    (22L, Seq(0.7f, 0.75f, 0f, 0f))).toDF("id", "vec")

  private def cents = Seq(
    (0L, Seq(1.0f, 0f, 0f, 0f)),
    (1L, Seq(0f, 1.0f, 0f, 0f))).toDF("cid", "vec")

  test("finds within-cluster near-dups; misses the boundary straddler") {
    val got = graft.similarity.Similarity
      .clusteredNearDups(vecs, cents, 0.9, probeParts = 0)
      .select("cid", "id_a", "id_b").as[(Long, Long, Long)]
      .collect().toSet
    assert(got === Set((0L, 10L, 11L), (1L, 20L, 21L)))
    // the straddling pair IS a cosine near-dup — all-pairs finds it; the
    // clustered variant cannot by construction (different Voronoi cells)
    val allPairs = graft.similarity.Similarity.cosineNearDups(vecs, 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(allPairs.contains((12L, 22L)))
    assert(!got.map(t => (t._2, t._3)).contains((12L, 22L)))
  }

  test("assignment ties break to the lowest cid deterministically") {
    // equidistant from both centroids -> cid 0 wins the tie
    val tied = Seq((5L, Seq(0.5f, 0.5f, 0f, 0f))).toDF("id", "vec")
    val got = graft.similarity.Similarity.ivfAssign(tied, cents)
      .as[(Long, Long)].collect()
    assert(got === Array((5L, 0L)))
  }

  test("probeParts pin is result-invariant and lands in the physical plan") {
    val modes = Seq(0, -1, 5).map(p => graft.similarity.Similarity
      .clusteredNearDups(vecs, cents, 0.9, probeParts = p))
    for (m <- modes.tail) {
      assert(m.exceptAll(modes.head).isEmpty && modes.head.exceptAll(m).isEmpty)
    }
    val pinned = modes(2)
    pinned.collect()
    assert(pinned.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM"),
      "explicit-count pin missing from executed plan")
    val skipped = modes.head
    skipped.collect()
    assert(!skipped.queryExecution.executedPlan.toString
      .contains("REPARTITION_BY_NUM"),
      "probeParts=0 must not inject a repartition")
  }
}
