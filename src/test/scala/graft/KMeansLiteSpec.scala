package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Spherical k-means-lite: learned IVF centroids improve the clustering
  * objective over the hash-seeded start, and plug into ivfAssign/ivfTopK. */
class KMeansLiteSpec extends SparkSpec {
  import spark.implicits._

  private def vecs: DataFrame =
    graft.sources.Sources.table(spark, sf, "embeddings")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Mean cosine of every vector to its assigned centroid. */
  private def objective(centroids: DataFrame): Double = {
    val assigned = Similarity.ivfAssign(vecs, centroids)
    vecs.join(assigned, Seq("id"))
      .join(centroids.select(col("cid"), col("vec").as("cv")), Seq("cid"))
      .select(avg(Similarity.cosine(col("vec"), col("cv"))))
      .as[Double].head()
  }

  test("learned centroids improve mean member-cosine over the seed set") {
    val seed = Similarity.kmeansLite(vecs, k = 8, iters = 0)
    val learned = Similarity.kmeansLite(vecs, k = 8, iters = 3)
    assert(seed.count() === 8)
    assert(learned.count() >= 2) // empty clusters may drop, most survive
    val (before, after) = (objective(seed), objective(learned))
    assert(after > before,
      s"objective did not improve: seed=$before learned=$after")
  }

  test("learned centroids drive ivfTopK end to end") {
    val centroids = Similarity.kmeansLite(vecs, k = 8, iters = 2)
    val out = Similarity.ivfTopK(
      vecs.where(col("id") < 3), vecs, centroids, k = 5)
    val perQuery = out.groupBy("query_id").count().as[(Long, Long)].collect()
    assert(perQuery.length === 3)
    assert(perQuery.forall(_._2 === 5))
  }

  test("multi-probe recovers a planted cross-boundary neighbor nprobe=1 misses") {
    def v(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    // two centroids 72° apart; the corpus vector n at 50° lives in
    // centroid 1's inverted list, m at 5° in centroid 0's
    val centroids = Seq((0L, v(0.0)), (1L, v(72.0))).toDF("cid", "vec")
    val corpus = Seq((1L, v(5.0)), (2L, v(50.0))).toDF("id", "vec")
    // query at 30°: assigned to centroid 0 (cos 30° > cos 42°), but its
    // TRUE nearest neighbor is n, 20° away across the Voronoi boundary —
    // the exact miss multi-probe exists to repair
    val q = Seq((100L, v(30.0))).toDF("id", "vec")
    def top1(nprobe: Int) = Similarity.ivfTopK(q, corpus, centroids, 1, nprobe)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(Similarity.bruteForceTopK(q, corpus, 1)
      .select("neighbor_id").as[Long].head() === 2L) // ground truth: n
    assert(top1(1) === Seq(1L)) // nprobe=1 scans only list 0: settles for m
    assert(top1(2) === Seq(2L)) // nprobe=2 probes list 1 too: recovers n
  }
}
