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
}
