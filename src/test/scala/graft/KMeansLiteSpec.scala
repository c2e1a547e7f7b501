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

  test("recall@k is monotone non-decreasing in nprobe, and exact when " +
      "every list is probed") {
    // the claim SCALING.md's nprobe table rests on: widening the probe
    // set can only ADD candidates (corpus vectors hold one rank-1 list
    // assignment, queries gain lists), so recall against brute-force
    // truth never drops — and probing all k lists IS brute force
    val k = 8
    val centroids = Similarity.kmeansLite(vecs, k = k, iters = 2).cache()
    val nLists = centroids.count().toInt
    val queries = vecs.where(col("id") < 20)
    val truth = Similarity.bruteForceTopK(queries, vecs, 5)
      .select("query_id", "neighbor_id").cache()
    val truthN = truth.count()
    val hits = Seq(1, 2, 4, 8).map { np =>
      np -> Similarity.ivfTopK(queries, vecs, centroids, 5, np)
        .select("query_id", "neighbor_id").intersect(truth).count()
    }
    hits.sliding(2).foreach { case Seq((np1, h1), (np2, h2)) =>
      assert(h1 <= h2, s"recall dropped: nprobe=$np1 hit $h1, " +
        s"nprobe=$np2 hit $h2")
    case _ => ()
    }
    val full = hits.collectFirst { case (np, h) if np >= nLists => h }
    assert(full.contains(truthN),
      s"probing all $nLists lists must equal brute force: " +
        s"$full vs $truthN")
    truth.unpersist(); centroids.unpersist()
  }
}
