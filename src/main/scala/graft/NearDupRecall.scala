package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Measurement main behind SCALING.md "Embedding near-dup pairs": recall of
  * the bucketed [[Similarity.lshNearDupPairs]] vs the unbounded all-pairs
  * [[Similarity.cosineNearDups]] on the test embeddings corpus, across
  * maxMismatch in {1,2,3} at bits=16, with candidate-pair counts as the
  * cost proxy. Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.NearDupRecall"
  *
  * Prints one markdown table row per (threshold, maxMismatch). The numbers
  * in SCALING.md come from this main verbatim — re-run it when the fixture
  * or the operator changes.
  */
object NearDupRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bits = 16
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .cache()
    val n = vecs.count()
    println(s"corpus: $sfDir embeddings, n=$n, bits=$bits")
    println("| threshold | maxMismatch | true pairs | lsh pairs | recall | candidate pairs | candidates/all-pairs |")
    println("|---|---|---|---|---|---|---|")
    try {
      // `ivfOnly` skips the all-pairs simhash sections — at sf1.0+ the
      // exact all-pairs truth is the (deliberately unbounded) slow path,
      // and the IVF sweep is what the larger corpora are run for
      val ivfOnly = args.contains("ivfOnly")
      val allPairs = n * (n - 1) / 2
      // truth depends only on thr, candidates only on mm — hoist both so
      // the expensive all-pairs scan runs once per threshold, not per cell
      val sigs = vecs.select(col("id"),
        Similarity.signBucket(col("vec"), bits).as("simhash"))
      if (!ivfOnly) {
      val candByMm = Seq(1, 2, 3).map(mm => mm ->
        graft.dedup.Dedup.simhashBandedDups(sigs, "id", bits, mm).count()).toMap
      for (thr <- Seq(0.3, 0.5)) {
        val truth = Similarity.cosineNearDups(vecs, thr).count()
        for (mm <- Seq(1, 2, 3)) {
          val lsh = Similarity.lshNearDupPairs(vecs, thr, bits, mm).count()
          val cand = candByMm(mm)
          val recall = if (truth == 0) 1.0 else lsh.toDouble / truth
          println(f"| $thr | $mm | $truth | $lsh | $recall%.3f | $cand | ${cand.toDouble / allPairs}%.4f |")
        }
      }

      // where the true-pair mass sits in sign-Hamming space: the histogram
      // a user reads to pick maxMismatch for THEIR similarity band
      val hsigs = sigs.withColumnRenamed("simhash", "sig")
      println("\nsign-Hamming distance of true pairs (thr=0.3), and mean cosine per distance:")
      Similarity.cosineNearDups(vecs, 0.3)
        .join(hsigs.select(col("id").as("id_a"), col("sig").as("sa")), Seq("id_a"))
        .join(hsigs.select(col("id").as("id_b"), col("sig").as("sb")), Seq("id_b"))
        .groupBy(bit_count(expr("sa ^ sb")).as("hamming"))
        .agg(count(lit(1)).as("pairs"), avg(col("sim")).as("mean_sim"))
        .orderBy("hamming")
        .collect()
        .foreach(r => println(f"| ${r.getInt(0)} | ${r.getLong(1)} | ${r.getDouble(2)}%.3f |"))

      // the designed-for case: planted near-duplicates (q100's corpus shape
      // — each vector gets a copy with dimension 0 zeroed, cosine >= 0.92
      // on this data). Recall of the PLANTED pairs per maxMismatch: both
      // sides of the ratio are restricted to (x, x+1M) pairs so the number
      // measures exactly what it claims — an incidental base-corpus pair
      // above the threshold (possible in a regenerated fixture) must not
      // leak into the denominator of a "planted recall".
      val planted = vecs.select((col("id") + 1000000).as("id"),
        transform(col("vec"), (x, i) => when(i === 0, lit(0f)).otherwise(x))
          .as("vec"))
      val corpus = vecs.unionByName(planted).cache()
      corpus.count()
      val isPlantedPair = col("id_b") - col("id_a") === 1000000L
      try {
        println("\nplanted near-dup corpus (orig + dim0-zeroed copy, thr=0.8):")
        println("| maxMismatch | planted pairs | lsh found | recall | candidate pairs |")
        println("|---|---|---|---|---|")
        val truth = Similarity.cosineNearDups(corpus, 0.8)
          .where(isPlantedPair).count()
        val csigs = corpus.select(col("id"),
          Similarity.signBucket(col("vec"), bits).as("simhash"))
        for (mm <- Seq(1, 2, 3)) {
          val lsh = Similarity.lshNearDupPairs(corpus, 0.8, bits, mm)
            .where(isPlantedPair).count()
          val cand = graft.dedup.Dedup
            .simhashBandedDups(csigs, "id", bits, mm).count()
          val recall = if (truth == 0) 1.0 else lsh.toDouble / truth
          println(f"| $mm | $truth | $lsh | $recall%.3f | $cand |")
        }
      } finally corpus.unpersist()
      } // end !ivfOnly

      // IVF recall vs nprobe: the other recall knob this file measures.
      // Ground truth is exact brute-force top-10; candidates are ranked
      // identically on both paths, so every miss is list-assignment loss —
      // a true neighbor living across a Voronoi boundary from its query.
      // nprobe widens the probe set; the curve below is what a user reads
      // to pick nprobe for THEIR recall target (SCALING.md "IVF recall").
      println("\nIVF recall@10 vs nprobe (16 learned centroids, 50 queries):")
      println("| nprobe | hit neighbors | recall@10 | wall s |")
      println("|---|---|---|---|")
      val queries = vecs.where(col("id") < 50)
      // materialized ONCE so per-nprobe wall time measures the probe scan,
      // not a k-means re-train per row
      val centroids = Similarity.kmeansLite(vecs, k = 16, iters = 2).cache()
      centroids.count()
      val truth = Similarity.bruteForceTopK(queries, vecs, 10)
        .select("query_id", "neighbor_id").cache()
      val truthN = truth.count()
      try {
        for (np <- Seq(1, 2, 4, 8)) {
          val t0 = System.nanoTime()
          val hits = Similarity.ivfTopK(queries, vecs, centroids, 10, np)
            .select("query_id", "neighbor_id").intersect(truth).count()
          val wall = (System.nanoTime() - t0) / 1e9
          println(f"| $np | $hits/$truthN | ${hits.toDouble / truthN}%.3f " +
            f"| $wall%.2f |")
        }
      } finally { truth.unpersist(); centroids.unpersist() }
    } finally vecs.unpersist()
    spark.stop()
  }
}
