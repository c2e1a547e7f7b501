package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.similarity.Similarity

/** Measurement main behind SCALING.md "PQ recall: raw vs residual" —
  * recall@10 of PQ-coded search against the exact squared-L2 truth
  * ([[Similarity.bruteForceTopKL2]]), across code budgets m in {4, 8}
  * and nprobe in {1, 2, 4, all}, for BOTH encodings:
  *
  *   raw      — codes quantize the raw vectors (q163's composition:
  *              ivfAssignN candidates + pqAdcTopK)
  *   residual — codes quantize v − centroid (q165's composition:
  *              ivfResidualize + pqAdcTopKResidual), the faiss
  *              IndexIVFPQ layout
  *
  * Codebooks are TRAINED (pqTrain, 3 Lloyd rounds, 16 codes/subspace)
  * on the same corpus each encoding searches; IVF centroids come from
  * kmeansLite (K=16) — the production path end to end, so the numbers
  * measure what a user deploys, not the fixed oracle exhibits.
  *
  * TWO corpora, because the residual question is data-dependent:
  *
  *   iid       — the raw test embeddings, which are near-i.i.d. noise:
  *               NO encoding can rank 64 dims from 16–32 code bits
  *               here (recall is noise-floor for both), and residuals
  *               have no cluster structure to exploit. Reported so the
  *               floor is on record.
  *   clustered — the realistic regime (real text/image embeddings live
  *               on low-dim manifolds with strong cluster structure):
  *               vec'_i = center(i mod 16) + 0.25·vec_i, centers drawn
  *               from the corpus itself, deterministic. Here raw PQ
  *               must spend its code budget spanning the BETWEEN-
  *               cluster offsets (≈ one code per cluster, zero within-
  *               cluster resolution) while residual codes span only
  *               the within-cluster spread — the textbook IndexIVFPQ
  *               win this table exists to demonstrate.
  *
  * Run:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PqRecall"
  *
  * Prints one markdown row per (corpus, m, encoding, nprobe). The
  * SCALING.md table comes from this main verbatim — re-run it when the
  * fixture or the operators change.
  */
object PqRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val k = 10
    // knobs scale with the corpus (the SemDeDup K ~ corpus/1000 rule):
    // fixed 16/16 at 10x the corpus dilutes recall because each list
    // grows 10x while the code budget stays flat — override to measure
    // the properly-sized operating point
    val nCodes = sys.env.getOrElse("SPARK_GRAFT_PQ_NCODES", "16").toInt
    val nLists = sys.env.getOrElse("SPARK_GRAFT_PQ_NLISTS", "16").toInt
    val raw = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec"))
      .cache()
    val n = raw.count()
    // the clustered corpus: 16 centers drawn from the corpus itself,
    // within-cluster spread = 0.25 of the original vector — strong,
    // deterministic cluster structure (the realistic embedding regime)
    val centers = broadcast(raw.where($"id" < 16)
      .select($"id".as("g"), $"vec".as("cvec")))
    val clustered = raw
      .select($"id", pmod($"id", lit(16)).as("g"), $"vec")
      .join(centers, Seq("g"))
      .select($"id", zip_with($"cvec", $"vec", (c, x) =>
        (c.cast("double") + lit(0.25) * x.cast("double"))
          .cast("float")).as("vec"))
      .cache()
    println(s"corpus: $sfDir embeddings, n=$n, k=$k, " +
      s"codes/subspace=$nCodes, ivf lists=$nLists")
    println("| corpus | m | encoding | nprobe | recall@10 |")
    println("|---|---|---|---|---|")

    def sweep(tag: String, vecs: DataFrame): Unit = {
      // ~n/41 deterministic in-corpus queries
      val queries = vecs.where(pmod(col("id"), lit(41)) === 0).cache()
      val truth: Map[Long, Set[Long]] =
        Similarity.bruteForceTopKL2(queries, vecs, k)
          .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

      def recall(approx: DataFrame): Double = {
        val got = approx.select($"query_id", $"neighbor_id")
          .as[(Long, Long)].collect()
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        truth.map { case (q, t) =>
          got.getOrElse(q, Set.empty).count(t.contains).toDouble / t.size
        }.sum / truth.size
      }

      val centroids = Similarity.kmeansLite(vecs, nLists, iters = 3).cache()
      val assignAll = Similarity.ivfAssign(vecs, centroids)
        .select($"id".as("neighbor_id"), $"cid").cache()

      for (m <- Seq(4, 8)) {
        // --- raw: train on raw vectors, q163's composition ---
        val cbRaw = Similarity.pqTrain(vecs, m, nCodes, iters = 3)
        val codesRaw = Similarity.pqEncode(vecs, cbRaw, m)
          .select($"id", $"pq_codes").cache()
        for (nprobe <- Seq(1, 2, 4)) {
          val cand = Similarity.ivfAssignN(queries, centroids, nprobe)
            .select($"id".as("query_id"), $"cid")
            .join(assignAll, Seq("cid"))
            .select("query_id", "neighbor_id")
          val r = recall(Similarity.pqAdcTopK(
            queries, codesRaw, cbRaw, k, m, Some(cand)))
          println(f"| $tag | $m | raw | $nprobe | $r%.3f |")
        }
        val rAll = recall(
          Similarity.pqAdcTopK(queries, codesRaw, cbRaw, k, m))
        println(f"| $tag | $m | raw | all | $rAll%.3f |")
        codesRaw.unpersist()

        // --- residual: train on v − centroid, q165's composition ---
        val resid = Similarity.ivfResidualize(vecs, centroids).cache()
        val cbRes = Similarity.pqTrain(
          resid.select($"id", $"vec"), m, nCodes, iters = 3)
        val codesRes = Similarity.pqEncode(resid, cbRes, m)
          .select($"id", $"cid", $"pq_codes").cache()
        for (nprobe <- Seq(1, 2, 4, nLists)) {
          val label = if (nprobe == nLists) "all" else nprobe.toString
          val r = recall(Similarity.pqAdcTopKResidual(
            queries, codesRes, cbRes, centroids, k, m, nprobe))
          println(f"| $tag | $m | residual | $label | $r%.3f |")
        }
        // --- refine: exact-L2 re-rank of the ADC top-C candidates
        // (pqRefine) — the C-curve SCALING.md records. recall@k after
        // refine = P(true neighbor survived into ADC's top C), so it
        // rises with C and is bounded by the nprobe=4 probe coverage.
        for (c <- Seq(k, 2 * k, 4 * k, 10 * k)) {
          val adc = Similarity.pqAdcTopKResidual(
            queries, codesRes, cbRes, centroids, c, m, nprobe = 4)
          val r = recall(Similarity.pqRefine(queries, vecs, adc, k))
          println(f"| $tag | $m | refine C=$c | 4 | $r%.3f |")
        }
        codesRes.unpersist(); resid.unpersist()
      }
      assignAll.unpersist(); centroids.unpersist(); queries.unpersist()
    }

    sweep("iid", raw)
    sweep("clustered", clustered)
    spark.stop()
  }
}
