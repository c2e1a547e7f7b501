package graft

import org.apache.spark.sql.functions._

import graft.similarity.Similarity

class PqSpec extends SparkSpec {
  import spark.implicits._

  private def emb = graft.sources.Sources.table(spark, sf, "embeddings")
    .select(col("vec_id").as("id"), col("embedding").as("vec"))

  test("pqEncode: codes are argmin positions in [0,k), deterministic " +
      "across repartitionings; non-divisible vectors get NULL codes; " +
      "the encode plan has no shuffle exchange") {
    val m = 4
    val cb = Similarity.pqCodebooks(emb.where($"id" < 4), m)
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqEncode(df, cb, m)
        .select($"id", array_join($"pq_codes", ",").as("c"))
        .as[(Long, String)].collect().sortBy(_._1).toSeq
    val base = run(emb)
    assert(base === run(emb.repartition(13)))
    assert(base.forall(_._2.split(",").forall(c =>
      c.toInt >= 0 && c.toInt < 4)))
    // non-divisible: a 3-dim vector under m=4 -> NULL codes, no throw
    val odd = Seq((900L, Seq(1f, 2f, 3f))).toDF("id", "vec")
    val oddOut = Similarity.pqEncode(odd, cb, m)
      .select($"pq_codes").collect().head
    assert(oddOut.isNullAt(0))
    // narrow map over the CORPUS: the streamed side (everything printed
    // before the BroadcastExchange subtree, i.e. the scan->encode path)
    // has no shuffle exchange — the only hashpartitioning exchange in
    // the whole plan is the m-row codebook pack inside the broadcast
    // build side, corpus-independent by construction
    val plan = Similarity.pqEncode(emb, cb, m)
      .queryExecution.executedPlan.toString
    val cut = plan.indexOf("BroadcastExchange")
    assert(cut > 0, plan)
    assert(!plan.substring(0, cut).contains("Exchange hashpartitioning"),
      plan)
  }

  test("ADC ranking equals exact squared-L2 search against the code " +
      "RECONSTRUCTIONS (the defining PQ identity), ties to lower id") {
    val m = 4
    val cb = Similarity.pqCodebooks(emb.where($"id" < 4), m)
    val codes = Similarity.pqEncode(emb.where($"id" < 200), cb, m)
    val queries = emb.where($"id".between(100, 102))
    val got = Similarity.pqAdcTopK(queries, codes, cb, 5, m)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // driver-side reference: reconstruct each candidate from its codes,
    // rank by exact |q - recon|^2 (constant |q|^2 does not reorder)
    val cbMap = cb.as[(Int, Long, Seq[Double])].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3.toArray).toArray).toMap
    val codeMap = codes.select($"id", $"pq_codes")
      .as[(Long, Seq[Int])].collect().toMap
    val vecs = emb.as[(Long, Seq[Float])].collect().toMap
    def recon(id: Long): Array[Double] =
      codeMap(id).zipWithIndex.flatMap { case (c, s) => cbMap(s)(c) }.toArray
    for (q <- Seq(100L, 101L, 102L)) {
      val qv = vecs(q).map(_.toDouble).toArray
      val want = codeMap.keys.filter(_ != q).toSeq
        .map { cand =>
          val r = recon(cand)
          val d = qv.zip(r).map { case (a, b) =>
            val t = a - b; t * t
          }.sum
          (cand, d)
        }
        .sortBy { case (cand, d) => (d, cand) }
        .take(5).map(_._1)
      assert(got(q) === want, s"ADC ranking diverged for query $q")
    }
  }

  test("IVF+PQ composition: probing ALL lists equals exhaustive ADC " +
      "(identity), and probed search only scores probed-list pairs") {
    val m = 4
    val cb = Similarity.pqCodebooks(emb.where($"id" < 4), m)
    val codes = Similarity.pqEncode(emb, cb, m)
    val cents = emb.where($"id" < 8)
      .select($"id".as("cid"), $"vec")
    val queries = emb.where($"id".between(100, 102))
    def cand(nprobe: Int) =
      Similarity.ivfAssignN(queries, cents, nprobe)
        .select($"id".as("query_id"), $"cid")
        .join(Similarity.ivfAssign(emb, cents)
          .select($"id".as("neighbor_id"), $"cid"), Seq("cid"))
        .select("query_id", "neighbor_id")
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"rank", $"neighbor_id", $"dist")
        .as[(Long, Int, Long, Double)].collect().sortBy(r => (r._1, r._2))
        .toSeq
    val exhaustive = collect(
      Similarity.pqAdcTopK(queries, codes, cb, 5, m))
    val allProbes = collect(
      Similarity.pqAdcTopK(queries, codes, cb, 5, m, Some(cand(8))))
    assert(allProbes === exhaustive,
      "probing every list must reduce to exhaustive ADC")
    // nprobe=1: every returned neighbor lives in its query's top list
    val one = Similarity.pqAdcTopK(queries, codes, cb, 5, m,
      Some(cand(1)))
    val probed = cand(1).as[(Long, Long)].collect().toSet
    val got = one.select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(got.subsetOf(probed), "a result escaped the probed lists")
  }

  test("pqTrain: per-subspace Lloyd reduces quantization distortion " +
      "round over round and is deterministic across repartitionings") {
    val m = 4
    def distortion(cb: org.apache.spark.sql.DataFrame): Double = {
      val cbMap = cb.as[(Int, Long, Seq[Double])].collect()
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3.toArray).toArray).toMap
      val codes = Similarity.pqEncode(emb, cb, m)
        .select($"id", $"pq_codes").as[(Long, Seq[Int])].collect().toMap
      val vecs = emb.as[(Long, Seq[Float])].collect().toMap
      codes.map { case (id, cs) =>
        val v = vecs(id).map(_.toDouble)
        cs.zipWithIndex.map { case (c, s) =>
          val sub = v.slice(s * v.length / m, (s + 1) * v.length / m)
          val cv = cbMap(s)(c)
          sub.zip(cv).map { case (a, b) => val t = a - b; t * t }.sum
        }.sum
      }.sum
    }
    val d1 = distortion(Similarity.pqTrain(emb, m, 8, iters = 1))
    val d3 = distortion(Similarity.pqTrain(emb, m, 8, iters = 3))
    assert(d3 <= d1 + 1e-9,
      s"Lloyd rounds must not increase distortion: $d1 -> $d3")
    // trained codebooks beat the arbitrary fixed exhibits
    val dFixed = distortion(Similarity.pqCodebooks(emb.where($"id" < 8), m))
    assert(d3 < dFixed, s"training worse than arbitrary seeds: $d3 vs $dFixed")
    // determinism
    val a = Similarity.pqTrain(emb, m, 8, 2)
      .as[(Int, Long, Seq[Double])].collect().sortBy(r => (r._1, r._2)).toSeq
    val b = Similarity.pqTrain(
        emb.repartition(11), m, 8, 2)
      .as[(Int, Long, Seq[Double])].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(a === b)
  }
}
