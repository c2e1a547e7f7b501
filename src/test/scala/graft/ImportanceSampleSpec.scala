package graft

import org.apache.spark.sql.functions._

/** DSIR-style importance resampling (Downsample.importanceSample):
  * membership properties that hold for ANY hash outcome, plus the
  * refinability contract the Scaladoc promises. */
class ImportanceSampleSpec extends SparkSpec {
  import spark.implicits._

  private def weighted = (1L to 400L).map(i => (i, i % 97))
    .toDF("id", "w")

  test("max-weight rows are always kept; zero-weight rows never") {
    val kept = graft.operators.Downsample
      .importanceSample(weighted, "id", "w")
      .select("id", "rate_bp").as[(Long, Long)].collect().toMap
    // w = 96 is the max -> rate_bp = 10000 -> bucket < 10000 always true
    val maxIds = (1L to 400L).filter(_ % 97 == 96)
    assert(maxIds.forall(kept.contains),
      s"missing max-weight ids: ${maxIds.filterNot(kept.contains)}")
    assert(maxIds.forall(kept(_) == 10000L))
    // w = 0 -> rate_bp = 0 -> bucket < 0 impossible
    assert((1L to 400L).filter(_ % 97 == 0).forall(!kept.contains(_)))
  }

  test("deterministic and refinable: lower maxBps keeps a strict subset") {
    val at10000 = graft.operators.Downsample
      .importanceSample(weighted, "id", "w").select("id")
      .as[Long].collect().toSet
    val again = graft.operators.Downsample
      .importanceSample(weighted, "id", "w").select("id")
      .as[Long].collect().toSet
    assert(at10000 === again) // pure function of ids
    val at4000 = graft.operators.Downsample
      .importanceSample(weighted, "id", "w", maxBps = 4000).select("id")
      .as[Long].collect().toSet
    assert(at4000.subsetOf(at10000))
    assert(at4000.size < at10000.size) // strictly fewer at 0.4x the rate
  }

  test("weight * maxBps overflow fails loudly under ANSI, never wraps") {
    // the Scaladoc's loud-failure claim, executed: a weight near
    // Long.MaxValue overflows the BIGINT multiply; ANSI mode must throw,
    // because a silent wrap yields a NEGATIVE rate_bp and the row set
    // quietly collapses instead of erroring
    val big = Seq((1L, Long.MaxValue / 2), (2L, 10L)).toDF("id", "w")
    val e = intercept[ArithmeticException] { // SparkArithmeticException
      graft.operators.Downsample.importanceSample(big, "id", "w").count()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("overflow"), msg.take(500))
    // the boundary itself is safe: max legal weight with maxBps=10000
    // stays inside BIGINT
    val boundary = Seq((1L, Long.MaxValue / 10000), (2L, 10L)).toDF("id", "w")
    graft.operators.Downsample.importanceSample(boundary, "id", "w").count()
  }

  test("keep rate tracks the weight: top-decile docs kept more often than bottom") {
    val kept = graft.operators.Downsample
      .importanceSample(weighted, "id", "w").select("id")
      .as[Long].collect().toSet
    def rate(p: Long => Boolean) = {
      val ids = (1L to 400L).filter(p)
      ids.count(kept).toDouble / ids.size
    }
    assert(rate(i => i % 97 >= 87) > rate(i => i % 97 <= 9))
  }
}
