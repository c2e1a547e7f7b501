package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: one tiny pass over every query at the smallest sf amortizes
    // JVM/JIT/codegen + parquet footer reads out of the measured numbers, so
    // per-query seconds reflect steady-state execution, not first-touch.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // shuffle accounting per query (stderr only — stdout stays the one
    // contract JSON line): a query whose shuffle bytes balloon between
    // rounds regressed its plan even if wall-clock noise hides it.
    // Listener events are ASYNC, so attribution is by job group (stage ->
    // job -> group), and the report prints after a drain pause — sampling a
    // counter inline would credit late stages to the wrong query.
    val stageToGroup = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val groupBytes = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          val group = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).getOrElse("?")
          j.stageIds.foreach(sid => stageToGroup.put(sid, group))
        }
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val group = stageToGroup.getOrDefault(sc.stageInfo.stageId, "?")
          groupBytes.computeIfAbsent(group,
            _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
      })
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      spark.sparkContext.setJobGroup(name, name)
      val t0 = System.nanoTime()
      val rows = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      (name, sec, rows)
    }
    Thread.sleep(1000) // best-effort drain of the async listener bus
    results.foreach { case (name, sec, rows) =>
      val b = Option(groupBytes.get(name)).map(_.get()).getOrElse(0L)
      val rps = if (sec > 0 && rows >= 0) f"${rows / sec}%.0f" else "?"
      System.err.println(
        s"[bench] $name ${f"$sec%.3f"}s rows=$rows rows/s=$rps shuffleWrite=${b}B")
    }
    // stages without a job group (e.g. broadcast builds on pool threads)
    // land here — surfaced so under-reporting above is visible
    Option(groupBytes.get("?")).map(_.get()).filter(_ > 0).foreach(b =>
      System.err.println(s"[bench] (unattributed) shuffleWrite=${b}B"))
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
