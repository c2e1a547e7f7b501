package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — prints ONE compact JSON line as the LAST stdout line.
  *
  * CORE-COUNT CONTRACT: `$SPARK_GRAFT_CPUS` (default 4) sets BOTH the
  * local master (`local[$cpus]`) and, via Graft.configure, the shuffle
  * partition count — the driver re-runs this main at a lower core
  * count to measure scaling. At sf0.1 the suite is per-job
  * SCHEDULING-bound (per-stage task count scales with partitions =
  * cores, so 8 cores ≈ 32 — the r19 finding; the driver's
  * `suspect_cpus_ignored` heuristic misreads that as the env var being
  * ignored). The env var IS honored; the demonstration that compute
  * scales with cores lives at a scale factor whose tasks are full:
  * SCALING.md "r20 core-count scaling exhibit" records the sf1.0
  * low-vs-high-core pairs (QuickBench honors the same env contract).
  *
  * Driver-parseability (the round-1/2 lesson): sbt defers the program's
  * stderr and re-emits it `[error]`-tagged at task end, AFTER stdout — so
  * anything this main writes to stderr lands between the JSON line and the
  * end of the captured output, and a multi-kB all-85-query JSON gets its
  * head cut by the driver's 2,000-char tail window. Hence:
  *  - the per-query human report (seconds, rows/s, shuffle bytes) goes to
  *    target/bench_report.txt, NOT stderr;
  *  - the full per-query JSON goes to target/bench_full.json;
  *  - stdout carries one ~700-char line: total seconds over ALL queries
  *    (comparable with BASELINE.md's recorded rounds) + a fixed headline
  *    subset of per-query seconds, 3-decimal precision.
  */
object Bench {

  /** Representative heavy/shuffle-diverse queries: joins, aggs, windows,
    * sessions, dedup, ANN, text, funnel — the ones whose plans carry the
    * 100 TB scale argument. Includes the three most expensive queries in
    * the full report (q35 all-pairs oracle exhibit, q34 pairwise Jaccard,
    * q91 iterative connected components) so round-over-round regression
    * in the costliest plans is visible in the headline, not just in
    * target/bench_full.json. Kept small so the JSON line survives a
    * 2,000-char tail capture. */
  private val headline = Seq(
    "q15_agg_groupby", "q20_sql_passthrough", "q32_minhash_lsh_candidates",
    "q34_ngram_jaccard", "q35_embedding_neardup", "q36_ann_bruteforce",
    "q43_sessionize", "q46_deep_join_tree", "q57_word_freq", "q60_ann_ivf",
    "q61_count_histogram", "q85_curation_funnel", "q88_fuzzy_match",
    "q91_dup_groups", "q101_contamination")

  /** Merge the two measured runs into (name, sec, rows, rows1, rows2).
    * Failure (rows == -1) must stay visible: taking max(rows) with
    * min(sec) would report a transiently-failed run's short abort time as
    * the query's time and hide the failure entirely. Any failed run marks
    * the query failed; sec is the min over SUCCESSFUL runs (or of the
    * failed ones when both failed). rows == -2 marks both runs succeeding
    * with DIFFERENT counts (a nondeterministic query) — never silently
    * prefer run 2's count over run 1's. Extracted from main() and unit-
    * tested in BenchReportSpec: round 7 shipped a formatting-path edit
    * that didn't compile because nothing off the main() path executed it. */
  private[graft] def mergeRuns(
      run1: Seq[(String, Double, Long)],
      run2: Seq[(String, Double, Long)]): Seq[(String, Double, Long, Long, Long)] =
    run1.zip(run2).map { case ((name, s1, r1), (_, s2, r2)) =>
      val okSecs = Seq((s1, r1), (s2, r2)).collect { case (s, r) if r >= 0 => s }
      val sec = if (okSecs.nonEmpty) okSecs.min else math.min(s1, s2)
      val rows =
        if (r1 >= 0 && r2 >= 0) { if (r1 == r2) r2 else -2L } else -1L
      (name, sec, rows, r1, r2)
    }

  /** Which run's shuffle bytes to report and how to label them: run 2 is
    * steady state; a failed run's partial bytes must never masquerade as
    * a measurement, so fall back (labelled) to run 1, and when both runs
    * failed say so instead of implying run 1 succeeded. */
  private[graft] def bytesSource(name: String, r1: Long, r2: Long): (String, String) =
    if (r2 >= 0) (s"$name#2", "")
    else if (r1 >= 0) (s"$name#1", " (run1: run2 failed)")
    else (s"$name#1", " (both runs failed; bytes are partial)")

  private[graft] def reportLine(name: String, sec: Double, rows: Long,
                                r1: Long, r2: Long, bytes: Long,
                                bytesLabel: String): String = {
    val rps = if (sec > 0 && rows >= 0) f"${rows / sec}%.0f" else "?"
    val flag = if (rows == -2L) s" ROWS-MISMATCH(run1=$r1,run2=$r2)" else ""
    s"[bench] $name ${f"$sec%.3f"}s rows=$rows rows/s=$rps shuffleWrite=${bytes}B$bytesLabel$flag"
  }

  // Locale.ROOT: the f-interpolator uses the default locale — a
  // comma-decimal locale would emit {"value":12,345} and break the JSON
  private def d3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
  private def jq(entries: Seq[(String, Double)]): String = entries
    .map { case (k, v) => "\"" + k + "\":" + d3(v) }.mkString("{", ",", "}")

  private[graft] def resultsJson(results: Seq[(String, Double, Long, Long, Long)],
                                 sfDir: String,
                                 onlyHeadline: Boolean,
                                 sentinels: Seq[(String, Double)] = Nil): String = {
    val total = results.map(_._2).sum
    val qs = results.collect {
      case (n, s, _, _, _) if !onlyHeadline || headline.contains(n) => n -> s
    }
    // interleaved-sentinel attribution (full JSON only — the stdout
    // headline stays the unchanged driver contract): per-sentinel
    // max/min across the in-run checkpoints. Flat spreads (~1.0) with
    // hot mid-band queries = code-visible cause; drifting spreads =
    // ambient load proven INSIDE the same artifact that shows the hot
    // queries — the r16/r17 driver-window question, self-attributed.
    val sent = if (sentinels.isEmpty) "" else {
      def spreadOf(xs: Seq[(String, Double)]) = xs
        .groupBy(_._1.takeWhile(_ != '@')).toSeq.sortBy(_._1)
        .map { case (q, ys) =>
          val ts = ys.map(_._2)
          q -> (if (ts.nonEmpty && ts.min > 0) ts.max / ts.min else 0.0)
        }
      // raw spread includes @r1p0 (the first sf-dir execution — codegen
      // warmup, systematically hot) and @*p100 (suite-end GC pressure);
      // the STEADY spread over r2's mid-suite checkpoints is the fair
      // window-heat signal: ~1.0-1.3 quiet, 2x+ contended (measured:
      // r18c quiet 1.06-1.29 vs r18b git-gc-contended 1.4-4x)
      val steady = spreadOf(sentinels.filter(s =>
        Seq("@r2p25", "@r2p50", "@r2p75").exists(s._1.endsWith)))
      // the STEADY spread also rides in the stdout headline (r18
      // verdict task: the driver's own artifact could not self-
      // attribute its window — three rounds of hot driver readings all
      // had to be bracketed locally). One additive field; the headline
      // contract (metric/value/unit/queries/sf) is unchanged.
      if (onlyHeadline) s""","sentinel_spread_steady":${jq(steady)}"""
      else s""","sentinels":${jq(sentinels)},"sentinel_spread":${
        jq(spreadOf(sentinels))},"sentinel_spread_steady":${jq(steady)}"""
    }
    s"""{"metric":"total","value":${d3(total)},"unit":"sec","queries":${
      jq(qs)},"sf":"$sfDir"$sent}"""
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Graft.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    // ERROR, not WARN: late WARN lines on deferred stderr would trail the
    // JSON in the driver's capture window
    spark.sparkContext.setLogLevel("ERROR")
    // Warmup: one tiny pass over every query at the smallest sf amortizes
    // JVM/JIT/codegen + parquet footer reads out of the measured numbers, so
    // per-query seconds reflect steady-state execution, not first-touch.
    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }
    // shuffle accounting per query (report file only): a query whose shuffle
    // bytes balloon between rounds regressed its plan even if wall-clock
    // noise hides it. Listener events are ASYNC, so attribution is by job
    // group (stage -> job -> group), and the report prints after a drain
    // pause — sampling a counter inline would credit late stages to the
    // wrong query.
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
    // Measured loop runs TWICE and each query reports the per-query MIN of
    // the two runs (JSON contract unchanged). One measured run made every
    // round's number hostage to machine contention during the driver's
    // bench window — r5 read 2.05x r4 on untouched code. Min-of-2 absorbs
    // one-sided noise (contention only ever adds time). This also settles
    // the q36 variance question (0.49 -> 1.60 -> 3.73 s over three rounds
    // on an unchanged plan): the sf0.001 warmup pass plans tiny inputs, so
    // AQE/broadcast decisions and the codegen it compiles are not the ones
    // the sf0.1 run takes — run 1 at the bench sf is the true warmup for
    // those paths, and run 2's time is steady-state.
    // Interleaved SENTINELS (r17 verdict task): q15/q20/q46 re-measured
    // at 0/25/50/75/100% of each measured run, accounted SEPARATELY
    // (never in results/total — the stdout contract and BASELINE
    // comparability are unchanged). If the driver's window runs hot,
    // these either drift with it (ambient proven inside the artifact)
    // or stay flat while mid-band queries read hot (code-visible cause).
    val sentinelNames = Seq(
      "q15_agg_groupby", "q20_sql_passthrough", "q46_deep_join_tree")
    val sentinelTimes = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def runSentinels(run: Int, pct: Int): Unit = sentinelNames.foreach { name =>
      spark.sparkContext.setJobGroup("sentinel", name)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case _: Throwable => () }
      sentinelTimes += s"$name@r${run}p$pct" ->
        (System.nanoTime() - t0) / 1e9
      spark.sparkContext.clearJobGroup()
      spark.sharedState.cacheManager.clearCache()
    }
    val ordered = SparkEntry.queries.toSeq.sortBy(_._1)
    val nQ = ordered.size
    val marks = Map(nQ / 4 -> 25, nQ / 2 -> 50, 3 * nQ / 4 -> 75)
    val runs = (1 to 2).map { run =>
      runSentinels(run, 0)
      val rs = ordered.zipWithIndex.map { case ((name, fn), idx) =>
        spark.sparkContext.setJobGroup(s"$name#$run", name)
        val t0 = System.nanoTime()
        val rows = try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
        val sec = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.clearJobGroup()
        // queries that persist internally (q120/q122/q126's
        // persistIntermediate) register session-owned cache entries that
        // run 2's IDENTICAL plan would read — min-of-2 would then report
        // a cache-read time no other query gets, and the corpus-sized
        // blocks would stay resident across the remaining ~120 queries
        // (eviction churn perturbing unrelated timings). Clearing per
        // query keeps every measurement self-contained: run 2 still
        // re-materializes once and reads its own cache 3x within the
        // query — the operator's real win — but never run 1's.
        spark.sharedState.cacheManager.clearCache()
        marks.get(idx + 1).foreach(pct => runSentinels(run, pct))
        (name, sec, rows)
      }
      runSentinels(run, 100)
      rs
    }
    val results = mergeRuns(runs.head, runs.last)
    Thread.sleep(1000) // best-effort drain of the async listener bus

    val report = new StringBuilder
    results.foreach { case (name, sec, rows, r1, r2) =>
      // shuffle bytes from run 2 (steady state; identical plan -> identical
      // bytes unless AQE re-planned between runs, which is itself notable)
      val (bGroup, bSrc) = bytesSource(name, r1, r2)
      val b = Option(groupBytes.get(bGroup)).map(_.get()).getOrElse(0L)
      report ++= reportLine(name, sec, rows, r1, r2, b, bSrc) + "\n"
    }
    // stages without a job group (e.g. broadcast builds on pool threads)
    // land here — surfaced so under-reporting above is visible
    Option(groupBytes.get("?")).map(_.get()).filter(_ > 0).foreach(b =>
      report ++= s"[bench] (unattributed) shuffleWrite=${b}B\n")

    // q82's oracle gate verdicts approx_median inside the exact p25..p75
    // band — wide enough to be partition-independent, wide enough to hide
    // slow sketch drift too. Surface the raw |approx − exact| here, NON-
    // gating (never part of the oracle hash), so round-over-round reports
    // show the actual error trend. worst/mean are across event_type groups.
    try {
      import org.apache.spark.sql.functions.{abs => fabs, _}
      val d = graft.sources.Sources.events(spark, sfDir)
        .groupBy(col("event_type"))
        .agg(fabs(percentile_approx(col("value"), lit(0.5), lit(10000))
          - percentile(col("value"), lit(0.5))).as("drift"))
        .agg(max(col("drift")), avg(col("drift"))).head()
      report ++= f"[bench] q82_sketch_drift worst=${d.getDouble(0)}%.6f " +
        f"mean=${d.getDouble(1)}%.6f (|approx_median - exact_median|, non-gating)\n"
    } catch { case e: Throwable =>
      report ++= s"[bench] q82_sketch_drift unavailable: ${e.getMessage}\n"
    }

    val fullJson =
      resultsJson(results, sfDir, onlyHeadline = false, sentinelTimes.toSeq)
    val headlineJson =
      resultsJson(results, sfDir, onlyHeadline = true, sentinelTimes.toSeq)

    val dir = java.nio.file.Paths.get("target")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.writeString(dir.resolve("bench_report.txt"), report.toString)
    java.nio.file.Files.writeString(dir.resolve("bench_full.json"), fullJson + "\n")
    spark.stop()
    // the one contract line, last on stdout, after spark shutdown noise
    println(headlineJson)
  }
}
