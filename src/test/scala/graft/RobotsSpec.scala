package graft

import org.apache.spark.sql.functions._

import graft.text.RobotsOps

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private def decide(robots: String, paths: Seq[String],
                     agent: String = "graftbot"): Seq[Boolean] = {
    val rules = RobotsOps.parseRobots(
      Seq((1L, robots)).toDF("id", "robots_txt"), "robots_txt", agent)
    val paired = rules.crossJoin(
      paths.zipWithIndex.map { case (p, i) => (i, p) }.toDF("ord", "path"))
    paired
      .select($"ord", RobotsOps.isAllowed($"robots_rules", $"path")
        .as("allowed"))
      .as[(Int, Boolean)].collect().sortBy(_._1).map(_._2).toSeq
  }

  test("parseRobots + isAllowed: groups, precedence, longest match, " +
      "comments, case, empty values") {
    val robots =
      """# comment line
        |User-agent: OtherBot
        |Disallow: /
        |
        |User-Agent: GraftBot   # header with comment
        |Disallow: /private
        |Allow: /private/ok
        |Disallow: /tmp
        |
        |User-agent: *
        |Disallow: /blocked
        |""".stripMargin
    assert(decide(robots, Seq(
      "/",            // no rule matches -> allow
      "/private",     // disallowed
      "/private/x",   // prefix of the disallow -> disallowed
      "/private/ok",  // longer allow wins
      "/private/ok/deep", // still the allow
      "/tmp/file",    // disallowed
      "/blocked"      // the * group does NOT apply (specific group exists)
    )) === Seq(true, false, false, true, true, false, true))
    // an agent with NO specific group falls to '*'
    assert(decide(robots, Seq("/blocked", "/private"), agent = "nobody")
      === Seq(false, true))
  }

  test("specific group that is EMPTY still shields from '*'; empty " +
      "Disallow value is allow-all; no robots at all allows") {
    val robots =
      """User-agent: graftbot
        |Disallow:
        |
        |User-agent: *
        |Disallow: /
        |""".stripMargin
    assert(decide(robots, Seq("/", "/anything")) === Seq(true, true))
    assert(decide("", Seq("/x")) === Seq(true))
    // NULL rules column (e.g. domain had no robots row after a left join)
    val nullRules = Seq((1L, "/x")).toDF("id", "path")
      .select(RobotsOps.isAllowed(lit(null)
        .cast("array<struct<allow:boolean,prefix:string>>"), $"path"))
      .as[Boolean].head()
    assert(nullRules)
  }

  test("consecutive User-agent headers share one group; allow wins " +
      "exact-length ties") {
    val robots =
      """User-agent: graftbot
        |User-agent: otherbot
        |Disallow: /shared
        |Allow: /shared
        |""".stripMargin
    // both rules match '/shared' at equal length: allow wins the tie
    assert(decide(robots, Seq("/shared", "/shared/x", "/other"))
      === Seq(true, true, true))
  }

  test("parseRobots/isAllowed never throw under truncation + corruption " +
      "fuzz; decisions stay boolean") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 40).select($"doc_id")
    val fam = RobotsOps.synthRobots(docs, "doc_id")
      .withColumnRenamed("domain_id", "media_id")
    val truncated = fam.select($"media_id",
      explode(sequence(lit(0), length($"robots_txt"), lit(5))).as("k"))
      .join(fam, Seq("media_id"))
      .select($"media_id",
        expr("substring(robots_txt, 1, k)").as("robots_txt"))
    val corrupted = Seq(":", "#", "\n").map { c =>
      fam.select($"media_id",
        concat(
          expr("substring(robots_txt, 1, " +
            "pmod(media_id * 31, length(robots_txt)))"),
          lit(c),
          expr("substring(robots_txt, " +
            "pmod(media_id * 31, length(robots_txt)) + 2, " +
            "2147483647)")).as("robots_txt"))
    }.reduce(_ unionAll _)
    for (mutated <- Seq(truncated, corrupted)) {
      val nIn = mutated.count()
      val out = RobotsOps.parseRobots(mutated, "robots_txt", "graftbot")
        .select($"media_id",
          RobotsOps.isAllowed($"robots_rules", lit("/private/ok/x"))
            .as("a1"),
          RobotsOps.isAllowed($"robots_rules", lit("/")).as("a2"))
      val n = out.where($"a1".isNotNull && $"a2".isNotNull).count()
      assert(n === nIn)
    }
  }

  test("synthRobots round-trips: per-domain decisions match the " +
      "id-arithmetic contract") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val robots = RobotsOps.parseRobots(
      RobotsOps.synthRobots(docs, "doc_id"), "robots_txt", "graftbot")
    val urls = docs.select($"doc_id",
      pmod($"doc_id", lit(20)).as("domain_id"),
      element_at(array(lit("/"), lit("/p5"), lit("/private"),
        lit("/private/ok/x"), lit("/blocked"), lit("/q")),
        (pmod($"doc_id", lit(6)) + 1).cast("int")).as("path"))
    val got = urls.join(broadcast(robots), Seq("domain_id"))
      .select($"doc_id", $"domain_id", $"path",
        RobotsOps.isAllowed($"robots_rules", $"path").as("allowed"))
    val d3 = pmod($"domain_id", lit(3))
    val u = pmod($"doc_id", lit(6))
    val expected =
      when(d3 === 0, !(u === 2)) // only /private blocked (ok carveout)
        .when(d3 === 1, u === 1 || u === 2 || u === 3) // '/p' prefix wins
        .otherwise(lit(true)) // empty specific group: all allowed
    val bad = got.where($"allowed" =!= expected)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
  }
}
