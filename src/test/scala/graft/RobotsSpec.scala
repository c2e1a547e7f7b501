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

  test("RobotsPathMatch: RFC 9309 wildcard goldens") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    def m(path: String, pat: String) =
      graft.functions.RobotsPathMatch.matches(u(path), u(pat))
    // the RFC 9309 §2.2.3 / Google reference examples
    assert(m("/fish.pdf", "/*.pdf$"))
    assert(m("/a/b/c.pdf", "/*.pdf$"))
    assert(!m("/a.pdfx", "/*.pdf$"))   // anchored: nothing after .pdf
    assert(!m("/a.pdf/b", "/*.pdf$"))
    assert(m("/publications", "/public*"))
    assert(m("/public", "/public*"))   // * matches empty
    assert(!m("/pub", "/public*"))
    assert(m("/fish", "/fish$"))
    assert(!m("/fishing", "/fish$"))
    assert(m("/fish/salmon", "/fish")) // plain prefix
    assert(m("/x/ok/deep", "/*/ok"))   // unanchored wildcard = prefix
    assert(m("/aXbYc", "/a*b*c$"))     // two stars, anchored
    assert(!m("/aXbYcZ", "/a*b*c$"))
    assert(m("/aXbYcZc", "/a*b*c$"))   // last star re-expands to 2nd c
    assert(m("/ab$x", "/ab$x"))        // mid-pattern $ is literal
    assert(m("anything", ""))          // empty pattern matches all
    assert(!m("/x", "$"))              // bare $ matches only the empty path
    assert(m("", "$"))
    assert(m("/abc", "/a**c$"))        // adjacent stars collapse
    assert(m("/ab", "/a*$"))           // trailing star then anchor
    assert(m("/a", "/a*$"))
    assert(m("/", "/*$"))              // bare '/*$': any path under /
    assert(m("/any/depth", "/*$"))
    assert(!m("x", "/*$"))             // ...but it must START with /
    assert(m("/a*b", "/a*b"))          // literal * in the PATH still matches
    // $ against QUERY-SUFFIXED paths — the q161 frontier feeds paths
    // WITH their query strings, so an anchored rule must distinguish
    // '/x.php' (ends there: matched) from '/x.php?y=1' (doesn't: the
    // anchor fails; only the unanchored or explicitly-wildcarded rule
    // catches it). A matcher that strips queries before matching would
    // over-block every parameterized URL of an anchored rule.
    assert(m("/x.php", "/*.php$"))
    assert(!m("/x.php?y=1", "/*.php$"))
    assert(m("/x.php?y=1", "/*.php"))      // unanchored prefix-after-*
    assert(m("/x.php?y=1", "/*.php*"))
    assert(m("/x.php?y=1", "/*?y=1$"))     // anchor on the QUERY itself
    assert(!m("/x.php?y=12", "/*?y=1$"))
  }

  test("RobotsPathMatch agrees with a regex reference on random " +
      "path/pattern pairs") {
    // reference: translate the rule to an anchored-prefix regex exactly
    // per the RFC reading ('*' -> '.*', trailing '$' -> end anchor)
    def ref(path: String, pat: String): Boolean = {
      val anchored = pat.endsWith("$")
      val core = (if (anchored) pat.dropRight(1) else pat)
        .map {
          case '*' => ".*"
          case c if "\\.[]{}()+-?^$|".contains(c) => "\\" + c
          case c => c.toString
        }.mkString
      val rx = ("^" + core + (if (anchored) "$" else ".*")).r
      rx.pattern.matcher(path).matches()
    }
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    val rnd = new scala.util.Random(9309)
    val alphabet = "ab/.p$*"
    def randStr(maxLen: Int): String =
      (0 until rnd.nextInt(maxLen + 1))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    var checked = 0
    for (_ <- 0 until 20000) {
      val path = randStr(10)
      val pat = randStr(8)
      // the reference regex treats mid-pattern '$' as literal only if
      // we escape it — which the translation above does — so ALL pairs
      // are comparable
      val got = graft.functions.RobotsPathMatch.matches(u(path), u(pat))
      assert(got === ref(path, pat),
        s"path='$path' pattern='$pat' got=$got expected=${ref(path, pat)}")
      checked += 1
    }
    assert(checked === 20000)
  }

  test("wildcard rules end-to-end: specificity counts the pattern as " +
      "written; BOM-prefixed files parse; tie goes to allow") {
    val robots = "\uFEFF" +
      """User-agent: graftbot
        |Disallow: /*.pdf$
        |Allow: /public*
        |Disallow: /private
        |""".stripMargin
    assert(decide(robots, Seq(
      "/docs/x.pdf",      // anchored wildcard disallow
      "/docs/x.pdfy",     // anchor fails -> no rule -> allow
      "/public/file.pdf", // Allow len 8 beats Disallow len 7
      "/private/p",       // literal disallow
      "/x")) === Seq(false, true, true, false, true))
    // the BOM must not break the FIRST directive: without the strip the
    // whole specific group would vanish and '*'-group/empty rules apply
    val bomOnly = "\uFEFF" +
      """User-agent: graftbot
        |Disallow: /
        |""".stripMargin
    assert(decide(bomOnly, Seq("/x")) === Seq(false))
    // wildcard-vs-literal exact-length tie: allow wins
    val tie =
      """User-agent: graftbot
        |Disallow: /a*c
        |Allow: /abcd
        |""".stripMargin
    // '/abcd': Disallow /a*c matches (len 4), Allow /abcd matches
    // (len 5) -> allow by length; '/aXc' only the wildcard -> disallow
    assert(decide(tie, Seq("/abcd", "/aXc")) === Seq(true, false))
  }

  test("synthWildcardRobots round-trips: per-domain wildcard decisions " +
      "match the hand-derived RFC contract") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val robots = RobotsOps.parseRobots(
      RobotsOps.synthWildcardRobots(docs, "doc_id"), "robots_txt",
      "graftbot")
    val urls = docs.select($"doc_id",
      pmod($"doc_id", lit(12)).as("domain_id"),
      element_at(array(lit("/docs/x.pdf"), lit("/docs/x.pdfy"),
        lit("/public/file.pdf"), lit("/private/p"), lit("/x/ok"),
        lit("/p"), lit("/aXbYc"), lit("/aXbYcZ")),
        (pmod($"doc_id", lit(8)) + 1).cast("int")).as("path"))
    val got = urls.join(broadcast(robots), Seq("domain_id"))
      .select($"doc_id", $"domain_id", $"path",
        RobotsOps.isAllowed($"robots_rules", $"path").as("allowed"))
    val d3 = pmod($"domain_id", lit(3))
    val u = pmod($"doc_id", lit(8))
    val expected =
      when(d3 === 0, u =!= 0 && u =!= 3)
        .when(d3 === 1, u === 4 || u === 5)
        .otherwise(u =!= 6)
    val bad = got.where($"allowed" =!= expected)
    assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
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
