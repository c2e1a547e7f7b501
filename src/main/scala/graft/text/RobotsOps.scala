package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing + allow/deny URL filtering — the crawl-politeness
  * layer a curation pipeline applies before (or audits after) fetching:
  * per-domain robots rules are parsed ONCE into a rules array, broadcast
  * onto the URL table by registrable domain, and each URL's path gets
  * the LONGEST-PREFIX-MATCH decision (the REP rule Google/Bing apply;
  * allow wins exact-length ties). Expression-only — the parse is one
  * bounded fold over the file's lines, the decision one fold over the
  * rules array — so both run at scan speed with zero UDFs.
  *
  * Grammar handled (RFC 9309 core): `User-agent` group headers
  * (consecutive headers share one group; matching is case-insensitive;
  * a group for OUR agent beats the `*` group — when a specific group
  * exists, `*` rules do NOT apply, even if the specific group is empty,
  * which means allow-everything), `Allow` / `Disallow` rules with
  * path-prefix matching, `#` comments, blank-line tolerance. An empty
  * rule value (`Disallow:` alone = allow all, per spec) contributes no
  * rule. Wildcards per RFC 9309 §2.2.3: `*` in a rule path matches any
  * character sequence and a trailing `$` anchors the match to the path
  * end (`Disallow: /&#42;.pdf$`, `Allow: /public*` — the ubiquitous real-
  * world shapes), via the native [[graft.functions.RobotsPathMatch]]
  * expression; rules with no wildcard keep the plain `startswith` fast
  * path. Specificity for longest-match is the RULE PATH's length
  * including wildcard characters (the REP-draft/Google rule). A leading
  * UTF-8 BOM is stripped (RFC 9309 §2.3). Unknown directives
  * (Crawl-delay, Sitemap) are skipped. Malformed input degrades to
  * fewer rules, never a throw; no robots.txt at all = everything
  * allowed — the crawl default. */
object RobotsOps {

  /** Append `robots_rules`: array<struct<allow boolean, prefix string>>
    * — the rule set governing `agent` (lowercase) per the group-selection
    * semantics above. */
  def parseRobots(df: DataFrame, robotsCol: String, agent: String,
                  // RFC 9309 §2.4 requires parsers to process at least
                  // 500 KiB; real Disallow lists run thousands of lines
                  // and a low cap silently DROPS rules — i.e. wrong
                  // allow decisions, not just missing metadata. 16384
                  // lines ≈ the 500 KiB mark at typical rule lengths;
                  // the fold runs once per DOMAIN, so the cap is not a
                  // per-URL cost.
                  maxLines: Int = 16384,
                  outCol: String = "robots_rules"): DataFrame = {
    require(agent.nonEmpty && agent == agent.toLowerCase,
      s"agent must be non-empty lowercase, got '$agent'")
    require(maxLines >= 1 && maxLines <= 100000, s"maxLines: $maxLines")
    Seq(outCol, "__rb_lines").foreach(c =>
      require(!df.columns.contains(c),
        s"RobotsOps.parseRobots: df already has a '$c' column — rename " +
          "it first; parseRobots appends its own"))
    // one fold over the lines; state: open = the previous line was a
    // User-agent header (consecutive headers share a group), in_s/in_g =
    // the CURRENT group names our agent / '*', sf = a specific group was
    // ever seen, spec/star = the accumulated rule arrays
    // UTF-8 BOM strip: a robots.txt stored with a leading BOM (common —
    // Windows editors) would otherwise glue U+FEFF onto the first
    // directive and make `User-agent:` unmatchable (RFC 9309 §2.3 says
    // to tolerate the BOM)
    val bom = "\uFEFF"
    val fold = expr(s"""
      aggregate(
        slice(split(trim(LEADING '$bom' FROM
            CAST(`$robotsCol` AS STRING)), '\\r?\\n'),
          1, $maxLines),
        named_struct('open', false, 'in_s', false, 'in_g', false,
          'sf', false,
          'spec', CAST(array() AS ARRAY<STRUCT<allow: BOOLEAN,
            prefix: STRING>>),
          'star', CAST(array() AS ARRAY<STRUCT<allow: BOOLEAN,
            prefix: STRING>>)),
        (st, raw) -> element_at(transform(
          -- let-bind the comment-stripped, trimmed line and its value
          array(named_struct(
            'l', lower(trim(element_at(split(raw, '#'), 1))),
            'v', trim(substring(element_at(split(raw, '#'), 1),
              instr(element_at(split(raw, '#'), 1), ':') + 1)))),
          t -> CASE
            WHEN startswith(t.l, 'user-agent:') THEN named_struct(
              'open', true,
              'in_s', (st.open AND st.in_s) OR lower(t.v) = '$agent',
              'in_g', (st.open AND st.in_g) OR t.v = '*',
              'sf', st.sf OR lower(t.v) = '$agent',
              'spec', st.spec, 'star', st.star)
            WHEN (startswith(t.l, 'allow:')
                  OR startswith(t.l, 'disallow:'))
                 AND t.v <> '' THEN named_struct(
              'open', false, 'in_s', st.in_s, 'in_g', st.in_g,
              'sf', st.sf,
              'spec', CASE WHEN st.in_s THEN concat(st.spec,
                array(named_struct('allow', startswith(t.l, 'allow:'),
                  'prefix', t.v))) ELSE st.spec END,
              'star', CASE WHEN st.in_g THEN concat(st.star,
                array(named_struct('allow', startswith(t.l, 'allow:'),
                  'prefix', t.v))) ELSE st.star END)
            WHEN startswith(t.l, 'allow:')
                 OR startswith(t.l, 'disallow:') THEN named_struct(
              -- empty rule value: no rule, but it DOES close the header
              -- run (the group's rule section has started)
              'open', false, 'in_s', st.in_s, 'in_g', st.in_g,
              'sf', st.sf, 'spec', st.spec, 'star', st.star)
            ELSE st
          END), 1),
        st -> CASE WHEN st.sf THEN st.spec ELSE st.star END)""")
    df.withColumn(outCol, fold)
  }

  /** Longest-match decision for `path` against a [[parseRobots]] rules
    * array: the matching rule with the longest rule path (wildcards
    * counted as written — the REP specificity rule) wins; allow wins
    * exact-length ties; no match (or a NULL / absent rule set) =
    * allowed. A rule containing `*` (or anchored with a trailing `$`)
    * matches per RFC 9309 §2.2.3 via [[graft.functions.RobotsPathMatch]];
    * wildcard-free rules — the overwhelming majority in real robots
    * files — stay on the codegen'd `startswith` fast path. */
  def isAllowed(rules: Column, path: Column): Column = {
    graft.functions.RobotsPathMatch.register(
      org.apache.spark.sql.SparkSession.active)
    def ruleMatches(r: Column): Column = {
      val p = r.getField("prefix")
      when(p.contains("*") || p.endsWith("$"),
        call_function("robots_path_match", path, p))
        .otherwise(startswith(path, p))
    }
    val dec = aggregate(
      coalesce(rules, expr(
        "CAST(array() AS ARRAY<STRUCT<allow: BOOLEAN, prefix: STRING>>)")),
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (st, r) => when(
        ruleMatches(r) &&
          (length(r.getField("prefix")) > st.getField("len") ||
            (length(r.getField("prefix")) === st.getField("len") &&
              r.getField("allow"))),
        struct(length(r.getField("prefix")).as("len"),
          r.getField("allow").as("allow")))
        .otherwise(st),
      st => st.getField("allow"))
    coalesce(dec, lit(true))
  }

  /** Deterministic robots.txt exhibits per DOMAIN (one row per distinct
    * pmod-20 domain of the id column) — the test/demo source for
    * [[parseRobots]], covering the selection semantics: a decoy
    * `otherbot` group that disallows everything (must never apply), a
    * `graftbot` group whose shape cycles by domain (Disallow+-more-
    * specific-Allow / Disallow-all-with-Allow-carveout / EMPTY group —
    * which means allow-everything AND shields the domain from `*`), and
    * a trailing `*` group with its own rule that must apply to nobody
    * here (every domain has a graftbot group). Comment and blank-line
    * noise included. */
  def synthRobots(docs: DataFrame, idCol: String): DataFrame = {
    val doms = docs.select(pmod(col(idCol), lit(20)).as("domain_id"))
      .distinct()
    val d3 = pmod(col("domain_id"), lit(3))
    val body = concat(
      lit("# synthetic robots.txt\n"),
      lit("User-agent: otherbot\nDisallow: /\n\n"),
      lit("User-agent: GraftBot\n"),
      when(d3 === 0, "Disallow: /private\nAllow: /private/ok\n")
        .when(d3 === 1, "Disallow: /\nAllow: /p\n")
        .otherwise("Disallow:\n"), // empty value: allow-everything group
      lit("\nUser-agent: *\nDisallow: /blocked\n"))
    doms.select(col("domain_id"), body.as("robots_txt"))
  }

  /** Deterministic WILDCARD robots.txt exhibits per domain (one row per
    * distinct pmod-12 domain of the id column) — the test/demo source
    * for the RFC 9309 `*`/`$` semantics, BOM-prefixed (every file) so
    * the BOM-tolerance path is exercised on the whole corpus. Three
    * rule-set shapes by domain: (0) an anchored extension block
    * `Disallow: /&#42;.pdf$` beaten by a LONGER `Allow: /public*` on paths
    * matching both (the specificity tie-break that bites in practice),
    * plus a literal `/private` disallow; (1) Disallow-all with a
    * mid-pattern wildcard carve-out `Allow: /&#42;/ok` and an ANCHORED
    * exact-path allow `Allow: /p$`; (2) a double-star anchored
    * `Disallow: /a*b*c$` over a short literal `Allow: /a`. A decoy
    * `otherbot` group disallows everything and must never apply. */
  def synthWildcardRobots(docs: DataFrame, idCol: String): DataFrame = {
    val doms = docs.select(pmod(col(idCol), lit(12)).as("domain_id"))
      .distinct()
    val d3 = pmod(col("domain_id"), lit(3))
    val body = concat(
      lit("\uFEFF# wildcard robots\n"),
      lit("User-agent: otherbot\nDisallow: /\n\n"),
      lit("User-agent: GraftBot\n"),
      when(d3 === 0,
        "Disallow: /*.pdf$\nAllow: /public*\nDisallow: /private\n")
        .when(d3 === 1, "Disallow: /\nAllow: /*/ok\nAllow: /p$\n")
        .otherwise("Disallow: /a*b*c$\nAllow: /a\n"),
      lit("\nUser-agent: *\nDisallow: /\n"))
    doms.select(col("domain_id"), body.as("robots_txt"))
  }
}
