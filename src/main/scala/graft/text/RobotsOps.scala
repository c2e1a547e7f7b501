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
  * rule. Wildcards (`*`, `$`) inside paths are NOT interpreted — they
  * match literally; a corpus needing full Google wildcard semantics
  * would extend the matcher, not the parse. Unknown directives
  * (Crawl-delay, Sitemap) are skipped. Malformed input degrades to
  * fewer rules, never a throw; no robots.txt at all = everything
  * allowed — the crawl default. */
object RobotsOps {

  /** Append `robots_rules`: array<struct<allow boolean, prefix string>>
    * — the rule set governing `agent` (lowercase) per the group-selection
    * semantics above. */
  def parseRobots(df: DataFrame, robotsCol: String, agent: String,
                  maxLines: Int = 512,
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
    val fold = expr(s"""
      aggregate(
        slice(split(CAST(`$robotsCol` AS STRING), '\\r?\\n'),
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

  /** Longest-prefix-match decision for `path` against a
    * [[parseRobots]] rules array: the matching rule with the longest
    * prefix wins; allow wins exact-length ties; no match (or a NULL /
    * absent rule set) = allowed. */
  def isAllowed(rules: Column, path: Column): Column = {
    val dec = aggregate(
      coalesce(rules, expr(
        "CAST(array() AS ARRAY<STRUCT<allow: BOOLEAN, prefix: STRING>>)")),
      struct(lit(-1).as("len"), lit(true).as("allow")),
      (st, r) => when(
        startswith(path, r.getField("prefix")) &&
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
}
