package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sitemap discovery + parsing — the URL-frontier side of crawl
  * politeness (sitemaps.org protocol, referenced by RFC 9309's
  * `Sitemap:` directive): robots.txt names the sitemaps, each sitemap
  * is either a `<urlset>` of page entries (loc + optional lastmod/
  * changefreq/priority) or a `<sitemapindex>` of child sitemaps. A
  * curation pipeline uses the parse both ways: frontier building
  * (which URLs does the site advertise) and freshness joins (lastmod
  * vs the stored fetch date decides re-crawls).
  *
  * Expression-only: `Sitemap:` lines are a filter over the robots
  * lines (the directive is GROUP-INDEPENDENT per the protocol — it
  * applies regardless of user-agent, so the extraction ignores group
  * structure entirely); the XML parse is block-wise regexp extraction
  * (`<url>…</url>` / `<sitemap>…</sitemap>` blocks, then loc/lastmod
  * within each block) with the XML entity decodes URLs legally carry
  * (`&amp;` `&lt;` `&gt;` `&quot;` `&apos;` — sitemap URLs MUST
  * entity-escape ampersands, so skipping the decode corrupts every
  * query-string URL). Not a general XML parser by design: the sitemap
  * protocol's structure is flat and the block regex is robust to
  * attribute noise, namespaces, CDATA-free real-world files; malformed
  * input degrades to fewer entries, never a throw. */
object SitemapOps {

  /** Append `sitemap_urls`: array<string> of the robots.txt's
    * `Sitemap:` directive values, in file order. Case-insensitive
    * directive match, `#` comments stripped, BOM tolerated. */
  def robotsSitemaps(df: DataFrame, robotsCol: String,
                     outCol: String = "sitemap_urls",
                     // same RFC 9309 §2.4 sizing rationale as
                     // RobotsOps.parseRobots: Sitemap directives often
                     // sit at the END of a long file, where a low line
                     // cap silently loses them
                     maxLines: Int = 16384): DataFrame = {
    require(maxLines >= 1 && maxLines <= 100000, s"maxLines: $maxLines")
    require(!df.columns.contains(outCol),
      s"SitemapOps.robotsSitemaps: df already has a '$outCol' column")
    val bom = "\uFEFF"
    df.withColumn(outCol, expr(s"""
      filter(transform(
        slice(split(trim(LEADING '$bom' FROM
          CAST(`$robotsCol` AS STRING)), '\\r?\\n'), 1, $maxLines),
        raw -> CASE
          WHEN startswith(lower(trim(element_at(split(raw, '#'), 1))),
            'sitemap:')
          THEN trim(substring(element_at(split(raw, '#'), 1),
            instr(lower(element_at(split(raw, '#'), 1)), 'sitemap:') + 8))
          ELSE CAST(NULL AS STRING) END),
        u -> u IS NOT NULL AND u <> '')"""))
  }

  private def xmlUnescape(c: Column): Column = {
    // single-pass decode of the five XML predefined entities plus the
    // numeric &#38;/&#x26; ampersand forms — the forms sitemap URLs
    // legally carry. Sequential replaces alone DOUBLE-decode
    // ('&#38;amp;' → '&amp;' → '&', where the correct single-pass
    // result is the literal '&amp;'), so every rule that PRODUCES an
    // ampersand emits a \u0001 sentinel first and the sentinel is
    // rewritten to '&' only after all entity rules have run — no
    // produced '&' can re-trigger a rule. (A URL that itself contains
    // U+0001 would corrupt — a C0 control char is not legal in XML
    // content at all, so nothing real is lost.)
    val steps: Column => Column = s =>
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        s, "&lt;", "<"), "&gt;", ">"), "&quot;", "\""), "&apos;", "'")
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      steps(c), "&amp;", "\u0001"), "&#38;", "\u0001"),
      "&#x26;", "\u0001"), "\u0001", "&")
  }

  /** Explode one sitemap XML document into entry rows. Output appends:
    * `sm_kind` ('urlset' | 'sitemapindex' | NULL for non-sitemap
    * input), `sm_loc` (entity-decoded URL), `sm_lastmod` (the raw W3C
    * datetime string or NULL). One row per `<url>`/`<sitemap>` block;
    * a recognized but EMPTY sitemap keeps one row with NULL loc so
    * corpus accounting sees the file. */
  def explodeSitemap(df: DataFrame, xmlCol: String,
                     maxEntries: Int = 50000): DataFrame = {
    require(maxEntries >= 1, s"maxEntries: $maxEntries")
    Seq("sm_kind", "sm_loc", "sm_lastmod", "__sm_blocks",
      "__sm_clean").foreach(c =>
      require(!df.columns.contains(c),
        s"SitemapOps.explodeSitemap: df already has a '$c' column"))
    val x = s"CAST(`$xmlCol` AS STRING)"
    val kind = expr(s"""CASE
      WHEN $x RLIKE '(?s)<\\\\s*sitemapindex[\\\\s>]' THEN 'sitemapindex'
      WHEN $x RLIKE '(?s)<\\\\s*urlset[\\\\s>]' THEN 'urlset'
      END""")
    // block tag by kind: <url>…</url> under urlset, <sitemap>…</sitemap>
    // under sitemapindex (the protocol's two shapes)
    val blocks = expr(s"""slice(CASE
      WHEN $x RLIKE '(?s)<\\\\s*sitemapindex[\\\\s>]'
        THEN regexp_extract_all($x, '(?s)<sitemap[\\\\s>](.*?)</sitemap>', 1)
      WHEN $x RLIKE '(?s)<\\\\s*urlset[\\\\s>]'
        THEN regexp_extract_all($x, '(?s)<url[\\\\s>](.*?)</url>', 1)
      ELSE CAST(array() AS ARRAY<STRING>) END, 1, $maxEntries)""")
    val withBlocks = df
      .withColumn("sm_kind", kind)
      .withColumn("__sm_blocks", blocks)
    // keep empty-but-recognized sitemaps as one NULL-loc row; non-
    // sitemap input also keeps its row (kind NULL) — accounting first
    val exploded = withBlocks.select(col("*"),
      explode(when(size(col("__sm_blocks")) > 0, col("__sm_blocks"))
        .otherwise(array(lit(null).cast("string")))).as("__sm_block"))
    // a FOREIGN block nested inside this one (a stray <sitemap> inside
    // a <url>, or vice versa — malformed, but real generators emit it)
    // carries its own <loc>/<lastmod> that must not shadow THIS block's
    // values: strip the opposite-kind spans before field extraction
    // (valid sitemaps never nest, so this only fires on noise)
    val cleaned = when(col("sm_kind") === "urlset", expr(
      """regexp_replace(__sm_block,
        |'(?s)<sitemap[\\s>].*?</sitemap>', '')""".stripMargin))
      .when(col("sm_kind") === "sitemapindex", expr(
        """regexp_replace(__sm_block,
          |'(?s)<url[\\s>].*?</url>', '')""".stripMargin))
      .otherwise(col("__sm_block"))
    // CDATA-wrapped loc values (some sitemap generators emit
    // <loc><![CDATA[url]]></loc>) carry the URL VERBATIM — unwrap
    // first, and skip entity decoding for them (CDATA content is not
    // entity-encoded; decoding would corrupt a literal '&amp;' the
    // URL legitimately contains)
    val rawLoc = expr(
      """nullif(regexp_extract(__sm_clean,
        |'(?s)<loc\\s*>\\s*(.*?)\\s*</loc>', 1), '')""".stripMargin)
    val cdata = expr(
      """nullif(regexp_extract(__sm_clean,
        |'(?s)<loc\\s*>\\s*<!\\[CDATA\\[(.*?)\\]\\]>\\s*</loc>', 1),
        |'')""".stripMargin)
    exploded
      .withColumn("__sm_clean", cleaned)
      .withColumn("sm_loc",
        coalesce(cdata, xmlUnescape(rawLoc)))
      .withColumn("sm_lastmod", expr(
        """nullif(regexp_extract(__sm_clean,
          |'(?s)<lastmod\\s*>\\s*(.*?)\\s*</lastmod>', 1), '')""".stripMargin))
      .drop("__sm_blocks", "__sm_block", "__sm_clean")
  }

  /** Deterministic sitemap exhibits from an id column — the test/demo
    * source for [[explodeSitemap]] + [[robotsSitemaps]]: a urlset with
    * 1-3 entries (lastmod on some, an entity-escaped query URL on
    * pmod 4 = 1 — `&amp;` MUST decode), a sitemapindex of 2 child
    * sitemaps (pmod 5 = 2), an EMPTY urlset (pmod 7 = 3), and garbage
    * non-XML (pmod 11 = 4). URLs/datetimes are id arithmetic so the
    * oracle rebuilds them exactly. */
  def synthSitemaps(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = pmod(id, lit(k))
    def urlEntry(k: Int): Column = concat(
      lit("<url><loc> https://s"), m(20).cast("string"),
      lit(s".com/p$k"),
      if (k == 1) when(m(4) === 1, "?a=1&amp;b=2").otherwise("")
      else lit(""),
      lit(" </loc>"),
      when(m(3) === 0, concat(lit("<lastmod>2026-0"),
        (m(8) + 1).cast("string"), lit(s"-0$k</lastmod>")))
        .otherwise(""),
      lit("</url>"))
    val urlset = concat(
      lit("<?xml version=\"1.0\"?><urlset xmlns=\"http://www.sitemaps" +
        ".org/schemas/sitemap/0.9\">"),
      urlEntry(1),
      when(m(3) >= 1, urlEntry(2)).otherwise(""),
      when(m(3) === 2, urlEntry(3)).otherwise(""),
      lit("</urlset>"))
    val index = concat(
      lit("<?xml version=\"1.0\"?><sitemapindex>"),
      lit("<sitemap><loc>https://s"), m(20).cast("string"),
      lit(".com/sitemap1.xml</loc>" +
        "<lastmod>2026-01-15</lastmod></sitemap>"),
      lit("<sitemap><loc>https://s"), m(20).cast("string"),
      lit(".com/sitemap2.xml</loc></sitemap>"),
      lit("</sitemapindex>"))
    val empty = lit("<?xml version=\"1.0\"?><urlset " +
      "xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\"></urlset>")
    val xml = when(m(11) === 4, lit("NOT XML AT ALL"))
      .when(m(5) === 2, index)
      .when(m(7) === 3, empty)
      .otherwise(urlset)
    docs.select(id.as("media_id"), xml.as("sitemap_xml"))
  }
}
