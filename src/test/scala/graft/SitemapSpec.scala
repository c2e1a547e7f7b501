package graft

import org.apache.spark.sql.functions._

import graft.text.SitemapOps

class SitemapSpec extends SparkSpec {
  import spark.implicits._

  test("robotsSitemaps: case-insensitive directive, comments, BOM, " +
      "group-independence, file order") {
    val robots = "\uFEFF" +
      """User-agent: graftbot
        |Disallow: /private
        |Sitemap: https://a.com/sitemap.xml   # trailing comment
        |
        |User-agent: *
        |SITEMAP: https://a.com/s2.xml
        |sitemap:https://a.com/s3.xml
        |Sitemap:
        |Crawl-delay: 5
        |""".stripMargin
    val got = SitemapOps.robotsSitemaps(
      Seq((1L, robots)).toDF("id", "robots_txt"), "robots_txt")
      .select($"sitemap_urls").as[Seq[String]].head()
    // the directive is group-independent: all three collected, in file
    // order, empty value dropped
    assert(got === Seq("https://a.com/sitemap.xml",
      "https://a.com/s2.xml", "https://a.com/s3.xml"))
    assert(SitemapOps.robotsSitemaps(
      Seq((1L, "User-agent: *\nDisallow: /\n")).toDF("id", "robots_txt"),
      "robots_txt").select($"sitemap_urls").as[Seq[String]].head()
      === Seq.empty)
  }

  private def explodeRows(rows: (Long, String)*) =
    SitemapOps.explodeSitemap(
      rows.toDF("media_id", "sitemap_xml"), "sitemap_xml")
      .select($"media_id", $"sm_kind", $"sm_loc", $"sm_lastmod")
      .as[(Long, Option[String], Option[String], Option[String])]
      .collect().sortBy(r => (r._1, r._3.getOrElse(""))).toSeq

  test("explodeSitemap: urlset entries with whitespace/entity noise, " +
      "sitemapindex, empty urlset, garbage") {
    val urlset =
      """<?xml version="1.0" encoding="UTF-8"?>
        |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
        |  <url>
        |    <loc>
        |      https://e.com/a?x=1&amp;y=2
        |    </loc>
        |    <lastmod>2026-03-01T12:00:00Z</lastmod>
        |    <changefreq>daily</changefreq>
        |  </url>
        |  <url><loc>https://e.com/plain</loc></url>
        |</urlset>""".stripMargin
    val index =
      """<sitemapindex>
        |<sitemap><loc>https://e.com/child.xml</loc></sitemap>
        |</sitemapindex>""".stripMargin
    val empty = "<urlset></urlset>"
    val got = explodeRows((1L, urlset), (2L, index), (3L, empty),
      (4L, "just text, not a sitemap"))
    assert(got === Seq(
      // entity-decoded, whitespace-trimmed loc
      (1L, Some("urlset"), Some("https://e.com/a?x=1&y=2"),
        Some("2026-03-01T12:00:00Z")),
      (1L, Some("urlset"), Some("https://e.com/plain"), None),
      (2L, Some("sitemapindex"), Some("https://e.com/child.xml"), None),
      (3L, Some("urlset"), None, None),
      (4L, None, None, None)))
  }

  test("CDATA-wrapped loc values unwrap VERBATIM — no entity decode " +
      "inside CDATA") {
    val cdata = "<urlset><url><loc><![CDATA[https://e.com/?q=a&amp;b]]>" +
      "</loc></url>" +
      "<url><loc> <![CDATA[https://e.com/plain]]> </loc></url>" +
      "</urlset>"
    val got = explodeRows((1L, cdata))
    // the &amp; inside CDATA is LITERAL text of the URL — decoding it
    // would corrupt the query string
    assert(got.map(_._3) === Seq(Some("https://e.com/?q=a&amp;b"),
      Some("https://e.com/plain")))
  }

  test("entity decode is one-pass: &amp;lt; stays literal '&lt;'; " +
      "maxEntries caps the explode") {
    val tricky = "<urlset><url><loc>https://e.com/?q=&amp;lt;tag" +
      "</loc></url></urlset>"
    val got = explodeRows((1L, tricky))
    assert(got.head._3 === Some("https://e.com/?q=&lt;tag"))
    // the numeric form must not DOUBLE-decode either: '&#38;amp;'
    // decodes to the literal 5-char '&amp;' (sequential replaces would
    // cascade it all the way to '&'), and '&amp;#38;' to '&#38;'
    val numeric = "<urlset>" +
      "<url><loc>https://e.com/?a=&#38;amp;</loc></url>" +
      "<url><loc>https://e.com/?b=&amp;#38;</loc></url>" +
      "<url><loc>https://e.com/?c=&#x26;d=1</loc></url>" +
      "</urlset>"
    val got2 = explodeRows((1L, numeric))
    assert(got2.map(_._3) === Seq(
      Some("https://e.com/?a=&amp;"),
      Some("https://e.com/?b=&#38;"),
      Some("https://e.com/?c=&d=1")))
    val many = "<urlset>" + (1 to 10)
      .map(i => s"<url><loc>https://e.com/$i</loc></url>").mkString +
      "</urlset>"
    val capped = SitemapOps.explodeSitemap(
      Seq((1L, many)).toDF("media_id", "sitemap_xml"), "sitemap_xml",
      maxEntries = 3)
    assert(capped.count() === 3)
  }

  test("foreign nested blocks are noise, not fields: a <sitemap> inside " +
      "a <url> (and vice versa) cannot shadow the block's own loc/lastmod") {
    val nestedInUrl = "<urlset><url>" +
      "<sitemap><loc>https://bad.example/shadow.xml</loc>" +
      "<lastmod>1999-01-01</lastmod></sitemap>" +
      "<loc>https://e.com/real</loc><lastmod>2026-02-03</lastmod>" +
      "</url></urlset>"
    val nestedInIndex = "<sitemapindex><sitemap>" +
      "<url><loc>https://bad.example/page</loc></url>" +
      "<loc>https://e.com/child.xml</loc>" +
      "</sitemap></sitemapindex>"
    val got = explodeRows((1L, nestedInUrl), (2L, nestedInIndex))
    assert(got === Seq(
      (1L, Some("urlset"), Some("https://e.com/real"),
        Some("2026-02-03")),
      (2L, Some("sitemapindex"), Some("https://e.com/child.xml"), None)))
  }

  test("synthSitemaps round-trips across the corpus (negative ids too): " +
      "explode output matches the q153 id arithmetic") {
    for (docs <- Seq(
      graft.sources.Sources.table(spark, sf, "documents").select($"doc_id"),
      spark.range(-60, 0).toDF("doc_id"))) {
      val got = SitemapOps.explodeSitemap(
        SitemapOps.synthSitemaps(docs, "doc_id"), "sitemap_xml")
      val id = $"media_id"
      def m(k: Int) = pmod(id, lit(k))
      val counts = got.groupBy("media_id").count()
      val expN = when(m(11) === 4, 1L)
        .when(m(5) === 2, 2L)
        .when(m(7) === 3, 1L)
        .otherwise(when(m(3) === 0, 1L).when(m(3) === 1, 2L)
          .otherwise(3L))
      val badN = counts.join(docs.select($"doc_id".as("media_id")),
        Seq("media_id"))
        .where($"count" =!= expN)
      assert(badN.isEmpty, badN.limit(5).collect().mkString("; "))
      // spot-check the urlset entry shape on the full synth
      val urlRows = got.where(m(11) =!= 4 && m(5) =!= 2 && m(7) =!= 3)
      val badLoc = urlRows.where(!$"sm_loc".startsWith(
        concat(lit("https://s"), m(20).cast("string"), lit(".com/p"))))
      assert(badLoc.isEmpty, badLoc.limit(5).collect().mkString("; "))
      // the entity-escaped variant decoded its ampersand
      val amp = urlRows.where(m(4) === 1 && $"sm_loc".endsWith("p1?a=1&b=2"))
      val ampExpect = urlRows.where(m(4) === 1 &&
        $"sm_loc".contains("/p1")).count()
      assert(amp.count() === ampExpect && (ampExpect > 0 ||
        docs.where(pmod($"doc_id", lit(4)) === 1).isEmpty))
    }
  }

  test("sitemap parse never throws under truncation + corruption fuzz") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 40).select($"doc_id")
    val fam = SitemapOps.synthSitemaps(docs, "doc_id")
    val truncated = fam.select($"media_id",
      explode(sequence(lit(0), length($"sitemap_xml"), lit(7))).as("k"))
      .join(fam, Seq("media_id"))
      .select($"media_id",
        expr("substring(sitemap_xml, 1, k)").as("sitemap_xml"))
    val corrupted = Seq("<", ">", "&").map { c =>
      fam.select($"media_id",
        concat(
          expr("substring(sitemap_xml, 1, " +
            "pmod(media_id * 31, length(sitemap_xml)))"),
          lit(c),
          expr("substring(sitemap_xml, " +
            "pmod(media_id * 31, length(sitemap_xml)) + 2, " +
            "2147483647)")).as("sitemap_xml"))
    }.reduce(_ unionAll _)
    for (mutated <- Seq(truncated, corrupted)) {
      val out = SitemapOps.explodeSitemap(mutated, "sitemap_xml")
      assert(out.where($"sm_loc".isNotNull &&
        length($"sm_loc") > 10000).count() === 0)
      assert(out.count() >= mutated.count()) // one row minimum per input
    }
  }
}
