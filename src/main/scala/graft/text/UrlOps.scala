package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL canonicalization + registrable-domain extraction for crawl
  * curation — the key derivations before exact-URL dedup ("the same page
  * fetched with different tracking params is the same page") and
  * per-domain caps/stats (capPerKey / topFractionPerKey key on the
  * REGISTRABLE domain, not the raw host, or `www.` and `m.` subdomains
  * silently double a site's budget).
  *
  * Zero-UDF: everything is `try_parse_url` (NOT `parse_url` — under
  * Spark 4 ANSI mode parse_url THROWS INVALID_URL on malformed input,
  * and crawl URLs are routinely malformed; try_parse_url yields NULL)
  * plus array HOFs over the query string. Scale shape: pure scan-side
  * expressions, no exchange, no driver involvement.
  */
object UrlOps {

  /** Tracking query parameters stripped by [[canonicalizeUrls]] — the
    * common cross-site click/campaign identifiers whose presence never
    * changes the fetched content. */
  val trackingParams: Seq[String] = Seq(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "fbclid", "gclid", "msclkid", "mc_eid", "igshid", "ref_src")

  /** Multi-label public suffixes for [[canonicalizeUrls]]'s registrable
    * domain — a documented HEURISTIC subset of the Public Suffix List
    * covering the common ccTLD second levels; a full-PSL integration
    * would broadcast the list as a lookup table, the same plan shape. */
  val multiLabelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "net.uk",
    "com.au", "net.au", "org.au", "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.ar", "com.mx", "com.tr",
    "co.in", "co.kr", "co.nz", "co.za")

  /** Appends url_scheme, url_host (lowercased), url_port (NULL when
    * absent), url_path ('/'-normalized, case KEPT — paths are
    * case-sensitive), registrable_domain and canonical_url to `df`.
    *
    * Canonical form: lowercased scheme and host; the port dropped only
    * when it is the scheme's default (http:80 / https:443 — an
    * explicit :80 on https is load-bearing and kept); the path
    * normalized to '/' when empty; tracking parameters removed and the
    * remaining query parameters SORTED (param order is transport
    * noise); the fragment dropped (never sent to the server). A URL
    * try_parse_url cannot parse yields NULL in every derived column —
    * filter, don't fail, at corpus scale.
    *
    * The registrable domain is the last two host labels, or three when
    * the trailing two are a known multi-label public suffix
    * ([[multiLabelSuffixes]]); a single-label host is its own domain. */
  /** SQL fragment: percent-encoding triplets in `inner` normalized to
    * UPPERCASE hex (RFC 3986 §6.2.2.1 — '%2f' and '%2F' are the same
    * octet and must canonicalize equal). Split-on-'%' rebuild, one pass;
    * a '%' not followed by two hex digits is left as-is (malformed but
    * present in crawls; escaping it would CHANGE the URL). */
  private def pctUpperSql(inner: String): String =
    s"""(CASE WHEN instr($inner, '%') = 0 THEN $inner ELSE
       |concat(element_at(split($inner, '%', -1), 1),
       |  aggregate(slice(split($inner, '%', -1), 2,
       |      greatest(size(split($inner, '%', -1)) - 1, 0)), '',
       |    (acc, p) -> acc || CASE WHEN p rlike '^[0-9a-fA-F]{2}'
       |      THEN '%' || upper(substring(p, 1, 2)) || substring(p, 3)
       |      ELSE '%' || p END,
       |    s -> s)) END)""".stripMargin

  def canonicalizeUrls(df: DataFrame, urlCol: String = "url"): DataFrame = {
    Seq("url_scheme", "url_host", "url_port", "url_path",
      "registrable_domain", "canonical_url",
      "__u_src", "__u_auth", "__u_path", "__u_q", "__u_labs")
      .foreach(c => require(!df.columns.contains(c),
        s"UrlOps.canonicalizeUrls: df already has a '$c' column — rename " +
          "it first; canonicalizeUrls appends its own"))
    graft.functions.IdnEncodeHost.register(df.sparkSession)
    // IDN pre-encode: java.net.URI (and so try_parse_url) REJECTS a
    // non-ASCII authority outright, so an IRI-form crawl URL would NULL
    // every derived column; punycoding the host first makes it parseable
    // AND is the canonical form (DNS only knows A-labels). ASCII URLs
    // pass through allocation-free.
    val u = "__u_src"
    val tracking = trackingParams.map(p => s"'$p'").mkString(", ")
    val suffixes = multiLabelSuffixes.map(s => s"'$s'").mkString(", ")
    df
      .withColumn("__u_src", expr(s"idn_encode_host(`$urlCol`)"))
      .withColumn("url_scheme", expr(s"lower(try_parse_url($u, 'PROTOCOL'))"))
      .withColumn("url_host", expr(s"lower(try_parse_url($u, 'HOST'))"))
      .withColumn("__u_auth", expr(s"try_parse_url($u, 'AUTHORITY')"))
      // try_cast, not CAST: java.net.URI's registry-authority fallback
      // lets try_parse_url accept authorities like 'x:99999999999999999999'
      // whose digit run overflows BIGINT — an ANSI CAST there crashes the
      // whole corpus job on one malformed crawl URL. Out-of-range ports
      // (>65535, impossible on the wire) also yield NULL, so canonical_url
      // simply drops them.
      .withColumn("url_port",
        expr("""CASE WHEN TRY_CAST(nullif(
               |    regexp_extract(__u_auth, ':([0-9]+)$', 1), '')
               |  AS BIGINT) BETWEEN 0 AND 65535
               |THEN TRY_CAST(nullif(
               |    regexp_extract(__u_auth, ':([0-9]+)$', 1), '')
               |  AS BIGINT) END""".stripMargin))
      .withColumn("__u_path",
        expr(s"""CASE WHEN url_host IS NULL THEN NULL
                |WHEN coalesce(try_parse_url($u, 'PATH'), '') = '' THEN '/'
                |ELSE ${pctUpperSql(s"try_parse_url($u, 'PATH')")} END"""
          .stripMargin))
      // tracking params out, the rest sorted; '' when nothing survives.
      // filter/array_sort keep this inside one projection — no explode.
      // Percent-case normalizes BEFORE the sort: '%2f' and '%2F' params
      // must land at the same sort position or equal URLs canonicalize
      // to different strings.
      .withColumn("__u_q",
        expr(s"""array_join(array_sort(filter(
                |  split(${pctUpperSql(
                    s"coalesce(try_parse_url($u, 'QUERY'), '')")}, '&'),
                |  p -> p <> '' AND NOT element_at(split(p, '='), 1)
                |         IN ($tracking))), '&')""".stripMargin))
      .withColumn("__u_labs", split(col("url_host"), "\\."))
      .withColumn("registrable_domain", expr(s"""
        CASE WHEN url_host IS NULL THEN NULL
        WHEN size(__u_labs) <= 2 THEN url_host
        WHEN concat(element_at(__u_labs, -2), '.',
                    element_at(__u_labs, -1)) IN ($suffixes)
          THEN concat(element_at(__u_labs, -3), '.',
                      element_at(__u_labs, -2), '.',
                      element_at(__u_labs, -1))
        ELSE concat(element_at(__u_labs, -2), '.',
                    element_at(__u_labs, -1)) END"""))
      .withColumn("canonical_url", expr("""
        CASE WHEN url_scheme IS NULL OR url_host IS NULL THEN NULL
        ELSE concat(
          url_scheme, '://', url_host,
          CASE WHEN url_port IS NULL THEN ''
               WHEN url_scheme = 'http' AND url_port = 80 THEN ''
               WHEN url_scheme = 'https' AND url_port = 443 THEN ''
               ELSE concat(':', CAST(url_port AS STRING)) END,
          __u_path,
          CASE WHEN __u_q = '' THEN '' ELSE concat('?', __u_q) END)
        END"""))
      .drop("__u_src", "__u_auth", "__u_q", "__u_labs")
      .withColumnRenamed("__u_path", "url_path")
  }

  /** Deterministic exhibit URLs from an id column — the test/demo source
    * for [[canonicalizeUrls]], mined with every trap the canonicalizer
    * exists for, id-varied so the bulk oracle exercises them all:
    * uppercase scheme and (pmod 5) host; `www.`/multi-label subdomains;
    * a `co.uk` public-suffix TLD (pmod 4 = 2); an explicit :80 that must
    * be STRIPPED on http but KEPT on https, and a :8080 always kept; an
    * empty path that normalizes to '/'; a utm_source tracking param
    * (even ids) at an id-dependent position among out-of-order kept
    * params that must sort; a fragment (pmod 4 = 0) that must drop. The
    * q138 oracle recomputes the canonical STRING and every derived
    * column as ground-truth id arithmetic. */
  def synthUrls(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = pmod(id, lit(k))
    val schemeRaw = when(m(2) === 0, "http").otherwise("HTTPS")
    val sub = when(m(3) === 0, "").when(m(3) === 1, "www.").otherwise("a.b.")
    val core = concat(lit("site"), pmod(id, lit(100)).cast(StringType))
    val coreRaw = when(m(5) === 0, upper(core)).otherwise(core)
    val tld = when(m(4) === 0, "com").when(m(4) === 1, "org")
      .when(m(4) === 2, "co.uk").otherwise("io")
    val portRaw = when(m(6) === 0, ":80").when(m(6) === 1, ":8080")
      .otherwise("")
    val pathRaw = when(m(7) === 0, "").otherwise(
      concat(lit("/p"), pmod(id, lit(50)).cast(StringType),
        // lowercase percent triplet: canonical form must uppercase it
        when(m(9) === 4, "%2f").otherwise("")))
    val qP = concat(lit("q="), pmod(id, lit(30)).cast(StringType))
    val track = lit("utm_source=track")
    val query = when(m(3) === 0,
      when(m(2) === 0, concat(qP, lit("&a=1&"), track))
        .otherwise(concat(qP, lit("&a=1"))))
      .when(m(3) === 1,
        when(m(2) === 0, concat(track, lit("&a=1&"), qP))
          .otherwise(concat(lit("a=1&"), qP)))
      .otherwise(
        when(m(2) === 0, concat(lit("a=1&"), track, lit("&"), qP))
          .otherwise(concat(lit("a=1&"), qP)))
    val frag = when(m(4) === 0, "#frag").otherwise("")
    docs.select(
      id.as("url_id"),
      concat(schemeRaw, lit("://"), sub, coreRaw, lit("."), tld,
        portRaw, pathRaw, lit("?"), query, frag).as("url"))
  }
}
