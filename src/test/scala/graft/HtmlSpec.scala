package graft

import org.apache.spark.sql.functions._

import graft.text.HtmlOps

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  private def extract(pages: (Long, String)*): Seq[(Long, String)] =
    HtmlOps.htmlToText(pages.toDF("media_id", "html"), "html")
      .select($"media_id", $"text_extracted")
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("htmlToText: golden traps — script/style bodies, attr '>', CDATA, " +
      "comments, stray '<', unterminated tails") {
    val got = extract(
      (1L, "<p>plain</p>"),
      // markup inside script/style must not leak; nested-looking close
      (2L, "<script>if (a<b) document.write('<i>x</i>')</script>keep" +
        "<style>p { content: '</div>' }</style>"),
      // attribute value containing '>' — quote-aware tag regex
      (3L, "<p title=\"a>b\" data-x='c>d'>shown</p>"),
      // comment containing tags; comment-out of a script opener
      (4L, "a<!-- <script>hidden</script> -->b"),
      // CDATA content joins the text; its markup-ish bytes get stripped
      (5L, "x<![CDATA[raw <b>kept]]>y"),
      // stray '<' that opens no tag stays literal text
      (6L, "1 < 2 and <b>bold</b>"),
      // unterminated comment / script strip to end-of-document
      (7L, "before<!-- never closed <p>gone"),
      (8L, "before<script>var x = 1;"),
      // empty / markup-only pages degrade to empty text, never a throw
      (9L, ""),
      (10L, "<div><span></span></div>"))
    assert(got === Seq(
      (1L, "plain"),
      (2L, "keep"),
      (3L, "shown"),
      (4L, "a b"),
      (5L, "xraw kepty"),
      (6L, "1 < 2 and bold"),
      (7L, "before"),
      (8L, "before"),
      (9L, ""),
      (10L, "")))
  }

  test("htmlToText: entity decode is single-pass — decoded chars never " +
      "re-form entities; out-of-range codes stay encoded") {
    val got = extract(
      (1L, "A &amp; B &lt;tag&gt; &quot;q&quot; &apos;a&apos; n&nbsp;s"),
      (2L, "&#65;&#x42;&#x63;"), // A B c — decimal + hex
      // the cascade traps: literal-entity text must survive one decode
      (3L, "&amp;#60; &amp;lt; &#38;gt;"),
      // out of the 32..126 cross-engine range: left encoded, not mangled
      (4L, "&#233; &#x1F600; &#9;"),
      // unknown names / bare ampersands / trailing '&' stay literal
      (5L, "&bogus; AT&T R&D &"),
      // entity split across... an unterminated entity stays literal
      (6L, "&amp &#65 &#;"))
    assert(got === Seq(
      (1L, "A & B <tag> \"q\" 'a' n s"),
      (2L, "ABc"),
      (3L, "&#60; &lt; &gt;"),
      (4L, "&#233; &#x1F600; &#9;"),
      (5L, "&bogus; AT&T R&D &"),
      (6L, "&amp &#65 &#;")))
  }

  test("extractMainText: boilerplate dies by density or length, content " +
      "survives — including a paragraph with an in-threshold link") {
    val page =
      "<html><head><title>My Site</title>" +
        "<script>var nav = '<p>not content</p>';</script></head><body>" +
        "<nav><a href='/'>HomePage</a> <a href='/a'>AboutPage</a> " +
        "<a href='/c'>ContactUs</a> menu</nav>" +
        "<h1>Hi</h1>" +
        "<p>This is the actual article body with plenty of real prose " +
        "in it.</p>" +
        "<p>A second paragraph citing <a href='/ref'>a source</a> " +
        "within much longer surrounding text.</p>" +
        "<div><a>L1link</a> <a>L2link</a> <a>L3link</a> <a>L4link</a> " +
        "more</div>" +
        "<footer>(c) me</footer></body></html>"
    val got = graft.text.HtmlOps.extractMainText(
      Seq((1L, page)).toDF("media_id", "html"), "html")
      .select($"main_text").as[String].head()
    assert(got === "This is the actual article body with plenty of real " +
      "prose in it. A second paragraph citing a source within much " +
      "longer surrounding text.")
    // empty / markup-only pages degrade to empty text, never a throw
    val empty = graft.text.HtmlOps.extractMainText(
      Seq((1L, ""), (2L, "<div><a>x</a></div>")).toDF("media_id", "html"),
      "html").select($"main_text").as[String].collect().toSeq
    assert(empty === Seq("", ""))
  }

  test("synthBoilerplatePage round-trips across the corpus") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val got = graft.text.HtmlOps.extractMainText(
      graft.text.HtmlOps.synthBoilerplatePage(docs, "doc_id"), "html")
    val id = $"media_id"
    val expected = concat(
      lit("Main content "), id.cast("string"), lit(" " + "w" * 30 +
        " alpha beta & gamma. Second part "),
      pmod(id, lit(50)).cast("string"),
      lit(" has one link plus " + "y" * 20 + " trailing words."))
    val bad = got.where($"main_text" =!= expected)
    assert(bad.isEmpty,
      bad.select(id, $"main_text").limit(3).collect().mkString("; "))
  }

  test("htmlToText/extractMainText never throw under truncation + " +
      "corruption fuzz") {
    // ANSI mode: any unguarded cast/index in the entity fold or the
    // block filter is a job-killing throw; every prefix + planted-byte
    // mutation of every synth page must yield exactly one row out
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 32).select($"doc_id")
    val fam = graft.text.HtmlOps.synthBoilerplatePage(docs, "doc_id")
      .unionByName(
        graft.text.HtmlOps.synthHtml(docs, "doc_id")
          .withColumnRenamed("html", "h2")
          .select($"media_id", $"h2".as("html")))
    val truncated = fam.select($"media_id",
      explode(sequence(lit(0), length($"html"), lit(7))).as("k"))
      .join(fam, Seq("media_id"))
      .select($"media_id", expr("substring(html, 1, k)").as("html"))
    val corrupted = Seq("&", "<", "%").map { c =>
      fam.select($"media_id",
        concat(
          expr("substring(html, 1, pmod(media_id * 31, length(html)))"),
          lit(c),
          expr("substring(html, pmod(media_id * 31, length(html)) + 2, " +
            "2147483647)")).as("html"))
    }.reduce(_ unionAll _)
    for (mutated <- Seq(truncated, corrupted)) {
      val nIn = mutated.count()
      def force(df: org.apache.spark.sql.DataFrame, c: String): Long =
        df.agg(count(lit(1)), sum(length(col(c)))).head().getLong(0)
      assert(force(graft.text.HtmlOps.htmlToText(mutated, "html"),
        "text_extracted") === nIn)
      assert(force(graft.text.HtmlOps.extractMainText(mutated, "html"),
        "main_text") === nIn)
      assert(force(graft.text.UnicodeOps.normalizeText(mutated, "html"),
        "text_norm") === nIn)
    }
  }

  test("synthHtml round-trips across the corpus, CDATA and tail traps " +
      "included") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val got = HtmlOps.htmlToText(
      HtmlOps.synthHtml(docs, "doc_id"), "html")
    val id = $"media_id"
    def m(k: Int) = pmod(id, lit(k))
    val expected = concat(
      lit("T"), id.cast("string"), lit(" Doc "), id.cast("string"),
      lit(" Para "), m(100).cast("string"),
      lit(" & more AB &#60; literal"),
      when(m(4) === 1,
        concat(lit(" cd"), m(9).cast("string"), lit(" data")))
        .otherwise(""),
      lit(" word"), m(50).cast("string"), lit(" tail"))
    val bad = got.where($"text_extracted" =!= expected)
    assert(bad.isEmpty,
      bad.select(id, $"text_extracted").limit(3).collect().mkString("; "))
  }
}
