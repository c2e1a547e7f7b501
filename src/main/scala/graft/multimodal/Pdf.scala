package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PDF triage — version, linearization, approximate page count,
  * startxref/EOF integrity, encryption flag — from bounded HEAD and TAIL
  * windows, expression-only. PDF is the most common non-HTML document
  * format in a crawl; triage decides demux-vs-drop without a PDF library.
  *
  * PDF's structural tokens are ASCII text, so the windows are cast to
  * STRING and searched with regex instead of hexed: bytes inside binary
  * streams decode to replacement chars, which cannot affect ASCII token
  * matches (no ASCII byte participates in a multi-byte UTF-8 sequence),
  * and the cast is non-validating so nothing throws. This is a TRIAGE
  * heuristic, not a parser: a token occurring inside a content stream can
  * inflate the fallback page count — documented, bounded, and the reason
  * the count column is named `n_pages_approx`.
  *
  * Field derivations:
  *  - `pdf_version` from the `%PDF-M.N` header (garbage after the dash →
  *    NULL version, format still 'pdf');
  *  - `linearized` = the head window carries a `/Linearized` dict — real
  *    linearizers put it in the first ~1 KiB by construction;
  *  - `n_pages_approx` by precedence, mirroring what real triage tools
  *    trust most: the linearization dict's `/N` (authoritative when
  *    present) → the first `/Count` in the TAIL window (the Pages-tree
  *    root rides the trailer section of most writers) → the count of
  *    `/Type /Page` objects in the head window (`(?![a-zA-Z])` so
  *    `/Pages` never counts). NULL when no source matches;
  *  - `startxref` = the LAST `startxref <offset>` in the tail
  *    (incremental updates append new ones; the last is operative) via
  *    try_element_at — never an ANSI index throw;
  *  - `has_eof` = `%%EOF` present in the tail (a truncated download
  *    fails this before anything else);
  *  - `encrypted` = `/Encrypt` in the tail trailer.
  *
  * Non-PDF input keeps every column NULL; malformed/truncated PDF input
  * degrades field-by-field, never throws. Numeric outputs carry the
  * family's pushdown barrier (see Multimodal.ndZero rationale): filter
  * the INPUT before triaging. */
object Pdf {

  private def ndZero: Column = (rand() * lit(0)).cast(LongType)

  def pdfTriage(media: DataFrame, contentCol: String = "content",
                headBytes: Int = 64 * 1024,
                tailBytes: Int = 4096): DataFrame = {
    require(headBytes >= 16, s"headBytes must be >= 16, got $headBytes")
    require(tailBytes >= 32,
      s"tailBytes must cover startxref + %%EOF (32), got $tailBytes")
    Seq("pdf_version", "linearized", "n_pages_approx", "startxref",
      "has_eof", "encrypted", "__pdf_hd", "__pdf_tl").foreach(c =>
      require(!media.columns.contains(c),
        s"Multimodal.Pdf.pdfTriage: media already has a '$c' column — " +
          "rename it first; pdfTriage appends its own"))
    val c = s"`$contentCol`"
    val withWin = media
      .withColumn("__pdf_hd",
        expr(s"CAST(substring($c, 1, $headBytes) AS STRING)"))
      .withColumn("__pdf_tl",
        expr(s"""CAST(substring($c,
                |  greatest(octet_length($c) - $tailBytes + 1, 1),
                |  $tailBytes) AS STRING)""".stripMargin))
    val hd = col("__pdf_hd")
    val tl = col("__pdf_tl")
    val isPdf = hd.startsWith("%PDF-")
    val linearized = hd.rlike("/Linearized\\b")
    val nLin = expr(
      """nullif(regexp_extract(__pdf_hd,
        |  '(?s)/Linearized.{0,256}?/N\\s+([0-9]{1,9})', 1), '')
        |""".stripMargin).cast(LongType)
    val nCount = expr(
      """nullif(regexp_extract(__pdf_tl,
        |  '/Count\\s+([0-9]{1,9})', 1), '')""".stripMargin).cast(LongType)
    val nObjs = expr(
      """nullif(regexp_count(__pdf_hd,
        |  '/Type\\s*/Page(?![a-zA-Z])'), 0)""".stripMargin).cast(LongType)
    val sxref = expr(
      """try_element_at(regexp_extract_all(__pdf_tl,
        |  'startxref\\s+([0-9]{1,18})', 1), -1)""".stripMargin)
      .cast(LongType)
    withWin
      .withColumn("pdf_version",
        when(isPdf, nullif(
          regexp_extract(hd, "^%PDF-([0-9]+\\.[0-9]+)", 1), lit(""))))
      .withColumn("linearized", when(isPdf, linearized))
      .withColumn("n_pages_approx",
        when(isPdf,
          when(linearized, coalesce(nLin, nCount, nObjs))
            .otherwise(coalesce(nCount, nObjs))) + ndZero)
      .withColumn("startxref", when(isPdf, sxref) + ndZero)
      .withColumn("has_eof", when(isPdf, instr(tl, "%%EOF") > 0))
      .withColumn("encrypted", when(isPdf, tl.rlike("/Encrypt\\b")))
      .drop("__pdf_hd", "__pdf_tl")
  }

  /** Deterministic PDF exhibit bytes from an id column — the test/demo
    * source for [[pdfTriage]], id-varied across the whole surface:
    * version 1.(id%8) or 2.0 (pmod 13 = 9); linearized with an
    * authoritative /N (pmod 2 = 0) vs not; a Pages-tree /Count that is
    * OMITTED on pmod 5 = 4 rows so the /Type /Page object-count fallback
    * is exercised (the ever-present `/Type /Pages` root is the decoy the
    * `(?![a-zA-Z])` guard exists for); an /Encrypt trailer entry
    * (pmod 3 = 0); a TRUNCATION trap (pmod 7 = 2) that cuts right after
    * `startxref\n` — version/pages still parse, startxref NULLs, has_eof
    * false; and a non-PDF garbage row (pmod 11 = 6) that must keep every
    * column NULL. The q143 oracle recomputes all fields as ground-truth
    * id arithmetic. */
  def synthPdfBytes(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = pmod(id, lit(k))
    val ver = when(m(13) === 9, "2.0")
      .otherwise(concat(lit("1."), m(8).cast("string")))
    val n = (m(6) + 1).cast("int") // 1..6 pages
    val lin = when(m(2) === 0, concat(
      lit("1 0 obj\n<< /Linearized 1 /L 5000 /N "), n.cast("string"),
      lit(" /H [500 200] >>\nendobj\n"))).otherwise("")
    val pagesRoot = concat(
      lit("2 0 obj\n<< /Type /Pages /Kids [3 0 R] "),
      when(m(5) === 4, "").otherwise(
        concat(lit("/Count "), n.cast("string"), lit(" "))),
      lit(">>\nendobj\n"))
    // repeat with a COLUMN count needs the SQL form (the Scala helper
    // only takes a literal Int)
    val pageObjs = expr(
      s"""repeat('3 0 obj\\n<< /Type /Page /Parent 2 0 R >>\\nendobj\\n',
         |CAST(pmod(`$idCol`, 6) + 1 AS INT))""".stripMargin)
    val trailer = concat(
      lit("trailer\n<< /Size 9 /Root 4 0 R"),
      when(m(3) === 0, " /Encrypt 5 0 R").otherwise(""),
      lit(" >>\nstartxref\n"))
    val sx = (m(100) + 9000).cast("string")
    val full = concat(
      lit("%PDF-"), ver, lit("\n"), lin, pagesRoot, pageObjs, trailer,
      when(m(7) === 2, "").otherwise(concat(sx, lit("\n%%EOF\n"))))
    val body = when(m(11) === 6, lit("GARBAGE NOT A PDF")).otherwise(full)
    docs.select(id.as("media_id"), body.cast("binary").as("content"))
  }
}
