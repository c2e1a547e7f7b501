package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Pdf

class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def triage(rows: (Long, String)*) =
    Pdf.pdfTriage(rows.toDF("media_id", "txt")
      .select($"media_id", $"txt".cast("binary").as("content")))
      .select($"media_id", $"pdf_version", $"linearized",
        $"n_pages_approx", $"startxref", $"has_eof", $"encrypted")
      .as[(Long, Option[String], Option[Boolean], Option[Long],
        Option[Long], Option[Boolean], Option[Boolean])]
      .collect().sortBy(_._1).toSeq

  test("pdfTriage: golden documents — precedence, decoys, truncation, " +
      "incremental updates, garbage") {
    val lin = "%PDF-1.6\n" +
      "1 0 obj\n<< /Linearized 1 /L 1234 /N 7 >>\nendobj\n" +
      "2 0 obj\n<< /Type /Pages /Count 99 >>\nendobj\n" + // /N wins
      "trailer\n<< /Size 9 /Root 4 0 R >>\nstartxref\n500\n%%EOF\n"
    val plain = "%PDF-1.4\n" +
      "2 0 obj\n<< /Type /Pages /Kids [] /Count 3 >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page >>\nendobj\n" +
      "trailer\n<< /Size 9 /Root 4 0 R /Encrypt 5 0 R >>\n" +
      "startxref\n42\n%%EOF\n"
    // no /N, no /Count: falls back to counting /Type /Page objects,
    // and the /Type /Pages root must NOT count
    val fallback = "%PDF-2.0\n" +
      "2 0 obj\n<< /Type /Pages /Kids [] >>\nendobj\n" +
      "3 0 obj\n<< /Type /Page >>\nendobj\n" +
      "4 0 obj\n<< /Type /Page >>\nendobj\n" +
      "trailer\n<< /Size 9 /Root 4 0 R >>\nstartxref\n7\n%%EOF\n"
    // incremental update: TWO startxref entries — the LAST is operative
    val updated = "%PDF-1.7\n" +
      "2 0 obj\n<< /Type /Pages /Count 1 >>\nendobj\n" +
      "startxref\n100\n%%EOF\n" +
      "5 0 obj\n<< /Foo 1 >>\nendobj\n" +
      "startxref\n900\n%%EOF\n"
    // truncated right after startxref: no offset, no EOF, rest parsed
    val truncated = "%PDF-1.3\n" +
      "2 0 obj\n<< /Type /Pages /Count 2 >>\nendobj\n" +
      "trailer\n<< /Size 9 /Root 4 0 R >>\nstartxref\n"
    // bad version digits: format recognized, version NULL
    val badVer = "%PDF-XY\nstartxref\n5\n%%EOF\n"
    val got = triage(
      (1L, lin), (2L, plain), (3L, fallback), (4L, updated),
      (5L, truncated), (6L, badVer), (7L, "not a pdf at all"))
    assert(got === Seq(
      (1L, Some("1.6"), Some(true), Some(7L), Some(500L), Some(true),
        Some(false)),
      (2L, Some("1.4"), Some(false), Some(3L), Some(42L), Some(true),
        Some(true)),
      (3L, Some("2.0"), Some(false), Some(2L), Some(7L), Some(true),
        Some(false)),
      (4L, Some("1.7"), Some(false), Some(1L), Some(900L), Some(true),
        Some(false)),
      (5L, Some("1.3"), Some(false), Some(2L), None, Some(false),
        Some(false)),
      (6L, None, Some(false), None, Some(5L), Some(true), Some(false)),
      (7L, None, None, None, None, None, None)))
  }

  test("synthPdfBytes round-trips across the corpus, negative ids too") {
    for (docs <- Seq(
      graft.sources.Sources.table(spark, sf, "documents").select($"doc_id"),
      spark.range(-64, 0).toDF("doc_id"))) {
      val got = Pdf.pdfTriage(Pdf.synthPdfBytes(docs, "doc_id"))
      val id = $"media_id"
      def m(k: Int) = pmod(id, lit(k))
      val pdfRow = m(11) =!= 6
      val bad = got.where(
        when(!pdfRow,
          $"pdf_version".isNotNull || $"linearized".isNotNull ||
            $"n_pages_approx".isNotNull || $"startxref".isNotNull ||
            $"has_eof".isNotNull || $"encrypted".isNotNull)
          .otherwise(
            $"pdf_version" =!= when(m(13) === 9, "2.0")
              .otherwise(concat(lit("1."), m(8).cast("string"))) ||
            $"linearized" =!= (m(2) === 0) ||
            $"n_pages_approx" =!= m(6) + 1 ||
            coalesce($"startxref", lit(-1L)) =!=
              when(m(7) === 2, -1L).otherwise(m(100) + 9000) ||
            $"has_eof" =!= (m(7) =!= 2) ||
            $"encrypted" =!= (m(3) === 0)))
      assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
    }
  }
}
