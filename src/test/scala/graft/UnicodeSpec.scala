package graft

import org.apache.spark.sql.functions._

import graft.text.UnicodeOps

class UnicodeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(rows: (Long, String)*): Seq[(Long, String)] =
    UnicodeOps.normalizeText(rows.toDF("media_id", "text_raw"), "text_raw")
      .select($"media_id", $"text_norm")
      .as[(Long, String)].collect().sortBy(_._1).toSeq

  test("normalizeText: NFC composes, junk strips, whitespace survives") {
    val got = norm(
      (1L, "café niño"),          // decomposed -> composed
      (2L, "za\u200Bp q\uFEFF\u0007r"),          // zero-width + control junk
      (3L, "tab\tand\nnewline\rkept"),   // tab/newline/CR are text
      (4L, "plain ascii"),
      (5L, ""))
    assert(got === Seq(
      (1L, "café niño"),
      (2L, "zap qr"),
      (3L, "tab\tand\nnewline\rkept"),
      (4L, "plain ascii"),
      (5L, "")))
  }

  test("normalizeText: mojibake repairs; honest accented text is NOT " +
      "touched; invalid re-decodes fall back to the original") {
    // UTF-8 bytes of the clean string mis-read as Latin-1
    val mangled = new String("café niño".getBytes("UTF-8"), "ISO-8859-1")
    assert(mangled == "cafÃ© niÃ±o")
    val got = norm(
      (1L, mangled),
      // honest Latin-1-looking text: accented chars before spaces/letters
      // never match the lead+continuation shape
      (2L, "café à la carte, señor"),
      // has the shape char U+00C3 but the next char breaks it: untouched
      (3L, "Ã alone and Â too"),
      // contains a char > U+00FF: latin1 gate refuses, untouched
      (4L, "cafÃ© — dash"),
      // shape matches but the re-encode is NOT valid UTF-8 overall
      // (a bare U+00C3 before 'x' after a valid pair): falls back whole
      (5L, "aÃ©b Ãx"))
    assert(got === Seq(
      (1L, "café niño"),
      (2L, "café à la carte, señor"),
      (3L, "Ã alone and Â too"),
      (4L, "cafÃ© — dash"),
      (5L, "aÃ©b Ãx")))
  }

  test("nfc_normalize registers per session and runs inside codegen") {
    graft.functions.NfcNormalize.register(spark)
    val r = spark.sql(
      "SELECT nfc_normalize('café niño') = 'café niño' AS ok, " +
        "nfc_normalize(NULL) IS NULL AS nullok").head()
    assert(r.getBoolean(0) && r.getBoolean(1))
  }

  test("synthMojibake round-trips: all three variants normalize to the " +
      "same id-arithmetic clean string") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val got = UnicodeOps.normalizeText(
      UnicodeOps.synthMojibake(docs, "doc_id"), "text_raw")
    val id = $"media_id"
    val expected = concat(
      lit("Doc "), id.cast("string"),
      lit(" café à la niño "),
      pmod(id, lit(50)).cast("string"), lit(" zap!"))
    val bad = got.where($"text_norm" =!= expected)
    assert(bad.isEmpty,
      bad.select(id, $"text_norm").limit(3).collect().mkString("; "))
    // the clean variant (pmod 3 = 2) must be untouched end to end
    val cleanChanged = got.where(pmod(id, lit(3)) === 2 &&
      $"text_norm" =!= $"text_raw")
    assert(cleanChanged.isEmpty)
  }
}
