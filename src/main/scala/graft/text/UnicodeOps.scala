package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.NfcNormalize

/** Unicode normalization + mojibake repair — the standard first stage
  * before any hashing-based text operator (dedup, fingerprints, n-gram
  * LM): the composed and decomposed spellings of the same word must hash
  * identically, crawl text is full of zero-width/control junk, and a
  * measurable slice of every web corpus is UTF-8 that was mis-decoded as
  * Latin-1 somewhere upstream ("Ã©" where "é" was meant).
  *
  * Pipeline (order is load-bearing):
  *  1. mojibake repair FIRST (it operates on the raw mis-decoding): a row
  *     is repaired only when (a) every char is <= U+00FF (else the
  *     Latin-1 re-encode couldn't be faithful), (b) it contains a UTF-8
  *     lead+continuation SHAPE mis-decoded into Latin-1 chars
  *     ([U+00C2-U+00DF][U+0080-U+00BF] etc. — honest Latin-1 text like
  *     "café à la" never puts a continuation-range char right after an
  *     accented one), and (c) the re-encoded bytes VALIDATE as UTF-8
  *     (try_validate_utf8 — never ANSI decode, one garbage row must not
  *     kill the job). Anything failing the three gates passes through
  *     unchanged; one repair pass only (double-mojibake is left for a
  *     second application, deliberately not looped);
  *  2. NFC composition ([[graft.functions.NfcNormalize]], native codegen
  *     expression);
  *  3. zero-width (U+200B..U+200D, U+FEFF) and C0 control chars stripped
  *     (tab/newline/CR survive as whitespace — they are text, not junk).
  *
  * Appends `outCol`; malformed input degrades, never throws. */
object UnicodeOps {

  private val mojibakeShape =
    "[\\u00C2-\\u00DF][\\u0080-\\u00BF]" +
      "|[\\u00E0-\\u00EF][\\u0080-\\u00BF]{2}" +
      "|[\\u00F0-\\u00F4][\\u0080-\\u00BF]{3}"
  private val latin1Only = "^[\\u0000-\\u00FF]*$"
  private val junkChars =
    "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F" +
      "\\u200B\\u200C\\u200D\\uFEFF]"

  /** Append `outCol` = mojibake-repaired, NFC-normalized, junk-stripped
    * `textCol`. */
  def normalizeText(df: DataFrame, textCol: String,
                    outCol: String = "text_norm"): DataFrame = {
    require(!df.columns.contains(outCol),
      s"UnicodeOps.normalizeText: df already has a '$outCol' column — " +
        "rename it first; normalizeText appends its own")
    NfcNormalize.register(df.sparkSession)
    val t = col(textCol).cast("string")
    // encode runs ONLY on rows that passed the latin1-only gate (CASE
    // branches evaluate lazily), so ANSI's unmappable-character error is
    // unreachable; try_validate_utf8 NULLs a failed re-decode and the
    // coalesce keeps the original.
    val repaired = when(
      t.rlike(latin1Only) && t.rlike(mojibakeShape),
      coalesce(
        expr(s"try_validate_utf8(CAST(encode(CAST(`$textCol` AS STRING), " +
          "'ISO-8859-1') AS STRING))"),
        t)).otherwise(t)
    df.withColumn(outCol, repaired)
      .withColumn(outCol, expr(s"nfc_normalize(`$outCol`)"))
      .withColumn(outCol, regexp_replace(col(outCol), junkChars, ""))
  }

  /** Deterministic text exhibits from an id column — the test/demo source
    * for [[normalizeText]]: pmod 3 selects DECOMPOSED input (e+U+0301,
    * i+U+0303 — NFC must compose; zero-width junk planted), MOJIBAKE
    * input (the whole junked string UTF-8-encoded then mis-decoded as
    * Latin-1 — repair must restore it byte-exact, then the junk strips),
    * or ALREADY-CLEAN input with no junk (the pipeline must be a no-op,
    * pinned by the oracle's `changed` column). The clean text
    * deliberately contains "café à la niño" — accented chars followed by
    * spaces/letters, the shape an over-eager mojibake heuristic would
    * corrupt — so the no-false-positive gate is exercised on every clean
    * row. All rows' expected output is the same id-arithmetic string. */
  def synthMojibake(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = pmod(id, lit(k))
    def mk(mid: String, tail: String) = concat(
      lit("Doc "), id.cast("string"), lit(mid),
      m(50).cast("string"), lit(tail))
    // composed: caf\u00e9 \u00e0 la ni\u00f1o
    val clean = mk(" caf\u00e9 \u00e0 la ni\u00f1o ", " zap!")
    // zero-width space inside the last word + a C0 control before '!'
    val junked = mk(" caf\u00e9 \u00e0 la ni\u00f1o ",
      " za\u200Bp\u0007!")
    // decomposed: e+COMBINING ACUTE, a+COMBINING GRAVE, n+COMBINING TILDE
    val decomposed = mk(
      " cafe\u0301 a\u0300 la nin\u0303o ", " za\u200Bp\u0007!")
    val mojibake = decode(encode(junked, "UTF-8"), "ISO-8859-1")
    docs.select(id.as("media_id"),
      when(m(3) === 0, decomposed)
        .when(m(3) === 1, mojibake)
        .otherwise(clean).as("text_raw"))
  }
}
