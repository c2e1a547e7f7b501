package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, token counting, quality scoring, language ID, document
  * fingerprinting. All pure built-in/higher-order expressions — codegen'd,
  * no UDFs, embarrassingly parallel (no shuffle at all): at 100 TB these run
  * map-side at scan speed with full column pruning.
  */
object TextOps {

  /** Whitespace tokenization of normalized text. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text))

  /** BPE-ish token count: letter runs, digit runs, single punctuation —
    * the usual pre-tokenizer regex shape. */
  val bpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpePattern), lit(0)))

  /** Punctuation character ratio (chars outside [a-z0-9\s] over length). */
  def punctRatio(text: Column): Column = {
    val t = lower(text)
    val punct = length(regexp_replace(t, "[a-z0-9\\s]", ""))
    // empty text -> null (DuckDB x/0 is NULL; Spark 0.0/0 would be NaN and
    // silently fall through every `score > t` quality filter)
    when(length(t) > 0, punct / length(t))
  }

  /** Ratio of tokens that are stopwords (duplicates counted — `filter` HOF,
    * not the deduping array_intersect). */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val sw = typedlit(stopwords)
    val toks = tokens(text)
    size(filter(toks, t => array_contains(sw, t))) / size(toks)
  }

  /** Composite quality score in [0,1]: stopword presence, length saturation,
    * low punctuation. Weights arbitrary but fixed; deterministic. */
  def qualityScore(text: Column, stopwords: Seq[String]): Column = {
    val sw = typedlit(stopwords)
    val toks = tokens(text)
    val sr = size(filter(toks, t => array_contains(sw, t))) / size(toks)
    val lenSat = least(lit(1.0), size(toks) / lit(100.0))
    val punct = length(regexp_replace(lower(text), "[a-z0-9\\s]", "")) / length(text)
    // raw double, no rounding: both engines produce bit-identical doubles
    // for identical op order, while round() half-boundary behavior differs.
    // Empty text -> null (see punctRatio).
    when(length(text) > 0,
      lit(0.4) * sr + lit(0.3) * lenSat + lit(0.3) * (lit(1.0) - punct))
  }

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately small + disjoint so ties are rare. */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "que"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "les", "et", "des", "une"))

  /** Stopword-hit count for one language. */
  def langHits(text: Column, words: Seq[String]): Column = {
    val sw = typedlit(words)
    size(filter(tokens(text), t => array_contains(sw, t)))
  }

  /** Characteristic character trigrams per language (the n-gram half of the
    * language-ID heuristic; includes word boundaries as spaces). */
  val langTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("th", "he ", "ing", " of "),
    "es" -> Seq(" el ", " que ", "os ", "ción"),
    "de" -> Seq(" der ", "sch", " und ", "ein"),
    "fr" -> Seq(" le ", " les ", "eau", " est "))

  /** Occurrence count of one literal n-gram: (len - len(text without gram))
    * / len(gram) — portable to any SQL engine with replace(). */
  def ngramHits(text: Column, gram: String): Column = {
    val t = lower(text)
    ((length(t) - length(replace(t, lit(gram), lit("")))) / gram.length)
      .cast(IntegerType)
  }

  /** Total characteristic-trigram hits for one language. */
  def langNgramHits(text: Column, grams: Seq[String]): Column =
    grams.map(g => ngramHits(text, g)).reduce(_ + _)

  /** Language-ID: argmax over combined evidence — stopword-token hits
    * (weight 2: a whole token is stronger evidence than a char n-gram)
    * plus characteristic-trigram hits. First-listed language wins ties
    * (deterministic). */
  def langId(text: Column): Column = {
    val byLang = langStopwords.map { case (l, ws) =>
      val grams = langTrigrams.toMap.apply(l)
      l -> (langHits(text, ws) * 2 + langNgramHits(text, grams))
    }
    val (_, sEn) :: (_, sEs) :: (_, sDe) :: (_, sFr) :: Nil = byLang.toList
    when(sEn >= sEs && sEn >= sDe && sEn >= sFr, "en")
      .when(sEs >= sDe && sEs >= sFr, "es")
      .when(sDe >= sFr, "de")
      .otherwise("fr")
  }

  /** Stopword removal preserving order and non-adjacent duplicates (the
    * cleaning counterpart of [[stopwordRatio]]). Map-side only. */
  def removeStopwords(toks: Column, stopwords: Seq[String]): Column = {
    val sw = typedlit(stopwords)
    filter(toks, t => !array_contains(sw, t))
  }

  /** Collapse runs of identical adjacent tokens to a single token
    * (boilerplate de-repetition — nav menus and scraped templates repeat
    * tokens back-to-back). Index lambda: keep position i iff i == 0 or the
    * token differs from its predecessor under null-safe equality, so null
    * elements collapse as runs too instead of being silently dropped
    * (plain `=!=` yields null for them, which filter treats as false). */
  def collapseAdjacent(toks: Column): Column =
    filter(toks, (t, i) => (i === 0) || !(t <=> get(toks, i - 1)))

  /** 60-bit hash from md5 (cross-engine reproducible: DuckDB computes the
    * same md5 and the same hex->int value). 15 hex chars < 2^60: no sign
    * issues in a signed 64-bit long. */
  def hash64(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast(LongType)

  /** PII patterns (email, NANP-style phone, dotted-quad IPv4) — kept to
    * constructs where java.util.regex (Spark) and RE2 (DuckDB) agree:
    * literal classes, bounded repeats, \\b word boundaries; no lookaround,
    * no backrefs. Counting + redaction are pure map-side expressions — at
    * 100 TB this runs at scan speed alongside the other quality signals. */
  val emailPattern = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val phonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** Occurrences of one PII pattern (input lowercased first). */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(lower(text), lit(pattern), lit(0)))

  /** Redact all three PII classes to typed placeholders. Order matters:
    * emails first (their local part could otherwise be chewed up by later
    * passes), then phones, then IPs. */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(lower(text), emailPattern, "<EMAIL>")
    val p = regexp_replace(e, phonePattern, "<PHONE>")
    regexp_replace(p, ipv4Pattern, "<IP>")
  }

  /** Whole-document content fingerprint over normalized tokens. */
  def fingerprintMd5(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Winnowing-style rolling fingerprint: min 60-bit hash over all 8-token
    * windows (null for docs shorter than 8 tokens). A near-identical doc
    * keeps the same minimum with high probability. */
  def winnowFingerprint(text: Column, window: Int = 8): Column = {
    // let-binding via single-element array + transform: the lambda
    // variable binds the tokenized array ONCE per row. Inlining
    // `tokens(text)` into the slice lambda would re-run the regex split
    // per window position — the O(tokens²) generator bug fixed in
    // Dedup.shingles, which can project the array; a Column function
    // cannot, hence this idiom.
    val perDoc = transform(array(tokens(text)), ts => {
      val n = size(ts)
      val hashes = transform(
        sequence(lit(1), n - (window - 1)),
        i => hash64(concat_ws(" ", slice(ts, i, lit(window)))))
      // guard: sequence(1, k) counts DOWN when k < 1 (Spark semantics)
      when(n >= window, array_min(hashes)).otherwise(lit(null).cast(LongType))
    })
    element_at(perDoc, 1)
  }
}
