package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Repetition-based quality signals for training-data curation — the
  * Gopher/MassiveText family of repetition rules re-expressed Spark-first:
  * per-document n-gram repetition (top-n-gram coverage, duplicated-n-gram
  * fraction) and corpus-level boilerplate n-gram profiling (n-grams shared
  * by many documents — navigation chrome, templates, license headers).
  * Reference analogue: none — beyond-reference operator; the reference's
  * text handling is single-table pandas column derivation
  * (dags/extract_and_tranform.py:84-120).
  *
  * SCALE DESIGN. Both operators count n-grams INSIDE the row first, over
  * higher-order array expressions: tokenize, build the n-gram array, sort
  * it (any total order groups equal grams adjacently — collation never
  * matters), read run lengths off the sorted array — O(g log g) per
  * document.
  *  - [[ngramStats]] stops there: a pure per-row computation, ZERO
  *    shuffle (RepetitionSpec pins the no-Exchange plan). At 100 TB it
  *    runs map-side at scan speed alongside the other quality signals.
  *    The explode-then-groupBy(doc, gram) alternative shuffles every
  *    n-gram occurrence of the corpus just to bring counts back to the
  *    row they started on.
  *  - [[boilerplateProfile]] needs cross-document state (a gram's
  *    document frequency), so one shuffle is irreducible — but the
  *    within-row run counting acts as a pre-aggregation no map-side
  *    combine could perform across an explode: what moves is ONE row per
  *    DISTINCT (document, gram), shaped (60-bit gram hash, id, count) —
  *    ~20 bytes — never per-occurrence rows and never text. Hash
  *    collisions merge grams at ~d²/2⁶¹ probability (d = distinct corpus
  *    grams; ~1e-9 at 50k grams) — the standard fingerprint trade, same
  *    as exact dedup on md5.
  */
object Repetition {

  /** The n-gram array of a token array: space-joined length-`n` windows,
    * empty (not null) when the array has fewer than `n` tokens. The
    * single-element-array + `transform` wrapper binds `toks` once per row
    * (the [[TextOps.winnowFingerprint]] let-binding idiom) — inlined, a
    * non-trivial `toks` expression would re-evaluate per window. */
  def ngramArray(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    element_at(transform(array(toks), ts =>
      when(size(ts) >= n,
        transform(sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", slice(ts, i, lit(n)))))
        .otherwise(array().cast(ArrayType(StringType)))), 1)
  }

  /** Shared within-row machinery: per input row, the SORTED n-gram array
    * `__g`, its size `__m`, and the 0-based run-start positions `__st`
    * (indices where the sorted array changes value — one per distinct
    * gram; run length = next start - this start). */
  private def sortedRuns(docs: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame = {
    val sorted = docs.select(col(idCol),
      array_sort(ngramArray(TextOps.tokens(col(textCol)), n)).as("__g"))
    // Null-safe comparison so (impossible today, cheap to be right about)
    // null grams group as runs; sequence() guarded because sequence(0, -1)
    // counts DOWN (Spark semantics, see winnowFingerprint).
    sorted.select(col(idCol), col("__g"), size(col("__g")).as("__m"),
      when(size(col("__g")) > 0,
        filter(sequence(lit(0), size(col("__g")) - 1),
          i => (i === 0) || !(get(col("__g"), i) <=> get(col("__g"), i - 1))))
        .otherwise(array().cast(ArrayType(IntegerType))).as("__st"))
  }

  /** Per-document n-gram repetition statistics over [[TextOps.tokens]]
    * tokenization: one row per input row with
    *  - `n_ngrams` / `distinct_ngrams`: total and distinct n-gram counts;
    *  - `top_ngram_n` / `top_ngram_frac`: occurrences of the most frequent
    *    n-gram and its share of all n-grams (the Gopher "top n-gram
    *    coverage" rule — boilerplate-heavy docs concentrate mass in one
    *    gram);
    *  - `dup_ngram_n` / `dup_ngram_frac`: occurrences covered by n-grams
    *    appearing 2+ times and their share (the "duplicated n-gram
    *    fraction" rule — high values mean internally repetitive text).
    * Documents shorter than `n` tokens report 0 counts and null stats.
    * Fractions are single int/int double divisions, bit-reproducible
    * cross-engine (q109's DuckDB oracle replays them exactly). */
  def ngramStats(docs: DataFrame, idCol: String, textCol: String,
                 n: Int): DataFrame = {
    val withRuns = sortedRuns(docs, idCol, textCol, n)
      .select(col(idCol), col("__m"), size(col("__st")).as("__d"),
        transform(col("__st"), (s, idx) =>
          coalesce(get(col("__st"), idx + 1), col("__m")) - s).as("__runs"))
    val counted = withRuns.select(col(idCol), col("__m"), col("__d"),
      array_max(col("__runs")).as("__top"),
      aggregate(col("__runs"), lit(0),
        (acc, r) => acc + when(r >= 2, r).otherwise(lit(0))).as("__dup"))
    counted.select(col(idCol),
      col("__m").cast(LongType).as("n_ngrams"),
      col("__d").cast(LongType).as("distinct_ngrams"),
      col("__top").cast(LongType).as("top_ngram_n"),
      when(col("__m") > 0, col("__dup")).cast(LongType).as("dup_ngram_n"),
      when(col("__m") > 0, col("__top") / col("__m")).as("top_ngram_frac"),
      when(col("__m") > 0, col("__dup") / col("__m")).as("dup_ngram_frac"))
  }

  /** Corpus-boilerplate profile: an n-gram is boilerplate when it occurs
    * in at least `minDocs` DISTINCT documents; each document reports how
    * much of it is made of boilerplate —
    * (idCol, `n_ngrams`, `boiler_n`, `boiler_frac`) where `boiler_n`
    * counts gram occurrences (with multiplicity) whose gram is
    * boilerplate. The C4/MassiveText "remove text seen many times across
    * the corpus" rule, restated over n-grams because this corpus has no
    * line structure.
    *
    * The within-row run counting emits ONE (hash, count) struct per
    * distinct gram per document (see the object scaladoc), so both
    * cross-document stages — document-frequency aggregation and the
    * boilerplate join + per-doc sum — shuffle distinct-(doc, gram) rows
    * only. `n_ngrams` is a map-side array size and never shuffles. The
    * boilerplate set stays distributed (hash join, not broadcast): at
    * corpus scale the hot-gram table is unbounded, unlike q101's
    * deliberately-small eval side. */
  def boilerplateProfile(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, minDocs: Int): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val runs = sortedRuns(docs, idCol, textCol, n)
    // one row per DISTINCT gram per doc: (id, gram-hash, within-doc count)
    val perDoc = runs.select(col(idCol),
      explode(transform(col("__st"), (s, idx) => struct(
        TextOps.hash64(get(col("__g"), s)).as("__h"),
        (coalesce(get(col("__st"), idx + 1), col("__m")) - s).as("__cnt"))))
        .as("__gc"))
      .select(col(idCol), col("__gc.__h").as("__h"), col("__gc.__cnt").as("__cnt"))
    val hot = perDoc.groupBy("__h").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= minDocs).select("__h")
    val totals = runs.select(col(idCol), col("__m"))
    val boiler = perDoc.join(hot, Seq("__h"))
      .groupBy(idCol).agg(sum(col("__cnt")).as("__bn"))
    totals.join(boiler, Seq(idCol), "left")
      .select(col(idCol),
        col("__m").cast(LongType).as("n_ngrams"),
        coalesce(col("__bn"), lit(0L)).as("boiler_n"),
        when(col("__m") > 0,
          coalesce(col("__bn"), lit(0L)) / col("__m")).as("boiler_frac"))
  }

  /** Corpus heavy-hitter n-grams: the `k` n-grams present in the MOST
    * documents, with their document frequency `df` and total occurrence
    * count `total_n` — the human-readable face of [[boilerplateProfile]]
    * (that operator scores documents against the hot set; this one shows a
    * curator WHAT the hot set is, the report that decides removal rules).
    *
    * Ties break deterministically: df desc, total desc, gram asc.
    *
    * SCALE SHAPE: the within-row run counting emits one (gram, count) row
    * per DISTINCT gram per document map-side ([[sortedRuns]] — no
    * per-occurrence explode ever shuffles); the gram aggregation
    * partial-aggregates to per-partition distinct grams before its
    * exchange; the top-k is a `TakeOrderedAndProject` — per-partition
    * partial top-k, k rows per partition to the driver, never a global
    * sort. Unlike boilerplateProfile's join key, the shuffled key here is
    * the gram TEXT (the report needs it) — bounded at n·(longest word)
    * chars, and the aggregate is distinct-gram-bounded either side of the
    * exchange. */
  def topNgrams(docs: DataFrame, idCol: String, textCol: String,
                n: Int, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val runs = sortedRuns(docs, idCol, textCol, n)
    val perDoc = runs.select(col(idCol),
      explode(transform(col("__st"), (s, idx) => struct(
        get(col("__g"), s).as("__gram"),
        (coalesce(get(col("__st"), idx + 1), col("__m")) - s).as("__cnt"))))
        .as("__gc"))
      .select(col("__gc.__gram").as("ngram"), col("__gc.__cnt").as("__cnt"))
    perDoc.groupBy("ngram")
      .agg(count(lit(1)).as("df"), sum(col("__cnt")).cast(LongType).as("total_n"))
      .orderBy(col("df").desc, col("total_n").desc, col("ngram"))
      .limit(k)
  }
}
