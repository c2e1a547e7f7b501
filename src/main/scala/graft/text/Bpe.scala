package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-level BPE (byte-pair-encoding) tokenizer ENCODE — the step
  * between a curated text corpus and an actual training shard: training
  * corpora are tokenized with a learned merge table (GPT-2-style byte
  * BPE), not the frequency-vocabulary word ids of
  * [[graft.operators.Packing]]'s upstream. This implements the standard
  * greedy encode loop over a PROVIDED merge-rank table:
  *
  *   1. pre-tokenize: split text into chunks (` ?[letters]+` | ` +` —
  *      the GPT-2 shape: a word carries its leading space; merges never
  *      cross chunk boundaries, which also bounds the quadratic merge
  *      loop to word length);
  *   2. seed each chunk with its UTF-8 BYTES as single-byte tokens
  *      (rendered as ISO-8859-1 chars so token-string concatenation
  *      reproduces the bytes exactly — the GPT-2 byte-alphabet trick);
  *   3. repeat: find the LOWEST-RANK adjacent pair present anywhere in
  *      the chunk, replace ALL its non-overlapping occurrences left to
  *      right, until no listed pair remains.
  *
  * Token ids: a single-byte token's id is its byte value (0-255); the
  * token made by merge rank r has id 256 + r — the standard contiguous
  * vocab layout.
  *
  * Decode is concatenation (BPE merges preserve adjacency), so
  * `decode(encode(x)) == x` for ALL inputs — the property BpeSpec
  * asserts, including non-ASCII (multi-byte UTF-8 splits into byte
  * tokens and reassembles bit-exact).
  *
  * Scale shape: the merge table is the ONLY shared state — broadcast
  * once per executor (a production 50k-merge table is ~MBs; shipping it
  * per-task in the closure would multiply that by tasks). The encode
  * itself is a narrow map — text never shuffles, each chunk's merge
  * loop is O(len²) on words of bounded length. No exchange anywhere
  * (BpeSpec pins the plan). */
object Bpe {

  /** The bounded demo merge table (ranks = index): common English
    * digraphs with two CASCADES (th→the, an→and) so multi-level merges
    * are exercised corpus-wide. q150's DuckDB oracle replays this exact
    * list. */
  val demoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("an", "d"),
    ("o", "n"), ("e", "r"), ("r", "e"), ("o", "r"), ("s", "t"))

  /** Pre-tokenize: partition `s` into chunks, each either (optional
    * leading space + maximal letter run) or a maximal space run that is
    * NOT followed by a letter — i.e. the regex ` ?[A-Za-z]+| +|[^ ]`
    * applied left to right (a non-letter, non-space byte becomes its
    * own chunk so the partition is total and decode round-trips). */
  private[graft] def preTokenize(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    def isLetter(c: Char) =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' && i + 1 < n && isLetter(s.charAt(i + 1))) {
        var j = i + 1
        while (j < n && isLetter(s.charAt(j))) j += 1
        out += s.substring(i, j); i = j
      } else if (isLetter(c)) {
        var j = i
        while (j < n && isLetter(s.charAt(j))) j += 1
        out += s.substring(i, j); i = j
      } else if (c == ' ') {
        var j = i
        while (j < n && s.charAt(j) == ' ') j += 1
        out += s.substring(i, j); i = j
      } else if (Character.isHighSurrogate(c) && i + 1 < n &&
        Character.isLowSurrogate(s.charAt(i + 1))) {
        // keep astral code points (emoji etc.) whole: a lone surrogate
        // is not encodable text — splitting the pair would corrupt the
        // byte stream to '?' and break decode∘encode == id
        out += s.substring(i, i + 2); i += 2
      } else {
        out += s.substring(i, i + 1); i += 1
      }
    }
    out.toList
  }

  /** Encode ONE pre-tokenized chunk: byte-seed, then greedy
    * lowest-rank-first merge passes (each pass replaces every
    * non-overlapping occurrence left to right — the GPT-2 semantics). */
  private[graft] def encodeChunk(chunk: String,
                                 ranks: Map[(String, String), Int])
      : List[String] = {
    val bytes = chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var toks: Array[String] = bytes.map(b =>
      String.valueOf((b & 0xff).toChar))
    while (toks.length > 1) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var k = 0
      while (k < toks.length - 1) {
        ranks.get((toks(k), toks(k + 1))) match {
          case Some(r) if r < best => best = r
          case _ => ()
        }
        k += 1
      }
      if (best == Int.MaxValue) return toks.toList
      // merge ALL non-overlapping occurrences of the best pair, L->R
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length &&
          ranks.get((toks(i), toks(i + 1))).contains(best)) {
          out += toks(i) + toks(i + 1); i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.toArray
    }
    toks.toList
  }

  /** The merge loop is O(chunk²): a pathological unbroken letter run
    * (a 100 KB base64 blob that survived text extraction, a DNA
    * sequence) would cost ~10^10 comparisons in ONE task. Chunks longer
    * than this are split into cap-sized pieces before encoding — merges
    * cannot cross the split (same contract as the word boundary), and
    * the cap bounds per-row CPU at cap² regardless of input. Real
    * tokenizers face the same input and make the same trade (HF
    * tokenizers' max_input_chars_per_word). Decode still round-trips:
    * splitting only refuses merges, never drops bytes. */
  val MaxChunkChars = 1024

  /** Cap-split that never lands between a surrogate pair. (Today only
    * ASCII letter/space runs can exceed the cap — "other" chunks are
    * single code points — but that is an invariant of preTokenize, not
    * of this function's input, so guard it here.) */
  private def splitChunk(s: String, cap: Int): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      var j = math.min(i + cap, s.length)
      if (j < s.length && Character.isHighSurrogate(s.charAt(j - 1)) &&
        Character.isLowSurrogate(s.charAt(j))) j -= 1
      out += s.substring(i, j); i = j
    }
    out.toList
  }

  private[graft] def encode(text: String,
                            ranks: Map[(String, String), Int])
      : List[String] =
    if (text == null) Nil
    else preTokenize(text).flatMap { chunk =>
      if (chunk.length <= MaxChunkChars) encodeChunk(chunk, ranks)
      else splitChunk(chunk, MaxChunkChars).flatMap(encodeChunk(_, ranks))
    }

  /** Inverse: token strings are byte strings; concatenation IS the
    * original byte sequence. */
  private[graft] def decode(tokens: Seq[String]): String = {
    val bytes = tokens.mkString.toCharArray.map(c => c.toByte)
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  /** One non-overlapping left-to-right merge pass for a SPECIFIC pair
    * — the training-side application step (the encoder's pass selects
    * by rank; the trainer applies exactly the pair it just learned). */
  private[graft] def applyPair(toks: Array[String], l: String,
                               r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == l && toks(i + 1) == r) {
        out += l + r; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** LEARN a merge table from a corpus — BPE training, the step that
    * makes [[bpeEncode]]'s input table derivable from YOUR data rather
    * than shipped from elsewhere. Classic algorithm (Sennrich et al.,
    * public), in its scale-true form: train on the WORD-TYPE HISTOGRAM,
    * not the corpus — a 100 TB corpus has a vocab-sized distinct-word
    * table, so after the first groupBy every round's state is
    * vocab-bounded regardless of corpus size. Each round: count
    * adjacent token pairs weighted by word frequency (one groupBy on
    * (l, r) — the only exchange, carrying token pairs), pick the most
    * frequent pair (ties break lexicographically for cross-engine
    * determinism; the argmax is the round's ONE justified driver-side
    * row, the centroid-collect category), apply it non-overlapping
    * left-to-right to every word, repeat. The histogram persists and
    * rolls forward round to round.
    *
    * Returns (rank, left_tok, right_tok, pair_count) — feed straight
    * into `bpeEncode(df, col, merges)`. Stops early if the corpus runs
    * out of repeated pairs. */
  def learnMerges(df: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 65536, s"k: $k")
    val ti = df.schema.fieldIndex(textCol)
    require(df.schema(ti).dataType == StringType,
      s"$textCol must be STRING, got ${df.schema(ti).dataType}")
    val spark = df.sparkSession
    import spark.implicits._
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    var cur = df.select(col(textCol)).as[String]
      .flatMap(t => if (t == null) Nil else preTokenize(t))
      .groupBy("value").count()
      .as[(String, Long)]
      .map { case (w, c) => (c, w.map(_.toString).toArray) }
      .toDF("cnt", "toks")
      .persist(lvl)
    cur.count()
    val learned =
      scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    for (rank <- 0 until k if !exhausted) {
      val best = cur.as[(Long, Array[String])]
        .flatMap { case (c, toks) =>
          (0 until toks.length - 1).iterator
            .map(i => (toks(i), toks(i + 1), c))
        }
        .toDF("l", "r", "c")
        .groupBy("l", "r").agg(sum("c").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect() // ONE row per round, by construction
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (best.head.getString(0), best.head.getString(1),
            best.head.getLong(2))
        learned += ((rank, l, r, c))
        var next = cur.as[(Long, Array[String])]
          .map { case (cn, toks) => (cn, applyPair(toks, l, r)) }
          .toDF("cnt", "toks").persist(lvl)
        next.count()
        // the per-round map chains lineage linearly in k; at production
        // merge counts (tens of thousands) an uncut chain kills the
        // planner long before the data does — same discipline as the
        // CC loop's per-round checkpoint, amortized here because BPE
        // rounds are much cheaper than CC rounds
        if (rank % 16 == 15) next = next.localCheckpoint()
        cur.unpersist()
        cur = next
      }
    }
    cur.unpersist()
    learned.toSeq
      .toDF("rank", "left_tok", "right_tok", "pair_count")
  }

  /** Append `bpe_tokens: array<string>` + `bpe_ids: array<int>` for
    * `textCol`, encoding with `merges` (order = rank). Merge ranks are
    * BROADCAST (one copy per executor); the encode is a narrow map —
    * passthrough columns survive via the same Encoders.row shape as
    * [[graft.sources.Http.parseHttpResponses]]. NULL text yields empty
    * arrays (a row is never dropped by tokenization). */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)] = demoMerges): DataFrame = {
    require(merges.nonEmpty, "empty merge table")
    require(merges.distinct.length == merges.length,
      "duplicate merge pair — ranks would be ambiguous")
    import org.apache.spark.sql.{Encoders, Row}
    Seq("bpe_tokens", "bpe_ids").foreach(c =>
      require(!df.columns.contains(c),
        s"Bpe.bpeEncode: df already has a '$c' column — rename it first"))
    val ti = df.schema.fieldIndex(textCol)
    require(df.schema(ti).dataType == StringType,
      s"$textCol must be STRING, got ${df.schema(ti).dataType}")
    val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val ids: Map[String, Int] =
      merges.zipWithIndex.map { case ((l, r), i) => (l + r) -> (256 + i) }
        .toMap
    require(ids.size == merges.length,
      "two merge rules produce the same token string — ids would collide")
    val spark = df.sparkSession
    val bcRanks = spark.sparkContext.broadcast(ranks)
    val bcIds = spark.sparkContext.broadcast(ids)
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("bpe_tokens", ArrayType(StringType, containsNull = false)),
      StructField("bpe_ids", ArrayType(IntegerType, containsNull = false))))
    df.map({ r =>
      val toks = encode(r.getAs[String](ti), bcRanks.value)
      val tokIds = toks.map { t =>
        if (t.length == 1 && t.charAt(0) < 256) t.charAt(0).toInt
        else bcIds.value(t)
      }
      Row.fromSeq(r.toSeq ++ Seq(toks, tokIds))
    })(Encoders.row(outSchema))
  }
}
