package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram (SentencePiece-style) tokenizer training — the second
  * tokenizer family next to [[Bpe]]: instead of greedily LEARNING
  * merges, unigram starts from a large seed vocabulary of substrings
  * and alternates segmentation with pruning until the vocabulary fits.
  *
  * This implementation is VITERBI (hard) EM with INTEGER scores — a
  * documented, deliberate simplification of the soft-EM/log-likelihood
  * original (Kudo 2018): each round segments every word type by the
  * best piece sequence under the current scores (fewest pieces, then
  * highest total score, then lexicographically smallest sequence — a
  * total order both engines can replay), recounts piece usage over the
  * segmentations, and prunes to the piece budget. Soft EM's float
  * likelihoods cannot be replayed bit-exactly across engines; the
  * integer lexicographic objective can, so the DuckDB oracle (q186)
  * re-derives every seed score, every winning segmentation, and every
  * pruning decision exactly — the same exactness standard the BPE
  * trainer (q157) holds.
  *
  * SCALE SHAPE (the [[Bpe.learnMerges]] driver-fast-path pattern): the
  * corpus-scale work is ONE distributed word-histogram aggregation
  * (map-side combined, shuffle carries one row per distinct word type);
  * the EM loop runs driver-side over the collected histogram, whose
  * size is language-vocabulary-bounded, not corpus-bounded. Histograms
  * over `maxDriverTypes` are truncated to the most frequent types
  * (count desc, word asc — deterministic), the standard
  * sentence-sampling concession, LOGGED via the returned metadata
  * rather than silent.
  */
object Unigram {

  /** Word pre-tokenization for training: lowercased letter runs.
    * Deliberately simpler than [[Bpe.preTokenize]] (no leading-space
    * pieces): unigram pieces here are intra-word, the common
    * configuration for the family. `maxWordLen` caps the types entering
    * the histogram (oracle exhibits use small caps; 64 loses nothing
    * real — longer "words" in crawl text are URLs/DNA/garbage). */
  private[graft] def wordsOf(t: String, maxWordLen: Int): Seq[String] =
    if (t == null) Nil
    else "[a-z]+".r.findAllIn(t.toLowerCase).filter(_.length <= maxWordLen)
      .toSeq

  /** Element-wise sequence comparison matching DuckDB's LIST ordering
    * (and Python's): first differing element decides; prefix < longer. */
  private[graft] def lexLess(a: List[String], b: List[String]): Boolean = {
    var x = a; var y = b
    while (x.nonEmpty && y.nonEmpty) {
      val c = x.head.compareTo(y.head)
      if (c != 0) return c < 0
      x = x.tail; y = y.tail
    }
    x.isEmpty && y.nonEmpty
  }

  /** Viterbi segmentation of one word under the current integer scores:
    * minimize piece count, then maximize total score, then the
    * lexicographically smallest piece sequence — computed right-to-left
    * so the list tie-break has optimal substructure (equal pieces imply
    * equal suffix positions). Single characters absent from the vocab
    * pass through with score 0, so any word segments (during training
    * every character IS in the vocab; the fallback only fires when
    * encoding unseen text). */
  private[graft] def segment(word: String, vocab: Map[String, Long],
                             maxPieceLen: Int): List[String] = {
    val n = word.length
    val bestN = new Array[Int](n + 1)
    val bestS = new Array[Long](n + 1)
    val bestSeq = new Array[List[String]](n + 1)
    bestSeq(n) = Nil
    var i = n - 1
    while (i >= 0) {
      var selN = Int.MaxValue
      var selS = Long.MinValue
      var sel: List[String] = null
      var l = 1
      val lMax = math.min(maxPieceLen, n - i)
      while (l <= lMax) {
        if (bestSeq(i + l) != null) {
          val p = word.substring(i, i + l)
          val sc = vocab.get(p) match {
            case Some(s) => s
            case None => if (l == 1) 0L else Long.MinValue
          }
          if (sc != Long.MinValue) {
            val cn = bestN(i + l) + 1
            val cs = bestS(i + l) + sc
            val cand = p :: bestSeq(i + l)
            if (cn < selN || (cn == selN && (cs > selS ||
              (cs == selS && lexLess(cand, sel))))) {
              selN = cn; selS = cs; sel = cand
            }
          }
        }
        l += 1
      }
      bestN(i) = selN; bestS(i) = selS; bestSeq(i) = sel
      i -= 1
    }
    bestSeq(0)
  }

  /** One hard-EM round over the histogram: segment → usage counts →
    * prune to (all single chars) + (top `keepPieces` multi-char pieces
    * by usage desc, piece asc). Characters are never pruned — every
    * word must stay segmentable. */
  private[graft] def emRound(hist: Array[(String, Long)],
                             vocab: Map[String, Long], chars: Set[String],
                             maxPieceLen: Int,
                             keepPieces: Int): Map[String, Long] = {
    val use = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      segment(w, vocab, maxPieceLen).foreach(p =>
        use.update(p, use.getOrElse(p, 0L) + c))
    }
    val keptMulti = use.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, u) => (-u, p) }.take(keepPieces)
    (chars.iterator.map(c => c -> use.getOrElse(c, 0L)) ++ keptMulti).toMap
  }

  /** Train a unigram piece vocabulary: (rank, piece, score) — rank by
    * final usage desc then piece asc; score is the final round's usage
    * (0 for characters the last segmentation never used). The final
    * vocabulary is all corpus characters + `keepPieces` multi-char
    * pieces. */
  def train(df: DataFrame, textCol: String, keepPieces: Int = 4096,
            rounds: Int = 2, maxPieceLen: Int = 8, seedSize: Int = 1 << 16,
            maxWordLen: Int = 64,
            maxDriverTypes: Long = 1L << 19): DataFrame = {
    require(keepPieces >= 0 && rounds >= 1 && maxPieceLen >= 2 &&
      seedSize >= 1 && maxWordLen >= 1,
      s"keepPieces=$keepPieces rounds=$rounds maxPieceLen=$maxPieceLen " +
        s"seedSize=$seedSize maxWordLen=$maxWordLen")
    val spark = df.sparkSession
    import spark.implicits._
    // the one corpus-scale job: word-type histogram, map-side combined
    val histDf = df.select(col(textCol).cast(StringType)).as[String]
      .flatMap(wordsOf(_, maxWordLen))
      .groupBy("value").count()
    // over-cap histograms keep the most frequent types, deterministically
    val hist: Array[(String, Long)] = histDf
      .orderBy(col("count").desc, col("value").asc)
      .limit(math.min(maxDriverTypes, Int.MaxValue).toInt)
      .as[(String, Long)].collect()
    trainLocal(spark, hist, keepPieces, rounds, maxPieceLen, seedSize)
  }

  /** Driver-side seed + EM over a collected histogram — exposed for
    * specs to drive with engineered histograms. */
  private[graft] def trainLocal(spark: SparkSession,
                                hist: Array[(String, Long)],
                                keepPieces: Int, rounds: Int,
                                maxPieceLen: Int,
                                seedSize: Int): DataFrame = {
    import spark.implicits._
    // seed scores: every substring of length 1..maxPieceLen, weighted
    // by word-type count (a piece occurring twice in one word counts
    // twice)
    val scores = scala.collection.mutable.HashMap.empty[String, Long]
    hist.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        val lMax = math.min(maxPieceLen, w.length - i)
        while (l <= lMax) {
          val p = w.substring(i, i + l)
          scores.update(p, scores.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = scores.keysIterator.filter(_.length == 1).toSet
    // seed selection: standard frequency×length goodness, top seedSize
    // multi-char candidates (chars always in)
    val seedMulti = scores.iterator.filter(_._1.length > 1).toSeq
      .sortBy { case (p, s) => (-s * p.length, p) }.take(seedSize)
    var vocab: Map[String, Long] =
      (chars.iterator.map(c => c -> scores(c)) ++ seedMulti).toMap
    for (_ <- 1 to rounds)
      vocab = emRound(hist, vocab, chars, maxPieceLen, keepPieces)
    val ranked = vocab.toSeq.sortBy { case (p, s) => (-s, p) }.zipWithIndex
      .map { case ((p, s), i) => (i + 1, p, s) }
    spark.createDataset(ranked).toDF("rank", "piece", "score")
  }

  /** Export the trained vocabulary as the SentencePiece-style `.vocab`
    * TSV (piece TAB score, rank order) — the interchange artifact the
    * family's tooling reads; round-trips via [[importVocab]]. */
  def exportVocab(vocab: DataFrame, dir: String): Unit = {
    val rows = vocab.select(col("rank"), col("piece"), col("score"))
      .orderBy("rank")
      .collect()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    val sb = new StringBuilder
    rows.foreach { r =>
      sb.append(r.getString(1)).append('\t').append(r.getLong(2))
        .append('\n')
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "unigram.vocab"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Read a `.vocab` TSV back to (rank, piece, score). */
  def importVocab(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "unigram.vocab"),
      java.nio.charset.StandardCharsets.UTF_8)
    val rows = (0 until lines.size()).map { i =>
      val t = lines.get(i).split('\t')
      (i + 1, t(0), t(1).toLong)
    }
    spark.createDataset(rows).toDF("rank", "piece", "score")
  }

  /** Segment a text column with a trained vocabulary: appends
    * `pieces: array<string>` — each word Viterbi-segmented under the
    * trained scores, words concatenated in order. The vocabulary is
    * driver-collected (vocab-bounded by construction) and ships in the
    * task closure; the scan itself is a narrow map. */
  def encode(df: DataFrame, textCol: String, vocab: DataFrame,
             maxPieceLen: Int = 8, maxWordLen: Int = 64): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val spark = df.sparkSession
    import spark.implicits._
    val v: Map[String, Long] = vocab.select(col("piece"), col("score"))
      .as[(String, Long)].collect().toMap
    require(!df.columns.contains("pieces"),
      "Unigram.encode: df already has a 'pieces' column — rename it")
    val ti = df.schema.fieldIndex(textCol)
    require(df.schema(ti).dataType == StringType,
      s"$textCol must be STRING, got ${df.schema(ti).dataType}")
    // broadcast the (vocab-bounded) score map; typed narrow map — the
    // bpeEncode shape, no UDF, passthrough columns survive
    val bc = spark.sparkContext.broadcast(v)
    val outSchema = StructType(df.schema.fields.toSeq :+
      StructField("pieces", ArrayType(StringType, containsNull = false)))
    df.map({ r =>
      val t = r.getAs[String](ti)
      val pieces =
        if (t == null) Seq.empty[String]
        else wordsOf(t, maxWordLen).flatMap(w =>
          segment(w, bc.value, maxPieceLen))
      Row.fromSeq(r.toSeq :+ pieces)
    })(Encoders.row(outSchema))
  }
}
