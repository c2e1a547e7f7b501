package graft

import org.apache.spark.sql.functions._

import graft.text.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val demoRanks =
    Bpe.demoMerges.zipWithIndex.map { case (p, i) => p -> i }.toMap

  test("encode goldens: cascades, leading-space chunks, unknown chars") {
    def e(s: String) = Bpe.encode(s, demoRanks)
    assert(e("the") === List("the"))           // th -> the cascade
    assert(e(" and the") === List(" ", "and", " ", "the"))
    assert(e("than") === List("th", "an"))     // two independent merges
    assert(e("instr") === List("in", "st", "r"))
    assert(e("xyz") === List("x", "y", "z"))   // nothing merges
    assert(e("") === Nil)
    assert(e(null) === Nil)
    // multiple spaces NOT followed by a letter stay a space-run chunk
    assert(e("ab  cd") === List("a", "b", " ", " ", "c", "d"))
    // punctuation is its own chunk (partition totality)
    assert(e("a.b") === List("a", ".", "b"))
  }

  test("preTokenize groups digit runs (GPT-2 ' ?\\p{N}+' shape) with " +
      "optional leading space; mixed runs split at class boundaries") {
    assert(Bpe.preTokenize("a 2026 b") === List("a", " 2026", " b"))
    assert(Bpe.preTokenize("abc123") === List("abc", "123"))
    assert(Bpe.preTokenize("1,234") === List("1", ",", "234"))
    assert(Bpe.preTokenize("  42") === List("  ", "42"))
    // a merge table over digits now applies within the run
    val ranks = Map(("2", "0") -> 0, ("20", "2") -> 1, ("202", "6") -> 2)
    assert(Bpe.encode("in 2026", ranks) === List("i", "n", " ", "2026"))
  }

  test("a merge pass replaces ALL non-overlapping occurrences left to " +
      "right (the GPT-2 batch semantics)") {
    val ranks = Map(("a", "a") -> 0)
    assert(Bpe.encodeChunk("aaa", ranks) === List("aa", "a"))
    assert(Bpe.encodeChunk("aaaa", ranks) === List("aa", "aa"))
    // lowest rank is chosen ACROSS the chunk even when a higher-rank
    // pair appears first
    val ranks2 = Map(("e", "r") -> 0, ("r", "e") -> 1)
    assert(Bpe.encodeChunk("rere", ranks2) === List("r", "er", "e"))
    // a merge can create the input of a LOWER-rank rule seen next round
    val ranks3 = Map(("b", "c") -> 0, ("a", "bc") -> 1)
    assert(Bpe.encodeChunk("abc", ranks3) === List("abc"))
  }

  test("decode(encode(x)) == x for arbitrary strings, non-ASCII included") {
    val rnd = new scala.util.Random(150)
    // sample whole CODE POINTS (the emoji is a surrogate pair — sampling
    // UTF-16 units would fabricate invalid strings no codec round-trips)
    val pool = Seq("a", "b", "t", "h", "e", "r", "i", "n", "s", " ",
      ".", "!", "é", "中", "😀")
    for (_ <- 0 until 2000) {
      val s = (0 until rnd.nextInt(30))
        .map(_ => pool(rnd.nextInt(pool.length))).mkString
      val toks = Bpe.encode(s, demoRanks)
      assert(Bpe.decode(toks) === s, s"round-trip broke on '$s'")
      // preTokenize is a PARTITION of the input
      assert(Bpe.preTokenize(s).mkString === s)
    }
  }

  test("pathological unbroken runs are cap-split: bounded CPU, decode " +
      "still round-trips, merges apply within each piece") {
    // a 100k-letter run (the base64-blob / DNA-sequence shape) must
    // encode in bounded time — the O(chunk²) merge loop is capped at
    // MaxChunkChars² per piece
    val run = "th" * 50000 // 100k chars, every 'th' mergeable
    val t0 = System.nanoTime()
    val toks = Bpe.encode(run, demoRanks)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(Bpe.decode(toks) === run)
    assert(toks.forall(_ == "th"), "merges must still fire inside pieces")
    assert(ms < 30000, s"cap failed to bound the merge loop: $ms ms")
    // boundary behavior: a merge CAN be refused at a piece boundary
    // (same contract as a word boundary) but bytes are never lost
    val odd = "t" + ("ht" * 70000) // boundaries fall mid-'th'
    assert(Bpe.decode(Bpe.encode(odd, demoRanks)) === odd)
  }

  test("token ids: bytes 0-255 for single-byte tokens, 256+rank for " +
      "merges; multi-byte UTF-8 splits into byte tokens") {
    val out = Bpe.bpeEncode(
      Seq((1L, "the café")).toDF("id", "txt"), "txt")
      .select($"bpe_tokens", $"bpe_ids")
      .as[(Seq[String], Seq[Int])].head()
    // 'the' -> merged id 257 (rank 1); é -> UTF-8 0xC3 0xA9 byte tokens
    assert(out._1 === Seq("the", " ", "c", "a", "f", "Ã", "©"))
    assert(out._2 === Seq(257, 32, 'c'.toInt, 'a'.toInt, 'f'.toInt,
      0xC3, 0xA9))
    assert(Bpe.decode(out._1) === "the café")
  }

  test("bpeEncode: passthrough columns survive, reserved names refused, " +
      "NULL text yields empty arrays, plan is exchange-free") {
    val df = Seq((1L, "the", "x"), (2L, null.asInstanceOf[String], "y"))
      .toDF("id", "txt", "note")
    val out = Bpe.bpeEncode(df, "txt")
    assert(out.columns.toSeq ===
      Seq("id", "txt", "note", "bpe_tokens", "bpe_ids"))
    val got = out.select($"id", $"note", size($"bpe_tokens"))
      .as[(Long, String, Int)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "x", 1), (2L, "y", 0)))
    intercept[IllegalArgumentException] {
      Bpe.bpeEncode(df.withColumnRenamed("note", "bpe_ids"), "txt")
    }
    // the tokenizer is a narrow map: no exchange anywhere in its plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("learnMerges: frequency-ordered merges with lexicographic " +
      "tie-break, early stop when pairs run out, train->encode " +
      "composition") {
    val corpus = Seq("aaab", "aaab", "ab").toDF("txt")
    val learned = Bpe.learnMerges(corpus, "txt", 6)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    // round 0: (a,a) 4 weighted adjacencies beats (a,b) 3;
    // round 1: after [aa,a,b]/[a,b], (a,b) has 3;
    // round 2: (aa,ab) 2; then no repeated pairs remain -> early stop
    assert(learned === Seq((0, "a", "a", 4L), (1, "a", "b", 3L),
      (2, "aa", "ab", 2L)))
    // the learned table drives the encoder directly: all three merges
    // cascade, collapsing the whole word to one learned token
    val merges = learned.map(m => (m._2, m._3))
    val enc = Bpe.bpeEncode(Seq((1L, "aaab")).toDF("id", "txt"), "txt",
      merges).select($"bpe_tokens").as[Seq[String]].head()
    assert(enc === Seq("aaab"))
    assert(Bpe.decode(enc) === "aaab")
    // a partial word still uses the intermediate merges
    val enc2 = Bpe.bpeEncode(Seq((1L, "aabx")).toDF("id", "txt"), "txt",
      merges).select($"bpe_tokens").as[Seq[String]].head()
    assert(enc2 === Seq("aa", "b", "x"))
  }

  test("learnMerges is deterministic across repartitionings, and the " +
      "driver-side fast path is bit-identical to the distributed loop") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select(lower(substring(regexp_replace($"text", "[^A-Za-z ]", ""),
        1, 48)).as("txt"))
      .where(length($"txt") > 0)
    def run(df: org.apache.spark.sql.DataFrame, cap: Long) =
      Bpe.learnMerges(df, "txt", 4, maxDriverTypes = cap)
        .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    val local = run(docs.where(lit(true)), 1L << 19)
    assert(local === run(docs.repartition(17), 1L << 19))
    // maxDriverTypes = 0 forces the distributed loop on the same corpus
    assert(local === run(docs.where(lit(true)), 0L))
  }

  test("learnMerges trains on the byte alphabet encodeChunk uses: " +
      "non-ASCII merges apply at encode time (train->encode identity)") {
    // 'é' is UTF-8 0xC3 0xA9: training must learn the BYTE pair
    // (Ã, ©), not the code-point singleton 'é' no encoder seed forms
    val corpus = Seq("ééé", "éé").toDF("txt")
    val learned = Bpe.learnMerges(corpus, "txt", 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(learned.head._2 === "Ã" && learned.head._3 === "©",
      s"first merge must be the UTF-8 byte pair of 'é': $learned")
    val merges = learned.map(m => (m._2, m._3))
    val enc = Bpe.bpeEncode(Seq((1L, "éé")).toDF("id", "txt"), "txt",
      merges).select($"bpe_tokens").as[Seq[String]].head()
    assert(enc.length < 4, s"learned merges must APPLY at encode: $enc")
    assert(Bpe.decode(enc) === "éé")
    // distributed path agrees on the byte alphabet too
    val dist = Bpe.learnMerges(corpus, "txt", 2, maxDriverTypes = 0L)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(dist === learned)
  }

  test("training skips a candidate pair whose concatenation collides " +
      "with an already-learned token string, on both paths") {
    // the trigger state is (arguably) unreachable from char-seeded
    // corpora, so drive both loops with an ENGINEERED histogram:
    // ('ab','c') wins round 0 making token 'abc'; round 1's raw argmax
    // ('a','bc') spells the same string and must be skipped (bpeEncode's
    // contiguous 256+rank ids need unique token strings), leaving
    // ('x','y') as the round-1 winner
    val hist = Array(
      (10L, Array("ab", "c")),
      (9L, Array("a", "bc")),
      (3L, Array("x", "y")))
    val local = Bpe.learnMergesLocal(hist, 4)
    assert(local === Seq((0, "ab", "c", 10L), (1, "x", "y", 3L)),
      s"collision not skipped: $local")
    val histDf = hist.toSeq.toDF("cnt", "toks")
    val dist = Bpe.learnMergesDistributed(histDf, 4)
    assert(dist === local, "distributed path diverged on the guard")
  }

  test("duplicate or colliding merge tables are refused") {
    val df = Seq((1L, "ab")).toDF("id", "txt")
    intercept[IllegalArgumentException] {
      Bpe.bpeEncode(df, "txt", Seq(("a", "b"), ("a", "b")))
    }
    intercept[IllegalArgumentException] {
      // ('t','he') and ('th','e') both produce token 'the'
      Bpe.bpeEncode(df, "txt",
        Seq(("t", "h"), ("h", "e"), ("t", "he"), ("th", "e")))
    }
  }

  test("tokenizer artifact round-trip: learn → export → import → " +
      "encode bit-equals learn → encode; a corpus-trained table " +
      "drives bpeEncode from disk") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "bpe_io")
      .toString
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select(lower(substring(regexp_replace(col("text"),
        "[^A-Za-z ]", ""), 1, 48)).as("t"))
    val learned = Bpe.learnMerges(docs, "t", 6)
    val pairs = learned.select("left_tok", "right_tok")
      .orderBy("rank").as[(String, String)].collect().toSeq
    Bpe.exportTokenizer(learned, dir)
    val imported = Bpe.importMerges(spark, dir)
    assert(imported === pairs, "merge table must round-trip exactly")
    // the imported table drives bpeEncode identically
    def ids(merges: Seq[(String, String)]) =
      Bpe.bpeEncode(docs.limit(50), "t", merges)
        .select(array_join(col("bpe_ids"), ",")).as[String]
        .collect().toSeq
    assert(ids(imported) === ids(pairs))
  }

  test("exported files are the GPT-2 shape: Ġ for space, remapped " +
      "non-ASCII, #version header, vocab ids = byte/256+rank") {
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "bpe_gold")
      .toString
    // ' t'+'h' exercises the space remap; the 0xC3/0xA9 pair is the
    // UTF-8 bytes of 'é' — a non-ASCII merge learned from real text
    val merges = Seq((0, " t", "h", 9L), (1, 0xC3.toChar.toString,
      0xA9.toChar.toString, 7L))
      .toDF("rank", "left_tok", "right_tok", "pair_count")
    Bpe.exportTokenizer(merges, dir)
    val mergesTxt = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "merges.txt")), "UTF-8")
    assert(mergesTxt === "#version: 0.2\nĠt h\nÃ ©\n")
    val vocabJson = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(dir, "vocab.json")), "UTF-8")
    assert(vocabJson.startsWith("{"))
    assert(vocabJson.contains("\"a\": 97"))        // byte id = value
    assert(vocabJson.contains("\"Ġth\": 256")) // merged id = 256+rank
    assert(vocabJson.contains("\"Ã©\": 257"))
    assert(vocabJson.contains("\"\\\"\": 34"))      // quote escaped
    // import round-trips back to raw-byte tokens
    val back = Bpe.importMerges(spark, dir)
    assert(back === Seq((" t", "h"),
      (0xC3.toChar.toString, 0xA9.toChar.toString)))
    // a malformed line fails fast — config, not corpus data (fresh
    // dir: overwriting the Hadoop-written file with java.nio would
    // leave a stale .crc behind and fail on checksum, not content)
    val dir2 = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "bpe_bad")
      .toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir2, "merges.txt"),
      "#version: 0.2\nonetoken\n")
    intercept[IllegalArgumentException] {
      Bpe.importMerges(spark, dir2)
    }
  }
}
