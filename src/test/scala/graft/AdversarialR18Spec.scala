package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal
import graft.similarity.Similarity
import graft.sources.{Brotli, Warc}

/** r18 adversarial sweep (the r15/r16/r17 tradition) — edge-probes the
  * r17 stack along the axes the verdict named: brotli dictionary
  * boundaries + every-byte truncation, dHash BMP stride padding and the
  * ICO height-doubling contract, residual PQ degenerate probes, and
  * WET Content-Length overrun. */
class AdversarialR18Spec extends SparkSpec {
  import spark.implicits._

  // ---- a minimal RFC 7932 stream writer: ONE insert-0/copy-L command
  // whose distance addresses the static dictionary (simple 1-symbol
  // prefix codes read zero bits, so the command costs only extra bits)
  private class W {
    private val bytes = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var n = 0
    def bits(v: Int, k: Int): this.type = {
      var i = 0
      while (i < k) {
        cur |= ((v >> i) & 1) << n
        n += 1
        if (n == 8) { bytes += cur.toByte; cur = 0; n = 0 }
        i += 1
      }
      this
    }
    def out: Array[Byte] = {
      if (n > 0) { bytes += cur.toByte; cur = 0; n = 0 }
      bytes.toArray
    }
  }

  private val CopyExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3,
    4, 4, 5, 5, 6, 7, 8, 9, 10, 24)
  private val CopyOffset = Array(2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18,
    22, 30, 38, 54, 70, 102, 134, 198, 326, 582, 1094, 2118)
  private val DictNdBits = Array(10, 10, 11, 11, 10, 10, 10, 10, 10,
    9, 9, 8, 7, 7, 8, 7, 7, 6, 6, 5, 5)

  /** Stream emitting one dictionary ref: word (copyLen, wordId) under
    * `transformId`, declared output length `mlen`. outLen is 0 at the
    * command, so maxDist = 0 and ANY distance is a dictionary address:
    * dist = wordId | (transformId << ndbits) + 1. */
  private def dictRefStream(copyLen: Int, wordId: Int, transformId: Int,
                            mlen: Int): Array[Byte] = {
    val copyCode = (0 until 24).findLast(c =>
      CopyOffset(c) <= copyLen &&
        copyLen - CopyOffset(c) < (1 << CopyExtra(c))).get
    val iacSym =
      if (copyCode < 8) 64 * 2 + copyCode
      else if (copyCode < 16) 64 * 3 + (copyCode - 8)
      else 64 * 6 + (copyCode - 16)
    val ndbits = DictNdBits(math.min(math.max(copyLen, 4), 24) - 4)
    val dist = ((transformId.toLong << ndbits) | wordId.toLong) + 1
    val dcode = (0 until 48).find { d =>
      val nbits = 1 + (d >> 1)
      val offset = ((2L + (d & 1)) << nbits) - 4
      dist >= offset + 1 && dist <= offset + (1L << nbits)
    }.get
    val nbits = 1 + (dcode >> 1)
    val offset = ((2L + (dcode & 1)) << nbits) - 4
    val w = new W()
    w.bits(0, 1)                    // WBITS = 16
      .bits(1, 1).bits(0, 1)        // ISLAST, not empty
      .bits(0, 2).bits(mlen - 1, 16) // MNIBBLES=0 (4 nibbles), MLEN
      .bits(0, 1).bits(0, 1).bits(0, 1) // L/I/D block types = 1
      .bits(0, 2).bits(0, 4)        // NPOSTFIX=0, NDIRECT=0
      .bits(0, 2)                   // context mode
      .bits(0, 1).bits(0, 1)        // NTREESL=1, NTREESD=1
      .bits(1, 2).bits(0, 2).bits(0, 8)        // literal code: 1 sym
      .bits(1, 2).bits(0, 2).bits(iacSym, 10)  // iac code: 1 sym
      .bits(1, 2).bits(0, 2).bits(16 + dcode, 6) // dist code: 1 sym
      // command: iac + dist symbols read 0 bits; only extras ride
      .bits(copyLen - CopyOffset(copyCode), CopyExtra(copyCode))
      .bits((dist - offset - 1).toInt, nbits)
    w.out
  }

  test("brotli dictionary BOUNDARIES: word 0 of the length-4 class is " +
      "'time' (Appendix A golden); the LAST word of a class and the " +
      "first of the next stay distinct (no off-by-one across class " +
      "offsets); the 32-word length-24 class addresses its last slot; " +
      "transform 121 is malformed while 120 decodes") {
    assert(Brotli.decodeEither(dictRefStream(4, 0, 0, 4))
      .map(new String(_, "ISO-8859-1")) === Right("time"))
    val last4 = Brotli.decodeEither(dictRefStream(4, 1023, 0, 4))
    val first5 = Brotli.decodeEither(dictRefStream(5, 0, 0, 5))
    assert(last4.isRight && last4.toOption.get.length === 4)
    assert(first5.isRight && first5.toOption.get.length === 5)
    assert(!java.util.Arrays.equals(last4.toOption.get,
      java.util.Arrays.copyOf(first5.toOption.get, 4)),
      "class-boundary words must come from different offsets")
    val last24 = Brotli.decodeEither(dictRefStream(24, 31, 0, 24))
    assert(last24.isRight && last24.toOption.get.length === 24)
    // transform ids: 120 is the last valid Appendix-B transform; the
    // emitted length varies with its prefix/suffix, so probe mlen —
    // exactly the minimal mlen in range succeeds (a longer mlen reruns
    // the single-command loop and must fail or emit more)
    assert(Brotli.decodeEither(dictRefStream(4, 7, 121, 4)).isLeft)
    val lens = (1 to 80).filter(m =>
      Brotli.decodeEither(dictRefStream(4, 7, 120, m)).isRight)
    assert(lens.nonEmpty, "transform 120 must decode at its true length")
    val out120 = Brotli.decodeEither(
      dictRefStream(4, 7, 120, lens.head)).toOption.get
    assert(out120.length === lens.head)
    // copy length 25 with a dictionary-range distance: RFC 7932 §8
    // allows only 4..24 — malformed, never a wild read
    assert(Brotli.decodeEither(dictRefStream(25, 0, 0, 25)).isLeft)
  }

  test("brotli truncation at EVERY byte of a dictionary-transform " +
      "stream: never a throw, never a silent full-plaintext decode " +
      "from fewer bytes") {
    val b64 = java.util.Base64.getDecoder
    val full = b64.decode(
      "G/0BAICqqqrq/3TVw00OFwY+3eUgAKoAIioCCgygA3AwFkRikhjgThttsFXJ" +
      "cr/5ADrKoEoNZiIMVkDEcPz56hs1Oy8Ugq3fYkxDsWZIIVJjtMLA")
    val plain = (("<html><head><title>t</title></head><body>" +
      "<p>para one</p><p>para two</p></body></html>") * 6)
      .getBytes("US-ASCII")
    assert(Brotli.decodeEither(full).map(_.toSeq) === Right(plain.toSeq))
    for (cut <- 0 until full.length) {
      Brotli.decodeEither(java.util.Arrays.copyOf(full, cut)) match {
        case Right(got) =>
          assert(!java.util.Arrays.equals(got, plain),
            s"full plaintext from a $cut-byte prefix")
        case Left(_) => // expected for most cuts
      }
    }
  }

  test("dHash BMP stride padding: widths with 3w % 4 != 0 pad rows to " +
      "4-byte strides — hashes match a driver-side reference at w=10 " +
      "(pad 2) and w=8 (pad 0)") {
    def g(x: Int, y: Int): Int = (x * 37 + y * 91 + 5) % 256
    def bmp(w: Int, h: Int): Array[Byte] = {
      val stride = ((w * 3 + 3) / 4) * 4
      val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
        .putInt(0).putInt(54)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      for (row <- 0 until h; x <- 0 until w) {
        val y = h - 1 - row // bottom-up storage
        val v = g(x, y).toByte
        bb.position(54 + row * stride + x * 3)
        bb.put(v).put(v).put(v)
      }
      bb.array()
    }
    def refHash(w: Int, h: Int): Long = {
      val grid = Array.tabulate(8, 9)((gy, gx) =>
        3L * g(gx * w / 9, gy * h / 8))
      (0 until 64).map(b =>
        if (grid(b / 8)(b % 8 + 1) > grid(b / 8)(b % 8)) 1L << b
        else 0L).sum
    }
    for (w <- Seq(10, 8)) {
      val got = Multimodal.imageDhash(
        Seq((1L, bmp(w, 8))).toDF("media_id", "content"))
        .select($"dhash").as[Option[Long]].collect().head
      assert(got === Some(refHash(w, 8)), s"w=$w stride hash diverged")
    }
  }

  test("dHash ICO height-doubling: an ODD doubled height follows the " +
      "documented floor(h/2) contract — same pixels, same hash as the " +
      "even twin; never a throw") {
    // reuse the synth ICO (id = 2 mod 3 renders an ICO) and patch its
    // DIB height field (offset 22 + 8 = byte 30, LE u32) from 16 to 17
    val ico = Multimodal.synthDhashImageBytes(Seq(2L).toDF("doc_id"),
      "doc_id").select($"content").as[Array[Byte]].collect().head
    assert(ico(30) === 16.toByte, "synth ICO DIB height must be 16")
    val odd = ico.clone(); odd(30) = 17
    def hash(b: Array[Byte]) = Multimodal.imageDhash(
      Seq((1L, b)).toDF("media_id", "content"))
      .select($"dhash").as[Option[Long]].collect().head
    val even = hash(ico)
    assert(even.isDefined)
    assert(hash(odd) === even, "floor(17/2) = 8 must hash like 16/2")
    // height-doubled 2 (h = 1): 1-pixel-high image still inside the
    // contract; the parser must not throw on the degenerate grid
    val flat = ico.clone(); flat(30) = 2
    hash(flat) // no throw; value is whatever the 9x1 sampling gives
  }

  test("residual PQ degenerate probes: a query whose probed lists hold " +
      "no codes returns no rows (never a throw); a query EQUAL to its " +
      "centroid (qres = 0) ranks by |recon|^2 with finite dists") {
    val m = 2
    // two far centroids; corpus lives entirely in c0's list
    val cents = Seq((0L, Seq(10f, 0f, 0f, 0f)), (1L, Seq(-10f, 0f, 0f, 0f)))
      .toDF("cid", "vec")
    val corpus = Seq(
      (100L, Seq(9f, 1f, 0.5f, 0f)), (101L, Seq(11f, -1f, 0f, 0.5f)),
      (102L, Seq(10f, 0.5f, -0.5f, 0f))).toDF("id", "vec")
    val res = Similarity.ivfResidualize(corpus, cents)
    val cb = Similarity.pqCodebooks(res.select($"id", $"vec"), m)
    val codes = Similarity.pqEncode(res, cb, m)
    // query near c1: its only probed list (nprobe=1) has zero codes
    val qEmpty = Seq((900L, Seq(-9f, 0f, 0f, 0f))).toDF("id", "vec")
    val outEmpty = Similarity.pqAdcTopKResidual(
      qEmpty, codes, cb, cents, 3, m, nprobe = 1)
    assert(outEmpty.count() === 0)
    // query exactly ON c0: qres is the zero vector
    val qZero = Seq((901L, Seq(10f, 0f, 0f, 0f))).toDF("id", "vec")
    val outZero = Similarity.pqAdcTopKResidual(
      qZero, codes, cb, cents, 3, m, nprobe = 1)
      .select($"rank", $"neighbor_id", $"dist")
      .as[(Int, Long, Double)].collect().sortBy(_._1).toSeq
    assert(outZero.map(_._1) === Seq(1, 2, 3))
    assert(outZero.forall(r => !r._3.isNaN && r._3 >= 0),
      s"qres=0 dists must be finite |recon|^2: $outZero")
  }

  test("zstd truncation at EVERY byte: the built-in decoder NULLs the " +
      "body (or yields a strict prefix where a frame boundary allows), " +
      "never throws, never fabricates the full body from fewer bytes") {
    val crlf = "\r\n"
    val full = java.util.Base64.getDecoder.decode(
      "KLUv/QRoYQAAZmlyc3QgZnJhbWUgmQ2Juii1L/0EaGEAAHNlY29uZCBmcmFtZRdkB7Y=")
    val plain = "first frame second frame"
    def msg(b: Array[Byte]) = ("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: zstd" + crlf + crlf).getBytes("ISO-8859-1") ++ b
    val rows = (0 until full.length).map(cut =>
      (cut.toLong, msg(java.util.Arrays.copyOf(full, cut))))
    val got = graft.sources.Http.parseHttpResponses(
      rows.toDF("media_id", "payload"))
      .select($"media_id", $"body".cast("string"))
      .as[(Long, Option[String])].collect().toMap
    // the final 4 bytes are the frame's XXH checksum: the reference
    // `zstd -d` also streams the COMPLETE content for cuts inside it
    // (exit 1, bytes emitted) — so the full body is legitimate there
    // and must be impossible any earlier
    for (cut <- 0 until full.length - 4)
      assert(!got(cut.toLong).contains(plain),
        s"full body from a $cut-byte prefix")
  }

  test("WET Content-Length overrun: a conversion record declaring more " +
      "bytes than the payload holds costs its own tail, not the task — " +
      "preceding records still parse") {
    val crlf = "\r\n"
    val good = ("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
      "WARC-Target-URI: http://w.org/ok" + crlf +
      "WARC-Record-ID: <urn:uuid:a>" + crlf + "Content-Length: 4" + crlf +
      crlf + "text" + crlf + crlf).getBytes("ISO-8859-1")
    val overrun = ("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
      "WARC-Target-URI: http://w.org/cut" + crlf +
      "WARC-Record-ID: <urn:uuid:b>" + crlf + "Content-Length: 500" +
      crlf + crlf + "only ten b").getBytes("ISO-8859-1")
    val out = Warc.wetDocs(Warc.explodeWarcBlobs(
      Seq((1L, good ++ overrun)).toDF("media_id", "content")))
      .select($"url", $"wet_text")
      .as[(String, Option[String])].collect().toSeq
    assert(out.exists(_._1 == "http://w.org/ok"),
      s"preceding record must survive: $out")
    assert(!out.exists(r => r._1 == "http://w.org/cut" &&
      r._2.exists(_.nonEmpty)),
      s"overrun record must not yield text from a short payload: $out")
  }
}
