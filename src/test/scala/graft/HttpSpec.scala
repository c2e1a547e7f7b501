package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.{Deflater, DeflaterOutputStream, GZIPOutputStream}

import org.apache.spark.sql.functions._

import graft.sources.Http

class HttpSpec extends SparkSpec {
  import spark.implicits._

  private val crlf = "\r\n"

  private def gz(s: String): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo); g.write(s.getBytes(US_ASCII)); g.close()
    bo.toByteArray
  }
  private def defl(s: String, raw: Boolean): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val d = new DeflaterOutputStream(bo, new Deflater(-1, raw))
    d.write(s.getBytes(US_ASCII)); d.close()
    bo.toByteArray
  }
  private def msg(headers: String, body: Array[Byte]): Array[Byte] = {
    val h = headers.getBytes(US_ASCII)
    val out = new Array[Byte](h.length + body.length)
    System.arraycopy(h, 0, out, 0, h.length)
    System.arraycopy(body, 0, out, h.length, body.length)
    out
  }

  private def parse(rows: (Long, Array[Byte])*) =
    Http.parseHttpResponses(rows.toDF("media_id", "payload"))
      .select($"media_id", $"http_status", $"content_type",
        $"body".cast("string"), $"body_truncated")
      .as[(Long, Option[Int], Option[String], Option[String], Boolean)]
      .collect().sortBy(_._1).toSeq

  test("parseHttpResponses: golden messages — framing, chunked, gzip, " +
      "deflate (both dialects), truncation, garbage") {
    val plain = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Length: 5" + crlf + crlf, "hello".getBytes(US_ASCII))
    // Content-Length longer than the bytes present: prefix + truncated
    val short = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Length: 99" + crlf + crlf, "tiny".getBytes(US_ASCII))
    // no Content-Length: body = rest of payload, complete
    val noLen = msg("HTTP/1.0 200 OK" + crlf +
      "Content-Type: text/plain" + crlf + crlf, "rest".getBytes(US_ASCII))
    val chunked = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("4;note=1" + crlf + "Wiki" + crlf + "5" + crlf + "pedia" + crlf +
        "0" + crlf + crlf).getBytes(US_ASCII))
    // chunked cut mid-chunk: prefix + truncated
    val chunkCut = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("4" + crlf + "Wi").getBytes(US_ASCII))
    // chunked with a GARBAGE size line: unparseable framing -> NULL body
    val chunkBad = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("XYZ" + crlf + "Wiki").getBytes(US_ASCII))
    // chunk size 0xFFFFFFFF: overflows a SIGNED 32-bit parse — one
    // malicious size line must not throw; it walks off the buffer into
    // the truncated-prefix path
    val chunkHuge = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("ffffffff" + crlf + "data").getBytes(US_ASCII))
    val gzBody = gz("compressed content here")
    val gzipped = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Encoding: gzip" + crlf +
      s"Content-Length: ${gzBody.length}" + crlf + crlf, gzBody)
    // zlib-wrapped deflate AND raw deflate: both wire dialects decode
    val dz = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: deflate" + crlf + crlf,
      defl("zlib dialect", raw = false))
    val dr = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: deflate" + crlf + crlf,
      defl("raw dialect", raw = true))
    // declared gzip but garbage bytes: framing fine, body undecodable
    val gzBad = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip" + crlf + crlf,
      "not gzip".getBytes(US_ASCII))
    // chunked + gzip: de-frame FIRST, then decode
    val gzChunkedBody = gz("chunked then gzipped")
    val hexLen = Integer.toHexString(gzChunkedBody.length)
    val gzChunked = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf +
      "Content-Encoding: gzip" + crlf + crlf,
      (hexLen + crlf).getBytes(US_ASCII) ++ gzChunkedBody ++
        (crlf + "0" + crlf + crlf).getBytes(US_ASCII))
    val garbage = "<html>not an http message</html>".getBytes(US_ASCII)
    val got = parse((1L, plain), (2L, short), (3L, noLen), (4L, chunked),
      (5L, chunkCut), (6L, chunkBad), (7L, gzipped), (8L, dz), (9L, dr),
      (10L, gzBad), (11L, gzChunked), (12L, garbage), (13L, chunkHuge))
    assert(got === Seq(
      (1L, Some(200), Some("text/html"), Some("hello"), false),
      (2L, Some(200), None, Some("tiny"), true),
      (3L, Some(200), Some("text/plain"), Some("rest"), false),
      (4L, Some(200), None, Some("Wikipedia"), false),
      (5L, Some(200), None, Some("Wi"), true),
      (6L, Some(200), None, None, false),
      (7L, Some(200), Some("text/html"), Some("compressed content here"),
        false),
      (8L, Some(200), None, Some("zlib dialect"), false),
      (9L, Some(200), None, Some("raw dialect"), false),
      (10L, Some(200), None, None, false),
      (11L, Some(200), None, Some("chunked then gzipped"), false),
      (12L, None, None, None, false),
      (13L, Some(200), None, Some("data"), true)))
  }

  test("parseHttpResponses: passthrough columns survive, payload column " +
      "is replaced, reserved names refused") {
    val m = msg("HTTP/1.1 200 OK" + crlf + "Content-Length: 2" + crlf +
      crlf, "ok".getBytes(US_ASCII))
    val in = Seq((1L, "http://a.com/", m, "extra"))
      .toDF("media_id", "target_uri", "payload", "note")
    val out = Http.parseHttpResponses(in)
    assert(out.columns.toSeq === Seq("media_id", "target_uri", "note",
      "http_status", "content_type", "content_encoding",
      "transfer_encoding", "location", "body", "body_truncated"))
    val r = out.select($"target_uri", $"note", $"http_status",
      $"body".cast("string")).as[(String, String, Int, String)].head()
    assert(r === (("http://a.com/", "extra", 200, "ok")))
    intercept[IllegalArgumentException] {
      Http.parseHttpResponses(in.withColumnRenamed("note", "body"))
    }
  }

  test("parseHttpResponses: decompression-bomb cap bounds the OUTPUT") {
    val bomb = gz("x" * 100000)
    val m = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip" + crlf + crlf, bomb)
    val got = Http.parseHttpResponses(
      Seq((1L, m)).toDF("media_id", "payload"), maxBodyBytes = 1024)
      .select(octet_length($"body"), $"body_truncated")
      .as[(Int, Boolean)].head()
    assert(got === ((1024, true)))
  }

  test("synthHttpPayloads round-trips across the corpus") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val got = Http.parseHttpResponses(
      Http.synthHttpPayloads(docs, "doc_id"))
    val id = $"media_id"
    def m(k: Int) = pmod(id, lit(k))
    val body = concat(lit("Body "), id.cast("string"), lit(" "),
      repeat(lit("f"), (m(40) + 5).cast("int")))
    val bad = got.where(
      when(m(11) === 7, $"http_status".isNotNull || $"body".isNotNull)
        .when(m(3) === 0,
          $"http_status" =!= 200 || $"transfer_encoding" =!= "chunked" ||
            $"body".cast("string") =!= body || $"body_truncated")
        .when(m(5) === 2,
          $"http_status" =!= 404 || octet_length($"body") =!= 0 ||
            $"body_truncated")
        .otherwise(
          $"http_status" =!= 200 ||
            $"content_type" =!= "text/html; charset=utf-8" ||
            $"body".cast("string") =!= body || $"body_truncated"))
    assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
  }

  test("withBodyText: header beats meta beats UTF-8 sniff beats cp1252 " +
      "fallback; NULL body passes through") {
    def m(ct: String, body: Array[Byte]) = msg(
      "HTTP/1.1 200 OK" + crlf + (if (ct == null) "" else
        s"Content-Type: $ct" + crlf) +
        s"Content-Length: ${body.length}" + crlf + crlf, body)
    val latin1 = "caf\u00e9".getBytes("ISO-8859-1")
    val cp1252 = Array[Byte]('h', 0x93.toByte, 'q', 0x94.toByte)
    val metaBody = ("<meta http-equiv=\"Content-Type\" content=\"text/html;" +
      " charset=iso-8859-1\">x").getBytes(US_ASCII) ++ Array(0xE9.toByte)
    val utf8 = "caf\u00e9".getBytes("UTF-8")
    val rows = Seq(
      // 1: header charset wins even over a conflicting meta
      (1L, m("text/html; charset=ISO-8859-1",
        ("<meta charset=\"utf-8\">".getBytes(US_ASCII) ++ latin1))),
      // 2: meta (http-equiv form) when the header has no charset
      (2L, m("text/html", metaBody)),
      // 3: undeclared valid UTF-8 -> sniff
      (3L, m("text/plain", utf8)),
      // 4: undeclared invalid UTF-8 -> cp1252 fallback (0x93 is a curly
      // quote there, a C1 control in real Latin-1)
      (4L, m(null, cp1252)),
      // 5: unparseable message -> NULL body -> NULL text
      (5L, "junk".getBytes(US_ASCII)))
      .toDF("media_id", "payload")
    val got = Http.withBodyText(Http.parseHttpResponses(rows))
      .select($"media_id", $"charset_source", $"body_text")
      .as[(Long, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some("header:iso-8859-1"),
        Some("<meta charset=\"utf-8\">caf\u00e9")),
      (2L, Some("meta:iso-8859-1"), Some(
        "<meta http-equiv=\"Content-Type\" content=\"text/html;" +
          " charset=iso-8859-1\">x\u00e9")),
      (3L, Some("sniff:utf-8"), Some("caf\u00e9")),
      (4L, Some("fallback:windows-1252"), Some("h\u201Cq\u201D")),
      (5L, None, None)))
  }

  test("synthCharsetPayloads round-trips: every resolution path decodes " +
      "to its id-arithmetic text") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val got = Http.withBodyText(Http.parseHttpResponses(
      Http.synthCharsetPayloads(docs, "doc_id")))
    val id = $"media_id"
    val m4 = pmod(id, lit(4))
    val expText = when(m4 === 0 || m4 === 2,
      concat(lit("caf\u00e9 doc "), id.cast("string")))
      .when(m4 === 1, concat(
        lit("<html><head><meta charset=\"windows-1252\"></head><body>" +
          "\u201Cq"), id.cast("string"), lit("\u201D</body></html>")))
      .otherwise(concat(lit("raw\u00e9 doc "), id.cast("string")))
    val expSrc = when(m4 === 0, "header:iso-8859-1")
      .when(m4 === 1, "meta:windows-1252")
      .when(m4 === 2, "sniff:utf-8")
      .otherwise("fallback:windows-1252")
    val bad = got.where($"body_text" =!= expText ||
      $"charset_source" =!= expSrc || $"body_truncated")
    assert(bad.isEmpty, bad.limit(5).collect().mkString("; "))
  }

  test("obs-fold continuations, duplicate Content-Length, chunked " +
      "trailers, and a mid-trailing-CRLF cut parse per contract") {
    // obs-fold (RFC 9112 §5.2): a line starting with SP/HTAB continues
    // the PREVIOUS header — the folded charset parameter must reach
    // content_type (and therefore drive the body decode)
    val foldedHdr = "HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html;" + crlf +
      "\tcharset=iso-8859-1" + crlf +
      "Content-Length: 1" + crlf + crlf
    val folded = msg(foldedHdr, "e".getBytes(US_ASCII))
    // duplicate IDENTICAL Content-Length: tolerated
    val dupSame = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Length: 2" + crlf + "Content-Length: 2" + crlf + crlf,
      "okX".getBytes(US_ASCII))
    // duplicate DIFFERING Content-Length: smuggling-class ambiguity —
    // body must be NULL (deterministically), headers survive
    val dupDiff = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/a" + crlf +
      "Content-Length: 2" + crlf + "Content-Length: 5" + crlf + crlf,
      "okxxx".getBytes(US_ASCII))
    // unparseable Content-Length: same ambiguity, same contract
    val badLen = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Length: abc" + crlf + crlf, "ok".getBytes(US_ASCII))
    // trailer headers after the 0-chunk (RFC 9112 §7.1.2) are ignored:
    // the body is exactly the chunk data, complete, trailer invisible
    val trailer = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("4" + crlf + "Wiki" + crlf + "0" + crlf +
        "X-Checksum: abc123" + crlf + crlf).getBytes(US_ASCII))
    // payload cut on the LONE '\r' of a chunk's trailing CRLF: that is
    // TRUNCATION (the chunk data itself was fully recovered), not
    // desynced framing — prefix + truncated, never NULL
    val midCrlf = msg("HTTP/1.1 200 OK" + crlf +
      "Transfer-Encoding: chunked" + crlf + crlf,
      ("4" + crlf + "Wiki" + "\r").getBytes(US_ASCII))
    val got = Http.parseHttpResponses(
      Seq((1L, folded), (2L, dupSame), (3L, dupDiff), (4L, badLen),
        (5L, trailer), (6L, midCrlf)).toDF("media_id", "payload"))
      .select($"media_id", $"http_status", $"content_type",
        $"body".cast("string"), $"body_truncated")
      .as[(Long, Option[Int], Option[String], Option[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some(200), Some("text/html; charset=iso-8859-1"),
        Some("e"), false),
      (2L, Some(200), None, Some("ok"), false),
      (3L, Some(200), Some("text/a"), None, false),
      (4L, Some(200), None, None, false),
      (5L, Some(200), None, Some("Wiki"), false),
      (6L, Some(200), None, Some("Wiki"), true)))
    // the folded charset actually drives the decode: a raw 0xE9 body
    // byte (invalid UTF-8, 'é' in Latin-1) decodes via the UNFOLDED
    // header parameter
    val foldedLatin = msg(foldedHdr, Array(0xE9.toByte))
    val txt = Http.withBodyText(Http.parseHttpResponses(
      Seq((1L, foldedLatin)).toDF("media_id", "payload")))
      .select($"charset_source", $"body_text")
      .as[(String, String)].head()
    assert(txt === (("header:iso-8859-1", "é")))
  }

  test("content-coding tokens: identity no-ops decode through; br/" +
      "unknown/stacked codings NULL the body but keep the plug-in seam") {
    val gzBody = gz("zipped payload")
    // 'gzip, identity': identity is a no-op token — still decodes
    val gzId = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip, identity" + crlf + crlf, gzBody)
    // 'identity' alone: passthrough
    val idOnly = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: identity" + crlf + crlf,
      "plain".getBytes(US_ASCII))
    // brotli with MALFORMED bytes: the built-in [[Brotli]] decoder
    // (r17) rejects them — body NULL, status/headers (INCLUDING
    // content_encoding='br') survive. Valid-brotli decode is the
    // dedicated real-bytes test below.
    val br = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Encoding: br" + crlf + crlf,
      Array[Byte](0x11, 0x3f, 0x00, 0x44, 0x22))
    // zstd with MALFORMED bytes: the built-in zstd-jni decoder (r18)
    // rejects them — same NULL-body contract; real frames decode in
    // the dedicated test below
    val zstd = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: zstd" + crlf + crlf, "xxxx".getBytes(US_ASCII))
    // a STACKED pair of real codings: undecodable here, NULL
    val stacked = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip, deflate" + crlf + crlf, gzBody)
    val got = Http.parseHttpResponses(
      Seq((1L, gzId), (2L, idOnly), (3L, br), (4L, zstd), (5L, stacked))
        .toDF("media_id", "payload"))
      .select($"media_id", $"http_status", $"content_encoding",
        $"body".cast("string"), $"body_truncated")
      .as[(Long, Option[Int], Option[String], Option[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some(200), Some("gzip, identity"), Some("zipped payload"), false),
      (2L, Some(200), Some("identity"), Some("plain"), false),
      (3L, Some(200), Some("br"), None, false),
      (4L, Some(200), Some("zstd"), None, false),
      (5L, Some(200), Some("gzip, deflate"), None, false)))
  }

  test("built-in brotli: REAL encoder bytes decode end-to-end — " +
      "dictionary-transform streams included; an extraDecoders 'br' " +
      "entry OVERRIDES the built-in") {
    val b64 = java.util.Base64.getDecoder
    // reference-encoder output at q1 for 'hello hello hello brotli
    // world ' x4 (BrotliSpec's ascii_rep@q1 golden)
    val realBr = b64.decode(
      "iz0AAICqqqrq/3Tl81lABEAEgAAYQEAABDbgWHMYxgkHwIFx2BhzbCmrCyzD" +
      "jPUxei95UuFLMg==")
    val plain = "hello hello hello brotli world " * 4
    // q2 html output that references the STATIC DICTIONARY through
    // Appendix-B transforms — decodes since r17's full-dictionary step
    val dictBr = b64.decode(
      "G/0BAICqqqrq/3TVw00OFwY+3eUgAKoAIioCCgygA3AwFkRikhjgThttsFXJ" +
      "cr/5ADrKoEoNZiIMVkDEcPz56hs1Oy8Ugq3fYkxDsWZIIVJjtMLA")
    val dictPlain = ("<html><head><title>t</title></head><body>" +
      "<p>para one</p><p>para two</p></body></html>") * 6
    def brMsg(body: Array[Byte]) = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Encoding: br" + crlf + crlf, body)
    val got = Http.parseHttpResponses(
      Seq((1L, brMsg(realBr)), (2L, brMsg(dictBr)))
        .toDF("media_id", "payload"))
      .select($"media_id", $"content_encoding", $"body".cast("string"))
      .as[(Long, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some("br"), Some(plain)),
      (2L, Some("br"), Some(dictPlain))))
    // an explicitly registered 'br' decoder still WINS over the
    // built-in (deployments may need large-window or hardware codecs;
    // the gzip built-ins keep the opposite precedence)
    val overridden = Http.parseHttpResponses(
      Seq((1L, brMsg(realBr))).toDF("media_id", "payload"),
      extraDecoders = Map("br" ->
        ((_: Array[Byte]) => Some("override".getBytes(US_ASCII)))))
      .select($"body".cast("string")).as[String].collect().head
    assert(overridden === "override")
  }

  test("built-in zstd: REAL encoder frames decode end-to-end — " +
      "skippable-frame prologue and multi-frame concatenation included; " +
      "the built-in WINS an extraDecoders 'zstd' clash (gzip precedence)") {
    val b64 = java.util.Base64.getDecoder
    // `zstd -19` output for 'zstd body content ' x8
    val f1 = b64.decode("KLUv/QRo1QAAmHpzdGQgYm9keSBjb250ZW50IHoBAHWlMwyv634d")
    val p1 = "zstd body content " * 8
    // a 4-byte SKIPPABLE frame (magic 0x184D2A50) prepended to a real
    // frame — RFC 8878 §3.1.2: decoders skip it, like the zstd tool
    val f2 = b64.decode("UCpNGAQAAABTS0lQKLUv/QRoVQEA8DxodG1sPjxib2R5" +
      "PnpzdGQgb3ZlciBodHRwPC88LwMAvRQCRQkGr+kEcuve1w==")
    val p2 = "<html><body>zstd over http</body></html>" * 3
    // two frames CONCATENATED: output is the concatenation
    val f3 = b64.decode("KLUv/QRoYQAAZmlyc3QgZnJhbWUgmQ2Juii1L/0EaGEA" +
      "AHNlY29uZCBmcmFtZRdkB7Y=")
    val p3 = "first frame second frame"
    // valid magic then garbage → NULL body
    val f4 = b64.decode("KLUv/f//////")
    def zMsg(body: Array[Byte]) = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Encoding: zstd" + crlf + crlf, body)
    val got = Http.parseHttpResponses(
      Seq((1L, zMsg(f1)), (2L, zMsg(f2)), (3L, zMsg(f3)), (4L, zMsg(f4)))
        .toDF("media_id", "payload"))
      .select($"media_id", $"content_encoding", $"body".cast("string"),
        $"body_truncated")
      .as[(Long, Option[String], Option[String], Boolean)]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, Some("zstd"), Some(p1), false),
      (2L, Some("zstd"), Some(p2), false),
      (3L, Some("zstd"), Some(p3), false),
      (4L, Some("zstd"), None, false)))
    // built-in wins the name clash (zstd-jni IS the reference libzstd;
    // a registered override could only be worse — the gzip rule)
    val notOverridden = Http.parseHttpResponses(
      Seq((1L, zMsg(f1))).toDF("media_id", "payload"),
      extraDecoders = Map("zstd" ->
        ((_: Array[Byte]) => Some("override".getBytes(US_ASCII)))))
      .select($"body".cast("string")).as[String].collect().head
    assert(notOverridden === p1)
    // bomb cap: compressed frame fits under maxBodyBytes but inflates
    // past it — output bounded, truncated flag set (the gzip-bomb
    // contract; a cap below the COMPRESSED size truncates framing
    // instead and the partial frame NULLs)
    val capped = Http.parseHttpResponses(
      Seq((1L, zMsg(f1))).toDF("media_id", "payload"), maxBodyBytes = 50)
      .select($"body".cast("string"), $"body_truncated")
      .as[(String, Boolean)].collect().head
    assert(capped === ((p1.take(50), true)))
  }

  test("probe past the cap over MALFORMED trailing bytes: the bounded " +
      "prefix survives with truncated=true — a throwing probe read must " +
      "not NULL an already-recovered body (zstd + gzip)") {
    // highly compressible so the COMPRESSED frame + garbage fit under
    // the cap (the framing stage applies maxBodyBytes to the coded
    // bytes first) while the DECODED length lands exactly AT the cap —
    // that is the state where the completeness probe runs over the
    // trailing garbage
    val payload = "A" * 2000
    val garbage = Array[Byte](0x12, 0x34, 0x56, 0x78, 0x11, 0x22)
    val zBytes = com.github.luben.zstd.Zstd.compress(
      payload.getBytes(US_ASCII))
    val zm = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: zstd" + crlf + crlf, zBytes ++ garbage)
    val gm = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: gzip" + crlf + crlf, gz(payload) ++ garbage)
    val out = Http.parseHttpResponses(
      Seq((1L, zm), (2L, gm)).toDF("media_id", "payload"),
      maxBodyBytes = payload.length)
      .select($"media_id", $"body".cast("string"), $"body_truncated")
      .as[(Long, String, Boolean)].collect().sortBy(_._1).toSeq
    // before the probeMore fix the zstd probe's throw (garbage is not a
    // valid next-frame header) propagated to the outer catch and the
    // whole already-recovered body NULLed
    assert(out.map(r => (r._1, r._2)) ===
      Seq((1L, payload), (2L, payload)))
    // zstd-jni throws on the garbage next-frame header → truncated=true;
    // the JDK's GZIPInputStream deliberately swallows trailing garbage
    // after the member trailer (the concatenated-member fallback), so
    // its probe reads clean end-of-stream → complete
    assert(out.map(_._3) === Seq(true, false), out.toString)
  }

  test("extraDecoders: a registered codec routes its coding end-to-end " +
      "through withBodyText; unregistered/stacked stay NULL; a throwing " +
      "decoder NULLs the body, never the task") {
    val text = "brotli body é fin"
    def xor(b: Array[Byte]) = b.map(x => (x ^ 0x2A).toByte)
    val fake = xor(text.getBytes("UTF-8")) // stand-in for real brotli
    val brMsg = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html; charset=utf-8" + crlf +
      "Content-Encoding: br" + crlf +
      s"Content-Length: ${fake.length}" + crlf + crlf, fake)
    val zstdMsg = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: zstd" + crlf +
      "Content-Length: 4" + crlf + crlf, Array[Byte](1, 2, 3, 4))
    val stacked = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Encoding: br, gzip" + crlf + crlf, fake)
    val dec: Http.BodyDecoder = bytes => Some(xor(bytes))
    val out = Http.withBodyText(Http.parseHttpResponses(
      Seq((1L, brMsg), (2L, zstdMsg), (3L, stacked))
        .toDF("media_id", "payload"),
      extraDecoders = Map("br" -> dec)))
      .select($"media_id", $"content_encoding", $"body_text")
      .as[(Long, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, Some("br"), Some(text)),
      (2L, Some("zstd"), None),       // malformed frame → built-in NULLs
      (3L, Some("br, gzip"), None)))  // stacks stay the documented seam
    val boom: Http.BodyDecoder = _ => throw new RuntimeException("boom")
    val row = Http.parseHttpResponses(
      Seq((1L, brMsg)).toDF("media_id", "payload"),
      extraDecoders = Map("br" -> boom))
      .select($"http_status", $"body").head()
    assert(row.getInt(0) === 200 && row.isNullAt(1))
    // Some(null) — the Java-interop hazard — is "undecodable", not an NPE
    val javaNull: Http.BodyDecoder = _ => Some(null)
    val row2 = Http.parseHttpResponses(
      Seq((1L, brMsg)).toDF("media_id", "payload"),
      extraDecoders = Map("br" -> javaNull))
      .select($"http_status", $"body").head()
    assert(row2.getInt(0) === 200 && row2.isNullAt(1))
  }

  test("interim 1xx heads are skipped to the real response; 204/304 " +
      "are bodiless regardless of Content-Length") {
    // crawlers store the WHOLE exchange: 100 Continue / 103 Early Hints
    // heads precede the final response; reporting status=100 with the
    // real response as 'body text' would corrupt every downstream stage
    val cont = msg("HTTP/1.1 100 Continue" + crlf + crlf +
      "HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html" + crlf +
      "Content-Length: 4" + crlf + crlf, "real".getBytes(US_ASCII))
    val hints = msg("HTTP/1.1 103 Early Hints" + crlf +
      "Link: </style.css>; rel=preload" + crlf + crlf +
      "HTTP/1.1 200 OK" + crlf +
      "Content-Length: 2" + crlf + crlf, "ok".getBytes(US_ASCII))
    // a malicious all-interim chain must terminate (hop bound), not loop
    val allInterim = msg(
      ("HTTP/1.1 100 Continue" + crlf + crlf) * 6, Array.emptyByteArray)
    // 304 routinely echoes the entity's Content-Length; the body is
    // EMPTY by spec — not 'truncated'
    val notModified = msg("HTTP/1.1 304 Not Modified" + crlf +
      "Content-Length: 9999" + crlf + crlf, Array.emptyByteArray)
    val noContent = msg("HTTP/1.1 204 No Content" + crlf +
      "Content-Length: 5" + crlf + crlf, Array.emptyByteArray)
    // 101 Switching Protocols is FINAL, not interim: what follows is
    // the UPGRADED protocol's bytes (here a fake websocket frame), not
    // HTTP — the stored status/headers must survive with an empty body
    // instead of being skipped and the frame bytes misread as a head
    val upgraded = msg("HTTP/1.1 101 Switching Protocols" + crlf +
      "Upgrade: websocket" + crlf +
      "Connection: Upgrade" + crlf + crlf,
      Array[Byte](0x81.toByte, 0x05, 'h', 'e', 'l', 'l', 'o'))
    val got = parse((1L, cont), (2L, hints), (3L, allInterim),
      (4L, notModified), (5L, noContent), (6L, upgraded))
    assert(got === Seq(
      (1L, Some(200), Some("text/html"), Some("real"), false),
      (2L, Some(200), None, Some("ok"), false),
      (3L, None, None, None, false),
      (4L, Some(304), None, Some(""), false),
      (5L, Some(204), None, Some(""), false),
      (6L, Some(101), None, Some(""), false)))
  }

  test("a body BOM outranks even the header charset (WHATWG decode " +
      "order); Location header surfaces for redirect analysis") {
    // UTF-8 BOM + UTF-8 bytes, header LYING iso-8859-1: header-first
    // would decode the é as 'Ã©' mojibake — the BOM must win
    val utf8Bom = msg("HTTP/1.1 200 OK" + crlf +
      "Content-Type: text/html; charset=iso-8859-1" + crlf + crlf,
      Array(0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        "café".getBytes("UTF-8"))
    val utf16le = msg("HTTP/1.1 200 OK" + crlf + crlf,
      Array(0xFF.toByte, 0xFE.toByte) ++ "hi".getBytes("UTF-16LE"))
    val utf16be = msg("HTTP/1.1 200 OK" + crlf + crlf,
      Array(0xFE.toByte, 0xFF.toByte) ++ "hi".getBytes("UTF-16BE"))
    val got = Http.withBodyText(Http.parseHttpResponses(
      Seq((1L, utf8Bom), (2L, utf16le), (3L, utf16be))
        .toDF("media_id", "payload")))
      .select($"media_id", $"charset_source", $"body_text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "bom:utf-8", "café"),
      (2L, "bom:utf-16le", "hi"),
      (3L, "bom:utf-16be", "hi")))
    // Location: the 3xx redirect target a chain analysis joins on
    val redir = msg("HTTP/1.1 301 Moved Permanently" + crlf +
      "Location: https://new.example/path" + crlf +
      "Content-Length: 0" + crlf + crlf, Array.emptyByteArray)
    val r = Http.parseHttpResponses(
      Seq((1L, redir)).toDF("media_id", "payload"))
      .select($"http_status", $"location").as[(Int, String)].head()
    assert(r === ((301, "https://new.example/path")))
  }

  test("meta charset inside an HTML comment must NOT win the sniff") {
    val utf8Tail = "café".getBytes("UTF-8")
    // terminated comment hiding a meta: the sniff must skip it and land
    // on UTF-8 validation (an iso-8859-1 decode would read 0xC3A9 as
    // 'Ã©' — mojibake)
    val commented = msg("HTTP/1.1 200 OK" + crlf + crlf,
      "<!-- <meta charset=\"iso-8859-1\"> -->".getBytes(US_ASCII) ++
        utf8Tail)
    // unterminated comment: everything after `<!--` in the window is
    // commented out as far as the sniffer can tell
    val unterminated = msg("HTTP/1.1 200 OK" + crlf + crlf,
      "<!-- <meta charset=\"iso-8859-1\"> ".getBytes(US_ASCII) ++ utf8Tail)
    // control: the SAME meta outside a comment still wins
    val live = msg("HTTP/1.1 200 OK" + crlf + crlf,
      "<meta charset=\"iso-8859-1\">".getBytes(US_ASCII) ++
        Array(0xE9.toByte))
    val got = Http.withBodyText(Http.parseHttpResponses(
      Seq((1L, commented), (2L, unterminated), (3L, live))
        .toDF("media_id", "payload")))
      .select($"media_id", $"charset_source", $"body_text")
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(got(0)._2 === "sniff:utf-8")
    assert(got(0)._3.endsWith("café"))
    assert(got(1)._2 === "sniff:utf-8")
    assert(got(2)._2 === "meta:iso-8859-1")
    assert(got(2)._3.endsWith("é"))
  }

  test("HTTP parser never throws under truncation + corruption fuzz") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 48).select($"doc_id")
    val fam = Http.synthHttpPayloads(docs, "doc_id")
    val truncated = fam.select($"media_id",
      explode(sequence(lit(0), octet_length($"payload"))).as("k"))
      .join(fam, Seq("media_id"))
      .select($"media_id", expr("substring(payload, 1, k)").as("payload"))
    val corrupted = Seq("00", "0D", "3B").map { b =>
      fam.select($"media_id",
        concat(
          expr("substring(payload, 1, " +
            "pmod(media_id * 31, octet_length(payload)))"),
          unhex(lit(b)),
          expr("substring(payload, " +
            "pmod(media_id * 31, octet_length(payload)) + 2, " +
            "2147483647)")).as("payload"))
    }.reduce(_ unionAll _)
    for (mutated <- Seq(truncated, corrupted)) {
      val n = Http.parseHttpResponses(mutated, maxBodyBytes = 64)
        .where(octet_length($"body") > 64).count()
      assert(n === 0)
    }
  }
}
