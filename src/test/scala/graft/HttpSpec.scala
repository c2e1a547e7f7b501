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
      "transfer_encoding", "body", "body_truncated"))
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
