package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, Inflater, InflaterInputStream}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** HTTP response parsing for WARC `response` payloads — the layer between
  * [[Warc.explodeWarcBlobs]] and [[graft.text.HtmlOps.htmlToText]]: a
  * crawl's response record carries the FULL HTTP message (status line,
  * headers, body), and the body is routinely `Transfer-Encoding: chunked`
  * and/or `Content-Encoding: gzip|deflate` — so without this step the
  * "HTML" a pipeline extracts from is chunk-framing noise or compressed
  * bytes.
  *
  * Same engineering category as the WARC reader: record-IO over binary
  * bytes (headers are ASCII, bodies are arbitrary), so a JVM per-row
  * parser (`mapPartitions`-class, zero UDF-boxing via the Dataset API)
  * rather than an expression fold. JDK-only codecs: GZIPInputStream,
  * InflaterInputStream (raw-deflate fallback for the servers that send
  * zlib-less deflate — both wire dialects exist and both are handled).
  *
  * Malformed-input contract: a non-HTTP first line, an unterminated
  * header block, a bad chunk-size line, or a codec error yields NULL
  * status/body for that row (the other rows are untouched); a TRUNCATED
  * body (fewer bytes than Content-Length / a short final chunk) yields
  * the prefix that IS present with `body_truncated` set — crawlers store
  * truncated fetches routinely and the text is still worth extracting.
  *
  * `maxBodyBytes` bounds BOTH sides of the codec: the de-framed
  * (compressed) input is capped at it, and the decompressed output is
  * capped at it again (decompression-bomb guard: a 10 KB gzip member can
  * inflate to GBs; the cap bounds task memory whatever the input
  * promises). A compressed body larger than the cap therefore truncates
  * its stream and decodes to NULL — raise the cap for corpora with
  * multi-MB compressed pages rather than trusting headers. */
object Http {

  final case class HttpParsed(
      http_status: Option[Int], content_type: Option[String],
      content_encoding: Option[String], transfer_encoding: Option[String],
      location: Option[String], body: Array[Byte], body_truncated: Boolean)

  private val Crlf = "\r\n".getBytes("ISO-8859-1")

  /** Find the header/body split: the first CRLFCRLF (tolerates LFLF)
    * at or after `from`. */
  private def headerEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length - 1) {
      if (b(i) == '\n') {
        if (i + 2 < b.length && b(i + 1) == '\r' && b(i + 2) == '\n')
          return i + 3
        if (i + 1 < b.length && b(i + 1) == '\n') return i + 2
      }
      i += 1
    }
    -1
  }

  /** De-chunk a Transfer-Encoding: chunked body. Returns (bytes, sawEnd):
    * a malformed size line returns null (unparseable framing); a body
    * that ends before its declared chunk returns the prefix with
    * sawEnd=false. */
  private def dechunk(b: Array[Byte], from: Int,
                      maxOut: Int): (Array[Byte], Boolean) = {
    val out = new java.io.ByteArrayOutputStream()
    var i = from
    while (true) {
      // chunk-size line: hex digits, optional ;ext, CRLF
      var j = i
      while (j < b.length && b(j) != '\n') j += 1
      if (j >= b.length) return (out.toByteArray, false) // cut mid size-line
      val lineEnd = if (j > i && b(j - 1) == '\r') j - 1 else j
      val line = new String(b, i, lineEnd - i, "ISO-8859-1")
      val hexPart = line.takeWhile(c => c != ';').trim
      if (hexPart.isEmpty || hexPart.length > 8 ||
        !hexPart.forall(c => Character.digit(c, 16) >= 0)) return (null, false)
      // parse as LONG: 8 hex digits reach 0xFFFFFFFF, and a signed
      // Integer.parseInt THROWS past 2^31-1 — one malicious chunk-size
      // line must not kill the task. A huge declared size just walks off
      // the buffer into the truncated-prefix path below.
      val size = java.lang.Long.parseLong(hexPart, 16)
      i = j + 1
      if (size == 0) return (out.toByteArray, true) // terminal chunk
      val avail = math.min(size, (b.length - i).toLong).toInt
      val take = math.min(avail, math.max(0, maxOut - out.size()))
      out.write(b, i, take)
      if (avail < size || out.size() >= maxOut)
        return (out.toByteArray, false) // truncated / capped
      i += size.toInt
      // chunk data is followed by CRLF; tolerate a missing one at EOF
      if (i + 1 < b.length && b(i) == '\r' && b(i + 1) == '\n') i += 2
      else if (i < b.length && b(i) == '\n') i += 1
      else if (i >= b.length) return (out.toByteArray, false)
      else if (i == b.length - 1 && b(i) == '\r')
        // payload ends on the lone '\r' of the trailing CRLF: that is a
        // TRUNCATED message (the prefix read so far is complete chunk
        // data), not desynced framing — honor the truncated-prefix
        // contract rather than NULLing a fully-recovered body
        return (out.toByteArray, false)
      else return (null, false) // desynced framing
    }
    (null, false) // unreachable
  }

  /** The one-byte "is there more coded data past the cap" probe, on its
    * own try: once the bounded prefix is safely decoded, a probe that
    * THROWS on malformed bytes past the cap still means the stream
    * didn't end cleanly at the cap — that is truncated=true, not a
    * codec error that should NULL the already-recovered prefix (the
    * decoder-seam truncation contract). */
  private def probeMore(in: java.io.InputStream): Boolean =
    try in.read() >= 0 catch { case _: Exception => true }

  /** Bounded decompress; None on codec error (not a valid stream). */
  private def inflate(bytes: Array[Byte], enc: String,
                      maxOut: Int): Option[(Array[Byte], Boolean)] =
    try {
      val in = enc match {
        case "gzip" | "x-gzip" =>
          new GZIPInputStream(new ByteArrayInputStream(bytes), 64 * 1024)
        case "deflate" =>
          // zlib-wrapped first; raw deflate is retried by the caller via
          // the nowrap variant when this one fails on the first read
          new InflaterInputStream(new ByteArrayInputStream(bytes))
        case "deflate-raw" =>
          new InflaterInputStream(new ByteArrayInputStream(bytes),
            new Inflater(true))
        case _ => return None
      }
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0 && out.size() < maxOut) {
        out.write(buf, 0, math.min(n, maxOut - out.size()))
        n = if (out.size() < maxOut) in.read(buf) else -1
      }
      val truncated = out.size() >= maxOut && probeMore(in)
      in.close()
      Some((out.toByteArray, truncated))
    } catch {
      case _: Exception => None
    }

  /** Bounded zstd decompress (RFC 8878 content-coding) via the Spark
    * classpath's zstd-jni streaming API — the reference libzstd
    * binding, so multi-frame concatenation and skippable frames decode
    * exactly like the `zstd` tool. None on codec error. Same bounded
    * read-loop contract as [[inflate]]: output capped at maxOut, the
    * truncated flag set when coded data remains past the cap. */
  private def zunstd(bytes: Array[Byte],
                     maxOut: Int): Option[(Array[Byte], Boolean)] =
    try {
      val in = new com.github.luben.zstd.ZstdInputStreamNoFinalizer(
        new ByteArrayInputStream(bytes))
      try {
        in.setContinuous(false)
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        // a single 64 KiB read can hand back bytes PAST the cap in one
        // call — track the discard, or the truncated flag would probe
        // an already-drained stream and read complete (the gzip path
        // dodges this only because GZIPInputStream returns small
        // internal-buffer-sized reads)
        var clipped = false
        var n = in.read(buf)
        while (n >= 0 && out.size() < maxOut) {
          val take = math.min(n, maxOut - out.size())
          out.write(buf, 0, take)
          if (take < n) clipped = true
          n = if (out.size() < maxOut) in.read(buf) else -1
        }
        val truncated = clipped ||
          (out.size() >= maxOut && probeMore(in))
        Some((out.toByteArray, truncated))
      } finally in.close()
    } catch {
      case _: Exception => None
    }

  /** An optional content-coding decoder: full coded bytes in, decoded
    * bytes out (None = codec error → body NULLs, headers survive).
    * Implementations must be SERIALIZABLE — the map ships to executors
    * inside the task closure. Output is capped at maxBodyBytes by the
    * caller afterward; a decoder may also self-bound. */
  type BodyDecoder = Array[Byte] => Option[Array[Byte]]

  /** Parse ONE HTTP response message. Interim 1xx responses (100
    * Continue, 103 Early Hints — servers send them before the final
    * response and crawlers store the whole exchange) have no body by
    * RFC 9110 §15.2: skip each interim head and parse the response that
    * follows, bounded at 4 hops so a malicious all-1xx payload cannot
    * loop. */
  private[graft] def parseResponse(payload: Array[Byte],
                                   maxBodyBytes: Int,
                                   extraDecoders: Map[String, BodyDecoder] =
                                     Map.empty): HttpParsed =
    parseFrom(payload, 0, maxBodyBytes, interimHops = 4, extraDecoders)

  private def parseFrom(payload: Array[Byte], from: Int,
                        maxBodyBytes: Int, interimHops: Int,
                        extra: Map[String, BodyDecoder]): HttpParsed = {
    val none = HttpParsed(None, None, None, None, None, null, false)
    if (payload == null || payload.length - from < 12) return none
    val he = headerEnd(payload, from)
    if (he < 0) return none
    val head = new String(payload, from, he - from, "ISO-8859-1")
    val lines = head.split("\r?\n")
    if (lines.isEmpty) return none
    val status = lines.head match {
      case s if s.startsWith("HTTP/") =>
        val parts = s.split(" ", 3)
        if (parts.length >= 2 && parts(1).length == 3 &&
          parts(1).forall(_.isDigit)) Some(parts(1).toInt) else None
      case _ => None
    }
    if (status.isEmpty) return none
    if (status.exists(s => s >= 100 && s < 200 && s != 101)) {
      // interim response (100 Continue, 103 Early Hints): bodiless by
      // spec; the REAL response follows. 101 Switching Protocols is
      // NOT interim — after a 101 the remaining payload is the
      // upgraded protocol, not HTTP, so 101 is handled below as a
      // FINAL bodiless response (status + headers survive; skipping
      // it would discard them and parse non-HTTP bytes as a head).
      return if (interimHops > 0)
        parseFrom(payload, he, maxBodyBytes, interimHops - 1, extra)
      else none
    }
    // un-fold obs-fold continuations first (RFC 9112 §5.2: a line starting
    // with SP/HTAB continues the PREVIOUS header's value) — otherwise a
    // folded `Content-Type:` value line is misread as a new header
    val unfolded = lines.tail.foldLeft(List.empty[String]) { (acc, l) =>
      if (l.nonEmpty && (l.head == ' ' || l.head == '\t') && acc.nonEmpty)
        (acc.head + " " + l.trim) :: acc.tail
      else l :: acc
    }.reverse
    var cType: Option[String] = None
    var cEnc: Option[String] = None
    var tEnc: Option[String] = None
    var loc: Option[String] = None
    var cLen = -1L
    // duplicate/invalid Content-Length is the request-smuggling class:
    // two DIFFERING values (or an unparseable one) make the framing
    // unknowable — deterministically NULL the body (headers survive)
    // rather than silently picking one. Equal duplicates are tolerated.
    var cLenConflict = false
    unfolded.foreach { l =>
      val i = l.indexOf(':')
      if (i > 0) {
        val k = l.substring(0, i).trim.toLowerCase
        val v = l.substring(i + 1).trim
        k match {
          case "content-type"      => cType = Some(v)
          case "content-encoding"  => cEnc = Some(v.toLowerCase)
          case "transfer-encoding" => tEnc = Some(v.toLowerCase)
          case "location"          => loc = Some(v)
          case "content-length" =>
            val parsed = try v.toLong catch { case _: Exception => -2L }
            if (parsed < 0) cLenConflict = true
            else if (cLen >= 0 && cLen != parsed) cLenConflict = true
            else cLen = parsed
          case _ => ()
        }
      }
    }
    // 204 No Content / 304 Not Modified are bodiless by RFC 9110
    // §15.3.5/§15.4.5 regardless of any Content-Length they carry (304s
    // routinely echo the would-be entity's length); 101 Switching
    // Protocols ends the HTTP exchange (RFC 9110 §15.2.2 — what follows
    // is the upgraded protocol's bytes, never an HTTP body): empty
    // body, complete
    if (status.exists(s => s == 204 || s == 304 || s == 101))
      return HttpParsed(status, cType, cEnc, tEnc, loc,
        Array.emptyByteArray, false)
    // framing: chunked beats Content-Length (RFC 9112 §6.3)
    val (framed, framedComplete): (Array[Byte], Boolean) =
      if (tEnc.exists(_.contains("chunked"))) {
        val (d, end) = dechunk(payload, he, maxBodyBytes)
        if (d == null)
          return HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
        (d, end)
      } else if (cLenConflict) {
        return HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
      } else {
        val avail = payload.length - he
        val want = if (cLen >= 0) math.min(cLen, Int.MaxValue.toLong).toInt
          else avail
        val take = math.min(math.min(want, avail), maxBodyBytes)
        val out = java.util.Arrays.copyOfRange(payload, he, he + take)
        (out, take >= want || (cLen < 0 && take == avail))
      }
    // content decoding AFTER de-framing. Content-Encoding is a COMMA
    // list of codings applied in order; "identity" (and empty tokens)
    // are no-ops. Exactly one real coding we can decode → decode it:
    // built-in gzip/x-gzip/deflate/zstd/br (zstd via the classpath's
    // zstd-jni, br via the pure-JVM [[Brotli]] RFC 7932 decoder — the
    // once-open brotli/zstd seam is now CLOSED, both built in), or a
    // caller-registered decoder from `extraDecoders` for anything
    // rarer (built-ins win a name clash except 'br' — see below).
    // Anything else — an unregistered token or a
    // multi-coding stack — must NOT fall through as raw compressed
    // bytes masquerading as text: body is NULL while status/headers
    // (INCLUDING content_encoding) survive, so the rows stay routable.
    val codings = cEnc.toSeq.flatMap(_.split(','))
      .map(_.trim).filter(c => c.nonEmpty && c != "identity")
    codings match {
      case Nil =>
        HttpParsed(status, cType, cEnc, tEnc, loc, framed,
          !framedComplete)
      case Seq(e @ ("gzip" | "x-gzip" | "deflate")) =>
        val dec = inflate(framed, e, maxBodyBytes)
          .orElse(if (e == "deflate")
            inflate(framed, "deflate-raw", maxBodyBytes) else None)
        dec match {
          case Some((b, trunc)) =>
            HttpParsed(status, cType, cEnc, tEnc, loc, b,
              trunc || !framedComplete)
          case None => // codec error: framing was fine, body undecodable
            HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
        }
      case Seq("zstd") =>
        // built-in zstd (RFC 8878) via the classpath's zstd-jni — the
        // reference libzstd binding, complete, so like gzip/deflate
        // the built-in wins any extraDecoders name clash. Skippable
        // frames and multi-frame concatenation decode like the
        // reference tool; codec error → NULL body, headers survive.
        zunstd(framed, maxBodyBytes) match {
          case Some((b, trunc)) =>
            HttpParsed(status, cType, cEnc, tEnc, loc, b,
              trunc || !framedComplete)
          case None =>
            HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
        }
      case Seq("br") if !extra.contains("br") =>
        // built-in pure-JVM brotli ([[Brotli]] — FULL RFC 7932: all
        // dictionary transforms and context-modeled literals decode;
        // only genuinely malformed streams NULL).
        // PRECEDENCE still INVERTS here vs gzip/deflate: an
        // extraDecoders entry for 'br' WINS (a deployment may prefer
        // a native-library decoder), while for gzip/deflate the JDK
        // built-ins are complete and an override could only be worse.
        // +1 so a body EXACTLY at the cap isn't flagged truncated;
        // saturate at Int.MaxValue (require only enforces > 0).
        Brotli.decode(framed,
          if (maxBodyBytes == Int.MaxValue) maxBodyBytes
          else maxBodyBytes + 1) match {
          case Some(b) =>
            val trunc = b.length > maxBodyBytes
            val out = if (trunc) java.util.Arrays.copyOf(b, maxBodyBytes)
              else b
            HttpParsed(status, cType, cEnc, tEnc, loc, out,
              trunc || !framedComplete)
          case None => // undecodable or outside the documented subset
            HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
        }
      case Seq(e) if extra.contains(e) =>
        // a decoder that throws, returns None, or returns Some(null)
        // (Java-interop hazard) all mean "undecodable": NULL body,
        // headers survive, task never fails
        (try extra(e)(framed) catch { case _: Exception => None }) match {
          case Some(b) if b != null =>
            val trunc = b.length > maxBodyBytes
            val out = if (trunc) java.util.Arrays.copyOf(b, maxBodyBytes)
              else b
            HttpParsed(status, cType, cEnc, tEnc, loc, out,
              trunc || !framedComplete)
          case _ => // None or Some(null)
            HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
        }
      case _ => // unregistered coding / stacked: undecodable here
        HttpParsed(status, cType, cEnc, tEnc, loc, null, false)
    }
  }

  /** Replace `payloadCol` with typed HTTP columns + the de-framed,
    * decompressed body; every OTHER input column passes through — a
    * crawl pipeline must keep the WARC-side metadata (target_uri,
    * offsets) on each parsed row, and a join-back-on-id would put an
    * exchange in the middle of an otherwise narrow map-side chain.
    * Implemented as a Row→Row map with explicit Encoders.row schemas
    * (the one Dataset shape that carries arbitrary passthrough columns
    * through JVM parsing code without boxing into case classes).
    *
    * `extraDecoders` plugs in content-codings the JDK lacks (brotli,
    * zstd): coding token → [[BodyDecoder]]. The map is captured in the
    * task closure (so it serializes to executors — a mutable global
    * registry would silently be EMPTY on a real cluster's executors,
    * which is why this is a parameter, not a register() call);
    * built-in gzip/deflate win a name clash; a coding with no decoder
    * keeps the NULL-body/headers-survive contract. */
  def parseHttpResponses(df: DataFrame,
                         payloadCol: String = "payload",
                         maxBodyBytes: Int = 1 << 20,
                         extraDecoders: Map[String, BodyDecoder] =
                           Map.empty): DataFrame = {
    require(maxBodyBytes > 0, s"maxBodyBytes: $maxBodyBytes")
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    Seq("http_status", "content_type", "content_encoding",
      "transfer_encoding", "location", "body", "body_truncated")
      .foreach(c =>
      require(!df.columns.contains(c),
        s"Http.parseHttpResponses: df already has a '$c' column — rename " +
          "it first; parseHttpResponses appends its own"))
    val pi = df.schema.fieldIndex(payloadCol)
    require(df.schema(pi).dataType == BinaryType,
      s"$payloadCol must be BINARY, got ${df.schema(pi).dataType}")
    val outSchema = StructType(
      df.schema.fields.patch(pi, Nil, 1).toSeq ++ Seq(
        StructField("http_status", IntegerType),
        StructField("content_type", StringType),
        StructField("content_encoding", StringType),
        StructField("transfer_encoding", StringType),
        StructField("location", StringType),
        StructField("body", BinaryType),
        StructField("body_truncated", BooleanType, nullable = false)))
    df.map({ r =>
      val p = parseResponse(r.getAs[Array[Byte]](pi), maxBodyBytes,
        extraDecoders)
      Row.fromSeq(r.toSeq.patch(pi, Nil, 1) ++ Seq(
        p.http_status.map(Int.box).orNull, p.content_type.orNull,
        p.content_encoding.orNull, p.transfer_encoding.orNull,
        p.location.orNull, p.body, p.body_truncated))
    })(Encoders.row(outSchema))
  }

  /** Charset resolution order for [[withBodyText]] — the standard crawl
    * heuristic: (1) the Content-Type header's `charset=` parameter;
    * (2) an HTML `<meta charset=...>` / http-equiv declaration in the
    * body's first `sniffBytes`; (3) validate-as-UTF-8; (4) Windows-1252
    * (the de-facto superset of ISO-8859-1 on the web — bytes 0x80-0x9F
    * are curly quotes/dashes there, C1 controls in true Latin-1, and
    * every byte sequence decodes, so it is the total fallback). */
  private val MetaCharset =
    ("""(?is)<meta[^>]*?charset\s*=\s*["']?\s*([a-z0-9_-]+)""").r

  private def resolveCharset(label: String): Option[java.nio.charset.Charset] =
    try {
      val l = label.trim.toLowerCase match {
        case "latin1" | "latin-1" | "iso8859-1" => "iso-8859-1"
        case other => other
      }
      if (java.nio.charset.Charset.isSupported(l))
        Some(java.nio.charset.Charset.forName(l))
      else None
    } catch { case _: Exception => None }

  private def validUtf8(b: Array[Byte]): Boolean =
    try {
      java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        .decode(java.nio.ByteBuffer.wrap(b))
      true
    } catch { case _: Exception => false }

  private[graft] def decodeBody(body: Array[Byte], contentType: String,
                                sniffBytes: Int): (String, String) = {
    if (body == null) return (null, null)
    // 0. byte-order mark — per the WHATWG encoding standard's decode
    // algorithm the BOM outranks EVERYTHING, including the Content-Type
    // header charset (browsers do exactly this): a UTF-16 body whose
    // header still says iso-8859-1 is common misconfiguration, and
    // header-first would decode it to alternating NUL mojibake
    if (body.length >= 3 && body(0) == 0xEF.toByte &&
      body(1) == 0xBB.toByte && body(2) == 0xBF.toByte)
      return (new String(body, 3, body.length - 3,
        java.nio.charset.StandardCharsets.UTF_8), "bom:utf-8")
    if (body.length >= 2 && body(0) == 0xFF.toByte &&
      body(1) == 0xFE.toByte)
      return (new String(body, 2, body.length - 2,
        java.nio.charset.StandardCharsets.UTF_16LE), "bom:utf-16le")
    if (body.length >= 2 && body(0) == 0xFE.toByte &&
      body(1) == 0xFF.toByte)
      return (new String(body, 2, body.length - 2,
        java.nio.charset.StandardCharsets.UTF_16BE), "bom:utf-16be")
    // 1. header charset
    val fromHeader = Option(contentType)
      .flatMap { ct =>
        val i = ct.toLowerCase.indexOf("charset=")
        if (i < 0) None
        else Some(ct.substring(i + 8).takeWhile(c =>
          !c.isWhitespace && c != ';' && c != '"' && c != '\''))
      }
      .flatMap(resolveCharset).map(cs => (cs, "header"))
    // 2. HTML meta declaration in the sniff window (ASCII-safe scan:
    // decode the window as Latin-1, which maps every byte)
    val fromMeta = if (fromHeader.isDefined) None else {
      val raw = new String(body, 0, math.min(sniffBytes, body.length),
        "ISO-8859-1")
      // a <meta charset> inside an HTML COMMENT must not win (the
      // browser sniffers skip comments): drop terminated comments, then
      // truncate at an unterminated `<!--` (everything after it is
      // commented out as far as the sniff window can tell)
      val noComments = raw.replaceAll("(?s)<!--.*?-->", " ")
      val win = noComments.indexOf("<!--") match {
        case -1 => noComments
        case i  => noComments.substring(0, i)
      }
      MetaCharset.findFirstMatchIn(win)
        .flatMap(m => resolveCharset(m.group(1))).map(cs => (cs, "meta"))
    }
    fromHeader.orElse(fromMeta) match {
      case Some((cs, src)) =>
        (new String(body, cs), src + ":" + cs.name().toLowerCase)
      case None =>
        if (validUtf8(body))
          (new String(body, java.nio.charset.StandardCharsets.UTF_8),
            "sniff:utf-8")
        else (new String(body, "windows-1252"), "fallback:windows-1252")
    }
  }

  /** Append `body_text` (charset-correctly decoded) + `charset_source`
    * to a [[parseHttpResponses]] output. The naive `CAST(body AS STRING)`
    * is UTF-8-only — a Latin-1/Windows-1252 page (still a measurable
    * slice of the web) turns into replacement-char mojibake that no
    * downstream repair can undo; this decodes by the page's DECLARED or
    * sniffed charset instead. Narrow map-side transform, passthrough
    * columns preserved (same Encoders.row shape as the parser). */
  def withBodyText(df: DataFrame, bodyCol: String = "body",
                   contentTypeCol: String = "content_type",
                   sniffBytes: Int = 2048): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    Seq("body_text", "charset_source").foreach(c =>
      require(!df.columns.contains(c),
        s"Http.withBodyText: df already has a '$c' column — rename it " +
          "first; withBodyText appends its own"))
    val bi = df.schema.fieldIndex(bodyCol)
    val ci = df.schema.fieldIndex(contentTypeCol)
    require(df.schema(bi).dataType == BinaryType,
      s"$bodyCol must be BINARY, got ${df.schema(bi).dataType}")
    val outSchema = StructType(df.schema.fields.toSeq ++ Seq(
      StructField("body_text", StringType),
      StructField("charset_source", StringType)))
    df.map({ r =>
      val (text, src) = decodeBody(r.getAs[Array[Byte]](bi),
        r.getAs[String](ci), sniffBytes)
      Row.fromSeq(r.toSeq ++ Seq(text, src))
    })(Encoders.row(outSchema))
  }

  /** Deterministic HTTP response exhibits from an id column — the
    * test/demo source for [[parseHttpResponses]] (compressed variants are
    * JVM-built in HttpSpec; expressions cannot gzip): identity bodies
    * with exact/short/absent Content-Length, a CHUNKED variant whose
    * id-derived split the parser must reassemble (sizes in hex with an
    * extension on one chunk), a 404 with an empty body, and a garbage
    * non-HTTP payload (pmod 11 = 7) that must yield NULL status. Bodies
    * are the id-arithmetic text `Body {id} {filler}` so the DuckDB
    * oracle rebuilds them character-exact. */
  def synthHttpPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    def m(k: Int) = pmod(id, lit(k))
    val body = concat(lit("Body "), id.cast("string"), lit(" "),
      repeat(lit("f"), (m(40) + 5).cast("int")))
    val crlf = "\r\n"
    // chunked split point: 1 + pmod(id,4) bytes in the first chunk
    val c1 = (m(4) + 1).cast("int")
    val chunk1 = body.substr(lit(1), c1)
    val chunk2 = expr(s"substring(concat('Body ', CAST(`$idCol` AS STRING)," +
      s" ' ', repeat('f', CAST(pmod(`$idCol`, 40) + 5 AS INT)))," +
      s" CAST(pmod(`$idCol`, 4) + 2 AS INT), 1000000)")
    val identity = concat(
      lit("HTTP/1.1 200 OK" + crlf),
      lit("Content-Type: text/html; charset=utf-8" + crlf),
      // octet counts, not chars — ASCII today, but framing must stay
      // byte-correct if the synth ever grows non-ASCII (the
      // synthCrawlBlobs lesson)
      lit("Content-Length: "), octet_length(body).cast("string"),
      lit(crlf),
      lit(crlf), body)
    val chunked = concat(
      lit("HTTP/1.1 200 OK" + crlf),
      lit("Content-Type: text/plain" + crlf),
      lit("Transfer-Encoding: chunked" + crlf),
      lit(crlf),
      lower(hex(octet_length(chunk1))), lit(";ext=1" + crlf), chunk1,
      lit(crlf),
      lower(hex(octet_length(chunk2))), lit(crlf), chunk2, lit(crlf),
      lit("0" + crlf + crlf))
    val notFound = lit("HTTP/1.1 404 Not Found" + crlf +
      "Content-Type: text/plain" + crlf +
      "Content-Length: 0" + crlf + crlf)
    val payload = when(m(11) === 7, lit("NOT HTTP AT ALL"))
      .when(m(3) === 0, chunked)
      .when(m(5) === 2, notFound)
      .otherwise(identity)
    docs.select(id.as("media_id"), payload.cast(BinaryType).as("payload"))
  }

  /** Deterministic NON-UTF-8 HTTP exhibits from an id column — the
    * test/demo source for [[withBodyText]], one variant per resolution
    * path: header-declared ISO-8859-1 (body carries a raw 0xE9 'é'),
    * HTML `<meta charset=windows-1252>` with 0x93/0x94 curly quotes (the
    * bytes that differ from Latin-1 — a 8859-1 decode would yield C1
    * controls), undeclared valid UTF-8 (sniff), and undeclared INVALID
    * UTF-8 (the Windows-1252 total fallback). Bodies are built from
    * unhex'd byte literals because string expressions can only emit
    * UTF-8; the q146 oracle rebuilds each decoded string with chr()
    * codepoints. */
  def synthCharsetPayloads(docs: DataFrame, idCol: String): DataFrame = {
    val id = col(idCol)
    val m4 = pmod(id, lit(4))
    def b(s: String) = lit(s).cast(BinaryType)
    val idB = id.cast("string").cast(BinaryType)
    val bodyBin =
      when(m4 === 0, concat(b("caf"), unhex(lit("E9")), b(" doc "), idB))
        .when(m4 === 1, concat(
          b("<html><head><meta charset=\"windows-1252\"></head><body>"),
          unhex(lit("93")), b("q"), idB, unhex(lit("94")),
          b("</body></html>")))
        .when(m4 === 2, concat(b("caf"), unhex(lit("C3A9")), b(" doc "),
          idB))
        .otherwise(concat(b("raw"), unhex(lit("E9")), b(" doc "), idB))
    val ct = when(m4 === 0,
      "Content-Type: text/html; charset=ISO-8859-1\r\n")
      .when(m4 === 1, "Content-Type: text/html\r\n")
      .otherwise("Content-Type: text/plain\r\n")
    val payload = concat(
      b("HTTP/1.1 200 OK\r\n"), ct.cast(BinaryType),
      b("Content-Length: "),
      octet_length(bodyBin).cast("string").cast(BinaryType),
      b("\r\n\r\n"), bodyBin)
    docs.select(id.as("media_id"), payload.as("payload"))
  }
}
