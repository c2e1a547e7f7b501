package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** JVM decode rung for [[Multimodal.avMetadata]] — the mapPartitions
  * twin of the expression-only A/V chunk walk, bit-compatible by
  * construction and pinned by AvFastSpec (same output for every synth
  * family, golden fixture and malformed blob).
  *
  * WHY (r20 optimization round, guide §4): the expression parser's
  * per-row cost is interpreted HOF-fold evaluation — ~0.1 ms/row at
  * sf0.1 (CensusProbe), the measured floor of expression-only parsing
  * and the dominant term of the q133 census. The same walk in plain
  * JVM code runs at ~1 µs/row. This is the documented decode-rung
  * ladder ([[Png]]/[[Jpeg]] pattern): per-partition init amortized,
  * blobs read once where they already are, only the metadata columns
  * travel onward. The EXPRESSION parser remains the library's
  * exhibit/reference implementation (q128/q153-class queries keep it;
  * the oracle checks both).
  *
  * Semantics are [[Multimodal.avMetadata]]'s, translated from 1-based
  * hex-char positions to 0-based byte offsets (char 2b+1 <-> byte b).
  * Every guard, field offset, walk budget, dispatch gate and NULL path
  * mirrors the expression fold — see the scaladoc there for the
  * format-level rationale. The one intentional divergence: u64 box
  * sizes/durations >= 2^63 wrap negative here, where the expression
  * path's ANSI BIGINT cast would THROW (such a value cannot occur in
  * oracle-checked data — a throw is not a replayable contract either).
  */
object AvFast {

  private val appended: Seq[StructField] = Seq(
    StructField("av_format", StringType), StructField("codec", StringType),
    StructField("channels", LongType), StructField("sample_rate", LongType),
    StructField("bits_per_sample", LongType), StructField("width", LongType),
    StructField("height", LongType), StructField("duration_ms", LongType))

  def avMetadataFast(media: DataFrame, contentCol: String = "content",
                     maxChunks: Int = 16,
                     headerBytes: Int = 64 * 1024,
                     formats: Set[String] = Multimodal.AvFormats): DataFrame = {
    require(maxChunks >= 1 && maxChunks <= 256,
      s"maxChunks must be in [1, 256], got $maxChunks")
    require(headerBytes >= 64,
      s"headerBytes must cover the smallest fmt/mvhd layout (64), got $headerBytes")
    require(formats.nonEmpty && formats.subsetOf(Multimodal.AvFormats),
      s"formats must be a non-empty subset of ${Multimodal.AvFormats}, got $formats")
    appended.map(_.name).foreach(c =>
      require(!media.columns.contains(c),
        s"Multimodal.avMetadataFast: media already has a '$c' column — " +
          "rename it first; avMetadataFast appends its own"))
    val schema = StructType(media.schema.fields ++ appended)
    val idx = media.schema.fieldIndex(contentCol)
    val mc = maxChunks
    val hb = headerBytes
    val fm = formats
    media.mapPartitions { it =>
      it.map { r =>
        val content = if (r.isNullAt(idx)) null
          else r.get(idx).asInstanceOf[Array[Byte]]
        Row.fromSeq(r.toSeq ++ parse(content, mc, hb, fm))
      }
    }(Encoders.row(schema))
  }

  // unsigned byte at offset (caller guarantees bounds)
  @inline private def u(p: Array[Byte], i: Int): Int = p(i) & 0xFF
  private def le16(p: Array[Byte], i: Int): Long =
    u(p, i) | (u(p, i + 1).toLong << 8)
  private def le32(p: Array[Byte], i: Int): Long =
    u(p, i) | (u(p, i + 1).toLong << 8) | (u(p, i + 2).toLong << 16) |
      (u(p, i + 3).toLong << 24)
  private def beN(p: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L; var k = 0
    while (k < n) { v = (v << 8) | u(p, i + k); k += 1 }
    v
  }
  private def fourcc(p: Array[Byte], i: Int, s: String): Boolean = {
    var k = 0
    while (k < s.length) { if (u(p, i + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  /** The appended 8 values for one blob, in [[appended]] order. */
  private[multimodal] def parse(content: Array[Byte], maxChunks: Int,
                                headerBytes: Int,
                                formats: Set[String]): Seq[Any] = {
    if (content == null) return Seq(null, null, null, null, null, null, null, null)
    val p = if (content.length <= headerBytes) content
      else java.util.Arrays.copyOf(content, headerBytes)
    val L = p.length
    def want(fs: String*): Boolean = fs.exists(formats.contains)
    val ebml = want("webm", "mkv")

    // EBML walk first when the magic matches (av_format needs DocType)
    var web: WebSt = null
    if (ebml && L >= 4 && u(p, 0) == 0x1A && u(p, 1) == 0x45 &&
        u(p, 2) == 0xDF && u(p, 3) == 0xA3)
      web = webmWalk(p, L, 3 * maxChunks)

    // sniff, in the expression when-chain's order
    val fmt: String =
      if (L >= 12 && fourcc(p, 0, "RIFF") && fourcc(p, 8, "WAVE")) "wav"
      else if (L >= 8 && fourcc(p, 4, "ftyp")) "mp4"
      else if ((L >= 3 && fourcc(p, 0, "ID3")) ||
               (L >= 2 && u(p, 0) == 0xFF && u(p, 1) >= 224)) "mp3"
      else if (L >= 4 && fourcc(p, 0, "fLaC")) "flac"
      else if (L >= 4 && fourcc(p, 0, "OggS")) "ogg"
      else if (web != null) { if (web.dt == "7765626D") "webm" else "mkv" }
      else null

    var codec: String = null
    var channels: Any = null
    var sampleRate: Any = null
    var bits: Any = null
    var width: Any = null
    var height: Any = null
    var durMs: Any = null

    if (fmt == "wav" && want("wav")) {
      // chunk walk from byte 12; each iter needs 8 bytes (fourcc + size)
      var b = 12
      var ch, sr, br, bi, db: Any = null
      var done = false
      var i = 0
      while (i < maxChunks && !done) {
        if (L < b + 8) done = true
        else {
          val size = le32(p, b + 4)
          val hop = b + 8 + size + (size % 2)
          if (fourcc(p, b, "fmt ") && L >= b + 24 && size >= 16) {
            ch = le16(p, b + 10); sr = le32(p, b + 12)
            br = le32(p, b + 16); bi = le16(p, b + 22)
            done = db != null
          } else if (fourcc(p, b, "data")) {
            db = size
            done = ch != null
          }
          // hop rides BIGINT in the expression; sizes here fit u32 so
          // Int overflow is only reachable past headerBytes — clamp
          b = math.min(hop, Int.MaxValue.toLong).toInt
        }
        i += 1
      }
      channels = ch; sampleRate = sr; bits = bi
      if (br != null && br.asInstanceOf[Long] > 0 && db != null)
        durMs = db.asInstanceOf[Long] * 1000 / br.asInstanceOf[Long]
    }

    if (fmt == "mp4" && want("mp4")) {
      var b = 0L
      var ts, dur, w, h: Any = null
      var done = false
      var i = 0
      while (i < maxChunks && !done) {
        if (b > L - 8) done = true
        else {
          val bi2 = b.toInt
          val size = beN(p, bi2, 4)
          if (fourcc(p, bi2 + 4, "mvhd")) {
            if (u(p, bi2 + 8) == 0 && L >= b + 28) {
              ts = beN(p, bi2 + 20, 4); dur = beN(p, bi2 + 24, 4)
              done = w != null; b += size
            } else if (u(p, bi2 + 8) == 1 && L >= b + 40) {
              ts = beN(p, bi2 + 28, 4); dur = beN(p, bi2 + 32, 8)
              done = w != null; b += size
            } else { ts = null; dur = null; done = true }
          } else if (fourcc(p, bi2 + 4, "tkhd")) {
            if (u(p, bi2 + 8) == 0 && L >= b + 90) {
              val rot = beN(p, bi2 + 48, 4) == 0 && beN(p, bi2 + 64, 4) == 0
              w = beN(p, bi2 + (if (rot) 88 else 84), 2)
              h = beN(p, bi2 + (if (rot) 84 else 88), 2)
              done = ts != null; b += size
            } else if (u(p, bi2 + 8) == 1 && L >= b + 102) {
              val rot = beN(p, bi2 + 60, 4) == 0 && beN(p, bi2 + 76, 4) == 0
              w = beN(p, bi2 + (if (rot) 100 else 96), 2)
              h = beN(p, bi2 + (if (rot) 96 else 100), 2)
              done = ts != null; b += size
            } else { w = null; h = null; done = true }
          } else if (fourcc(p, bi2 + 4, "moov") || fourcc(p, bi2 + 4, "trak")) {
            b += 8
          } else if (size == 1) {
            if (L >= b + 16 && beN(p, bi2 + 8, 4) == 0 &&
                beN(p, bi2 + 12, 4) >= 16) b += beN(p, bi2 + 12, 4)
            else done = true
          } else if (size < 8) done = true
          else b += size
        }
        i += 1
      }
      width = w; height = h
      if (ts != null && ts.asInstanceOf[Long] > 0 && dur != null)
        durMs = dur.asInstanceOf[Long] * 1000 / ts.asInstanceOf[Long]
    }

    if (fmt == "mp3" && want("mp3")) {
      // first-frame byte offset: one hop over an ID3v2 tag (syncsafe)
      val fp: Any =
        if (L >= 3 && fourcc(p, 0, "ID3")) {
          if (L >= 10 && u(p, 6) < 128 && u(p, 7) < 128 && u(p, 8) < 128 &&
              u(p, 9) < 128)
            10L + (u(p, 6).toLong * 2097152 + u(p, 7).toLong * 16384 +
              u(p, 8).toLong * 128 + u(p, 9))
          else null
        } else 0L
      if (fp != null) {
        val fpL = fp.asInstanceOf[Long]
        if (fpL <= L - 4 && fpL <= Int.MaxValue - 4) {
          val fi = fpL.toInt
          val h2 = u(p, fi + 1); val h3 = u(p, fi + 2)
          if (u(p, fi) == 0xFF && h2 >= 224 && (h2 / 2) % 4 == 1 &&
              (h2 / 8) % 4 != 1 && h3 / 16 >= 1 && h3 / 16 <= 14 &&
              (h3 / 4) % 4 != 3) {
            val kbps: Long =
              if ((h2 / 8) % 4 == 3)
                Array(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                  256, 320)(h3 / 16 - 1)
              else
                Array(8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
                  160)(h3 / 16 - 1)
            val srT = (h2 / 8) % 4 match {
              case 3 => Array(44100L, 48000L, 32000L)
              case 2 => Array(22050L, 24000L, 16000L)
              case _ => Array(11025L, 12000L, 8000L)
            }
            sampleRate = srT((h3 / 4) % 4)
            channels = if (u(p, fi + 3) / 64 == 3) 1L else 2L
            // CBR estimate over the WHOLE blob, not the hexed prefix
            if (kbps > 0)
              durMs = (content.length.toLong - fpL) * 8 / kbps
          }
        }
      }
    }

    if (fmt == "flac" && want("flac")) {
      if (L >= 26 && u(p, 4) % 128 == 0) {
        val u32a = beN(p, 18, 4); val u32b = beN(p, 22, 4)
        sampleRate = u32a / 4096
        channels = (u32a / 512) % 8 + 1
        bits = (u32a / 16) % 32 + 1
        val total = (u32a % 16) * 4294967296L + u32b
        if (u32a / 4096 > 0) durMs = total * 1000 / (u32a / 4096)
      }
    }

    if (fmt == "ogg" && want("ogg")) {
      if (L >= 27 && u(p, 4) == 0) {
        val pb = 27 + u(p, 26)
        if (L >= pb + 16 && fourcc(p, pb, "OpusHead")) {
          codec = "opus"; channels = u(p, pb + 9).toLong
          sampleRate = le32(p, pb + 12)
        } else if (L >= pb + 16 && u(p, pb) == 0x01 &&
                   fourcc(p, pb + 1, "vorbis")) {
          codec = "vorbis"; channels = u(p, pb + 11).toLong
          sampleRate = le32(p, pb + 12)
        }
      }
    }

    if ((fmt == "webm" || fmt == "mkv") && web != null) {
      // CodecID: strict UTF-8 decode — invalid bytes -> NULL (the
      // try_validate_utf8 twin)
      if (web.cid != null) codec = strictUtf8(web.cid)
      channels = web.ch
      if (web.sr != null) sampleRate = web.sr.asInstanceOf[Double].toLong
      width = web.w; height = web.h
      if (web.dur != null) {
        val scale = if (web.scale == null) 1000000L
          else web.scale.asInstanceOf[Long]
        durMs = math.floor(
          web.dur.asInstanceOf[Double] * scale.toDouble / 1000000.0d).toLong
      }
    }

    Seq(fmt, codec, channels, sampleRate, bits, width, height, durMs)
  }

  private final class WebSt {
    var dt: String = null        // DocType payload as UPPERCASE hex
    var scale: Any = null
    var dur: Any = null          // Double
    var w, h, ch: Any = null
    var sr: Any = null           // Double
    var cid: Array[Byte] = null  // CodecID payload bytes
  }

  private def strictUtf8(bytes: Array[Byte]): String =
    try {
      val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => null }

  // IEEE-754 BE decode, the expression f32/f64 twins: sign bit set,
  // inf/nan (max exponent) or subnormal (zero exponent, unless the whole
  // word is zero = exact 0.0) -> null
  private def ebmlFloat(p: Array[Byte], i: Int, n: Int): Any =
    if (n == 4) {
      if (u(p, i) >= 128) null
      else {
        val raw = beN(p, i, 4)
        if (raw == 0) 0.0d
        else if (raw / 8388608 == 0 || raw / 8388608 == 255) null
        else (1.0d + (raw % 8388608).toDouble / 8388608.0d) *
          math.pow(2.0d, (raw / 8388608).toDouble - 127.0d)
      }
    } else {
      if (u(p, i) >= 128) null
      else {
        val raw = beN(p, i, 8)
        if (raw == 0) 0.0d
        else if (raw / 4503599627370496L == 0 ||
                 raw / 4503599627370496L == 2047) null
        else (1.0d + (raw % 4503599627370496L).toDouble / 4.503599627370496e15) *
          math.pow(2.0d, (raw / 4503599627370496L).toDouble - 1023.0d)
      }
    }

  private def hexUpper(p: Array[Byte], from: Int, n: Int): String = {
    val sb = new java.lang.StringBuilder(2 * n)
    var k = 0
    while (k < n) {
      val v = u(p, from + k)
      sb.append("0123456789ABCDEF".charAt(v >>> 4))
      sb.append("0123456789ABCDEF".charAt(v & 15))
      k += 1
    }
    sb.toString
  }

  /** The EBML element walk — the webmFold twin (see avMetadata's
    * scaladoc): descends into the six container ids, reads the known
    * leaves, generically hops the rest; Cluster, malformed varints,
    * truncation or unknown-size end it keeping fields found so far. */
  private def webmWalk(p: Array[Byte], L: Int, budget: Int): WebSt = {
    val st = new WebSt
    var b = 0L
    var done = false
    var i = 0
    val containers = Set("1A45DFA3", "18538067", "1549A966", "1654AE6B",
      "AE", "E0", "E1")
    while (i < budget && !done) {
      if (b > L - 2) done = true
      else {
        val bi = b.toInt
        val f0 = u(p, bi)
        val idLen = if (f0 >= 128) 1 else if (f0 >= 64) 2
          else if (f0 >= 32) 3 else if (f0 >= 16) 4 else 0
        if (idLen == 0) done = true
        else {
          val idAvail = math.min(idLen.toLong, L - b).toInt
          val idh = hexUpper(p, bi, idAvail)
          val szpB = b + idLen
          val szl: Int =
            if (szpB >= L) 0
            else {
              val s0 = u(p, szpB.toInt)
              if (s0 >= 128) 1 else if (s0 >= 64) 2 else if (s0 >= 32) 3
              else if (s0 >= 16) 4 else if (s0 >= 8) 5 else if (s0 >= 4) 6
              else if (s0 >= 2) 7 else if (s0 >= 1) 8 else 0
            }
          if (szl == 0) done = true
          else {
            // the expression reads the size varint CLAMPED to the hexed
            // prefix (a truncated read parses the available bytes); an
            // empty read is NULL -> walk ends
            val szAvail = math.min(szl.toLong, L - szpB).toInt
            if (szAvail <= 0) done = true
            else {
              val szv = beN(p, szpB.toInt, szAvail) - (1L << (7 * szl))
              val dpB = szpB + szl
              def leafOk(lo: Long, hi: Long): Boolean =
                szv >= lo && szv <= hi && L >= dpB + szv
              if (containers.contains(idh)) b = dpB
              else if (idh == "1F43B675") done = true // Cluster
              else if (idh == "4282") { // DocType
                if (leafOk(1, 16)) {
                  st.dt = hexUpper(p, dpB.toInt, szv.toInt); b = dpB + szv
                } else done = true
              } else if (idh == "2AD7B1") { // TimestampScale
                if (leafOk(1, 8)) {
                  st.scale = beN(p, dpB.toInt, szv.toInt); b = dpB + szv
                } else done = true
              } else if (idh == "4489") { // Duration (float)
                if ((szv == 4 || szv == 8) && L >= dpB + szv) {
                  st.dur = ebmlFloat(p, dpB.toInt, szv.toInt); b = dpB + szv
                } else done = true
              } else if (idh == "B0") {
                if (leafOk(1, 8)) { st.w = beN(p, dpB.toInt, szv.toInt); b = dpB + szv }
                else done = true
              } else if (idh == "BA") {
                if (leafOk(1, 8)) { st.h = beN(p, dpB.toInt, szv.toInt); b = dpB + szv }
                else done = true
              } else if (idh == "9F") {
                if (leafOk(1, 8)) { st.ch = beN(p, dpB.toInt, szv.toInt); b = dpB + szv }
                else done = true
              } else if (idh == "B5") { // SamplingFrequency (float)
                if ((szv == 4 || szv == 8) && L >= dpB + szv) {
                  st.sr = ebmlFloat(p, dpB.toInt, szv.toInt); b = dpB + szv
                } else done = true
              } else if (idh == "86") { // CodecID
                if (leafOk(1, 16)) {
                  st.cid = java.util.Arrays.copyOfRange(
                    p, dpB.toInt, (dpB + szv).toInt)
                  b = dpB + szv
                } else done = true
              } else if (szv < 0 || szv == (1L << (7 * szl)) - 1) done = true
              else b = dpB + szv
            }
          }
        }
      }
      i += 1
    }
    st
  }
}
