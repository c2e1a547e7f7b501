package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class ImageDhashSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(ids: Long*): Map[Long, Option[Long]] =
    Multimodal.imageDhash(Multimodal.synthDhashImageBytes(
      ids.toDF("doc_id"), "doc_id"))
      .select($"media_id", $"dhash")
      .as[(Long, Option[Long])].collect().toMap

  test("cross-container content identity: ids congruent mod 256 render " +
      "the same pixels in DIFFERENT layouts (24bpp bottom-up BMP, " +
      "32bpp top-down BMP, ICO) and must hash identically") {
    // all ≡ 0 mod 256 (identical pixels), hitting all three variants:
    // 0 -> pmod 3 = 0 (bmp24), 256 -> 1 (top-down bmp32), 1280 -> 2
    // (ico; 512 would be ico too but 512 ≡ 6 mod 11 is the garbage row)
    val h = hashes(0L, 256L, 1280L, 5L)
    assert(h(0L).isDefined)
    assert(h(0L) === h(256L), "bmp24 vs top-down bmp32 diverged")
    assert(h(0L) === h(1280L), "bmp vs ico diverged")
    assert(h(0L) !== h(5L), "different pixels must differ")
  }

  test("planted one-pixel near-dup lands within Hamming 1 of its " +
      "source; unrelated images sit far away; banding finds the plant") {
    val h = hashes(40L, 41L, 43L)  // 41 = plant of 40; 43 unrelated
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h(40L).get, h(41L).get) <= 1)
    assert(ham(h(40L).get, h(43L).get) > 8)
    val sigs = Multimodal.imageDhash(Multimodal.synthDhashImageBytes(
      Seq(40L, 41L, 43L).toDF("doc_id"), "doc_id"))
      .select($"media_id".as("id"), $"dhash".as("simhash"))
    val pairs = graft.dedup.Dedup.simhashBandedDups(sigs, "id", 64, 2)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((40L, 41L)))
  }

  test("malformed inputs NULL, never throw: garbage bytes, truncated " +
      "pixel arrays, unsupported bpp, and NULL rows never reach banding") {
    val h = hashes(6L)  // pmod(6, 11) = 6 -> garbage bytes
    assert(h(6L).isEmpty)
    // truncate a valid image mid-pixel-array: dhash must go NULL
    val truncated = Multimodal.synthDhashImageBytes(
      Seq(3L).toDF("doc_id"), "doc_id")
      .select($"media_id", expr("substring(content, 1, 100)").as("content"))
    val ht = Multimodal.imageDhash(truncated)
      .select($"dhash").collect().head
    assert(ht.isNullAt(0))
    // an 8-bpp palette BMP is undecodable here: NULL, not garbage
    val pal = Seq((9L, Array.fill[Byte](200)(0x42))).toDF("media_id", "content")
    assert(Multimodal.imageDhash(pal).select($"dhash")
      .collect().head.isNullAt(0))
    // NULL-hash rows joined into banding produce no pairs (null keys
    // drop from the equi-join — no filter needed upstream)
    val sigs = Multimodal.imageDhash(Multimodal.synthDhashImageBytes(
      Seq(6L, 17L).toDF("doc_id"), "doc_id"))
      .select($"media_id".as("id"), $"dhash".as("simhash"))
    assert(graft.dedup.Dedup.simhashBandedDups(sigs, "id", 64, 2)
      .count() === 0)
  }

  test("imageDhashFast (JVM rung) is bit-identical to the expression " +
      "dHash across all three layouts, plants, garbage, truncation and " +
      "malformed headers") {
    // wide id range covers every pmod class: 24bpp bottom-up BMP,
    // 32bpp top-down BMP, single-image ICO, near-dup plants, garbage
    val ids = ((-300L to 300L) ++ (99990L to 100050L)).toDF("doc_id")
    val media = Multimodal.synthDhashImageBytes(ids, "doc_id")
    val exp = Multimodal.imageDhash(media)
      .select($"media_id", $"dhash").collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    val got = Multimodal.imageDhashFast(media)
      .select($"media_id", $"dhash").collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    assert(exp.keySet === got.keySet)
    val bad = exp.keys.filter(k => exp(k) != got(k))
    assert(bad.isEmpty,
      bad.take(5).map(k => s"$k exp=${exp(k)} got=${got(k)}").toSeq)
    assert(exp.values.count(_ != null) > 400, "fixture must mostly decode")
    // malformed blobs through BOTH paths: garbage, truncated pixels,
    // truncated ICO directory (the clamped data-dependent reads),
    // 8-bpp palette, empty, null
    def hx(str: String): Array[Byte] = str.grouped(2)
      .map(x => Integer.parseInt(x, 16).toByte).toArray
    val valid3 = Multimodal.synthDhashImageBytes(
      Seq(3L).toDF("doc_id"), "doc_id")
      .select($"content").as[Array[Byte]].collect().head
    val mal = Seq[(Long, Array[Byte])](
      1L -> null,
      2L -> Array.empty[Byte],
      3L -> valid3.take(100),            // truncated mid-pixel-array
      4L -> Array.fill[Byte](200)(0x42), // 8-bpp-ish garbage
      5L -> hx("00000100" + "0100" + "00" * 10 + "16000000"), // ICO dir only
      6L -> hx("00000100" + "0100" + "00" * 10 + "16000000" + "28000000"
        + "09000000"),                   // ICO DIB truncated mid-header
      7L -> hx("424D" + "00" * 60),      // BM magic, zeroed DIB
      8L -> valid3                       // control: must decode
    ).toDF("media_id", "content")
    val expM = Multimodal.imageDhash(mal)
      .select($"media_id", $"dhash").collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    val gotM = Multimodal.imageDhashFast(mal)
      .select($"media_id", $"dhash").collect()
      .map(r => r.get(0) -> r.get(1)).toMap
    assert(expM === gotM)
    assert(expM(8L) != null && expM(3L) == null)
  }

  test("64-bit banding chunks use UNSIGNED shifts: a signature with the " +
      "sign bit set pairs with its 1-bit neighbor and never throws") {
    // MinValue vs 0 differ ONLY in the sign bit (hamming 1): with a
    // signed `>>` the top chunk would smear to all-ones and the join
    // key would still match, but the smeared cv of MinValue|1 vs
    // MinValue would break — unsigned shifts make all three pair up
    val sigs = Seq((1L, Long.MinValue), (2L, Long.MinValue | 1L),
      (3L, 0L)).toDF("id", "simhash")
    val got = graft.dedup.Dedup.simhashBandedDups(sigs, "id", 64, 2)
      .select($"id_a", $"id_b", $"hamming")
      .as[(Long, Long, Int)].collect().toSet
    assert(got === Set((1L, 2L, 1), (1L, 3L, 1), (2L, 3L, 2)))
    // bits=64 with maxHamming=0 would need one 64-wide mask: refused
    intercept[IllegalArgumentException] {
      graft.dedup.Dedup.simhashBandedDups(sigs, "id", 64, 0)
    }
  }
}
