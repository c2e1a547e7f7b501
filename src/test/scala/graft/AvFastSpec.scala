package graft

import org.apache.spark.sql.functions._
import graft.multimodal.{AvFast, Multimodal}

/** avMetadataFast (the JVM mapPartitions rung) must be bit-compatible
  * with avMetadata (the expression exhibit) — same 8 appended columns
  * on every synth family, adversarial ids, malformed blobs and format
  * subsets. The census (q133) runs the rung; the per-family exhibit
  * queries keep the expression parser; this spec is what lets both
  * claim the same semantics. */
class AvFastSpec extends SparkSpec {

  private val cols = Seq("av_format", "codec", "channels", "sample_rate",
    "bits_per_sample", "width", "height", "duration_ms")

  private def assertParity(media: org.apache.spark.sql.DataFrame,
                           formats: Set[String] = Multimodal.AvFormats,
                           label: String): Unit = {
    val key = media.columns.head
    val exp = Multimodal.avMetadata(media, formats = formats)
      .select(col(key) +: cols.map(col): _*).collect()
      .map(r => r.get(0) -> r.toSeq.tail).toMap
    val got = AvFast.avMetadataFast(media, formats = formats)
      .select(col(key) +: cols.map(col): _*).collect()
      .map(r => r.get(0) -> r.toSeq.tail).toMap
    assert(exp.keySet === got.keySet, label)
    val bad = exp.keys.filter(k => exp(k) != got(k))
    assert(bad.isEmpty,
      s"$label: ${bad.take(5).map(k => s"$k exp=${exp(k)} got=${got(k)}")}")
  }

  test("parity on all four synth families across a wide id range " +
      "(negatives = adversarial per repo convention)") {
    import spark.implicits._
    val ids = ((-300L to 300L) ++ (100000L to 100050L)).toDF("doc_id")
    assertParity(Multimodal.synthAvBytes(ids, "doc_id"), label = "wav/mp4")
    assertParity(Multimodal.synthAudioBytes(ids, "doc_id"), label = "mp3/flac")
    assertParity(Multimodal.synthOggBytes(ids, "doc_id"), label = "ogg")
    assertParity(Multimodal.synthWebmBytes(ids, "doc_id"), label = "webm/mkv")
  }

  test("parity on malformed/truncated/garbage blobs and prefix edges") {
    import spark.implicits._
    def hx(s: String): Array[Byte] = s.grouped(2)
      .map(b => Integer.parseInt(b, 16).toByte).toArray
    val blobs: Seq[(Long, Array[Byte])] = Seq(
      1L -> null,
      2L -> Array.empty[Byte],
      3L -> hx("52"), // 'R'
      4L -> hx("52494646"), // RIFF, truncated before WAVE
      5L -> hx("5249464600000000" + "57415645"), // RIFF/WAVE, no chunks
      // RIFF/WAVE with an odd-sized junk chunk then truncated fmt
      6L -> hx("524946461C00000057415645" + "6A756E6B03000000AABBCC00" +
        "666D7420100000000100"),
      // fmt declaring size 8 (< 16): fields must NOT be read
      7L -> hx("524946462400000057415645" + "666D742008000000" +
        "01000200401F0000" + "6461746104000000AABBCCDD"),
      8L -> hx("000000086674797069736F6D"), // bare ftyp, nothing else
      // mvhd version 7 (unknown): ts/dur nulled, walk done
      9L -> hx("0000006C6674797069736F6D" + "000000146D766864" +
        "07000000" + "00" * 12),
      10L -> hx("494433040000000000"), // ID3 truncated before size end
      11L -> hx("4944330400000000000010"), // ID3 + tag, no frame
      12L -> hx("FFFB9000" + "00" * 8), // bare MPEG1 L3 frame header
      13L -> hx("FFE21000" + "00" * 8), // reserved version bits
      14L -> hx("664C6143" + "00" * 10), // fLaC truncated STREAMINFO
      15L -> hx("664C614380000022" + "12345678" + "0AC44218" + "00" * 20),
      16L -> hx("4F67675300" + "00" * 40), // OggS v0, zero segments, junk
      17L -> hx("4F67675301" + "00" * 40), // OggS bad version
      18L -> hx("1A45DFA3"), // EBML magic alone
      19L -> hx("1A45DFA3934282847765626D"), // head + DocType webm
      20L -> hx("1A45DFA39342828477656262"), // DocType 'webb' -> mkv
      // EBML: unknown-size element then Cluster
      21L -> hx("1A45DFA3FF1F43B67580"),
      // EBML: Duration f32 with sign bit (-> null duration)
      22L -> hx("1A45DFA39A18538067941549A9668E4489" + "84C2480000"),
      23L -> hx("00112233445566778899"), // garbage
      24L -> ("RIFF....WAVE".getBytes("ISO-8859-1") ++
        Array.fill(200)(0x41.toByte)))
    val media = blobs.toDF("doc_id", "content")
    assertParity(media, label = "malformed")
  }

  test("parity under format-subset dispatch") {
    import spark.implicits._
    val ids = (-50L to 80L).toDF("doc_id")
    for ((fam, df) <- Seq(
        "av" -> Multimodal.synthAvBytes(ids, "doc_id"),
        "audio" -> Multimodal.synthAudioBytes(ids, "doc_id"),
        "ogg" -> Multimodal.synthOggBytes(ids, "doc_id"),
        "webm" -> Multimodal.synthWebmBytes(ids, "doc_id"));
        fs <- Seq(Set("wav"), Set("webm", "mkv"), Set("mp3", "ogg")))
      assertParity(df, formats = fs, label = s"$fam under $fs")
  }

  test("q133 census twin: rung and expression parser aggregate identically " +
      "over the real corpus bytes") {
    val d = graft.sources.Sources.table(spark, sf, "documents")
      .select("doc_id")
    val av = Seq(
      Multimodal.synthAvBytes(d, "doc_id"),
      Multimodal.synthAudioBytes(d, "doc_id"),
      Multimodal.synthOggBytes(d, "doc_id"),
      Multimodal.synthWebmBytes(d, "doc_id")).reduce(_ unionByName _)
    def census(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("av_format")
      .agg(count(lit(1)).as("n"),
        sum(coalesce(col("width"), lit(0L))).as("sum_w"),
        sum(coalesce(col("duration_ms"), lit(0L))).as("sum_dur"))
      .orderBy("av_format").collect().toSeq
    assert(census(AvFast.avMetadataFast(av)) ===
      census(Multimodal.avMetadata(av)))
  }
}
