package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.US_ASCII
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

import graft.sources.Warc

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private val crlf = "\r\n"

  private def record(wtype: String, uri: String, rid: String,
                     payload: String,
                     clName: String = "Content-Length"): String =
    "WARC/1.0" + crlf +
      s"WARC-Type: $wtype" + crlf +
      s"WARC-Record-ID: $rid" + crlf +
      s"WARC-Target-URI: $uri" + crlf +
      s"$clName: ${payload.length}" + crlf +
      crlf + payload + crlf + crlf

  test("explodeWarcBlobs: golden records — types, offsets, case-insensitive " +
      "headers, traps stop the walk without losing parsed records") {
    val r0 = record("response", "http://a.com/x", "<urn:uuid:1>", "hello")
    val r1 = record("request", "http://a.com/y", "<urn:uuid:2>",
      "WARC/1.0 inside a payload must not resync", clName = "content-LENGTH")
    val good = r0 + r1
    // truncated mid-header after one full record: first record kept
    val trunc = r0 + "WARC/1.0" + crlf + "WARC-Type: resp"
    // bad version line: zero records
    val bad = "HTTP/1.1 200 OK" + crlf + r0
    // declared length longer than the bytes present: record dropped
    val shortPay = "WARC/1.0" + crlf + "Content-Length: 99" + crlf + crlf +
      "tiny"
    val blobs = Seq(
      (1L, good.getBytes(US_ASCII)),
      (2L, trunc.getBytes(US_ASCII)),
      (3L, bad.getBytes(US_ASCII)),
      (4L, shortPay.getBytes(US_ASCII)),
      (5L, Array.empty[Byte])).toDF("media_id", "content")
    val got = Warc.explodeWarcBlobs(blobs)
      .select($"media_id", $"rec_idx", $"offset", $"warc_type",
        $"target_uri", $"record_id", $"content_length",
        $"payload".cast("string"), $"payload_truncated")
      .as[(Long, Long, Long, String, String, String, Long, String, Boolean)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 0L, 0L, "response", "http://a.com/x", "<urn:uuid:1>", 5L,
        "hello", false),
      (1L, 1L, r0.length.toLong, "request", "http://a.com/y",
        "<urn:uuid:2>", 41L, "WARC/1.0 inside a payload must not resync",
        false),
      (2L, 0L, 0L, "response", "http://a.com/x", "<urn:uuid:1>", 5L,
        "hello", false)))
  }

  test("explodeWarcBlobs: payload cap skips excess bytes, keeps the " +
      "declared length, marks the row, and stays in sync") {
    val big = record("response", "u", "<r1>", "x" * 100)
    val after = record("metadata", "u2", "<r2>", "ok")
    val blobs = Seq((1L, (big + after).getBytes(US_ASCII)))
      .toDF("media_id", "content")
    val got = Warc.explodeWarcBlobs(blobs, maxPayloadBytes = 16)
      .select($"rec_idx", $"content_length",
        octet_length($"payload").as("kept"), $"payload_truncated")
      .as[(Long, Long, Int, Boolean)].collect().sortBy(_._1).toSeq
    // the capped record reports the DECLARED 100 but carries 16 bytes,
    // and the walk still lands exactly on the next record
    assert(got === Seq((0L, 100L, 16, true), (1L, 2L, 2, false)))
  }

  test("warcRecords: .warc and record-per-member .warc.gz files parse " +
      "identically; offsets are uncompressed-stream offsets") {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc").toString
    val recs = (0 until 5).map(i =>
      record(if (i % 2 == 0) "response" else "request",
        s"http://h$i.com/", s"<urn:uuid:$i>", s"payload-$i-" + "y" * i))
    val plainBytes = recs.mkString.getBytes(US_ASCII)
    val fo = new FileOutputStream(s"$dir/a.warc")
    fo.write(plainBytes); fo.close()
    // WARC.gz convention: each record its own gzip member, concatenated
    val gz = new ByteArrayOutputStream()
    recs.foreach { r =>
      val g = new GZIPOutputStream(gz)
      g.write(r.getBytes(US_ASCII)); g.finish()
    }
    val go = new FileOutputStream(s"$dir/b.warc.gz")
    go.write(gz.toByteArray); go.close()
    // a non-warc file must be ignored by the listing; a NESTED segment
    // directory must be found (real dumps nest by date/segment)
    val xo = new FileOutputStream(s"$dir/notes.txt"); xo.write(42); xo.close()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/seg0"))
    val no = new FileOutputStream(s"$dir/seg0/c.warc")
    no.write(recs.head.getBytes(US_ASCII)); no.close()
    val df = Warc.warcRecords(spark, dir)
    val byFile = df.groupBy($"path").count()
      .as[(String, Long)].collect().toMap
    assert(byFile.size === 3)
    assert(byFile.filter(!_._1.endsWith("c.warc")).values.forall(_ === 5L))
    assert(byFile.find(_._1.endsWith("c.warc")).exists(_._2 === 1L))
    val a = df.where($"path".endsWith("a.warc"))
      .select($"rec_idx", $"offset", $"target_uri",
        $"payload".cast("string"))
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
    val b = df.where($"path".endsWith("b.warc.gz"))
      .select($"rec_idx", $"offset", $"target_uri",
        $"payload".cast("string"))
      .as[(Long, Long, String, String)].collect().sortBy(_._1).toSeq
    assert(a === b, "gz and plain parses must agree on the logical stream")
    val expOffsets = recs.scanLeft(0L)(_ + _.length).init
    assert(a.map(_._2) === expOffsets)
    assert(a.map(_._4) === (0 until 5).map(i => s"payload-$i-" + "y" * i))
  }

  test("multi-member gzip with trailing garbage: both members parse, " +
      "the garbage ends the stream cleanly; early-stop consumers leave " +
      "no broken state") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_warc_mm").toString
    val r0 = record("response", "http://mm.com/0", "<urn:uuid:m0>", "alpha")
    val r1 = record("response", "http://mm.com/1", "<urn:uuid:m1>", "beta")
    val gz = new ByteArrayOutputStream()
    Seq(r0, r1).foreach { r =>
      val g = new GZIPOutputStream(gz)
      g.write(r.getBytes(US_ASCII)); g.finish()
    }
    // trailing non-gzip garbage AFTER the last member: the JDK inflater
    // treats an unparseable next-member header as end-of-stream — pin
    // that contract (a re-crawled/append-damaged .gz must not throw)
    gz.write("TRAILING GARBAGE BYTES".getBytes(US_ASCII))
    val fo = new FileOutputStream(s"$dir/mm.warc.gz")
    fo.write(gz.toByteArray); fo.close()
    val got = Warc.warcRecords(spark, dir)
      .select($"rec_idx", $"payload".cast("string"))
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, "alpha"), (1L, "beta")))
    // blob path: same bytes, same two records, garbage swallowed
    val viaBlob = Warc.explodeWarcBlobs(
      Seq((1L, gz.toByteArray)).toDF("media_id", "content"))
    assert(viaBlob.count() === 2)
    // an EARLY-STOPPED consumer (LIMIT 1 over a multi-record file) must
    // work and not strand the task — the completion listener closes the
    // abandoned stream (can't observe the fd here, but the query must
    // succeed and return the first record)
    val first = Warc.warcRecords(spark, dir).limit(1)
      .select($"payload".cast("string")).as[String].collect().toSeq
    assert(first === Seq("alpha"))
  }

  test("damaged gzip costs its own tail, never the task: truncated " +
      "member, corrupt CRC trailer, corrupt post-magic header") {
    val r0 = record("response", "http://gz.com/0", "<urn:uuid:g0>", "alpha")
    val r1 = record("response", "http://gz.com/1", "<urn:uuid:g1>", "beta")
    val gz = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(gz)
    g.write((r0 + r1).getBytes(US_ASCII)); g.close()
    val full = gz.toByteArray
    // (a) truncated mid-member: the JDK stream THROWS EOFException on
    // the read — records fully parsed before the cut must survive
    val cut = java.util.Arrays.copyOfRange(full, 0, full.length / 2)
    // (b) corrupt CRC trailer: deflate data delivers fine, the trailer
    // check throws on the LAST read — both records must survive
    val crc = full.clone(); crc(crc.length - 5) = (crc(crc.length - 5) ^ 0x55).toByte
    // (c) gzip magic + damaged header: the CONSTRUCTOR throws
    val badHdr = Array[Byte](0x1f, 0x8b.toByte, 0x01, 0x02, 0x03)
    val got = Warc.explodeWarcBlobs(
      Seq((1L, cut), (2L, crc), (3L, badHdr))
        .toDF("media_id", "content"))
      .groupBy($"media_id").count()
      .as[(Long, Long)].collect().toMap
    assert(got.getOrElse(3L, 0L) === 0L, "bad header must yield 0 records")
    assert(got(2L) === 2L, "CRC corruption must not lose delivered records")
    assert(got.getOrElse(1L, 0L) <= 2L) // prefix records only, no throw
    // file path: same three, plus a healthy file — the damaged ones
    // must not take the healthy one (or the task) down
    val dir = java.nio.file.Files
      .createTempDirectory("graft_warc_dmg").toString
    Seq(("a_cut.warc.gz", cut), ("b_crc.warc.gz", crc),
      ("c_hdr.warc.gz", badHdr)).foreach { case (n, b) =>
      val fo = new FileOutputStream(s"$dir/$n"); fo.write(b); fo.close()
    }
    val ho = new FileOutputStream(s"$dir/d_ok.warc")
    ho.write(r0.getBytes(US_ASCII)); ho.close()
    val byFile = Warc.warcRecords(spark, dir)
      .groupBy($"path").count().as[(String, Long)].collect()
      .map { case (p, n) => p.split('/').last -> n }.toMap
    assert(byFile.getOrElse("d_ok.warc", 0L) === 1L,
      "healthy file lost to a damaged neighbor")
    assert(byFile.getOrElse("b_crc.warc.gz", 0L) === 2L)
    assert(!byFile.contains("c_hdr.warc.gz") ||
      byFile("c_hdr.warc.gz") === 0L)
  }

  test("synthWarcBytes round-trips across the corpus, traps included") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .select($"doc_id")
    val parsed = Warc.explodeWarcBlobs(Warc.synthWarcBytes(docs, "doc_id"))
    val id = $"media_id"
    // garbage-first-line ids yield zero records; everyone else 1 + m3
    val perDoc = parsed.groupBy("media_id").count()
    val joined = docs.join(perDoc, docs("doc_id") === perDoc("media_id"),
      "left")
    val wrong = joined.where(
      when(pmod($"doc_id", lit(11)) === 3, coalesce($"count", lit(0L)) =!= 0)
        .otherwise(coalesce($"count", lit(0L)) =!=
          pmod($"doc_id", lit(3)) + 1))
    assert(wrong.isEmpty, wrong.limit(5).collect().mkString("; "))
    // spot-verify field derivations on the parsed rows
    val badField = parsed.where(
      $"warc_type" =!= element_at(
        array(lit("response"), lit("request"), lit("metadata")),
        ($"rec_idx" + 1).cast("int")) ||
      $"target_uri" =!= concat(lit("http://site"),
        pmod(id, lit(100)).cast("string"), lit(".com/p"),
        $"rec_idx".cast("string")) ||
      $"content_length" =!=
        pmod(id * 7 + $"rec_idx", lit(50)) + 11 ||
      $"payload_truncated")
    assert(badField.isEmpty, badField.limit(5).collect().mkString("; "))
  }

  test("WARC parser never throws under truncation + corruption fuzz") {
    val docs = graft.sources.Sources.table(spark, sf, "documents")
      .where($"doc_id" < 48).select($"doc_id")
    val fam = Warc.synthWarcBytes(docs, "doc_id")
    val truncated = fam.select($"media_id",
      explode(sequence(lit(0), octet_length($"content"))).as("k"))
      .join(fam, Seq("media_id"))
      .select($"media_id", expr("substring(content, 1, k)").as("content"))
    val corrupted = Seq("00", "0D", "FF").map { b =>
      fam.select($"media_id",
        concat(
          expr("substring(content, 1, " +
            "pmod(media_id * 31, octet_length(content)))"),
          unhex(lit(b)),
          expr("substring(content, " +
            "pmod(media_id * 31, octet_length(content)) + 2, " +
            "2147483647)")).as("content"))
    }.reduce(_ unionAll _)
    for (mutated <- Seq(truncated, corrupted)) {
      // the parser must never throw, and every record it does emit must
      // be internally consistent (payload not longer than declared)
      val n = Warc.explodeWarcBlobs(mutated)
        .where(octet_length($"payload") > $"content_length").count()
      assert(n === 0)
      val n2 = Warc.explodeWarcBlobs(mutated, maxPayloadBytes = 7)
        .where(octet_length($"payload") > 7).count()
      assert(n2 === 0)
    }
  }

  test("wetDocs: conversion records become (url, wet_text) docs; " +
      "warcinfo drops; BOM strips; invalid UTF-8 NULLs text; gz parity") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      Warc.wetDocs(Warc.explodeWarcBlobs(df))
        .select($"media_id", $"rec_idx", $"url", $"wet_text",
          $"content_length")
        .as[(Long, Long, String, Option[String], Long)]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val info = ("WARC/1.0" + crlf + "WARC-Type: warcinfo" + crlf +
      "WARC-Record-ID: <urn:uuid:i>" + crlf + "Content-Length: 4" + crlf +
      crlf + "soft" + crlf + crlf).getBytes("ISO-8859-1")
    val conv = record("conversion", "http://w.org/a", "<urn:uuid:c>",
      "plain text doc").getBytes("ISO-8859-1")
    // BOM payload: 3 BOM bytes + 'héllo' in UTF-8 (6 bytes) = 9
    val utf8Hello = "héllo".getBytes("UTF-8")
    val bomPayload =
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++ utf8Hello
    val bom = (("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
      "WARC-Target-URI: http://w.org/b" + crlf +
      "WARC-Record-ID: <urn:uuid:d>" + crlf +
      s"Content-Length: ${bomPayload.length}" + crlf + crlf)
      .getBytes("ISO-8859-1")) ++ bomPayload ++
      (crlf + crlf).getBytes("ISO-8859-1")
    // invalid UTF-8: a lone 0xFF byte inside the payload
    val badPayload = "ok".getBytes("UTF-8") ++ Array[Byte](0xFF.toByte)
    val bad = (("WARC/1.0" + crlf + "WARC-Type: conversion" + crlf +
      "WARC-Target-URI: http://w.org/c" + crlf +
      "WARC-Record-ID: <urn:uuid:e>" + crlf +
      s"Content-Length: ${badPayload.length}" + crlf + crlf)
      .getBytes("ISO-8859-1")) ++ badPayload ++
      (crlf + crlf).getBytes("ISO-8859-1")
    val blob = info ++ conv ++ bom ++ bad
    val plain = collect(Seq((1L, blob)).toDF("media_id", "content"))
    assert(plain === Seq(
      (1L, 1L, "http://w.org/a", Some("plain text doc"), 14L),
      (1L, 2L, "http://w.org/b", Some("héllo"), 9L),
      (1L, 3L, "http://w.org/c", None, 3L)))
    // gz parity: record-per-member .warc.gz parses identically
    val gz = new ByteArrayOutputStream()
    for (r <- Seq(info, conv, bom, bad)) {
      val g = new GZIPOutputStream(gz)
      g.write(r); g.finish()
    }
    val gzed = collect(Seq((1L, gz.toByteArray)).toDF("media_id", "content"))
    assert(gzed === plain, "gz and plain WET parses must agree")
    // the synth corpus drives the same surface end to end
    val synth = Warc.wetDocs(Warc.explodeWarcBlobs(
      Warc.synthWetBytes(spark.range(0, 300).toDF("doc_id"), "doc_id")))
    assert(synth.where($"warc_type" =!= "conversion").count() === 0)
    assert(synth.where($"wet_text".isNull).count() > 0)  // m9=4 class
    assert(synth.where($"url".isNull).count() === 0)
    // FILE-level path: a .warc.gz on disk through warcRecords reads the
    // same WET docs (path-keyed passthrough instead of media_id)
    val dir = java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get("target"), "wet")
      .toString
    val fo = new FileOutputStream(s"$dir/a.warc.gz")
    fo.write(gz.toByteArray); fo.close()
    val fromFile = Warc.wetDocs(Warc.warcRecords(spark, dir))
      .select($"rec_idx", $"url", $"wet_text", $"content_length")
      .as[(Long, String, Option[String], Long)]
      .collect().sortBy(_._1).toSeq
    assert(fromFile === plain.map(r => (r._2, r._3, r._4, r._5)))
  }
}
