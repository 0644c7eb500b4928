package graft.io.warc

import graft.TestBase
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

class WarcFilesSuite extends TestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("WET write/read roundtrip is byte-exact across shard rolls") {
    val docs = sfTable("documents").select(
      concat(lit("urn:doc:"), col("doc_id")).as("uri"),
      encode(col("text"), "UTF-8").as("bytes"))
    val dir = tmp("warc_rt")
    WarcFiles.write(docs, dir, maxShardBytes = 64 * 1024)
    val back = WarcFiles.read(spark, dir)
    assert(back.select("record_type").distinct().as[String].collect()
      .toSeq == Seq("conversion"))
    assertDFEq(
      back.select(col("uri"), decode(col("bytes"), "UTF-8").as("text")),
      sfTable("documents").select(
        concat(lit("urn:doc:"), col("doc_id")).as("uri"), col("text")))
    // the cap forced multiple shards and every shard is its own file
    val shards = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")) // local-FS .crc checksum twins
    assert(shards.length > 1 && shards.forall(_.endsWith(".warc.gz")))
  }

  test("reader parses a hand-written uncompressed WARC with an HTTP response") {
    val body = "<html>hi</html>"
    val http = s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n$body"
    val rec = "WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "WARC-Target-URI: http://example.com/\r\n" +
      "WARC-Date: 2013-05-01T12:00:00Z\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n" + http + "\r\n\r\n" +
      "WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "Content-Length: 4\r\n\r\nabcd\r\n\r\n"
    val dir = tmp("warc_hand")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg.warc"),
      rec.getBytes(StandardCharsets.US_ASCII))
    val rows = WarcFiles.read(spark, dir)
    assert(rows.count() == 2)
    val resp = rows.filter(col("record_type") === "response")
      .select(col("uri"), col("date"),
        decode(WarcFiles.httpBody(col("bytes")), "UTF-8").as("body"))
      .head()
    assert(resp.getString(0) == "http://example.com/")
    assert(resp.getString(1) == "2013-05-01T12:00:00Z")
    assert(resp.getString(2) == body)
  }

  test("httpBody passes through payloads with no HTTP envelope") {
    val df = Seq("plain text".getBytes(StandardCharsets.UTF_8))
      .toDF("bytes")
    assert(df.select(decode(WarcFiles.httpBody(col("bytes")), "UTF-8"))
      .as[String].head() == "plain text")
  }

  test("dateCol rides into records; default date is the fixed epoch") {
    val df = Seq(("urn:a", "x".getBytes(StandardCharsets.UTF_8), "2020-01-02T03:04:05Z"))
      .toDF("uri", "bytes", "d")
    val dir = tmp("warc_date")
    WarcFiles.write(df, dir, dateCol = Some("d"))
    assert(WarcFiles.read(spark, dir).select("date").as[String].head() ==
      "2020-01-02T03:04:05Z")
    val dir2 = tmp("warc_nodate")
    WarcFiles.write(df.drop("d"), dir2)
    assert(WarcFiles.read(spark, dir2).select("date").as[String].head() ==
      "1970-01-01T00:00:00Z")
  }

  test("zstd segments decode, including concatenated per-record frames") {
    val rec1 = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: urn:z1\r\nContent-Length: 5\r\n\r\nhello\r\n\r\n"
    val rec2 = "WARC/1.0\r\nWARC-Type: conversion\r\n" +
      "WARC-Target-URI: urn:z2\r\nContent-Length: 5\r\n\r\nworld\r\n\r\n"
    val dir = tmp("warc_zst")
    val out = new java.io.FileOutputStream(s"$dir/seg.warc.zst")
    for (r <- Seq(rec1, rec2)) { // one zstd FRAME per record
      val z = new com.github.luben.zstd.ZstdOutputStream(
        new java.io.FilterOutputStream(out) { override def close(): Unit = () })
      z.write(r.getBytes(StandardCharsets.US_ASCII)); z.close()
    }
    out.close()
    val rows = WarcFiles.read(spark, dir)
      .select(col("uri"), decode(col("bytes"), "UTF-8").as("t"))
      .as[(String, String)].collect().toSet
    assert(rows == Set(("urn:z1", "hello"), ("urn:z2", "world")))
  }

  test("httpHeaders parses the envelope; no-envelope payload yields empty map") {
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=ISO-8859-1\r\nX-A: b\r\n\r\nbody"
    val df = Seq(http.getBytes(StandardCharsets.ISO_8859_1),
      "plain".getBytes(StandardCharsets.UTF_8)).toDF("bytes")
    val maps = df.select(WarcFiles.httpHeaders(col("bytes")))
      .as[Map[String, String]].collect()
    assert(maps(0) == Map(
      "content-type" -> "text/html; charset=ISO-8859-1", "x-a" -> "b"))
    assert(maps(1).isEmpty)
  }

  test("decodeText sniffs BOM, header charset, meta charset, falls back UTF-8") {
    val latin = "café ole".getBytes(StandardCharsets.ISO_8859_1)
    val bom = Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++
      "café".getBytes(StandardCharsets.UTF_8)
    val meta = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body>déjà</body></html>")
      .getBytes("windows-1252")
    val plainUtf = "働く".getBytes(StandardCharsets.UTF_8)
    val broken = Array(0xC3, 0x28).map(_.toByte) // malformed UTF-8
    val df = Seq(
      (latin, "text/html; charset=ISO-8859-1"),
      (bom, null), (meta, null), (plainUtf, null), (broken, null))
      .toDF("bytes", "ct")
    val out = df.select(WarcFiles.decodeText(col("bytes"), col("ct")))
      .as[String].collect()
    assert(out(0) == "café ole")
    assert(out(1) == "café") // BOM consumed, not emitted
    assert(out(2).contains("déjà"))
    assert(out(3) == "働く")
    assert(out(4).contains("�")) // replaced, never a task failure
  }

  test("non-ASCII target URIs roundtrip as UTF-8 header bytes") {
    // real Common Crawl segments carry UTF-8 URIs; US-ASCII getBytes
    // would write '?' and a per-byte toChar read would return mojibake
    val uris = Seq("https://例え.jp/ページ?q=日本語",
      "https://müller.de/straße", "urn:plain:ascii")
    val df = uris.map(u => (u, s"body of $u".getBytes(StandardCharsets.UTF_8)))
      .toDF("uri", "bytes")
    val dir = tmp("warc_utf8")
    WarcFiles.write(df, dir)
    val back = WarcFiles.read(spark, dir)
      .select(col("uri"), decode(col("bytes"), "UTF-8").as("t"))
      .as[(String, String)].collect().toSet
    assert(back == uris.map(u => (u, s"body of $u")).toSet)
  }

  test("shard cap counts exact framed bytes, long URIs included") {
    // two records whose REAL framed size (header ~460 B with a 300-char
    // URI) exceeds half the cap: a flat 256-byte header estimate would
    // pack both into one shard and overshoot; exact accounting rolls
    val uri = "https://example.com/" + ("p" * 280)
    val df = Seq((uri + "1", ("a" * 100).getBytes(StandardCharsets.UTF_8)),
      (uri + "2", ("b" * 100).getBytes(StandardCharsets.UTF_8)))
      .toDF("uri", "bytes").coalesce(1)
    val dir = tmp("warc_cap")
    WarcFiles.write(df, dir, maxShardBytes = 1000)
    val shards = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).filter(_.endsWith(".warc.gz"))
    assert(shards.length == 2,
      s"exact framed accounting must roll the second record: $shards")
    assert(WarcFiles.read(spark, dir).count() == 2)
  }

  test("httpBody and httpHeaders agree on a >64 KiB header block") {
    // both accessors cap the CRLFCRLF search identically: a pathological
    // header block past the bound means NO envelope for both — headers
    // empty AND body passed through whole (previously httpBody stripped
    // it while httpHeaders returned empty, disagreeing)
    val huge = ("HTTP/1.1 200 OK\r\n" + "X-Pad: " + "a" * (1 << 16) +
      "\r\n\r\nbody").getBytes(StandardCharsets.ISO_8859_1)
    val df = Seq(huge).toDF("bytes")
    val hdrs = df.select(WarcFiles.httpHeaders(col("bytes")))
      .as[Map[String, String]].head()
    val body = df.select(WarcFiles.httpBody(col("bytes")))
      .as[Array[Byte]].head()
    assert(hdrs.isEmpty)
    assert(body.length == huge.length, "no-envelope body passes through whole")
  }

  test("malformed segment fails loudly, not silently truncated") {
    val dir = tmp("warc_bad")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "seg.warc"),
      "NOT A WARC\r\n".getBytes(StandardCharsets.US_ASCII))
    val e = intercept[org.apache.spark.SparkException] {
      WarcFiles.read(spark, dir).count()
    }
    assert(e.getMessage.contains("WARC") ||
      e.getCause != null)
  }
}
