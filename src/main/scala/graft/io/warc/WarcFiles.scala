package graft.io.warc

import org.apache.commons.compress.compressors.gzip.{GzipCompressorInputStream, GzipCompressorOutputStream}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{BufferedInputStream, InputStream, OutputStream}
import java.nio.charset.StandardCharsets

/** WARC / WET reader and writer (ISO 28500 — the Common Crawl
  * container, i.e. the on-disk shape of the 100 TB corpora this
  * library curates; WET is the same framing with `conversion` records
  * carrying extracted plain text).
  *
  * read: segment files are listed driver-side (O(files) state) and each
  * task STREAMS one file's records — one task per segment, the
  * format's intended parallelism: gzip segments are not splittable, and
  * a crawl ships tens of thousands of ~1 GB segments, so file-level
  * fan-out saturates any executor count without splitting. Per-record
  * gzip members (the Common Crawl layout) and whole-file gzip both
  * decode through one concatenated-member stream; peak memory is one
  * record's payload. Malformed mid-file records fail the task loudly
  * rather than silently truncating the corpus.
  *
  * write: WET-style `conversion` records in byte-capped shards named
  * `part-<partition>-<seq>.warc.gz`, each record its OWN gzip member
  * (the Common Crawl convention — member boundaries let downstream
  * readers resynchronize and dedup tooling index by offset). Same
  * executor-side Hadoop FS streaming, collision-free naming, and
  * no-speculation caveat as [[graft.io.binary.TarShards.write]]; the
  * byte cap counts UNCOMPRESSED record bytes (compressed size is
  * unknowable before writing — document ~3-5x text compression when
  * sizing). All generated header fields are deterministic functions of
  * the row (record id = md5 of the target URI; fixed date unless a
  * column is supplied), so a deterministic input partitioning yields
  * byte-identical shards.
  */
object WarcFiles {

  val recordType: StructType = StructType(Seq(
    StructField("file", StringType),
    StructField("record_type", StringType),
    StructField("uri", StringType),
    StructField("date", StringType),
    StructField("content_type", StringType),
    StructField("bytes", BinaryType)))

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** Read one CRLF- (or LF-) terminated header line; null at EOF.
    * Bytes accumulate and decode as UTF-8 (the WARC 1.0 header charset —
    * real Common Crawl segments carry non-ASCII WARC-Target-URIs; a
    * per-byte toChar decode would read them back as mojibake). */
  private def readLine(in: InputStream): String = {
    val buf = new java.io.ByteArrayOutputStream(64)
    var c = in.read()
    if (c < 0) return null
    while (c >= 0 && c != '\n') {
      if (c != '\r') buf.write(c)
      c = in.read()
    }
    new String(buf.toByteArray, StandardCharsets.UTF_8)
  }

  private def readFully(in: InputStream, n: Long): Array[Byte] = {
    require(n <= Int.MaxValue, s"record payload $n exceeds 2 GiB")
    val buf = new Array[Byte](n.toInt)
    var off = 0
    while (off < buf.length) {
      val r = in.read(buf, off, buf.length - off)
      require(r >= 0, s"EOF inside a $n-byte WARC payload at offset $off")
      off += r
    }
    buf
  }

  /** Streaming record iterator over one (possibly compressed) segment.
    * Gzip and zstd both decode concatenated per-record members/frames
    * (zstd via zstd-jni's continuous mode — the `.warc.zst` layout of
    * the newer public crawls). */
  private[warc] def records(in0: InputStream, file: String,
      codec: String): Iterator[Row] = {
    val in: InputStream = codec match {
      // buffer above the inflater: header parsing reads bytewise
      case "gz" => new BufferedInputStream(
        new GzipCompressorInputStream(in0, true), 1 << 16)
      case "zst" =>
        val z = new com.github.luben.zstd.ZstdInputStream(in0)
        z.setContinuous(true)
        new BufferedInputStream(z, 1 << 16)
      case _ => in0
    }
    new Iterator[Row] {
      private var nextRow: Row = advance()
      private def advance(): Row = {
        // resynchronize: skip blank record separators to the version line
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) return null
        require(line.startsWith("WARC/"),
          s"$file: expected WARC version line, got '${line.take(40)}'")
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i > 0)
            headers(h.substring(0, i).trim.toLowerCase) =
              h.substring(i + 1).trim
          h = readLine(in)
        }
        val len = headers.getOrElse("content-length",
          sys.error(s"$file: WARC record without Content-Length")).toLong
        val payload = readFully(in, len)
        Row(file,
          headers.getOrElse("warc-type", ""),
          headers.getOrElse("warc-target-uri", null),
          headers.getOrElse("warc-date", null),
          headers.getOrElse("content-type", null),
          payload)
      }
      override def hasNext: Boolean = nextRow != null
      override def next(): Row = {
        val r = nextRow
        nextRow = advance()
        r
      }
    }
  }

  /** All records of every `*.warc[.gz]` / `*.wet[.gz]` segment under
    * `dir` as (file, record_type, uri, date, content_type, bytes) —
    * one input task per segment. Filter `record_type` early
    * (`response` for raw crawls, `conversion` for WET). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf.value)
    val segs = Seq("*.warc", "*.warc.gz", "*.wet", "*.wet.gz",
      "*.warc.zst", "*.wet.zst")
      .flatMap(g => fs.globStatus(new org.apache.hadoop.fs.Path(base, g)))
      .map(_.getPath.toString).sorted
    val rdd = spark.sparkContext
      .parallelize(segs, math.max(1, segs.length))
      .flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val raw = new BufferedInputStream(
          path.getFileSystem(conf.value).open(path), 1 << 16)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => raw.close()))
        records(raw, p,
          if (p.endsWith(".gz")) "gz"
          else if (p.endsWith(".zst")) "zst"
          else "none")
      }
    spark.createDataFrame(rdd, recordType)
  }

  /** The HTTP message body of a `response` record's payload (bytes
    * after the first blank line); the payload itself for records that
    * carry no HTTP envelope. */
  def httpBody(c: Column): Column = {
    val f = udf { bytes: Array[Byte] =>
      if (bytes == null) null
      else {
        var i = 0
        var at = -1
        // same HeaderScanBytes bound as httpHeaders, so the two
        // accessors always agree on whether an HTTP envelope exists
        val lim = math.min(bytes.length, HeaderScanBytes)
        while (at < 0 && i + 3 < lim) {
          if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
              bytes(i + 2) == '\r' && bytes(i + 3) == '\n') at = i + 4
          i += 1
        }
        if (at < 0) bytes else java.util.Arrays.copyOfRange(bytes, at, bytes.length)
      }
    }
    f(c)
  }

  /** Both envelope accessors cap their CRLFCRLF search here: a header
    * block past 64 KiB is treated as "no envelope" by BOTH httpHeaders
    * and httpBody (previously httpBody scanned unbounded, so the two
    * disagreed on such records — headers empty but body stripped). */
  private val HeaderScanBytes = 1 << 16

  /** HTTP response headers of a `response` record's payload as a
    * lowercase-keyed map (empty for records with no HTTP envelope). */
  def httpHeaders(c: Column): Column = {
    val f = udf { bytes: Array[Byte] =>
      if (bytes == null) Map.empty[String, String]
      else {
        val end = {
          var i = 0; var at = -1
          while (at < 0 && i + 3 < math.min(bytes.length, HeaderScanBytes)) {
            if (bytes(i) == '\r' && bytes(i + 1) == '\n' &&
                bytes(i + 2) == '\r' && bytes(i + 3) == '\n') at = i
            i += 1
          }
          at
        }
        if (end < 0) Map.empty[String, String]
        else {
          val head = new String(bytes, 0, end, StandardCharsets.ISO_8859_1)
          if (!head.regionMatches(true, 0, "HTTP/", 0, 5))
            Map.empty[String, String]
          else head.split("\r\n").drop(1).flatMap { l =>
            val i = l.indexOf(':')
            if (i > 0) Some(l.substring(0, i).trim.toLowerCase ->
              l.substring(i + 1).trim)
            else None
          }.toMap
        }
      }
    }
    f(c)
  }

  /** Decode page bytes to text with charset sniffing — the order real
    * pipelines use: UTF BOM, `charset=` in the Content-Type header
    * value (pass `httpHeaders(c)("content-type")` or null), `<meta
    * charset>` / http-equiv in the first 4 KB, else UTF-8 with
    * malformed input REPLACEd (never a task failure: a broken page
    * yields U+FFFD runs that the downstream quality gates drop).
    * Unknown charset names fall back the same way. */
  def decodeText(bytes: Column, contentType: Column = lit(null)): Column = {
    val f = udf { (b: Array[Byte], ct: String) =>
      if (b == null) null
      else {
        def known(n: String): Option[java.nio.charset.Charset] =
          try Some(java.nio.charset.Charset.forName(n.trim))
          catch { case _: Exception => None }
        val fromBom =
          if (b.length >= 3 && b(0) == 0xEF.toByte && b(1) == 0xBB.toByte &&
              b(2) == 0xBF.toByte) Some(StandardCharsets.UTF_8)
          else if (b.length >= 2 && b(0) == 0xFE.toByte && b(1) == 0xFF.toByte)
            Some(StandardCharsets.UTF_16BE)
          else if (b.length >= 2 && b(0) == 0xFF.toByte && b(1) == 0xFE.toByte)
            Some(StandardCharsets.UTF_16LE)
          else None
        val CsHeader = "(?i)charset=[\"']?([\\w.:-]+)".r
        val fromHeader = Option(ct)
          .flatMap(c => CsHeader.findFirstMatchIn(c))
          .flatMap(m => known(m.group(1)))
        val fromMeta = {
          val head = new String(b, 0, math.min(b.length, 4096),
            StandardCharsets.ISO_8859_1)
          CsHeader.findFirstMatchIn(head).flatMap(m => known(m.group(1)))
        }
        val cs = fromBom.orElse(fromHeader).orElse(fromMeta)
          .getOrElse(StandardCharsets.UTF_8)
        val dec = cs.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        val skip = if (fromBom.contains(StandardCharsets.UTF_8)) 3
          else if (fromBom.isDefined) 2 else 0
        dec.decode(java.nio.ByteBuffer.wrap(b, skip, b.length - skip))
          .toString
      }
    }
    f(bytes, contentType)
  }

  /** The record's header block as bytes — UTF-8, which the WARC 1.0
    * spec allows in header field values (US-ASCII getBytes silently
    * substitutes '?' for unmappable chars, corrupting non-ASCII target
    * URIs); [[readLine]] decodes the same way, so URIs roundtrip. */
  private def recordHeader(uri: String, date: String,
      payloadLen: Int): Array[Byte] = {
    val id = java.security.MessageDigest.getInstance("MD5")
      .digest(uri.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
    new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: conversion\r\n")
      .append(s"WARC-Target-URI: $uri\r\n")
      .append(s"WARC-Date: $date\r\n")
      .append(s"WARC-Record-ID: <urn:graft:$id>\r\n")
      .append("Content-Type: text/plain\r\n")
      .append(s"Content-Length: $payloadLen\r\n\r\n")
      .toString.getBytes(StandardCharsets.UTF_8)
  }

  /** Write (uri, bytes) rows as WET-style gzipped shards under
    * `outDir`. See the class doc for the byte-cap and determinism
    * contract. */
  def write(df: DataFrame, outDir: String,
            uriCol: String = "uri", bytesCol: String = "bytes",
            dateCol: Option[String] = None,
            maxShardBytes: Long = 1L << 30,
            overwrite: Boolean = true): Unit = {
    require(maxShardBytes > 0, s"maxShardBytes=$maxShardBytes must be positive")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(outDir)
    if (overwrite) {
      val fs = base.getFileSystem(conf.value)
      if (fs.exists(base)) fs.delete(base, true)
      fs.mkdirs(base)
    }
    val out = outDir
    val cols = Seq(col(uriCol).cast("string"), col(bytesCol)) ++
      dateCol.map(c => col(c).cast("string"))
    df.select(cols: _*).foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val basePath = new org.apache.hadoop.fs.Path(out)
      val fs = basePath.getFileSystem(conf.value)
      var seq = 0
      var written = 0L
      var raw: org.apache.hadoop.fs.FSDataOutputStream = null
      def roll(): Unit = {
        if (raw != null) raw.close()
        val p = new org.apache.hadoop.fs.Path(basePath,
          f"part-$pid%05d-$seq%05d.warc.gz")
        raw = fs.create(p, true)
        seq += 1
        written = 0L
      }
      it.foreach { r =>
        val payload = r.getAs[Array[Byte]](1)
        // exact framed accounting: the built header's real byte length
        // plus the record-terminating CRLFCRLF (a flat estimate let a
        // long URI overshoot maxShardBytes; the header is in hand here,
        // same discipline as TarShards' framed cap)
        val header = recordHeader(r.getString(0),
          if (r.length > 2 && !r.isNullAt(2)) r.getString(2)
          else "1970-01-01T00:00:00Z", payload.length)
        val framed = payload.length.toLong + header.length + 4
        if (raw == null || (written > 0 && written + framed > maxShardBytes))
          roll()
        // one gzip member per record; close() releases the Deflater
        // (no native leak across millions of records) while the no-op
        // close wrapper keeps the underlying segment stream open
        val gz = new GzipCompressorOutputStream(
          new java.io.FilterOutputStream(raw) {
            // FilterOutputStream's bulk write loops byte-at-a-time
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              out.write(b, off, len)
            override def close(): Unit = ()
          })
        gz.write(header)
        gz.write(payload)
        gz.write(Crlf); gz.write(Crlf)
        gz.close()
        written += framed
      }
      if (raw != null) raw.close()
    }
  }
}
