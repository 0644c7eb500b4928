package graft.io.http

import graft.TestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

/** End-to-end HTTP-on-Spark tests against a local mock service (pattern
  * ref: io/split2/HTTPSuite.scala — the reference also tests with real
  * sockets).
  */
class HTTPSuite extends TestBase {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val flakyCounter = new AtomicInteger(0)
  private val rateLimitCounter = new AtomicInteger(0)
  private val asyncPollCounter = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 1024)
    port = server.getAddress.getPort
    // /len : JSON {"text": ...} -> {"length": N}
    server.createContext("/len", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val text = """"text"\s*:\s*"(.*?)"""".r.findFirstMatchIn(body)
          .map(_.group(1)).getOrElse("")
        val resp = s"""{"length": ${text.length}}""".getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      }
    })
    // /flaky : fails twice per process with 503, then echoes OK
    server.createContext("/flaky", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val n = flakyCounter.incrementAndGet()
        val resp = "OK".getBytes(StandardCharsets.UTF_8)
        if (n <= 2) { ex.sendResponseHeaders(503, -1); ex.close() }
        else {
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      }
    })
    // /ratelimited : first call per process gets 429 + Retry-After, then OK
    server.createContext("/ratelimited", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val n = rateLimitCounter.incrementAndGet()
        if (n <= 1) {
          ex.getResponseHeaders.add("Retry-After", "1")
          ex.sendResponseHeaders(429, -1); ex.close()
        } else {
          val resp = "OK".getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      }
    })
    // /async : long-running-operation protocol — 202 + Operation-Location,
    // poll URL reports running twice then succeeded
    server.createContext("/async", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        if (ex.getRequestURI.getPath.endsWith("/op")) {
          val n = asyncPollCounter.incrementAndGet()
          val resp = (if (n <= 2) """{"status":"running"}"""
            else """{"status":"succeeded","result":7}""")
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        } else {
          ex.getResponseHeaders.add("Operation-Location",
            s"http://localhost:${server.getAddress.getPort}/async/op")
          ex.sendResponseHeaders(202, -1); ex.close()
        }
      }
    })
    // /blob/<name> : deterministic binary payload derived from the name;
    // /blob/missing is a 404
    server.createContext("/blob", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val name = ex.getRequestURI.getPath.stripPrefix("/blob/")
        if (name == "missing") { ex.sendResponseHeaders(404, -1); ex.close() }
        else {
          val resp = Array.tabulate[Byte](16)(i => (name.hashCode + i).toByte)
          ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }

  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("HTTPTransformer round-trips request structs in order") {
    val df = (0 until 20).map(i => (i.toLong, s"doc$i")).toDF("id", "text")
    val withReq = df.withColumn("request", HTTPSchema.toRequest(
      lit(s"http://localhost:$port/len"), lit("POST"),
      to_json(struct(col("text"))).cast("binary"),
      array(HTTPSchema.header("Content-Type", lit("application/json")))))
    val out = new HTTPTransformer().setInputCol("request")
      .setOutputCol("response").setConcurrency(4)
      .transform(withReq)
      .select(col("id"), col("response.statusCode").as("status"),
        HTTPSchema.entityToString(col("response")).as("body"))
      .collect().sortBy(_.getLong(0))
    assert(out.length == 20)
    assert(out.forall(_.getInt(1) == 200))
    assert(out(7).getString(2) == """{"length": 4}""") // "doc7"
    assert(out(15).getString(2) == """{"length": 5}""") // "doc15"
  }

  test("HTTPTransformer retries 5xx to success") {
    flakyCounter.set(0)
    val df = Seq(1L).toDF("id").withColumn("request", HTTPSchema.toRequest(
      lit(s"http://localhost:$port/flaky"), lit("GET"), lit(null)))
    val out = new HTTPTransformer().setInputCol("request").setRetries(3)
      .transform(df)
      .select(col("response.statusCode")).head.getInt(0)
    assert(out == 200)
    assert(flakyCounter.get() == 3) // two failures + one success
  }

  test("HTTPTransformer retries 429 honoring Retry-After") {
    rateLimitCounter.set(0)
    val df = Seq(1L).toDF("id").withColumn("request", HTTPSchema.toRequest(
      lit(s"http://localhost:$port/ratelimited"), lit("GET"), lit(null)))
    val t0 = System.nanoTime()
    val out = new HTTPTransformer().setInputCol("request").setRetries(3)
      .transform(df)
      .select(col("response.statusCode")).head.getInt(0)
    val elapsedMs = (System.nanoTime() - t0) / 1000000L
    assert(out == 200)
    assert(rateLimitCounter.get() == 2) // one 429 + one success
    assert(elapsedMs >= 1000L, s"Retry-After: 1 not honored ($elapsedMs ms)")
  }

  test("HTTPTransformer retries transport-level connection failures") {
    // a raw socket that hard-closes the first two connections before any
    // HTTP response, then serves a minimal 200 — transport errors must
    // ride the same backoff schedule as 5xx instead of poisoning the row
    val ss = new java.net.ServerSocket(0, 50,
      java.net.InetAddress.getByName("localhost"))
    val failuresLeft = new AtomicInteger(2)
    val acceptor = new Thread(() => {
      try while (!ss.isClosed) {
        val s = ss.accept()
        if (failuresLeft.getAndDecrement() > 0) s.close()
        else {
          val buf = new Array[Byte](8192)
          s.getInputStream.read(buf) // request head
          s.getOutputStream.write(
            "HTTP/1.1 200 OK\r\nContent-Length: 2\r\nConnection: close\r\n\r\nOK"
              .getBytes(StandardCharsets.UTF_8))
          s.getOutputStream.flush(); s.close()
        }
      } catch { case _: Throwable => } // closed
    })
    acceptor.setDaemon(true); acceptor.start()
    try {
      val df = Seq(1L).toDF("id").withColumn("request", HTTPSchema.toRequest(
        lit(s"http://localhost:${ss.getLocalPort}/x"), lit("GET"), lit(null)))
      val out = new HTTPTransformer().setInputCol("request").setRetries(3)
        .setBackoffs(Array(50, 50, 50))
        .transform(df)
        .select(col("response.statusCode")).head.getInt(0)
      assert(out == 200)
      assert(failuresLeft.get() <= 0, "both planted failures should be consumed")
    } finally ss.close()
  }

  test("HTTPTransformer follows 202 Operation-Location async replies") {
    asyncPollCounter.set(0)
    val df = Seq(1L).toDF("id").withColumn("request", HTTPSchema.toRequest(
      lit(s"http://localhost:$port/async"), lit("POST"), lit(null)))
    val out = new HTTPTransformer().setInputCol("request")
      .setAsyncReply(true).setPollIntervalMs(50L)
      .transform(df)
      .select(col("response.statusCode"),
        HTTPSchema.entityToString(col("response")).as("body"))
      .head
    assert(out.getInt(0) == 200)
    assert(out.getString(1).contains("\"status\":\"succeeded\""))
    assert(asyncPollCounter.get() == 3) // running ×2 + succeeded
  }

  test("JSONInputParser -> HTTPTransformer -> JSON/String output parsers") {
    import org.apache.spark.sql.types._
    val docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")
    val req = new JSONInputParser().setInputCols(Seq("text"))
      .setUrl(s"http://localhost:$port/len").setOutputCol("request")
      .transform(docs)
    val resp = new HTTPTransformer().setInputCol("request")
      .setOutputCol("response").transform(req)
    val parsed = new JSONOutputParser().setInputCol("response")
      .setOutputCol("parsed")
      .setDataType(StructType(Seq(StructField("length", IntegerType))))
      .transform(resp)
    val raw = new StringOutputParser().setInputCol("response")
      .setOutputCol("raw").transform(parsed)
    val out = raw.select(col("doc_id"), col("parsed.length"), col("raw"))
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getInt(1)).sameElements(Array(5, 7)))
    assert(out(0).getString(2) == """{"length": 5}""")
  }

  test("CustomInputParser and CustomOutputParser named stages") {
    import org.apache.spark.sql.types._
    val docs = Seq((1L, "hello"), (2L, "worlds!")).toDF("doc_id", "text")
    val url = s"http://localhost:$port/len"
    val req = new CustomInputParser().setInputCol("text")
      .setOutputCol("request")
      .setUDF(in => HTTPSchema.toRequest(
        lit(url), lit("POST"),
        to_json(struct(in.as("text"))).cast(BinaryType),
        array(HTTPSchema.header("Content-Type", lit("application/json")))))
      .transform(docs)
    val resp = new HTTPTransformer().setInputCol("request")
      .setOutputCol("response").transform(req)
    val out = new CustomOutputParser().setInputCol("response")
      .setOutputCol("custom")
      .setUDF(r => struct(r.getField("statusCode").as("code"),
        length(HTTPSchema.entityToString(r)).as("bodyLen")))
      .transform(resp)
      .select(col("doc_id"), col("custom.code"), col("custom.bodyLen"))
      .collect().sortBy(_.getLong(0))
    assert(out.map(_.getInt(1)).sameElements(Array(200, 200)))
    assert(out.map(_.getInt(2)).forall(_ > 0))
    // setUrlFn must produce a schema-conformant request struct (typed
    // headers, not array<void>) so it unions/persists like any other
    val urlReq = new CustomInputParser().setInputCol("text")
      .setUrlFn(c => concat(lit(url + "?q="), c)).transform(docs)
    val headersType = urlReq.schema("request").dataType
      .asInstanceOf[StructType]("headers").dataType
    assert(headersType == ArrayType(HTTPSchema.headerType),
      s"headers type was $headersType")
  }

  test("SimpleHTTPTransformer parses JSON service output") {
    val docs = (0 until 10).map(i => (i.toLong, "x" * i)).toDF("doc_id", "text")
    val out = new SimpleHTTPTransformer()
      .setInputCols(Seq("text"))
      .setUrl(s"http://localhost:$port/len")
      .setOutputDataType(StructType(Seq(StructField("length", IntegerType))))
      .setOutputCol("parsed")
      .transform(docs)
      .select(col("doc_id"), col("parsed.length").as("len"), col("error"))
      .collect().sortBy(_.getLong(0))
    assert(out.forall(_.isNullAt(2)))
    assert(out.map(_.getInt(1)).sameElements(0 until 10))
  }

  test("DownloadFromUrls fetches bytes per URL and flags failures") {
    val df = (Seq("a", "b", "missing", "c").zipWithIndex.map { case (n, i) =>
      (i.toLong, s"http://localhost:$port/blob/$n", n)
    }).toDF("id", "url", "name")
    val out = new DownloadFromUrls().setInputCol("url").setOutputCol("bytes")
      .setConcurrency(4).transform(df)
      .select("id", "bytes", "download_status", "name")
      .collect().sortBy(_.getLong(0)).toSeq
    assert(out.map(_.getInt(2)) == Seq(200, 200, 404, 200))
    // payload matches the server's deterministic derivation from the name
    out.filter(_.getInt(2) == 200).foreach { r =>
      val expected = Array.tabulate[Byte](16)(i => (r.getString(3).hashCode + i).toByte)
      assert(r.getAs[Array[Byte]](1).sameElements(expected))
    }
    assert(out.filter(_.getInt(2) == 404).forall(_.isNullAt(1)))
    // dropFailures filters the dead URL
    val kept = new DownloadFromUrls().setInputCol("url")
      .setDropFailures(true).transform(df)
    assert(kept.count() == 3)
  }
}
