package graft.io.http

import graft.TestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** RestRowsWriter (the PowerBI-shaped rows sink) against a mock push
  * endpoint: batched `{"rows":[...]}` bodies, auth header, retry on 503,
  * loud failure on a terminal status, and the foreachBatch streaming
  * path.
  */
class RestRowsWriterSuite extends TestBase {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val bodies = new ConcurrentLinkedQueue[String]()
  private val auths = new ConcurrentLinkedQueue[String]()
  private val flaky = new AtomicInteger(0)

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/rows", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        bodies.add(new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8))
        Option(ex.getRequestHeaders.getFirst("Authorization"))
          .foreach(auths.add)
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    // first POST per process 503s, the retry lands
    server.createContext("/flakyrows", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        if (flaky.incrementAndGet() <= 1) { ex.sendResponseHeaders(503, -1); ex.close() }
        else { ex.sendResponseHeaders(200, -1); ex.close() }
      }
    })
    server.createContext("/teapot", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        ex.getRequestBody.readAllBytes()
        ex.sendResponseHeaders(418, -1); ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
  }
  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("uploads every row once in enveloped batches with auth") {
    bodies.clear(); auths.clear()
    val df = (0 until 57).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .repartition(3)
    RestRowsWriter.write(df, s"http://localhost:$port/rows",
      Map("batchSize" -> "10", "token" -> "sekret"))
    val all = bodies.toArray.map(_.toString)
    // per-partition batching: 3 partitions × ceil(19/10) = 6 bodies
    assert(all.length == 6, s"got ${all.length} bodies")
    all.foreach { b =>
      assert(b.startsWith("""{"rows":[""") && b.endsWith("]}"), b)
    }
    (0 until 57).foreach { i =>
      assert(all.exists(_.contains(s""""id":$i,""")), s"missing row $i")
    }
    assert(auths.toArray.forall(_ == "Bearer sekret"))
  }

  test("retries a 503 and succeeds") {
    flaky.set(0)
    val df = Seq((1L, "a")).toDF("id", "name").coalesce(1)
    RestRowsWriter.write(df, s"http://localhost:$port/flakyrows")
    assert(flaky.get() == 2) // one failure + one successful retry
  }

  test("fails loudly on a terminal non-2xx status") {
    val df = Seq((1L, "a")).toDF("id", "name").coalesce(1)
    val e = intercept[RuntimeException] {
      RestRowsWriter.write(df, s"http://localhost:$port/teapot")
    }
    assert(e.getMessage.contains("418"))
  }

  test("custom envelope replaces the default rows wrapper") {
    bodies.clear()
    val df = Seq((7L, "x")).toDF("id", "name").coalesce(1)
    RestRowsWriter.write(df, s"http://localhost:$port/rows",
      Map("envelope" -> "%s"))
    val b = bodies.toArray.map(_.toString)
    assert(b.length == 1 && b.head.startsWith("[") && b.head.endsWith("]"))
  }

  test("streaming foreachBatch path pushes each micro-batch") {
    bodies.clear()
    val dir = java.nio.file.Files.createTempDirectory("restrows").toFile
    val src = spark.readStream.schema("id LONG, name STRING")
        .json(dir.getAbsolutePath)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir.getAbsolutePath, "b0.json"),
      """{"id": 1, "name": "s1"}""" + "\n" + """{"id": 2, "name": "s2"}""")
    val q = RestRowsWriter.stream(src, s"http://localhost:$port/rows")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .option("checkpointLocation",
        new java.io.File(dir, "_cp").getAbsolutePath)
      .start()
    q.awaitTermination(30000)
    val all = bodies.toArray.map(_.toString).mkString
    assert(all.contains(""""id":1""") && all.contains(""""id":2"""))
  }
}
