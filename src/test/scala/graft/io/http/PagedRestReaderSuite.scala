package graft.io.http

import graft.TestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** PagedRestReader against a mock Bing-shaped search service: per-query
  * offset/count pagination, every item surfaced exactly once, auth
  * header forwarded, failed pages dropped without failing the job.
  */
class PagedRestReaderSuite extends TestBase {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    // /search?q=<q>&offset=N&count=C → {"value":[{"name":"<q>-<i>",
    // "contentUrl":"http://x/<q>/<i>"}...]} — 12 items total per query,
    // so count=5 pages as 5/5/2
    server.createContext("/search", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val params = ex.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val q = java.net.URLDecoder.decode(params("q"), "UTF-8")
        if (q == "boom") { ex.sendResponseHeaders(500, -1); ex.close() }
        else {
          val offset = params("offset").toInt
          val count = params("count").toInt
          val items = (offset until math.min(offset + count, 12)).map(i =>
            s"""{"name":"$q-$i","contentUrl":"http://x/$q/$i"}""")
          val resp = s"""{"value":[${items.mkString(",")}]}"""
            .getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          Option(ex.getRequestHeaders.getFirst("Ocp-Apim-Subscription-Key"))
            .foreach(k => ex.getResponseHeaders.add("X-Got-Key", k))
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      }
    })
    // echoes the raw query string back as the single item, for asserting
    // exact URL construction
    server.createContext("/echo", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val raw = ex.getRequestURI.getRawQuery
        val resp = s"""{"value":[{"name":"$raw","contentUrl":"x"}]}"""
          .getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.add("Content-Type", "application/json")
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
  }
  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  private def reader = new PagedRestReader().setInputCol("query")
    .setUrlTemplate(
      s"http://localhost:$port/search?q={query}&offset={offset}&count={count}")
    .setItemSchema("name STRING, contentUrl STRING")
    .setHeaders(Array("Ocp-Apim-Subscription-Key: testkey"))

  test("pages through every query and surfaces each item exactly once") {
    val out = reader.setPageSize(5).setMaxPages(3)
      .transform(Seq("cats", "dogs").toDF("query"))
      .select(col("query"), col("item.name"), col("item.contentUrl"))
      .collect()
    assert(out.length == 24) // 12 items × 2 queries, across 3 pages each
    val names = out.map(_.getString(1)).toSet
    assert(names == (for (q <- Set("cats", "dogs"); i <- 0 until 12)
      yield s"$q-$i").toSet)
    assert(out.forall(r =>
      r.getString(2) == s"http://x/${r.getString(0)}/${r.getString(1).split("-")(1)}"))
  }

  test("url-encodes queries and keeps literal template segments") {
    val out = reader.setPageSize(12).setMaxPages(1)
      .transform(Seq("tabby cat").toDF("query"))
      .select(col("item.name")).collect().map(_.getString(0))
    assert(out.length == 12 && out.forall(_.startsWith("tabby cat-")))
  }

  test("literal q/o/c segments between placeholders stay literal") {
    // the old marker-split matched segment CONTENT, so a literal segment
    // that was exactly "q"/"o"/"c" between two placeholders got
    // substituted for a column; the placeholder-regex parse keeps it
    // literal — asserted against the echoed raw URL
    val out = new PagedRestReader().setInputCol("query")
      .setUrlTemplate(s"http://localhost:$port/echo?a={offset}q{count}&b={count}o{offset}&q={query}")
      .setItemSchema("name STRING, contentUrl STRING")
      .setPageSize(12).setMaxPages(1)
      .transform(Seq("cats").toDF("query"))
      .select(col("item.name")).collect().map(_.getString(0))
    assert(out.sameElements(Array("a=0q12&b=12o0&q=cats")), out.mkString)
  }

  test("a failing query's pages drop without failing the batch") {
    val out = reader.setPageSize(5).setMaxPages(3)
      .transform(Seq("ok", "boom").toDF("query"))
      .select(col("query")).collect().map(_.getString(0))
    assert(out.count(_ == "ok") == 12 && !out.contains("boom"))
  }
}
