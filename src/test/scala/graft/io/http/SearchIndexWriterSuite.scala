package graft.io.http

import graft.TestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentLinkedQueue

/** SearchIndexWriter against a mock search service: asserts the derived
  * index definition (schema→Edm mapping + key flag) and that every
  * document arrives exactly once in action-tagged batches.
  */
class SearchIndexWriterSuite extends TestBase {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _
  private val indexDefs = new ConcurrentLinkedQueue[String]()
  private val uploads = new ConcurrentLinkedQueue[String]()

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    server.createContext("/indexes", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        if (ex.getRequestURI.getPath.endsWith("/docs/index")) uploads.add(body)
        else indexDefs.add(body)
        val resp = "{}".getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(201, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      }
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4))
    server.start()
  }
  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("derives the Edm index definition with the key field") {
    val w = new SearchIndexWriter().setIndexName("docs").setKeyCol("id")
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType), StructField("n", LongType),
      StructField("score", DoubleType), StructField("ok", BooleanType),
      StructField("tags", ArrayType(StringType))))
    val json = w.indexDefinition(schema)
    assert(json.contains(""""name":"docs""""))
    assert(json.contains("""{"name":"id","type":"Edm.String","key":true}"""))
    assert(json.contains("""{"name":"n","type":"Edm.Int64"}"""))
    assert(json.contains("""{"name":"score","type":"Edm.Double"}"""))
    assert(json.contains("""{"name":"tags","type":"Collection(Edm.String)"}"""))
  }

  test("creates the index and uploads every document in batches") {
    indexDefs.clear(); uploads.clear()
    val df = (0 until 57).map(i => (s"d$i", i.toLong)).toDF("id", "n")
      .repartition(3)
    val out = new SearchIndexWriter()
      .setServiceUrl(s"http://localhost:$port").setIndexName("docs")
      .setKeyCol("id").setBatchSize(10)
      .transform(df)
      .select("batch_docs", "statusCode").collect()
    assert(out.forall(_.getInt(1) == 201))
    assert(out.map(_.getInt(0)).sum == 57)
    assert(indexDefs.size == 1)
    val allDocs = uploads.toArray.map(_.toString).mkString
    val ids = (0 until 57).map(i => s""""id":"d$i"""")
    ids.foreach(id => assert(allDocs.contains(id), s"missing $id"))
    assert(allDocs.contains(""""@search.action":"upload""""))
    // batch bodies are well-formed JSON arrays
    uploads.forEach(b => assert(b.startsWith("""{"value":[""") && b.endsWith("]}")))
  }
}
