package graft.io.http

import graft.TestBase
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

class ServiceTransformerSuite extends TestBase {
  import spark.implicits._

  private var server: HttpServer = _
  private var port: Int = _

  override def beforeAll(): Unit = {
    super.beforeAll()
    server = HttpServer.create(new InetSocketAddress(0), 0)
    port = server.getAddress.getPort
    // echo service: returns the request body under "echo" + the path
    server.createContext("/", new HttpHandler {
      def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        val resp =
          s"""{"echo": ${escape(body)}, "path": "${ex.getRequestURI.getPath}"}"""
            .getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, resp.length)
        ex.getResponseBody.write(resp); ex.close()
      }
      private def escape(s: String) =
        "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    })
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(4,
      r => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
  }
  override def afterAll(): Unit = { server.stop(0); super.afterAll() }

  test("ServiceTransformer packs scalar and column params, per-row urls") {
    val df = Seq((1L, "alpha", "svcA"), (2L, "beta", "svcB"))
      .toDF("id", "text", "svc")
      .withColumn("url", concat(lit(s"http://localhost:$port/"), col("svc")))
    val out = new ServiceTransformer()
      .setUrlCol("url")
      .setBodyParamCol("text", "text")
      .setBodyParam("lang", "en")
      .setHeader("X-Api-Key", "k")
      .setOutputDataType(StructType(Seq(
        StructField("echo", StringType), StructField("path", StringType))))
      .transform(df)
      .select(col("id"), col("parsed.echo"), col("parsed.path"), col("error"))
      .collect().sortBy(_.getLong(0))
    assert(out.forall(_.isNullAt(3)))
    assert(out(0).getString(2) == "/svcA")
    assert(out(1).getString(2) == "/svcB")
    assert(out(0).getString(1).contains(""""text":"alpha""""))
    assert(out(0).getString(1).contains(""""lang":"en""""))
  }
}
