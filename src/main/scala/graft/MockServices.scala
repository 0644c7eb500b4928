package graft

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** In-process mock JSON services backing the HTTP-on-Spark demo queries
  * (the reference tests its cognitive-service transformers the same way —
  * real sockets against a local server). Lives for the JVM; idempotent.
  */
object MockServices {
  @volatile private var lenPort: Int = -1
  @volatile private var lenServer: HttpServer = _

  /** Stop all mock servers (their dispatcher threads are non-daemon and
    * would otherwise pin the JVM open). */
  def stopAll(): Unit = synchronized {
    if (lenServer != null) { lenServer.stop(0); lenServer = null; lenPort = -1 }
  }

  /** `POST /len {"text": ...}` → `{"length": N}`. Returns the port. */
  def lenServicePort(): Int = synchronized {
    if (lenPort < 0) {
      graft.core.ServerTuning.ensure()
      val server = HttpServer.create(new InetSocketAddress("localhost", 0), 1024)
      server.createContext("/len", new HttpHandler {
        private val TextRe = """"text"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
        def handle(ex: HttpExchange): Unit = {
          val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          val raw = TextRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
          // unescape JSON string to measure the original text length
          val text = raw.replace("\\\"", "\"").replace("\\\\", "\\")
            .replace("\\n", "\n").replace("\\t", "\t").replace("\\r", "\r")
          val resp = s"""{"length": ${text.length}}""".getBytes(StandardCharsets.UTF_8)
          ex.getResponseHeaders.add("Content-Type", "application/json")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      })
      // GET /blob/<n> → (n % 64) + 1 deterministic bytes (download demo)
      server.createContext("/blob", new HttpHandler {
        def handle(ex: HttpExchange): Unit = {
          val name = ex.getRequestURI.getPath.stripPrefix("/blob/")
          val n = try name.toLong catch { case _: Throwable => 0L }
          val len = (n % 64).toInt + 1
          val resp = Array.tabulate[Byte](len)(i => ((n + i) % 256).toByte)
          ex.getResponseHeaders.add("Content-Type", "application/octet-stream")
          ex.sendResponseHeaders(200, resp.length)
          ex.getResponseBody.write(resp); ex.close()
        }
      })
      // daemon threads: the mock must never pin the JVM open after main().
      // 128 handlers: the server must never be the benchmark bottleneck,
      // even when a kernel's delayed-ACK stalls each exchange ~40 ms
      server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(128,
        r => { val t = new Thread(r); t.setDaemon(true); t }))
      server.start()
      lenServer = server
      lenPort = server.getAddress.getPort
    }
    lenPort
  }
}
