package graft.core

/** JDK HttpServer socket tuning shared by every server-creation site.
  * `com.sun.net.httpserver` leaves Nagle ON by default; its write-write
  * response pattern (headers, then body) against a delayed-ACK client
  * then stalls ~40 ms per exchange under kernel-dependent conditions.
  * Measured interleaved A/B on the bench's mock-service queries at
  * sf0.1: `http_transformer` 2.4 → 1.1 s and `download_from_urls`
  * 3.7 → 2.4 s with nodelay on — and the stall mode was the source of
  * the committed record's 2.1 ↔ 3.7 s `http_transformer` bimodality
  * that kept tripping per-query drift reviews (round 16/17). The
  * `sun.net.httpserver.nodelay` property is read ONCE when the JDK's
  * ServerConfig classloads (the first `HttpServer.create` in the JVM),
  * so every creation site calls [[ensure]] first. An explicit
  * user-set value is respected.
  *
  * **Embedder caveat (first-classload ordering).** Because the JDK
  * reads the property exactly once, [[ensure]] only takes effect if it
  * runs before the FIRST `HttpServer.create` anywhere in the JVM — an
  * embedding application that creates its own HttpServer before any
  * graft server silently keeps Nagle on for graft's servers too; and
  * conversely, when graft's call wins the race it changes the nodelay
  * behavior of every later user-created HttpServer in the process.
  * Embedders that care either way should set
  * `-Dsun.net.httpserver.nodelay=...` themselves at JVM start — an
  * explicit value is never overridden here. */
object ServerTuning {
  def ensure(): Unit =
    if (System.getProperty("sun.net.httpserver.nodelay") == null)
      System.setProperty("sun.net.httpserver.nodelay", "true")
}
