package graft

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Minimal in-memory REST server implementing the RestSink contract —
  * shared fixture for the sink spec (DiskModeRestSpec) and the
  * GirderTransferApp CLI drive (GirderUploadAppSpec). */
class FakeRestServer {
  val items = new ConcurrentHashMap[String, (String, Array[Byte])]()
  val folders = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  @volatile var failuresRemaining = 0 // serve this many 503s first
  val uploads = new java.util.concurrent.atomic.AtomicInteger(0)
  val server: HttpServer = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = {
      def respond(status: Int, body: String): Unit = {
        val b = body.getBytes
        ex.sendResponseHeaders(status, if (b.isEmpty) -1 else b.length)
        if (b.nonEmpty) ex.getResponseBody.write(b)
        ex.close()
      }
      if (failuresRemaining > 0) { failuresRemaining -= 1; respond(503, ""); return }
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val params = q.split("&").filter(_.contains("="))
        .map { kv => val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8") }.toMap
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", "/item") =>
          items.get(params("path")) match {
            case null => respond(404, "")
            case (sha, _) => respond(200, s"""{"sha256": "$sha"}""")
          }
        case ("POST", "/folder") =>
          folders.add(params("path")); respond(200, "")
        case ("POST", "/item") =>
          val body = ex.getRequestBody.readAllBytes()
          items.put(params("path"), (params("sha256"), body))
          uploads.incrementAndGet()
          respond(200, "")
        case _ => respond(400, "unknown")
      }
    }
  })
  server.start()
  def base: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  def stop(): Unit = server.stop(0)
}
