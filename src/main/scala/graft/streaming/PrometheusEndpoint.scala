package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP scrape endpoint over [[PrometheusExposition]] — the transport half
  * of the reference's `/metrics` surface (ref ml/serving/api.py:274 serves
  * `generate_latest()` over FastAPI; here the JDK's built-in HttpServer
  * keeps the engine dependency-free). Each GET renders one fresh scrape of
  * the listener's bounded in-memory snapshots: no Spark job, no state
  * beyond the listener's own ring — a scraper hitting the endpoint every
  * 15s costs microseconds of driver CPU.
  *
  * Lifecycle: [[start]] binds and serves until [[Handle.stop]]; bind on
  * port 0 to let the OS pick (the bound port is on the handle) — the spec
  * and multi-driver deployments both need collision-free binds.
  */
object PrometheusEndpoint {

  final case class Handle(server: HttpServer) {
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  /** Bind `/metrics` (and `/`) on `port` serving scrapes of `listener`. */
  def start(listener: Observability.MetricsListener, port: Int = 0): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val handler = new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (code, body) =
          if (x.getRequestMethod != "GET")
            (405, "method not allowed\n")
          else if (x.getRequestURI.getPath != "/metrics" && x.getRequestURI.getPath != "/")
            (404, "not found; scrape /metrics\n")
          else (200, PrometheusExposition.render(listener))
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        // HttpServer length contract: 0 means "chunked/unknown", -1 means
        // "no body" — an empty scrape must send -1 or the client hangs
        x.sendResponseHeaders(code, if (bytes.isEmpty) -1L else bytes.length.toLong)
        val os = x.getResponseBody
        try { if (bytes.nonEmpty) os.write(bytes) } finally os.close()
      }
    }
    server.createContext("/", handler)
    server.start()
    Handle(server)
  }
}
