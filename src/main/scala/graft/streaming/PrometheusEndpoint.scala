package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP serving endpoint: `/metrics` scrapes over [[PrometheusExposition]],
  * plus the reference api.py's metadata routes `/health` and `/model/info`
  * (ref ml/serving/api.py:177-196 — status + loaded-model version, and
  * model metadata + feature inventory + decision threshold). The JDK's
  * built-in HttpServer keeps the engine dependency-free. Each GET renders
  * one fresh snapshot: a `/metrics` scrape reads the listener's bounded
  * in-memory ring; `/health` and `/model/info` call the model-info
  * provider, which for the registry-backed provider is one driver-side
  * directory listing (the hot-reload freshness contract: the route always
  * reports the version a scorer reloading "latest" would serve). No Spark
  * job on any route.
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

  /** What `/health` and `/model/info` report about the serving model. */
  final case class ModelInfo(name: String, version: Long,
                             features: Seq[String], fraudThreshold: Double)

  /** Registry-backed provider: re-resolves the LATEST committed version on
    * every call, so the route tracks hot reloads (ModelRegistry visibility
    * rules apply — an in-flight save is never reported). */
  def registryModelInfo(spark: org.apache.spark.sql.SparkSession,
                        registryRoot: String, name: String,
                        features: Seq[String],
                        fraudThreshold: Double = 0.5): () => Option[ModelInfo] =
    () => graft.ml.ModelRegistry.latestVersion(spark, registryRoot, name)
      .map(v => ModelInfo(name, v, features, fraudThreshold))

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def healthJson(info: Option[ModelInfo]): String = {
    val status = if (info.isDefined) "healthy" else "degraded"
    val version = info.map(_.version.toString).getOrElse("null")
    s"""{"status": ${jsonStr(status)}, "model_loaded": ${info.isDefined}, """ +
      s""""model_version": $version, "service": ${jsonStr("graft-serving")}}"""
  }

  private def modelInfoJson(info: ModelInfo): String =
    s"""{"model_name": ${jsonStr(info.name)}, "model_version": ${info.version}, """ +
      s""""feature_count": ${info.features.size}, """ +
      s""""features": [${info.features.map(jsonStr).mkString(", ")}], """ +
      s""""fraud_threshold": ${info.fraudThreshold}}"""

  /** Bind `/metrics` (and `/`), `/health`, and `/model/info` on `port`. */
  def start(listener: Observability.MetricsListener, port: Int = 0,
            modelInfo: () => Option[ModelInfo] = () => None): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val handler = new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val (code, body, contentType) =
          if (x.getRequestMethod != "GET")
            (405, "method not allowed\n", "text/plain; charset=utf-8")
          else x.getRequestURI.getPath match {
            case "/metrics" | "/" =>
              (200, PrometheusExposition.render(listener),
                "text/plain; version=0.0.4; charset=utf-8")
            case "/health" =>
              (200, healthJson(modelInfo()), "application/json")
            case "/model/info" => modelInfo() match {
              case Some(info) => (200, modelInfoJson(info), "application/json")
              case None =>
                // the reference 503s when no model is loaded (api.py:162)
                (503, """{"detail": "Model not loaded. Run training first."}""",
                  "application/json")
            }
            case _ =>
              (404, "not found; try /metrics, /health, /model/info\n",
                "text/plain; charset=utf-8")
          }
        val bytes = body.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", contentType)
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
