package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** HTTP serving endpoint: `/metrics` scrapes over [[PrometheusExposition]],
  * the reference api.py's metadata routes `/health` and `/model/info`
  * (ref ml/serving/api.py:177-196), and — when a [[ServingApi
  * .HotRequestScorer]] is wired in — its full scoring surface: `POST
  * /predict` and `POST /predict/batch` (api.py:198-259), `GET /features`
  * (api.py:261) and `POST /model/reload` (api.py:279). The JDK's built-in
  * HttpServer keeps the engine dependency-free.
  *
  * Cost per route: a `/metrics` scrape reads the listener's bounded
  * in-memory ring plus the serving counters; `/health` / `/model/info` /
  * every POST route do one driver-side registry directory listing (the
  * hot-reload freshness contract: a route always answers with the version
  * a scorer reloading "latest" would serve); request scoring itself is a
  * driver-local tree-ensemble walk ([[ServingApi]]). No route launches a
  * Spark job.
  *
  * Error contract (mirrors FastAPI's, spec-bound in StreamingSpec):
  * 503 + detail when no model is committed (api.py:162), 400 on a
  * malformed JSON body, 415 on a POST without an application/json
  * content type, 422 on a well-formed body that fails validation
  * (missing required field, out-of-range value, oversize batch), 405 on
  * a method/route mismatch, 404 on unknown paths.
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

  private val NoModel503 =
    (503, """{"detail": "Model not loaded. Run training first."}""",
      "application/json")

  /** Bind the serving routes on `port`. `scorer = None` serves only the
    * metadata/metrics routes (POST routes then 503 like an unloaded
    * model); `serving` is the metric sink the scoring routes increment,
    * rendered into every `/metrics` scrape after the streaming families. */
  def start(listener: Observability.MetricsListener, port: Int = 0,
            modelInfo: () => Option[ModelInfo] = () => None,
            scorer: Option[ServingApi.HotRequestScorer] = None,
            serving: ServingMetrics = new ServingMetrics): Handle = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    val handler = new HttpHandler {

      /** POST-body guard chain: content type must be JSON (415), body must
        * parse (400), validation runs inside `f` (422 via ValidationError). */
      private def withJsonBody(x: HttpExchange)(
          f: org.json4s.JValue => (Int, String, String)): (Int, String, String) = {
        val ct = Option(x.getRequestHeaders.getFirst("Content-Type")).getOrElse("")
        if (!ct.toLowerCase(java.util.Locale.ROOT).contains("application/json"))
          (415, ServingApi.errorJson(
            s"unsupported content type '$ct'; use application/json"),
            "application/json")
        else {
          val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
          ServingApi.parseJson(body) match {
            case Left(err) => (400, ServingApi.errorJson(err), "application/json")
            case Right(j) =>
              try f(j)
              catch { case ServingApi.ValidationError(d) =>
                (422, ServingApi.errorJson(d), "application/json") }
          }
        }
      }

      private def nowMs(start: Long): Double = (System.nanoTime() - start) / 1e6

      override def handle(x: HttpExchange): Unit = {
        val method = x.getRequestMethod
        val path = x.getRequestURI.getPath
        val (code, body, contentType) = (method, path) match {
          case ("GET", "/metrics") | ("GET", "/") =>
            (200, PrometheusExposition.render(listener) + serving.render,
              "text/plain; version=0.0.4; charset=utf-8")
          case ("GET", "/health") =>
            (200, healthJson(modelInfo()), "application/json")
          case ("GET", "/model/info") => modelInfo() match {
            case Some(info) => (200, modelInfoJson(info), "application/json")
            case None => NoModel503 // the reference 503s (api.py:162)
          }

          case ("POST", "/predict") => scorer match {
            case None => NoModel503
            case Some(sc) => withJsonBody(x) { j =>
              val t0 = System.nanoTime()
              sc.score(ServingApi.parseTxn(j)) match {
                case None => NoModel503
                case Some(scored) =>
                  val ms = nowMs(t0)
                  // the reference's per-request metric protocol (api.py:220-224):
                  // outcome counter + latency observation + fraud counter
                  serving.incPredictions(if (scored.isFraud) "fraud" else "legit")
                  serving.observeLatencyMs(ms)
                  if (scored.isFraud) serving.incFraudDetected()
                  (200, ServingApi.predictionJson(scored, ms), "application/json")
              }
            }
          }
          case ("POST", "/predict/batch") => scorer match {
            case None => NoModel503
            case Some(sc) => withJsonBody(x) { j =>
              val t0 = System.nanoTime()
              sc.scoreBatch(ServingApi.parseBatch(j)) match {
                case None => NoModel503
                case Some(scored) =>
                  val ms = nowMs(t0)
                  // batch increments ONLY the outcome="batch" counter, one
                  // per row — api.py:251 increments nothing else
                  serving.incPredictions("batch", scored.size.toLong)
                  (200, ServingApi.batchJson(scored, ms), "application/json")
              }
            }
          }
          case ("POST", "/model/reload") => scorer match {
            case None => NoModel503
            case Some(sc) => sc.reload() match {
              // api.py:286 answers 500 when the reload finds no model
              case None => (500, ServingApi.errorJson(
                "no committed model version to reload"), "application/json")
              case Some(v) => (200, ServingApi.reloadJson(v), "application/json")
            }
          }
          case ("GET", "/features") => scorer match {
            case None => NoModel503
            case Some(sc) => sc.importances() match {
              case None => NoModel503
              case Some((imps, _)) =>
                (200, ServingApi.featuresJson(imps), "application/json")
            }
          }

          case (_, "/metrics" | "/" | "/health" | "/model/info" | "/features"
                 | "/predict" | "/predict/batch" | "/model/reload") =>
            (405, ServingApi.errorJson(s"$method not allowed on $path"),
              "application/json")
          case _ =>
            (404, "not found; try /metrics, /health, /model/info, /features, " +
              "/predict, /predict/batch, /model/reload\n",
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
