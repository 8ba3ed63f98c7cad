package graft.sql

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import VeloSqlParser.ParseException

/** The multi-job server's REST management surface over a live
  * [[VeloContext]] (reference: api/velostream-sql-multi-server.openapi
  * .yaml — `/`, `/metrics`, `/health`, `/report`, `/jobs`;
  * stream_job_server.rs:427-438 — the health JSON shape;
  * health_dashboard.rs:78-82,338-340 — Healthy/Warning/Critical
  * derivation), plus deploy/stop routes so the whole job lifecycle is
  * drivable over HTTP, not only as SQL text.
  *
  * Same shape as [[graft.sources.SchemaRegistryServer]]: JDK-native
  * HTTP (no dependencies), ephemeral port for spec-driven use, serving
  * driver-side registry state — job metadata is a few strings per job,
  * so one endpoint serves any cluster size and executors never touch
  * it.
  *
  * Routes:
  *  - `GET    /`                    → server info + endpoint map
  *  - `GET    /health`              → `{status, issues, warnings, job_count}`
  *  - `GET    /metrics`             → Prometheus exposition text
  *  - `GET    /report`              → human-readable per-job report
  *  - `GET    /jobs`                → JSON array of job summaries
  *  - `GET    /jobs/{name}`         → one job: status + metrics + resources
  *  - `POST   /jobs/{name}`         → deploy: `{"query": "SELECT …", "version": "v"}`
  *  - `DELETE /jobs/{name}[?force=true]` → stop
  *
  * Deploy/stop delegate to the SQL surface (`ctx.sql`) so every HTTP
  * mutation passes the SAME validator, breaker, and admission gates as
  * a SQL statement — the REST ring adds transport, never a side door.
  */
final class JobServerHttp(ctx: VeloContext, port: Int = 0) {
  import JobServerHttp._

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  private def respond(ex: HttpExchange, status: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def err(ex: HttpExchange, status: Int, msg: String): Unit =
    respond(ex, status, s"""{"error":${jstr(msg)}}""")

  // one registry snapshot per request — the pure driver-side accessor,
  // NOT statusDf: scrape endpoints are polled continuously, and a
  // DataFrame build+collect per poll pays Spark analysis/planning (and
  // holds the JobManager monitor longer) for a few in-memory strings
  private def jobRows(name: Option[String]): Seq[JobRow] =
    ctx.jobManager.statusRows(name).map { r =>
      JobRow(r.name, r.status, r.version, r.strategy, r.isActive, r.error, r.breaker)
    }

  private def jobJson(j: JobRow): String =
    s"""{"name":${jstr(j.name)},"status":${jstr(j.status)},"version":${jstr(j.version)},""" +
      s""""strategy":${jstr(j.strategy)},"is_active":${j.isActive},""" +
      s""""breaker":${jstr(j.breaker)},"error":${jstr(j.error)}}"""

  /** Healthy/Warning/Critical rollup (health_dashboard.rs:78-82): any
    * hard failure is Critical; non-fatal signals (open breakers, recorded
    * resource violations on live jobs) are Warning. */
  private def healthJson(): String = {
    val rows = jobRows(None)
    val issues = rows.collect { case j if j.status == "FAILED" =>
      s"Job '${j.name}' failed: ${j.error}" }
    // real jobs only: the global '*' admission row's violation count is
    // monotonically increasing telemetry that no job-scoped reset ever
    // clears — counting it would pin /health at Warning forever after a
    // single transient admission rejection
    val violationRows = ctx.jobManager.resourceRows(None)
      .filter(r => r.violations > 0 && r.jobName != "*")
      .map(r => s"Job '${r.jobName}' resource " +
        s"'${r.resource}' recorded ${r.violations} violation(s)")
    val breakerWarnings = rows.collect { case j if j.breaker != "CLOSED" =>
      s"Job '${j.name}' circuit breaker is ${j.breaker}" }
    val warnings = breakerWarnings ++ violationRows
    val status =
      if (issues.nonEmpty) "Critical"
      else if (warnings.nonEmpty) "Warning"
      else "Healthy"
    s"""{"status":${jstr(status)},"issues":${issues.map(jstr).mkString("[", ",", "]")},""" +
      s""""warnings":${warnings.map(jstr).mkString("[", ",", "]")},"job_count":${rows.size}}"""
  }

  private def reportText(): String = {
    val rows = jobRows(None)
    val metrics = ctx.jobManager.metricsDf(None).collect().toIndexedSeq
      .map(r => r.getAs[String]("job_name") ->
        (r.getAs[Long]("last_batch_id"), r.getAs[Long]("sink_rows"))).toMap
    val sb = new StringBuilder(s"graft multi-job server report — ${rows.size} job(s)\n")
    rows.foreach { j =>
      val (batch, sunk) = metrics.getOrElse(j.name, (-1L, 0L))
      sb.append(f"  ${j.name}%-24s ${j.status}%-8s v${j.version}%-8s " +
        f"breaker=${j.breaker}%-9s last_batch=$batch%-4d sink_rows=$sunk%d\n")
      if (j.error.nonEmpty) sb.append(s"    error: ${j.error}\n")
    }
    sb.toString
  }

  private def jobDetail(ex: HttpExchange, name: String): Unit =
    jobRows(Some(name)).headOption match {
      case None => err(ex, 404, s"unknown job: $name")
      case Some(j) =>
        val m = ctx.jobManager.metricsDf(Some(name)).collect().headOption
        val metricsJson = m.map(r =>
          s"""{"last_batch_id":${r.getAs[Long]("last_batch_id")},""" +
            s""""last_batch_input_rows":${r.getAs[Long]("last_batch_input_rows")},""" +
            s""""sink_rows":${r.getAs[Long]("sink_rows")}}""").getOrElse("null")
        val resources = ctx.jobManager.resourceRows(Some(name)).map { r =>
          s"""{"resource":${jstr(r.resource)},""" +
            s""""current":${r.current},"peak":${r.peak},""" +
            s""""level":${jstr(r.level)},"violations":${r.violations}}"""
        }
        respond(ex, 200, jobJson(j).dropRight(1) +
          s""","metrics":$metricsJson,"resources":${resources.mkString("[", ",", "]")}}""")
    }

  private def deploy(ex: HttpExchange, name: String): Unit = {
    if (!name.matches("[A-Za-z0-9_]+")) { err(ex, 400, s"invalid job name: $name"); return }
    val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
    val query = jsonStringField(body, "query")
    val version = jsonStringField(body, "version").getOrElse("1.0.0")
    if (!version.matches("[A-Za-z0-9._-]+")) { err(ex, 400, s"invalid version: $version"); return }
    query match {
      case None => err(ex, 422, "missing query field")
      case Some(q) =>
        // through the SQL surface: validator gate, breaker gate, and
        // admission control all apply exactly as for a SQL DEPLOY
        try {
          ctx.sql(s"DEPLOY JOB $name VERSION '$version' AS $q")
          jobRows(Some(name)).headOption match {
            case Some(j) => respond(ex, 200, jobJson(j))
            case None => err(ex, 500, "deploy did not register the job")
          }
        } catch {
          case e: ParseException => err(ex, 400, String.valueOf(e.getMessage))
        }
    }
  }

  private def stopJob(ex: HttpExchange, name: String): Unit = {
    if (!name.matches("[A-Za-z0-9_]+")) { err(ex, 400, s"invalid job name: $name"); return }
    // parse the query string properly: a substring test would let any
    // parameter merely CONTAINING 'force=true' (e.g. unforce=true)
    // force-stop the job, dropping its in-flight micro-batch
    val force = Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .exists(kv => kv.length == 2 && kv(0) == "force" && kv(1) == "true")
    try {
      ctx.sql(s"STOP JOB $name${if (force) " FORCE" else ""}")
      respond(ex, 200, jobJson(jobRows(Some(name)).head))
    } catch {
      case e: ParseException =>
        val msg = String.valueOf(e.getMessage)
        err(ex, if (msg.contains("unknown job")) 404 else 400, msg)
    }
  }

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
      val parts = path.split("/").filter(_.nonEmpty).toList
      (ex.getRequestMethod, parts) match {
        case ("GET", Nil) =>
          respond(ex, 200,
            s"""{"service":"graft-sql-server","status":"running","endpoints":{""" +
              s""""/metrics":"Prometheus metrics export","/health":"System health status (JSON)",""" +
              s""""/report":"Detailed performance report (text)","/jobs":"List all jobs (JSON)"}}""")
        case ("GET", "health" :: Nil) => respond(ex, 200, healthJson())
        case ("GET", "metrics" :: Nil) =>
          respond(ex, 200, ctx.prometheusText, "text/plain; version=0.0.4")
        case ("GET", "report" :: Nil) => respond(ex, 200, reportText(), "text/plain")
        case ("GET", "jobs" :: Nil) =>
          respond(ex, 200, jobRows(None).map(jobJson).mkString("[", ",", "]"))
        case ("GET", "jobs" :: name :: Nil) => jobDetail(ex, name)
        case ("POST", "jobs" :: name :: Nil) => deploy(ex, name)
        case ("DELETE", "jobs" :: name :: Nil) => stopJob(ex, name)
        case _ => err(ex, 404, s"no route: ${ex.getRequestMethod} /$path")
      }
    } catch {
      case e: Exception => err(ex, 500, String.valueOf(e.getMessage))
    }
  })
  // a small pool, NOT the single dispatcher thread: a draining
  // deploy/stop can run for minutes, and serving requests serially
  // would black out /metrics and /health scrapes for its whole
  // duration — exactly when an operator needs them. (Routes that take
  // the JobManager monitor still serialize behind a long drain; the
  // lock-free surfaces — '/', '/metrics' — stay live.)
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)
  server.start()

  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object JobServerHttp {
  private final case class JobRow(name: String, status: String, version: String,
                                  strategy: String, isActive: Boolean, error: String,
                                  breaker: String)

  private[sql] def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Flat-JSON string-field extraction (same contract as
    * SchemaRegistryHttp.jsonStringField — duplicated at 30 lines rather
    * than coupling the sql package to sources' private helper). */
  private[sql] def jsonStringField(body: String, field: String): Option[String] = {
    val key = "\"" + field + "\""
    val at = body.indexOf(key)
    if (at < 0) return None
    var i = body.indexOf(':', at + key.length)
    if (i < 0) return None
    i += 1
    while (i < body.length && body(i).isWhitespace) i += 1
    if (i >= body.length || body(i) != '"') return None
    i += 1
    val sb = new StringBuilder
    while (i < body.length && body(i) != '"') {
      body(i) match {
        case '\\' if i + 1 < body.length =>
          body(i + 1) match {
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'b' => sb += '\b'; i += 2
            case 'f' => sb += '\f'; i += 2
            case 'u' if i + 5 < body.length
                && body.substring(i + 2, i + 6).forall(h => Character.digit(h, 16) >= 0) =>
              // hex validated FIRST: \uZZZZ in a client body must be a
              // malformed-input 4xx, not a NumberFormatException 500
              sb += Integer.parseInt(body.substring(i + 2, i + 6), 16).toChar; i += 6
            case c => sb += c; i += 2
          }
        case c => sb += c; i += 1
      }
    }
    if (i >= body.length) None else Some(sb.toString)
  }
}
