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

  // The JDK server defaults to NO request/response time bound: a client
  // that opens a POST and never sends its body parks a pool thread in
  // readNBytes forever — four such connections exhaust the fixed pool
  // and permanently black out /health and /metrics. These properties
  // are the documented JDK knobs, read once per JVM (first server
  // wins — see graft.HttpGuards); set only if the deployment hasn't
  // chosen its own values. In-process guards (readBodyBounded) are
  // the defense that holds regardless.
  graft.HttpGuards.ensureRequestTimeouts()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  private def respond(ex: HttpExchange, status: Int, body: String,
                      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    // HEAD gets GET's status and headers with no body (HTTP semantics
    // require HEAD wherever GET is supported — a load-balancer probe
    // using HEAD /health read 405 and marked a healthy backend down,
    // r17 review); -1 = no response body
    if (ex.getRequestMethod == "HEAD") {
      try ex.sendResponseHeaders(status, -1)
      finally ex.close()
    } else {
      ex.sendResponseHeaders(status, bytes.length)
      // finally-close: a client disconnect mid-write would otherwise skip
      // close() AND let the dispatch-level catch call sendResponseHeaders
      // a second time ("headers already sent" masking the real error)
      try ex.getResponseBody.write(bytes)
      finally ex.close()
    }
  }

  private def err(ex: HttpExchange, status: Int, msg: String): Unit =
    // tolerate an already-committed response (write failed mid-body):
    // the exchange is closed, there is nothing more to send
    try respond(ex, status, s"""{"error":${jstr(msg)}}""")
    catch { case _: java.io.IOException => }

  /** Routes that answer WITHOUT consuming a body-carrying request drain
    * it first — the rule now lives ONCE in HttpGuards.drained (r17
    * review: this server and the registry each kept a hand-written
    * copy); only the 413 body dialect stays local. */
  private def drained(ex: HttpExchange)(body: => Unit): Unit =
    graft.HttpGuards.drained(ex, MaxBodyBytes,
      max => s"""{"error":"body exceeds $max bytes"}""")(body)

  // one registry snapshot per request — the pure driver-side accessor,
  // NOT statusDf: scrape endpoints are polled continuously, and a
  // DataFrame build+collect per poll pays Spark analysis/planning (and
  // holds the JobManager monitor longer) for a few in-memory strings
  private def jobRows(name: Option[String]): Seq[JobRow] =
    ctx.jobManager.statusRows(name).map { r =>
      JobRow(r.name, r.status, r.version, r.strategy, r.isActive, r.error, r.breaker)
    }

  /** `extraFields` are spliced before the closing brace (each starts
    * with a comma) — one builder for both the summary and detail
    * shapes, instead of string surgery on finished JSON. */
  private def jobJson(j: JobRow, extraFields: String = ""): String =
    s"""{"name":${jstr(j.name)},"status":${jstr(j.status)},"version":${jstr(j.version)},""" +
      s""""strategy":${jstr(j.strategy)},"is_active":${j.isActive},""" +
      s""""breaker":${jstr(j.breaker)},"error":${jstr(j.error)}$extraFields}"""

  /** Healthy/Warning/Critical rollup (health_dashboard.rs:78-82): any
    * hard failure is Critical; non-fatal signals (open breakers, recorded
    * resource violations on live jobs) are Warning. */
  private def healthJson(): String = {
    val rows = jobRows(None)
    val (status, issues, warnings) = JobServerHttp.healthRollup(
      rows.map(j => (j.name, j.status, j.breaker, j.error)),
      ctx.jobManager.resourceRows(None).map(r => (r.jobName, r.resource, r.violations)))
    s"""{"status":${jstr(status)},"issues":${issues.map(jstr).mkString("[", ",", "]")},""" +
      s""""warnings":${warnings.map(jstr).mkString("[", ",", "]")},"job_count":${rows.size}}"""
  }

  /** Per-job metrics behind a short TTL cache: /jobs/{name} and
    * /report are natural polling targets, but metricsDf's sink_rows is
    * a full Spark scan of everything the job ever wrote — unbounded
    * I/O per poll, growing with the sink, competing with the jobs
    * themselves (r11 review). A dashboard polling every few seconds
    * reads the cache; numbers refresh within MetricsTtlMs. */
  // entries carry the job's GENERATION stamp at scan time
  // (JobManager.generationOf): a DEPLOY/ROLLBACK/STOP issued through
  // the SQL surface bypasses this layer's evictions entirely, and a
  // TTL-fresh entry would serve the previous deployment's numbers as
  // the new one's for up to MetricsTtlMs — the exact staleness the
  // r11 eviction exists to prevent (r15 review). A generation mismatch
  // on read is a cache miss.
  private val metricsCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[String], Option[(Long, Long, Long)])]()
  // generation guard for the cache: a cold metrics SCAN can be in
  // flight while deploy/stop evicts the name — its late put() would
  // re-cache the PREVIOUS generation's numbers with a fresh timestamp,
  // exactly the staleness the eviction exists to prevent (r14 review).
  // Writers record the epoch at scan START and only put if no
  // deploy/stop happened since; a lost put costs one extra scan, never
  // stale data.
  private val metricsEpoch = new java.util.concurrent.atomic.AtomicLong()

  private def cachedMetrics(name: String): Option[(Long, Long, Long)] = {
    val now = System.nanoTime()
    val gen = ctx.jobManager.generationOf(name)
    Option(metricsCache.get(name))
      .filter(e => now - e._1 < JobServerHttp.MetricsTtlMs * 1000000L && e._2 == gen) match {
      case Some((_, _, v)) => v
      case None =>
        // SINGLE-FLIGHT per name (r17 review): N dashboards whose TTL
        // expired together each launched the full sink scan — up to
        // pool-size duplicate Spark jobs competing with the jobs
        // themselves. Cold pollers serialize on the name's lock and
        // re-check the cache; followers ride the leader's scan.
        val lock = metricsScanLocks.computeIfAbsent(name, _ => new Object)
        lock.synchronized {
          val again = Option(metricsCache.get(name))
            .filter(e => System.nanoTime() - e._1 < JobServerHttp.MetricsTtlMs * 1000000L
              && e._2 == ctx.jobManager.generationOf(name))
          again match {
            case Some((_, _, v)) => v
            case None =>
              val epoch0 = metricsEpoch.get()
              val v = ctx.jobManager.metricsDf(Some(name)).collect().headOption.map(r =>
                (r.getAs[Long]("last_batch_id"), r.getAs[Long]("last_batch_input_rows"),
                  r.getAs[Long]("sink_rows")))
              // put-then-recheck-and-remove, not check-then-put: the naked
              // check left a window (check passes, evictor bumps, our stale
              // put lands) — with evictors bumping BEFORE their remove, every
              // interleaving now ends with the stale entry gone (r14
              // follow-up: either our recheck sees the bump, or the evictor's
              // remove runs after our put)
              // the entry stores the generation read BEFORE the scan — a
              // transition DURING the scan reads as a mismatch on the next
              // poll, costing one extra scan, never stale data
              metricsCache.put(name, (now, gen, v))
              if (metricsEpoch.get() != epoch0) metricsCache.remove(name)
              v
          }
        }
    }
  }

  // per-name cold-scan locks for cachedMetrics' single-flight; never
  // removed (names are few and stable — a job registry, not user data)
  private val metricsScanLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Metrics for ALL the given jobs, cache-first. If every entry is
    * fresh this touches no Spark; otherwise ONE metricsDf(None) scan
    * refreshes the whole map — the per-name path would run N full sink
    * scans per cold /report poll with N jobs (r11 advisor). */
  private def cachedMetricsAll(names: Seq[String]): Map[String, Option[(Long, Long, Long)]] = {
    val now = System.nanoTime()
    val gens = names.map(n => n -> ctx.jobManager.generationOf(n)).toMap
    val fresh = names.flatMap { n =>
      Option(metricsCache.get(n))
        .filter(e => now - e._1 < JobServerHttp.MetricsTtlMs * 1000000L
          && e._2 == gens(n))
        .map(n -> _._3)
    }.toMap
    if (fresh.size == names.size) fresh
    else {
      val epoch0 = metricsEpoch.get()
      val scanned = ctx.jobManager.metricsDf(None).collect().map(r =>
        r.getAs[String]("job_name") ->
          (r.getAs[Long]("last_batch_id"), r.getAs[Long]("last_batch_input_rows"),
            r.getAs[Long]("sink_rows"))).toMap
      // same put-then-recheck discipline as cachedMetrics (one recheck
      // AFTER all puts: a bump seen by it removes every entry this scan
      // wrote — over-eviction costs one extra scan, never stale data)
      names.foreach(n => metricsCache.put(n, (now, gens(n), scanned.get(n))))
      if (metricsEpoch.get() != epoch0) names.foreach(metricsCache.remove)
      names.map(n => n -> scanned.get(n)).toMap
    }
  }

  private def reportText(): String = {
    val rows = jobRows(None)
    val metrics = cachedMetricsAll(rows.map(_.name))
    val sb = new StringBuilder(s"graft multi-job server report — ${rows.size} job(s)\n")
    rows.foreach { j =>
      val (batch, _, sunk) = metrics.getOrElse(j.name, None).getOrElse((-1L, 0L, 0L))
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
        val metricsJson = cachedMetrics(name).map { case (batch, inRows, sunk) =>
          s"""{"last_batch_id":$batch,""" +
            s""""last_batch_input_rows":$inRows,""" +
            s""""sink_rows":$sunk}""" }.getOrElse("null")
        // real job rows only, same rule as healthJson: resourceRows(name)
        // also returns the global '*' admission row, whose violations
        // counter is monotonic telemetry no job-scoped reset clears —
        // unlabeled here it would read as THIS job's violation forever
        val resources = ctx.jobManager.resourceRows(Some(name))
          .filter(_.jobName != "*").map { r =>
          s"""{"resource":${jstr(r.resource)},""" +
            s""""current":${r.current},"peak":${r.peak},""" +
            s""""level":${jstr(r.level)},"violations":${r.violations}}"""
        }
        respond(ex, 200, jobJson(j,
          s""","metrics":$metricsJson,"resources":${resources.mkString("[", ",", "]")}"""))
    }

  private def deploy(ex: HttpExchange, name: String): Unit = {
    if (!name.matches("[A-Za-z0-9_]+")) {
      drained(ex)(err(ex, 400, s"invalid job name: $name")); return
    }
    // bounded read with an in-process timeout (graft.HttpGuards — the
    // JDK maxReqTime knob is first-server-wins per JVM, so it cannot be
    // the only guard): queries are short SQL strings, and an uncapped
    // readAllBytes would buffer an arbitrary client body into the
    // DRIVER heap (which also hosts every running job), while an
    // unbounded read would park a dispatch thread on a silent client
    val raw = graft.HttpGuards.readBodyChecked(ex, MaxBodyBytes) { max =>
      // answerTooLarge, not err: respond's inline ex.close() would
      // drain the unread remainder BLOCKING on this pool thread — a
      // stalled oversize client per thread blacks out /health (r17
      // review; the 413 twin of the 408 no-inline-close rule)
      graft.HttpGuards.answerTooLarge(ex,
        s"""{"error":"body exceeds $max bytes"}""".getBytes(UTF_8))
    } match {
      case None => return // answered: 408 timeout or 413 oversize
      case Some(b) => b
    }
    val body = new String(raw, UTF_8)
    val query = jsonStringField(body, "query")
    val versionField = jsonStringField(body, "version")
    // present-but-not-a-string is a CLIENT ERROR, not "apply the
    // default": {"version": 2} used to deploy silently as "1.0.0"
    // with a 200 while the client believed v2 was live (r17 review;
    // a missing query already 422s and a malformed string 400s — only
    // the type-mismatch case was silently remapped)
    if (versionField.isEmpty && graft.JsonOut.jsonHasField(body, "version")) {
      err(ex, 400, "version must be a JSON string"); return
    }
    val version = versionField.getOrElse("1.0.0")
    if (!version.matches("[A-Za-z0-9._-]+")) { err(ex, 400, s"invalid version: $version"); return }
    query match {
      case None => err(ex, 422, "missing query field")
      case Some(q) =>
        // through the SQL surface: validator gate, breaker gate, and
        // admission control all apply exactly as for a SQL DEPLOY
        try {
          ctx.sql(s"DEPLOY JOB $name VERSION '$version' AS $q")
          // new generation: the previous deployment's cached
          // last_batch_id/sink_rows must never be served as this one's
          // numbers for up to MetricsTtlMs (r11 advisor); the epoch bump
          // also invalidates any scan already in flight (r14 review).
          // Bump BEFORE the remove: with remove-first, an in-flight
          // scanner could put-and-recheck entirely inside the
          // remove→bump gap and keep its stale entry — bump-first means
          // either the scanner's recheck sees the new epoch (removes its
          // own put) or our remove lands after its put (r14 follow-up)
          metricsEpoch.incrementAndGet()
          metricsCache.remove(name)
          jobRows(Some(name)).headOption match {
            case Some(j) => respond(ex, 200, jobJson(j))
            case None => err(ex, 500, "deploy did not register the job")
          }
        } catch {
          // breaker-open / half-open-trial / admission-exhausted are
          // TRANSIENT server states, not client errors: a 400 tells
          // retry middleware "do not retry" and automated redeploys
          // give up for good. Classified by STRUCTURED exception type,
          // not message substrings — echoed query text could spoof the
          // substring check into a retry-forever 503 (r14 review).
          case e: VeloSqlParser.TransientRejectionException =>
            err(ex, 503, String.valueOf(e.getMessage))
          case e: ParseException =>
            err(ex, 400, String.valueOf(e.getMessage))
          // a semantically invalid query the static gate could not see
          // (launch-time analysis failure) is the CLIENT's error: a 500
          // invites retry middleware to re-submit a request that can
          // never succeed, burning breaker failures until even a
          // corrected deploy is 503-rejected for the recovery window
          // (r15 review)
          case e: org.apache.spark.sql.AnalysisException =>
            err(ex, 400, String.valueOf(e.getMessage))
        }
    }
  }

  private def stopJob(ex: HttpExchange, name: String): Unit = drained(ex) {
    if (!name.matches("[A-Za-z0-9_]+")) { err(ex, 400, s"invalid job name: $name"); return }
    // parse the query string properly: a substring test would let any
    // parameter merely CONTAINING 'force=true' (e.g. unforce=true)
    // force-stop the job, dropping its in-flight micro-batch
    val force = Option(ex.getRequestURI.getQuery).toSeq
      .flatMap(_.split("&")).map(_.split("=", 2))
      .exists(kv => kv.length == 2 && kv(0) == "force" && kv(1) == "true")
    try {
      ctx.sql(s"STOP JOB $name${if (force) " FORCE" else ""}")
      // evict on stop so a stopped (and possibly soon-undeployed) job's
      // entry doesn't linger in the map, and a redeploy under the same
      // name starts from a cold cache (r11 advisor); epoch bump kills
      // in-flight scans' late puts (r14 review; bump-first ordering —
      // see the deploy arm's comment)
      metricsEpoch.incrementAndGet()
      metricsCache.remove(name)
      respond(ex, 200, jobJson(jobRows(Some(name)).head))
    } catch {
      // classified by STRUCTURED type like the deploy arm (r15 review):
      // the old message-substring check turned any future engine
      // message merely CONTAINING 'unknown job' into a 404, and a
      // renamed message into a 400
      case e: VeloSqlParser.UnknownJobException =>
        err(ex, 404, String.valueOf(e.getMessage))
      case e: ParseException =>
        err(ex, 400, String.valueOf(e.getMessage))
    }
  }

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
      val parts = path.split("/").filter(_.nonEmpty).toList
      // HEAD routes like GET (respond suppresses the body)
      val method =
        if (ex.getRequestMethod == "HEAD") "GET" else ex.getRequestMethod
      (method, parts) match {
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
          respond(ex, 200, jobRows(None).map(jobJson(_)).mkString("[", ",", "]"))
        case ("GET", "jobs" :: name :: Nil) => jobDetail(ex, name)
        case ("POST", "jobs" :: name :: Nil) => deploy(ex, name)
        case ("DELETE", "jobs" :: name :: Nil) => stopJob(ex, name)
        // wrong METHOD on a known path is 405, not 404 — a client
        // probing job existence by status code would read 404 as
        // "job absent" when only the verb was wrong
        case (m, "jobs" :: _ :: Nil) => drained(ex) {
          ex.getResponseHeaders.set("Allow", "GET, POST, DELETE")
          err(ex, 405, s"method $m not allowed; Allow: GET, POST, DELETE")
        }
        case (m, p) if p == Nil || (p.lengthCompare(1) == 0 &&
            Set("health", "metrics", "report", "jobs").contains(p.head)) => drained(ex) {
          ex.getResponseHeaders.set("Allow", "GET")
          err(ex, 405, s"method $m not allowed; Allow: GET")
        }
        case _ => drained(ex)(err(ex, 404, s"no route: ${ex.getRequestMethod} /$path"))
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
  // daemon threads: an embedding app that exits without calling stop()
  // (crash path past its shutdown hook) must not be wedged open by the
  // HTTP pool; the server owns no state needing an orderly drain
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    (r: Runnable) => { val t = new Thread(r, "graft-job-http"); t.setDaemon(true); t })
  server.setExecutor(pool)
  server.start()

  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object JobServerHttp {
  private final case class JobRow(name: String, status: String, version: String,
                                  strategy: String, isActive: Boolean, error: String,
                                  breaker: String)

  /** Request bodies carry short SQL strings; anything larger is a
    * client error, not a legitimate deploy. */
  private[sql] val MaxBodyBytes: Int = 1 << 20

  /** How stale /jobs/{name} and /report metrics may read (ms). */
  private[sql] val MetricsTtlMs: Long = 5000L

  // the ONE shared JSON text surface (graft.JsonOut) — these were
  // byte-for-byte twins of SchemaRegistryHttp's private helpers, and
  // the key-vs-value extraction fix would have had to land twice
  private[sql] def jstr(s: String): String = graft.JsonOut.jstr(s)
  private[sql] def jsonStringField(body: String, field: String): Option[String] =
    graft.JsonOut.jsonStringField(body, field)

  /** The Healthy/Warning/Critical rollup as a PURE function of job and
    * resource rows (extracted r17 so the liveness rules are unit-
    * testable without a tripped-breaker HTTP fixture). Rules:
    *  - any FAILED job is Critical (hard failure);
    *  - warnings count LIVE (non-STOPPED) jobs only: STOP never resets
    *    a breaker (an abandoned HALF_OPEN trial sticks — no trial can
    *    run on a stopped job) and violation counters persist until a
    *    redeploy, so a retired job would pin /health at Warning
    *    forever — the same class as the global '*' admission row,
    *    whose monotonically-increasing count no job-scoped reset ever
    *    clears (r17 review);
    *  - the '*' row is excluded for that reason. */
  private[sql] def healthRollup(
      rows: Seq[(String, String, String, String)], // name, status, breaker, error
      violations: Seq[(String, String, Long)]): (String, Seq[String], Seq[String]) = {
    val issues = rows.collect { case (name, "FAILED", _, error) =>
      s"Job '$name' failed: $error" }
    val live = rows.filter(_._2 != "STOPPED")
    val liveNames = live.map(_._1).toSet
    val violationRows = violations
      .filter { case (job, _, n) => n > 0 && job != "*" && liveNames(job) }
      .map { case (job, res, n) =>
        s"Job '$job' resource '$res' recorded $n violation(s)" }
    val breakerWarnings = live.collect { case (name, _, breaker, _) if breaker != "CLOSED" =>
      s"Job '$name' circuit breaker is $breaker" }
    val warnings = breakerWarnings ++ violationRows
    val status =
      if (issues.nonEmpty) "Critical"
      else if (warnings.nonEmpty) "Warning"
      else "Healthy"
    (status, issues, warnings)
  }
}
