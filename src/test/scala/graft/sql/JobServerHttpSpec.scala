package graft.sql

import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The job-management REST surface, executed end-to-end: a real JDK
  * HttpServer on an ephemeral port over a live VeloContext, driven by
  * the real HTTP client — deploy → status → health → stop, plus the
  * discovery/report/metrics routes and the error contract (reference:
  * api/velostream-sql-multi-server.openapi.yaml,
  * stream_job_server.rs:427-438, health_dashboard.rs:78-82). */
class JobServerHttpSpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {

  private lazy val (input, ctx) = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Double)]
    val c = new VeloContext(spark)
    c.register("http_events", in.toDF().toDF("id", "v"))
    (in, c)
  }
  private lazy val server = new JobServerHttp(ctx)
  private val http = HttpClient.newHttpClient()

  override def afterAll(): Unit = {
    server.stop()
    ctx.close()
    super.afterAll()
  }

  private def get(path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
      .GET().build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def post(path: String, json: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
      .POST(HttpRequest.BodyPublishers.ofString(json)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }
  private def delete(path: String): (Int, String) = {
    val r = http.send(HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
      .DELETE().build(), HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("server info and empty health are served") {
    val (code, body) = get("/")
    assert(code == 200 && body.contains("graft-sql-server"))
    assert(body.contains("/health") && body.contains("/jobs"))
    val (hc, health) = get("/health")
    assert(hc == 200 && health.contains("\"status\":\"Healthy\"") && health.contains("\"job_count\":0"))
  }

  test("deploy over HTTP launches the job; status, list, report, stop all reflect it") {
    input.addData(Seq((1L, 2.0), (2L, 4.0)))
    val (dc, deployed) = post("/jobs/http_doubler",
      """{"query": "SELECT id, v * 2 AS v2 FROM http_events", "version": "1.1.0"}""")
    assert(dc == 200, deployed)
    assert(deployed.contains("\"status\":\"RUNNING\"") && deployed.contains("\"version\":\"1.1.0\""))
    ctx.jobManager.awaitIdle("http_doubler")
    assert(ctx.jobManager.sinkDf("http_doubler").count() == 2)

    val (lc, list) = get("/jobs")
    assert(lc == 200 && list.contains("\"name\":\"http_doubler\""))
    val (sc, detail) = get("/jobs/http_doubler")
    assert(sc == 200 && detail.contains("\"metrics\":") && detail.contains("\"resources\":"))
    val (rc, report) = get("/report")
    assert(rc == 200 && report.contains("http_doubler") && report.contains("RUNNING"))
    val (mc, _) = get("/metrics")
    assert(mc == 200)

    val (xc, stopped) = delete("/jobs/http_doubler")
    assert(xc == 200 && stopped.contains("\"status\":\"STOPPED\""))
    assert(spark.streams.active.forall(_.name != "graft-job-http_doubler"))
  }

  test("error contract: bad SQL is 400 with the validator message, unknown routes/jobs 404/422") {
    // the REST ring passes the SAME pre-deploy gate as SQL text
    val (bc, bad) = post("/jobs/badjob", """{"query": "SELECT bogus FROM http_events"}""")
    assert(bc == 400 && bad.contains("error"))
    assert(get("/jobs/never_deployed")._1 == 404)
    assert(delete("/jobs/never_deployed")._1 == 404)
    assert(post("/jobs/nobody", """{"nope": 1}""")._1 == 422)
    // URI-legal but outside the server's [A-Za-z0-9_]+ job-name shape
    assert(post("/jobs/bad.name", """{"query": "SELECT 1"}""")._1 == 400)
    assert(get("/no_such_route")._1 == 404)
    // the failed deploy never registered a job
    assert(!ctx.jobManager.hasJob("badjob"))
  }

  test("r15 review: metrics cache keys on the job GENERATION — SQL-surface deploys invalidate") {
    import spark.implicits._
    ctx.register("gen_src", Seq(1, 2, 3).toDF("a"))
    ctx.sql("START JOB genjob AS SELECT a FROM gen_src") // batch body: 3 rows
    val (c1, d1) = get("/jobs/genjob")
    assert(c1 == 200 && d1.contains("\"sink_rows\":3"), d1)
    // a DEPLOY through the SQL surface bypasses the HTTP arms' own
    // eviction — the TTL-fresh cache entry used to serve the previous
    // deployment's numbers as the new one's
    ctx.sql("DEPLOY JOB genjob VERSION '2.0' AS SELECT a FROM gen_src WHERE a = 1")
    val (c2, d2) = get("/jobs/genjob") // immediately, inside the TTL
    assert(c2 == 200 && d2.contains("\"sink_rows\":1"),
      s"stale previous-generation metrics served after a SQL-surface deploy: $d2")
    ctx.sql("STOP JOB genjob")
  }

  test("r15 review: unknown-job 404 is classified by TYPE; guard-rejected POSTs drain bodies") {
    // structured UnknownJobException, not a message-substring match
    assert(delete("/jobs/never_was")._1 == 404)
    // guard-rejected routes with bodies drain on the side pool and
    // still answer; the pool stays live for a follow-up request
    assert(post("/jobs/bad.name", """{"query":"SELECT 1"}""")._1 == 400)
    assert(post("/health", """{"x":"y"}""")._1 == 405)
    assert(post("/no/route", """{"x":"y"}""")._1 == 404)
    assert(get("/health")._1 == 200)
  }

  test("body parsing: a string VALUE equal to a key name cannot hijack extraction") {
    // a bare indexOf would match the "note" VALUE 'query' and extract
    // the NEXT field — deploying 'SELECT 99' with a 200, silently
    val q = JsonOut_jsonStringField(
      """{"note":"query","other":"SELECT 99","query":"SELECT 1"}""", "query")
    assert(q.contains("SELECT 1"))
    // key absent entirely (only as a value) → None, not the next field
    assert(JsonOut_jsonStringField("""{"note":"query","other":"SELECT 99"}""", "query").isEmpty)
    // whitespace around the key/colon still parses
    assert(JsonOut_jsonStringField("""{ "query" : "SELECT 7" }""", "query").contains("SELECT 7"))
  }
  private def JsonOut_jsonStringField(b: String, f: String) = graft.JsonOut.jsonStringField(b, f)

  test("body parsing: a key inside a NESTED object cannot hijack extraction (r13 review)") {
    // the inner metadata.query must not win over the top-level key —
    // the preceded-by-{-or-, heuristic matched it and the server would
    // deploy the wrong SQL
    val q = JsonOut_jsonStringField(
      """{"metadata":{"query":"SELECT evil"},"query":"SELECT real"}""", "query")
    assert(q.contains("SELECT real"), q)
    // key present ONLY nested → None (no top-level field of that name)
    assert(JsonOut_jsonStringField(
      """{"metadata":{"query":"SELECT evil"}}""", "query").isEmpty)
    // arrays of objects don't leak their keys to the top level either
    assert(JsonOut_jsonStringField(
      """{"items":[{"query":"SELECT a"}],"query":"SELECT b"}""", "query")
      .contains("SELECT b"))
    // escaped quote inside a preceding value cannot desync the scan
    assert(JsonOut_jsonStringField(
      """{"note":"a \" quote","query":"SELECT c"}""", "query").contains("SELECT c"))
  }

  test("sec3 emits JSON null for non-finite values, never bare NaN/Infinity (r13 review)") {
    assert(graft.JsonOut.sec3(Double.NaN) == "null")
    assert(graft.JsonOut.sec3(Double.PositiveInfinity) == "null")
    assert(graft.JsonOut.sec3(Double.NegativeInfinity) == "null")
    assert(graft.JsonOut.sec3(1.23456) == "1.235")
  }

  test("HTTP semantics: 405 on wrong method, 413 on oversized body") {
    // wrong VERB on a known path must not read as "job absent" (404 is
    // the jobDetail not-found contract)
    val put = http.send(HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + "/jobs/somejob"))
      .PUT(HttpRequest.BodyPublishers.ofString("{}")).build(),
      HttpResponse.BodyHandlers.ofString())
    assert(put.statusCode() == 405)
    assert(put.headers().firstValue("Allow").orElse("").contains("GET"))
    assert(post("/health", "{}")._1 == 405)
    // an uncapped body would buffer into the driver heap before validation
    val big = "x" * (JobServerHttp.MaxBodyBytes + 16)
    assert(post("/jobs/bigjob", s"""{"query":"$big"}""")._1 == 413)
  }

  test("health rolls a FAILED job up to Critical with the issue named") {
    input.addData(Seq((5L, 5.0)))
    // assert the deploy itself succeeded: a validator regression would
    // otherwise surface later as a misleading unknown-job error
    val (fc, fragile) = post("/jobs/http_fragile",
      """{"query": "SELECT id, assert_true(v < 1.0) AS chk FROM http_events"}""")
    assert(fc == 200, fragile)
    // the stream dies on the assert (awaitIdle surfaces the death);
    // supervision then records the failure
    try ctx.jobManager.awaitIdle("http_fragile")
    catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
    Thread.sleep(200)
    ctx.jobManager.superviseOnce(autoRestart = false)
    val (hc, health) = get("/health")
    assert(hc == 200 && health.contains("\"status\":\"Critical\""), health)
    assert(health.contains("http_fragile"))
    delete("/jobs/http_fragile")
  }

  test("transient 503 classification is structured, not spoofable by echoed query text (r14 review)") {
    // a malformed query whose TRAILING TOKENS echo the breaker/admission
    // phrases must stay a permanent 400 — the old substring check read
    // the echoed text and answered 503, making retry middleware redeploy
    // a never-valid query forever
    val (c1, b1) = post("/jobs/spoof1",
      """{"query": "SELECT 1 resource exhausted"}""")
    assert(c1 == 400, s"$c1 $b1")
    val (c2, b2) = post("/jobs/spoof2",
      """{"query": "SELECT 1 circuit breaker is OPEN"}""")
    assert(c2 == 400, s"$c2 $b2")
  }

  test("r17 review: HEAD is served on the GET scrape routes with no body") {
    // a load balancer probing HEAD /health used to get 405 and mark a
    // healthy backend down; HTTP requires HEAD wherever GET works
    for (path <- Seq("/health", "/metrics", "/jobs", "/")) {
      val r = http.send(HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
        .method("HEAD", HttpRequest.BodyPublishers.noBody()).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, s"$path -> ${r.statusCode()}")
      assert(r.body().isEmpty, s"$path carried a body on HEAD")
    }
  }

  test("r17 review: a present-but-non-string version field is a 400, not a silent 1.0.0 deploy") {
    val (code, body) = post("/jobs/http_vtype",
      """{"query": "SELECT id FROM http_events", "version": 2}""")
    assert(code == 400, s"$code $body")
    assert(body.contains("version"), body)
    // absent version still applies the documented default
    val (c2, b2) = post("/jobs/http_vdefault", """{"query": "SELECT id FROM http_events"}""")
    assert(c2 == 200, b2)
    delete("/jobs/http_vdefault")
  }

  test("r17 review: health rollup counts warnings on LIVE jobs only") {
    import JobServerHttp.healthRollup
    // a STOPPED job with a stuck HALF_OPEN breaker (operator stopped
    // the trial) must not pin /health at Warning forever
    val (s1, _, w1) = healthRollup(
      Seq(("retired", "STOPPED", "HALF_OPEN", "")), Seq(("retired", "mem", 3L)))
    assert(s1 == "Healthy" && w1.isEmpty, (s1, w1).toString)
    // the same signals on a LIVE job still warn
    val (s2, _, w2) = healthRollup(
      Seq(("live", "RUNNING", "OPEN", "")), Seq(("live", "mem", 3L)))
    assert(s2 == "Warning" && w2.length == 2, (s2, w2).toString)
    // FAILED stays Critical regardless
    val (s3, i3, _) = healthRollup(
      Seq(("dead", "FAILED", "OPEN", "boom")), Nil)
    assert(s3 == "Critical" && i3.exists(_.contains("boom")))
    // the global '*' admission row never warns
    val (s4, _, _) = healthRollup(Seq(("live", "RUNNING", "CLOSED", "")), Seq(("*", "ops", 9L)))
    assert(s4 == "Healthy")
  }
}
