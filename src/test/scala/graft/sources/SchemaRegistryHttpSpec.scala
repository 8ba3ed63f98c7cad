package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.SparkTestSession

/** The registry WIRE protocol, executed: a real HTTP server (JDK
  * HttpServer) on an ephemeral port, driven by the real HTTP client —
  * registration, idempotency, the backward-compat gate as a 409,
  * discovery routes, 404s, the compatibility probe, and the end-to-end
  * registry-driven reader-schema upgrade through Serde. */
class SchemaRegistryHttpSpec extends AnyFunSuite with SparkTestSession with BeforeAndAfterAll {

  private lazy val registry =
    new SchemaRegistry(java.nio.file.Files.createTempDirectory("graft_reg_http"))
  private lazy val server = new SchemaRegistryServer(registry)
  private lazy val client = new SchemaRegistryClient(server.baseUrl)

  override def afterAll(): Unit = {
    server.stop()
    super.afterAll()
  }

  private val v1 =
    """{"type":"record","name":"Ev","fields":[
         {"name":"id","type":"int"},
         {"name":"name","type":"string"}]}"""
  private val v2 =
    """{"type":"record","name":"Ev","fields":[
         {"name":"id","type":"long"},
         {"name":"name","type":"string"},
         {"name":"score","type":"double","default":0.5}]}"""
  private val breaking =
    """{"type":"record","name":"Ev","fields":[
         {"name":"id","type":"long"},
         {"name":"must_have","type":"string"}]}"""

  test("register + versions + latest over the wire, compat gate as 409") {
    assert(client.register("wire-value", v1) == 1)
    assert(client.register("wire-value", v1) == 1) // idempotent re-POST
    assert(client.isCompatible("wire-value", v2))
    assert(!client.isCompatible("wire-value", breaking))
    assert(client.register("wire-value", v2) == 2)

    assert(client.versions("wire-value") == Vector(1, 2))
    assert(client.subjects().contains("wire-value"))
    val (ver, latestSchema) = client.latest("wire-value")
    assert(ver == 2 && latestSchema.contains("\"score\""))
    assert(client.schemaAt("wire-value", 1).contains("\"int\""))

    val rejected = intercept[client.RegistryException](client.register("wire-value", breaking))
    assert(rejected.status == 409 && rejected.body.contains("not backward-compatible"))
    assert(client.versions("wire-value") == Vector(1, 2)) // gate held

    val malformed = intercept[client.RegistryException](client.register("wire-value", "{not avro"))
    assert(malformed.status == 422)

    // a malformed CANDIDATE on the compatibility probe is the client's
    // error too: 422 like the register route, not a retryable-looking
    // 500 for a request that can never succeed
    val badProbe = intercept[client.RegistryException](
      client.isCompatible("wire-value", "{not avro"))
    assert(badProbe.status == 422, s"got ${badProbe.status}: ${badProbe.body}")
  }

  test("unknown subject and version are protocol 404s") {
    val noSubject = intercept[client.RegistryException](client.latest("nope-value"))
    assert(noSubject.status == 404 && noSubject.body.contains("40401"))
    val noVersion = intercept[client.RegistryException](client.schemaAt("wire-value", 99))
    assert(noVersion.status == 404 && noVersion.body.contains("40402"))
  }

  test("schema text survives the wire byte-for-byte semantically (escaping round-trip)") {
    // doc strings force JSON escaping through the wire in both directions
    val withDoc =
      """{"type":"record","name":"Doc","doc":"line1\nline2 \"quoted\" \t tab",
           "fields":[{"name":"id","type":"long"}]}"""
    assert(client.register("doc-value", withDoc) == 1)
    val (_, back) = client.latest("doc-value")
    val parsed = new org.apache.avro.Schema.Parser().parse(back)
    assert(parsed.getDoc == "line1\nline2 \"quoted\" \t tab")
  }

  test("path-traversal subject over the wire is rejected, nothing written outside the root") {
    // ".." is a URI-legal path segment the server passes verbatim — the
    // registry must refuse it (500 with the invalid-name message here;
    // never a file outside the registry root)
    val http = java.net.http.HttpClient.newHttpClient()
    val resp = http.send(
      java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(server.baseUrl + "/subjects/%2E%2E/versions"))
        .header("Content-Type", "application/vnd.schemaregistry.v1+json")
        .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
          s"""{"schema": "{\\"type\\":\\"record\\",\\"name\\":\\"X\\",\\"fields\\":[]}"}"""))
        .build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    assert(resp.statusCode() >= 400, s"${resp.statusCode()} ${resp.body()}")
    assert(resp.body().contains("invalid subject name") || resp.statusCode() == 404)
    assert(!java.nio.file.Files.exists(registry.root_forTest.getParent.resolve("1.avsc")))
  }

  private def rawSend(method: String, path: String, body: String = ""): (Int, String) = {
    val http = java.net.http.HttpClient.newHttpClient()
    val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
    val req = (if (method == "GET") b.GET()
               else b.POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))).build()
    val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), r.body())
  }

  test("invalid subject names are client errors (404/422), never 500s or fake 409s") {
    // a name failing the registry's character rule can never exist: the
    // GET routes answer 404, not a 500 that invites futile retries
    assert(rawSend("GET", "/subjects/a%20b/versions")._1 == 404)
    assert(rawSend("GET", "/subjects/a%20b/versions/latest")._1 == 404)
    assert(rawSend("GET", "/subjects/a%20b/versions/1")._1 == 404)
    // compat route: invalid subject is a 404 even before body inspection
    assert(rawSend("POST", "/compatibility/subjects/a%20b/versions/latest", "{}")._1 == 404)
    // register: 422 with the reason — NOT a 409 dressed as a compat
    // conflict (the IllegalArgumentException arm is for real rejections)
    val (code, respBody) = rawSend("POST", "/subjects/a%20b/versions",
      s"""{"schema": "{\\"type\\":\\"record\\",\\"name\\":\\"X\\",\\"fields\\":[]}"}""")
    assert(code == 422 && respBody.contains("invalid subject name"))
  }

  test("zero-padded version numerals resolve; impossible versions stay 404") {
    client.register("zp-value", v1)
    assert(rawSend("GET", "/subjects/zp-value/versions/001")._1 == 200)
    // zero-padding past the 9-digit cap still resolves after stripping
    assert(rawSend("GET", "/subjects/zp-value/versions/0000000001")._1 == 200)
    // a genuinely out-of-Int-range version cannot exist → 404, not 500
    assert(rawSend("GET", "/subjects/zp-value/versions/9999999999")._1 == 404)
  }

  test("a schema with an illegal field default is a 422, not a 500") {
    // structurally-valid JSON, but Avro's default validation throws
    // AvroTypeException (not SchemaParseException) — same client error
    val bad = """{"schema": "{\"type\":\"record\",\"name\":\"X\",\"fields\":[{\"name\":\"id\",\"type\":\"int\",\"default\":\"oops\"}]}"}"""
    val (code, respBody) = rawSend("POST", "/subjects/baddefault-value/versions", bad)
    assert(code == 422, s"$code $respBody")
  }

  test("end-to-end: decode old payloads under the reader schema fetched over HTTP") {
    import spark.implicits._
    val writerSchema = client.schemaAt("wire-value", 1)
    val (_, readerSchema) = client.latest("wire-value")
    val encoded = Serde.encodeAvro(Seq((7, "a"), (8, "b")).toDF("id", "name"),
      writerSchema, "value").select("value")
    val decoded = Serde.decodeAvro(encoded, "value", writerSchema, Some(readerSchema))
    val rows = decoded.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("score")))
    assert(rows.toSeq == Seq((7L, "a", 0.5), (8L, "b", 0.5)))
  }

  test("re-registering an OLDER live version is idempotent, not a 409 (redeploy of a pinned schema)") {
    val reg = new SchemaRegistry(java.nio.file.Files.createTempDirectory("graft_reg_idem"))
    val w1 =
      """{"type":"record","name":"Ev","fields":[
           {"name":"id","type":"int"},
           {"name":"extra","type":"string"}]}"""
    // legal BACKWARD evolution that DROPS the no-default field: v1 can
    // no longer pass the compat gate against v2 — but a redeployed job
    // re-POSTing its pinned v1 must get version 1 back, not a 409
    val w2 =
      """{"type":"record","name":"Ev","fields":[
           {"name":"id","type":"int"}]}"""
    assert(reg.register("idem-value", w1) == 1)
    assert(reg.register("idem-value", w2) == 2)
    assert(reg.register("idem-value", w1) == 1)
    assert(reg.versions("idem-value") == Vector(1, 2))
  }

  test("version files publish atomically: a committed version is never empty/partial") {
    val reg = new SchemaRegistry(java.nio.file.Files.createTempDirectory("graft_reg_atomic"))
    val s =
      """{"type":"record","name":"Ev","fields":[{"name":"id","type":"int"}]}"""
    assert(reg.register("atomic-value", s) == 1)
    // the committed file parses standalone (non-atomic CREATE_NEW+write
    // exposed an empty file between the create and the content write)
    val txt = reg.get("atomic-value", 1).get
    assert(new org.apache.avro.Schema.Parser().parse(txt).getName == "Ev")
    // no temp droppings survive a successful publish
    val dir = java.nio.file.Files.list(reg.root_forTest.resolve("atomic-value"))
    try {
      import scala.jdk.CollectionConverters._
      assert(dir.iterator().asScala.map(_.getFileName.toString).toVector == Vector("1.avsc"))
    } finally dir.close()
  }

  test("wrong verb on a known route is 405 + Allow; malformed version is 422, never subject-not-found (r14 review)") {
    client.register("m405-value", v1)
    val http = java.net.http.HttpClient.newHttpClient()
    def sendMethod(method: String, path: String): (Int, String, String) = {
      val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(server.baseUrl + path))
        .method(method, java.net.http.HttpRequest.BodyPublishers.noBody()).build()
      val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body(), r.headers().firstValue("Allow").orElse(""))
    }
    // a registry client probing existence by error code must NOT see
    // 40401 subject-not-found when only the verb was wrong
    val (c1, b1, allow1) = sendMethod("DELETE", "/subjects/m405-value/versions")
    assert(c1 == 405 && !b1.contains("40401") && allow1 == "GET, POST", s"$c1 $b1 '$allow1'")
    val (c2, _, allow2) = sendMethod("DELETE", "/subjects")
    assert(c2 == 405 && allow2 == "GET")
    val (c3, _, allow3) = sendMethod("PUT", "/subjects/m405-value/versions/latest")
    assert(c3 == 405 && allow3 == "GET")
    val (c4, _, allow4) = sendMethod("GET", "/compatibility/subjects/m405-value/versions/latest")
    assert(c4 == 405 && allow4 == "POST")
    // a malformed version segment is an invalid-version client error,
    // not a missing subject
    val (vc, vb) = rawSend("GET", "/subjects/m405-value/versions/1x")
    assert(vc == 422 && vb.contains("42202") && vb.contains("invalid version"), s"$vc $vb")
  }

  test("r15 review: guard-rejected POSTs with bodies drain, answer, and leave the server live") {
    // routes that answer without consuming the body (405, no-route 404,
    // compat-route subject guard) now drain it on the side pool first —
    // ex.close() otherwise drained inline on the single dispatch thread
    val (c1, b1) = rawSend("POST", "/subjects", """{"x":"y"}""")
    assert(c1 == 405, s"$c1 $b1")
    val (c2, _) = rawSend("POST", "/no/such/route", """{"x":"y"}""")
    assert(c2 == 404)
    val (c3, _) = rawSend("POST", "/compatibility/subjects/a%20b/versions/latest",
      """{"schema":"{}"}""")
    assert(c3 == 404)
    // the dispatch thread survived all three — a normal request works
    assert(rawSend("GET", "/subjects")._1 == 200)
  }

  test("r16 advice: DELETE-with-body guard routes drain like POST (413 on oversize, live after)") {
    val http = java.net.http.HttpClient.newHttpClient()
    def del(path: String, body: String): (Int, String) = {
      val req = java.net.http.HttpRequest.newBuilder(
        java.net.URI.create(server.baseUrl + path))
        .method("DELETE", java.net.http.HttpRequest.BodyPublishers.ofString(body)).build()
      val r = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
      (r.statusCode(), r.body())
    }
    // oversize body on an unrouted DELETE must be seen by the drain
    // machinery (413), not the route guard (404): pre-fix, DELETE
    // bypassed drained()'s body-carrying arm entirely, leaving the
    // inline ex.close() drain on the single dispatch thread — the
    // wedge the guard exists to prevent (Confluent-style
    // DELETE /subjects/{s} is a body-carrying client reality)
    val (cBig, bBig) = del("/subjects/somesubj", "x" * ((1 << 20) + 1))
    assert(cBig == 413, s"$cBig $bBig")
    // a small-body DELETE still reaches the guard response
    assert(del("/no/such/route", """{"x":"y"}""")._1 == 404)
    assert(del("/subjects/m405-value/versions", """{"x":"y"}""")._1 == 405)
    // the dispatch thread survived — a normal request works
    assert(rawSend("GET", "/subjects")._1 == 200)
  }

  test("r17 review: a trailing slash in the client baseUrl must not 404 every route") {
    // copied URLs routinely end in '/': pre-fix, every path got a double
    // slash and the server's split('/') routing saw a no-route
    val slashed = new SchemaRegistryClient(server.baseUrl + "/")
    try {
      slashed.register("slash-value", v1)
      assert(slashed.subjects().contains("slash-value"))
      assert(slashed.versions("slash-value") == Vector(1))
    } finally slashed.close()
  }

  test("r17 review: zero-padded version files are stray noise, not unreadable versions") {
    // '01.avsc' used to LIST as version 1 that get() (which reconstructs
    // '1.avsc') could not read back — latest()/register then crashed
    // with NoSuchElementException on a version the listing reported
    val root = java.nio.file.Files.createTempDirectory("graft_reg_zeropad")
    val reg = new SchemaRegistry(root)
    val d = root.resolve("padded-value")
    java.nio.file.Files.createDirectories(d)
    java.nio.file.Files.writeString(d.resolve("01.avsc"), v1)
    assert(reg.versions("padded-value").isEmpty, "zero-padded name is not a canonical version")
    assert(reg.latest("padded-value").isEmpty) // pre-fix: NoSuchElementException
    // registration still works alongside the stray file
    assert(reg.register("padded-value", v1) == 1)
    assert(reg.versions("padded-value") == Vector(1))
  }

  test("r17 review: isCompatible extracts the field, never substring-scans the body") {
    // a verbose registry reply carrying 'true' OUTSIDE is_compatible
    // (Confluent answers {"is_compatible":false,"messages":[...]}) used
    // to read as compatible — deploying a reader that cannot decode
    val stub = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    stub.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      ex.getRequestBody.readAllBytes()
      val body =
        """{"is_compatible": false, "messages": ["reader lacks field with default=true"]}"""
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      ex.sendResponseHeaders(200, body.length)
      ex.getResponseBody.write(body); ex.close()
    })
    stub.start()
    val c = new SchemaRegistryClient(s"http://127.0.0.1:${stub.getAddress.getPort}")
    try assert(!c.isCompatible("any-value", v1),
      "verbose incompatible reply must read INCOMPATIBLE")
    finally { c.close(); stub.stop(0) }
  }

  test("client validates subject names before any request goes on the wire (r14 review)") {
    // a space would throw IllegalArgumentException from URI.create; a
    // '#' would silently query the WRONG resource via a URI fragment
    val e1 = intercept[client.RegistryException](client.latest("a b"))
    assert(e1.getMessage.contains("invalid subject name"), e1.getMessage)
    val e2 = intercept[client.RegistryException](client.versions("a#b"))
    assert(e2.getMessage.contains("invalid subject name"))
    val e3 = intercept[client.RegistryException](client.register("..", v1))
    assert(e3.getMessage.contains("invalid subject name"))
  }
}
