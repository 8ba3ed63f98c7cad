package graft.sources

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** The remote schema-registry WIRE protocol (reference:
  * src/velostream/schema/ — its client speaks a Confluent-style REST
  * API). Both sides are implemented on JDK-native HTTP (no extra
  * dependencies): `SchemaRegistryServer` exposes a [[SchemaRegistry]]
  * over the standard registry REST surface, `SchemaRegistryClient`
  * consumes it. The registry is driver-side metadata — a few KB of
  * schema text per subject — so a single HTTP endpoint serves any
  * cluster size; executors never talk to it (reader schemas ship to
  * tasks as plan literals via `Serde.decodeAvro`).
  *
  * Endpoints (the standard registry subset the reference's client
  * uses):
  *   - `GET  /subjects`                                  → `["s1", ...]`
  *   - `GET  /subjects/{s}/versions`                     → `[1, 2, ...]`
  *   - `GET  /subjects/{s}/versions/latest` (or `/{n}`)  → `{subject, version, schema}`
  *   - `POST /subjects/{s}/versions` `{"schema": json}`  → `{"version": n}` (409 if incompatible)
  *   - `POST /compatibility/subjects/{s}/versions/latest` → `{"is_compatible": bool}`
  */
object SchemaRegistryHttp {

  // -- minimal JSON (flat objects with one string field is all the
  //    protocol needs inbound; outbound is hand-assembled) —
  //    delegated to the ONE shared surface (graft.JsonOut): these were
  //    byte-for-byte twins of JobServerHttp's helpers, and the
  //    key-vs-value extraction fix would have had to land twice --
  private[sources] def jstr(s: String): String = graft.JsonOut.jstr(s)
  private[sources] def jsonStringField(body: String, field: String): Option[String] =
    graft.JsonOut.jsonStringField(body, field)
}

/** Serves a [[SchemaRegistry]] over HTTP on `port` (0 = ephemeral).
  * Single-threaded executor: registration is already serialized by the
  * registry's lock, and a metadata endpoint has no throughput needs. */
final class SchemaRegistryServer(registry: SchemaRegistry, port: Int = 0) {
  import SchemaRegistryHttp._

  // BEFORE HttpServer.create: the JDK reads its request/response time
  // bounds once per JVM, first server wins (graft.HttpGuards) — a
  // registry server starting before the job server would otherwise
  // silently disarm the job server's knobs too
  graft.HttpGuards.ensureRequestTimeouts()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  private def respond(ex: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(status, bytes.length)
    // finally-close (the JobServerHttp shape): a client disconnect
    // mid-write would otherwise skip close() AND let the dispatch-level
    // catch call sendResponseHeaders a second time ("headers already
    // sent" masking the real error)
    try ex.getResponseBody.write(bytes)
    finally ex.close()
  }

  /** Bounded, in-process-timed body read (graft.HttpGuards): this
    * server runs on ONE dispatch thread, so a client that opens a POST
    * and never sends its body would otherwise wedge the whole registry
    * — every job launch pinning its reader schema hangs until restart —
    * and an uncapped readAllBytes would buffer an arbitrary body into
    * the driver heap before any validation (r11 review). Schemas are a
    * few KB; 1 MiB is generous. */
  private def readBody(ex: HttpExchange): Option[String] =
    // bounded read + oversize-413 sequencing shared via HttpGuards
    // (r14 review: the hand-kept copy here had drifted from
    // JobServerHttp's); only the 413 body's DIALECT stays local
    // answerTooLarge, not respond: the inline ex.close() after an
    // oversize read would drain the unread remainder BLOCKING on the
    // single dispatch thread (r17 review; the 413 twin of the 408
    // no-inline-close rule)
    graft.HttpGuards.readBodyChecked(ex, 1 << 20) { max =>
      graft.HttpGuards.answerTooLarge(ex,
        s"""{"error_code":413,"message":"request body exceeds $max bytes"}"""
          .getBytes(UTF_8))
    }.map(new String(_, UTF_8))

  private def notFound(ex: HttpExchange, code: Int, msg: String): Unit =
    respond(ex, 404, s"""{"error_code":$code,"message":${jstr(msg)}}""")

  /** Routes that answer WITHOUT consuming a body-carrying request must
    * drain the body on the side pool first: respond's ex.close()
    * otherwise drains it INLINE — a blocking read on the single
    * dispatch thread, so one stalled POST to a guard-rejected route
    * (405, bad subject, no route) wedged the whole registry for the
    * JDK reaper interval — the exact hazard readBody exists to avoid
    * (r15 review). A drain that timed out or overflowed has already
    * answered (408/413), so the guard response is skipped. */
  // the drain-before-guard-response rule lives ONCE in
  // HttpGuards.drained (r17 review: this server and JobServerHttp each
  // kept a hand-written copy); only the 413 dialect stays local
  private def drained(ex: HttpExchange)(body: => Unit): Unit =
    graft.HttpGuards.drained(ex, 1 << 20,
      max => s"""{"error_code":413,"message":"request body exceeds $max bytes"}""")(body)

  private def methodNotAllowed(ex: HttpExchange, m: String, allow: String): Unit =
    drained(ex) {
      ex.getResponseHeaders.set("Allow", allow)
      respond(ex, 405,
        s"""{"error_code":405,"message":${jstr(s"method $m not allowed; Allow: $allow")}}""")
    }

  private def schemaPayload(subject: String, version: Int, schema: String): String =
    s"""{"subject":${jstr(subject)},"version":$version,"schema":${jstr(schema)}}"""

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
      val parts = path.split("/").toList
      // An INVALID subject name (fails the registry's character rule) can
      // never exist: answering 404/422 up front keeps the registry's
      // require(...) from surfacing as a 500 (futile-retry bait) on the
      // GET routes, or dressed as a 409 conflict on register
      def subjectGuard(s: String)(body: => Unit): Unit =
        if (SchemaRegistry.isValidSubject(s)) body
        else notFound(ex, 40401, s"Subject '$s' not found.")
      (ex.getRequestMethod, parts) match {
        case ("GET", "subjects" :: Nil) =>
          respond(ex, 200, registry.subjects().map(jstr).mkString("[", ",", "]"))

        case ("GET", "subjects" :: s :: "versions" :: Nil) => subjectGuard(s) {
          val vs = registry.versions(s)
          if (vs.isEmpty) notFound(ex, 40401, s"Subject '$s' not found.")
          else respond(ex, 200, vs.mkString("[", ",", "]"))
        }

        case ("GET", "subjects" :: s :: "versions" :: "latest" :: Nil) => subjectGuard(s) {
          registry.latest(s) match {
            case Some((v, sch)) => respond(ex, 200, schemaPayload(s, v, sch))
            case None => notFound(ex, 40401, s"Subject '$s' not found.")
          }
        }

        case ("GET", "subjects" :: s :: "versions" :: n0 :: Nil)
            if n0.nonEmpty && n0.forall(_.isDigit) => subjectGuard(s) {
          // normalize zero-padding ('0012' is version 12), THEN cap the
          // digits: a version beyond Int range must be a 404 (it cannot
          // exist), not a 500 from toInt blowing up
          val n = n0.dropWhile(_ == '0') match { case "" => "0"; case x => x }
          val found = if (n.length <= 9) registry.get(s, n.toInt) else None
          found match {
            case Some(sch) => respond(ex, 200, schemaPayload(s, n.toInt, sch))
            case None => notFound(ex, 40402, s"Version $n0 not found.")
          }
        }

        // readBody.foreach: a timed-out body (None — 408 already sent)
        // simply ends the route
        case ("POST", "subjects" :: s :: "versions" :: Nil) => readBody(ex).foreach { body =>
          if (!SchemaRegistry.isValidSubject(s))
            respond(ex, 422, s"""{"error_code":42201,"message":${jstr(s"invalid subject name: $s")}}""")
          else jsonStringField(body, "schema") match {
            case None => respond(ex, 422, s"""{"error_code":42201,"message":"missing schema field"}""")
            case Some(schemaJson) =>
              try respond(ex, 200, s"""{"version":${registry.register(s, schemaJson)}}""")
              catch {
                case e: IllegalArgumentException =>
                  respond(ex, 409, s"""{"error_code":409,"message":${jstr(String.valueOf(e.getMessage))}}""")
                // AvroRuntimeException, not just SchemaParseException:
                // a structurally-valid schema with an illegal default
                // throws AvroTypeException — same client error, same 422
                case e: org.apache.avro.AvroRuntimeException =>
                  respond(ex, 422, s"""{"error_code":42201,"message":${jstr(String.valueOf(e.getMessage))}}""")
              }
          }
        }

        // body read BEFORE the subject guard (the register route's
        // shape): a 404 sent with the body unread would drain it
        // inline on close — the dispatch-thread wedge `drained`
        // documents (r15 review)
        case ("POST", "compatibility" :: "subjects" :: s :: "versions" :: "latest" :: Nil) =>
          readBody(ex).foreach { body => subjectGuard(s) {
          // schema-field check FIRST (nothing registry-side evaluated
          // until the request itself is well-formed)
          jsonStringField(body, "schema") match {
            case None => respond(ex, 422, s"""{"error_code":42201,"message":"missing schema field"}""")
            case Some(candidate) => registry.latest(s) match {
              case None => notFound(ex, 40401, s"Subject '$s' not found.")
              case Some((_, prev)) =>
                // malformed candidate schema is the CLIENT's error — the
                // register route answers 422 for the same body, and a 500
                // here invites clients to retry a request that can never
                // succeed
                try {
                  val ok = registry.incompatibilities(candidate, prev).isEmpty
                  respond(ex, 200, s"""{"is_compatible":$ok}""")
                } catch {
                  case e: org.apache.avro.AvroRuntimeException =>
                    respond(ex, 422, s"""{"error_code":42201,"message":${jstr(String.valueOf(e.getMessage))}}""")
                }
            }
          }
          }
        }

        // a GET version segment that is neither 'latest' nor digits is a
        // MALFORMED version, not a missing subject: answering 40401 told
        // registry clients the subject does not exist (r14 review;
        // 42202 is the registry convention's invalid-version code)
        case ("GET", "subjects" :: s :: "versions" :: n0 :: Nil) => subjectGuard(s) {
          respond(ex, 422, s"""{"error_code":42202,"message":${jstr(s"invalid version: $n0")}}""")
        }
        // wrong METHOD on a known route is 405 + Allow, not 404/40401 —
        // a client probing subject existence by status/error code would
        // read the subject-not-found code as "absent" when only the
        // verb was wrong (same rationale as JobServerHttp's 405
        // handling; r14 review)
        case (m, "subjects" :: Nil) => methodNotAllowed(ex, m, "GET")
        case (m, "subjects" :: _ :: "versions" :: Nil) => methodNotAllowed(ex, m, "GET, POST")
        case (m, "subjects" :: _ :: "versions" :: _ :: Nil) => methodNotAllowed(ex, m, "GET")
        case (m, "compatibility" :: "subjects" :: _ :: "versions" :: "latest" :: Nil) =>
          methodNotAllowed(ex, m, "POST")
        case _ => drained(ex)(notFound(ex, 40401, s"no route: ${ex.getRequestMethod} $path"))
      }
    } catch {
      // tolerate an already-committed response (write failed mid-body):
      // the exchange is closed, there is nothing more to send
      case e: Exception =>
        try respond(ex, 500, s"""{"error_code":500,"message":${jstr(String.valueOf(e.getMessage))}}""")
        catch { case _: java.io.IOException => }
    }
  })
  server.setExecutor(null)
  server.start()

  def stop(): Unit = server.stop(0)
}

/** Client side of the wire protocol — what a deployed job uses to pin
  * its reader schema at launch. */
final class SchemaRegistryClient(baseUrl: String) {
  import SchemaRegistryHttp._

  // a trailing slash — the normal way a copied URL arrives — would
  // double every path separator, and the server's split('/') routing
  // turns '//subjects' into a no-route 404 on EVERY call (r17 review)
  private val base = baseUrl.stripSuffix("/")

  // finite timeouts: a deployed job pins its reader schema through this
  // client at LAUNCH — a wedged registry (TCP accepted, never answers)
  // must fail the launch, not hang the driver forever.
  // The request executor is OWNED so close() can release it: every JDK
  // HttpClient spawns worker threads that otherwise live until GC, and
  // a long-lived driver launching many jobs would accumulate idle
  // HTTP threads with no deterministic release (JDK 17 HttpClient has
  // no close(); shutting down the owned executor is the releasable
  // part — the selector thread exits once the client is unreachable).
  private val httpExec = java.util.concurrent.Executors.newCachedThreadPool(r => {
    val t = new Thread(r, "schema-registry-client"); t.setDaemon(true); t
  })
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .executor(httpExec).build()
  private val requestTimeout = java.time.Duration.ofSeconds(30)

  /** Release the client's worker threads. The client is unusable after. */
  def close(): Unit = { httpExec.shutdown(); () }

  final case class RegistryException(status: Int, body: String)
    extends RuntimeException(s"registry returned $status: $body")

  private def get(path: String): String = send(
    HttpRequest.newBuilder(java.net.URI.create(base + path))
      .timeout(requestTimeout).GET().build())

  private def post(path: String, json: String): String = send(
    HttpRequest.newBuilder(java.net.URI.create(base + path))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .timeout(requestTimeout)
      .POST(HttpRequest.BodyPublishers.ofString(json)).build())

  private def send(req: HttpRequest): String = {
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200) throw RegistryException(resp.statusCode(), resp.body())
    resp.body()
  }

  def subjects(): Vector[String] =
    // ["a","b"] — names are validated [A-Za-z0-9._-]+ so a plain split is safe
    get("/subjects").stripPrefix("[").stripSuffix("]").split(",").toVector
      .map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty)

  /** Mirror the SERVER's subject rule before building the URI: an
    * invalid subject can never exist registry-side, and raw
    * interpolation either threw IllegalArgumentException from
    * URI.create (space) or silently truncated the path at a '#'
    * fragment and asked about the WRONG resource (r14 review). The
    * valid alphabet is URI-safe, so no percent-encoding is needed
    * after the gate. */
  private def subjectSeg(subject: String): String =
    if (SchemaRegistry.isValidSubject(subject)) subject
    else throw RegistryException(400, s"invalid subject name: $subject")

  def versions(subject: String): Vector[Int] =
    get(s"/subjects/${subjectSeg(subject)}/versions").stripPrefix("[").stripSuffix("]")
      .split(",").toVector.map(_.trim).filter(_.nonEmpty).map(_.toInt)

  def register(subject: String, schemaJson: String): Int = {
    val body = post(s"/subjects/${subjectSeg(subject)}/versions", s"""{"schema":${jstr(schemaJson)}}""")
    // targeted field extraction, not digit-stripping over the whole
    // body: a response that ever grows a second numeric field (an id,
    // an echoed error_code) would otherwise concatenate into a garbage
    // version and silently pin the wrong schema (r11 review)
    "\"version\":(\\d+)".r.findFirstMatchIn(body)
      .getOrElse(throw RegistryException(200, body)).group(1).toInt
  }

  def latest(subject: String): (Int, String) = parseSchemaPayload(
    get(s"/subjects/${subjectSeg(subject)}/versions/latest"))

  def schemaAt(subject: String, version: Int): String =
    parseSchemaPayload(get(s"/subjects/${subjectSeg(subject)}/versions/$version"))._2

  def isCompatible(subject: String, schemaJson: String): Boolean = {
    // extract the FIELD, never substring-scan the body: a verbose
    // registry reply ({"is_compatible":false,"messages":["...default=
    // true..."]}) would read incompatible as compatible and deploy a
    // reader that cannot decode the subject's data (r17 review; the
    // register() "version" extraction is the same rule)
    val body = post(s"/compatibility/subjects/${subjectSeg(subject)}/versions/latest",
      s"""{"schema":${jstr(schemaJson)}}""")
    """"is_compatible"\s*:\s*(true|false)""".r.findFirstMatchIn(body)
      .getOrElse(throw RegistryException(200, body)).group(1) == "true"
  }

  private def parseSchemaPayload(body: String): (Int, String) = {
    val v = "\"version\":(\\d+)".r.findFirstMatchIn(body)
      .getOrElse(throw RegistryException(200, body)).group(1).toInt
    val sch = jsonStringField(body, "schema")
      .getOrElse(throw RegistryException(200, body))
    (v, sch)
  }
}
