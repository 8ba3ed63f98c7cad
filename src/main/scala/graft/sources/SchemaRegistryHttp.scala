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

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  def boundPort: Int = server.getAddress.getPort
  def baseUrl: String = s"http://127.0.0.1:$boundPort"

  private def respond(ex: HttpExchange, status: Int, json: String): Unit = {
    val bytes = json.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/vnd.schemaregistry.v1+json")
    ex.sendResponseHeaders(status, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def notFound(ex: HttpExchange, code: Int, msg: String): Unit =
    respond(ex, 404, s"""{"error_code":$code,"message":${jstr(msg)}}""")

  private def schemaPayload(subject: String, version: Int, schema: String): String =
    s"""{"subject":${jstr(subject)},"version":$version,"schema":${jstr(schema)}}"""

  server.createContext("/", (ex: HttpExchange) => {
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/").stripSuffix("/")
      val parts = path.split("/").toList
      (ex.getRequestMethod, parts) match {
        case ("GET", "subjects" :: Nil) =>
          respond(ex, 200, registry.subjects().map(jstr).mkString("[", ",", "]"))

        case ("GET", "subjects" :: s :: "versions" :: Nil) =>
          val vs = registry.versions(s)
          if (vs.isEmpty) notFound(ex, 40401, s"Subject '$s' not found.")
          else respond(ex, 200, vs.mkString("[", ",", "]"))

        case ("GET", "subjects" :: s :: "versions" :: "latest" :: Nil) =>
          registry.latest(s) match {
            case Some((v, sch)) => respond(ex, 200, schemaPayload(s, v, sch))
            case None => notFound(ex, 40401, s"Subject '$s' not found.")
          }

        // length cap: an all-digit version beyond Int range must be a
        // 404 (version cannot exist), not a 500 from toInt blowing up
        case ("GET", "subjects" :: s :: "versions" :: n :: Nil)
            if n.nonEmpty && n.length <= 9 && n.forall(_.isDigit) =>
          registry.get(s, n.toInt) match {
            case Some(sch) => respond(ex, 200, schemaPayload(s, n.toInt, sch))
            case None => notFound(ex, 40402, s"Version $n not found.")
          }
        case ("GET", "subjects" :: _ :: "versions" :: n :: Nil) if n.forall(_.isDigit) =>
          notFound(ex, 40402, s"Version $n not found.")

        case ("POST", "subjects" :: s :: "versions" :: Nil) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          jsonStringField(body, "schema") match {
            case None => respond(ex, 422, s"""{"error_code":42201,"message":"missing schema field"}""")
            case Some(schemaJson) =>
              try respond(ex, 200, s"""{"version":${registry.register(s, schemaJson)}}""")
              catch {
                case e: IllegalArgumentException =>
                  respond(ex, 409, s"""{"error_code":409,"message":${jstr(e.getMessage)}}""")
                case e: org.apache.avro.SchemaParseException =>
                  respond(ex, 422, s"""{"error_code":42201,"message":${jstr(e.getMessage)}}""")
              }
          }

        case ("POST", "compatibility" :: "subjects" :: s :: "versions" :: "latest" :: Nil) =>
          val body = new String(ex.getRequestBody.readAllBytes(), UTF_8)
          (jsonStringField(body, "schema"), registry.latest(s)) match {
            case (None, _) => respond(ex, 422, s"""{"error_code":42201,"message":"missing schema field"}""")
            case (_, None) => notFound(ex, 40401, s"Subject '$s' not found.")
            case (Some(candidate), Some((_, prev))) =>
              // malformed candidate schema is the CLIENT's error — the
              // register route answers 422 for the same body, and a 500
              // here invites clients to retry a request that can never
              // succeed
              try {
                val ok = registry.incompatibilities(candidate, prev).isEmpty
                respond(ex, 200, s"""{"is_compatible":$ok}""")
              } catch {
                case e: org.apache.avro.SchemaParseException =>
                  respond(ex, 422, s"""{"error_code":42201,"message":${jstr(e.getMessage)}}""")
              }
          }

        case _ => notFound(ex, 40401, s"no route: ${ex.getRequestMethod} $path")
      }
    } catch {
      case e: Exception => respond(ex, 500, s"""{"error_code":500,"message":${jstr(String.valueOf(e.getMessage))}}""")
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

  private val http = HttpClient.newHttpClient()

  final case class RegistryException(status: Int, body: String)
    extends RuntimeException(s"registry returned $status: $body")

  private def get(path: String): String = send(
    HttpRequest.newBuilder(java.net.URI.create(baseUrl + path)).GET().build())

  private def post(path: String, json: String): String = send(
    HttpRequest.newBuilder(java.net.URI.create(baseUrl + path))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
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

  def versions(subject: String): Vector[Int] =
    get(s"/subjects/$subject/versions").stripPrefix("[").stripSuffix("]")
      .split(",").toVector.map(_.trim).filter(_.nonEmpty).map(_.toInt)

  def register(subject: String, schemaJson: String): Int = {
    val body = post(s"/subjects/$subject/versions", s"""{"schema":${jstr(schemaJson)}}""")
    body.replaceAll("""[^0-9]""", "").toInt
  }

  def latest(subject: String): (Int, String) = parseSchemaPayload(
    get(s"/subjects/$subject/versions/latest"))

  def schemaAt(subject: String, version: Int): String =
    parseSchemaPayload(get(s"/subjects/$subject/versions/$version"))._2

  def isCompatible(subject: String, schemaJson: String): Boolean =
    post(s"/compatibility/subjects/$subject/versions/latest",
      s"""{"schema":${jstr(schemaJson)}}""").contains("true")

  private def parseSchemaPayload(body: String): (Int, String) = {
    val v = "\"version\":(\\d+)".r.findFirstMatchIn(body)
      .getOrElse(throw RegistryException(200, body)).group(1).toInt
    val sch = jsonStringField(body, "schema")
      .getOrElse(throw RegistryException(200, body))
    (v, sch)
  }
}
