package graft

import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.HttpExchange

/** Shared slow-client defenses for the JDK-native HTTP servers
  * (JobServerHttp, SchemaRegistryServer). ONE copy: the registry server
  * originally lacked every guard the job server had grown (unbounded
  * untimed readAllBytes on its single dispatch thread — one stalled
  * POST wedged the whole registry; r11 review), and a second hand-kept
  * copy would drift the same way again.
  */
private[graft] object HttpGuards {

  /** Bound request-read and response-write time for JDK HttpServers.
    * Idempotent; respects values the deployment already set.
    * LIMITATION: the JDK reads these once per JVM in
    * sun.net.httpserver.ServerConfig's STATIC initializer — first
    * server created wins — which is exactly why EVERY server in this
    * codebase must call this BEFORE its HttpServer.create (a registry
    * server starting first would otherwise silently disarm the job
    * server's knobs). readBodyBounded is the in-process guard that
    * holds either way; this is defense in depth for the response-write
    * side. */
  def ensureRequestTimeouts(): Unit = synchronized {
    if (System.getProperty("sun.net.httpserver.maxReqTime") == null)
      System.setProperty("sun.net.httpserver.maxReqTime", "30")   // seconds
    if (System.getProperty("sun.net.httpserver.maxRspTime") == null)
      System.setProperty("sun.net.httpserver.maxRspTime", "120")
  }

  // side pool for in-process body-read timeouts: cached + daemon — a
  // reader parked on a silent client lingers only until its socket
  // dies, and never occupies a dispatch thread
  private val bodyReaders = java.util.concurrent.Executors.newCachedThreadPool(
    (r: Runnable) => { val t = new Thread(r, "graft-http-body-read"); t.setDaemon(true); t })

  val DefaultBodyTimeoutMs: Long = 30000L

  /** Bounded body read with an IN-PROCESS timeout: the read runs on the
    * side pool with a hard wait, so a client that opens a POST and
    * never sends its body can park a disposable reader thread, never a
    * dispatch thread. Returns None on timeout, after answering 408 on
    * the exchange.
    *
    * The timeout path deliberately does NOT call ex.close(): the JDK's
    * close drains the remaining request body — a blocking read on a
    * socket that never delivers — so closing from here would park a
    * SECOND thread per slow connection (r11 review). The 408 is
    * written BEFORE task.cancel(true): interrupting a thread blocked
    * in the server's SocketChannel.read CLOSES the channel
    * (InterruptibleChannel semantics), so a cancel-first order made
    * the 408 write throw into the silent catch and the client saw a
    * bare reset instead of the documented rejection (r13 review).
    * After the 408, the interrupt doubles as cleanup: it releases the
    * parked reader thread along with the channel. The 408 bytes are
    * flushed explicitly so the client sees the rejection without the
    * exchange completing. */
  /** readBodyBounded plus the oversize step, sequenced ONCE for every
    * server: readBodyBounded reads max+1 bytes so oversize is
    * DETECTABLE (a silent truncation would parse a cut-off body and
    * fail with a misleading downstream error); `tooLarge` lets each
    * caller answer 413 in its own error dialect — the two hand-kept
    * copies of this sequence had already diverged in body shape (r14
    * review). Returns None when the route is already answered (408
    * timeout or the caller's 413). */
  def readBodyChecked(ex: HttpExchange, maxBytes: Int,
                      timeoutMs: Long = DefaultBodyTimeoutMs)
                     (tooLarge: Int => Unit): Option[Array[Byte]] =
    readBodyBounded(ex, maxBytes, timeoutMs) match {
      case None => None // timed out — 408 already sent
      case Some(b) if b.length > maxBytes => tooLarge(maxBytes); None
      case some => some
    }

  /** Answer 413 WITHOUT the dispatch thread paying the drain: a normal
    * respond-and-close after an oversize read would inline-drain the
    * unread body remainder (JDK LeftOverInputStream.drain — blocking
    * reads) on the handler pool thread, the 413 twin of the 408 rule
    * above: a client that sends max+1 bytes and stalls would park the
    * fixed pool one thread per connection (r17 review). The 413 is
    * written and flushed here; close() — and its drain — runs on a
    * disposable daemon side-pool thread. */
  def answerTooLarge(ex: HttpExchange, body413: Array[Byte]): Unit = {
    try {
      ex.getResponseHeaders.set("Connection", "close")
      ex.getResponseHeaders.set("Content-Type", "application/json")
      ex.sendResponseHeaders(413, body413.length)
      val os = ex.getResponseBody
      os.write(body413)
      os.flush()
    } catch { case _: java.io.IOException => () }
    bodyReaders.submit(new Runnable {
      def run(): Unit = try ex.close() catch { case _: java.io.IOException => () }
    })
    ()
  }

  /** The drain-before-guard-response rule, held ONCE for every server
    * (r17 review: JobServerHttp and SchemaRegistryServer each kept a
    * hand-written copy — the exact drift this module exists to stop).
    * Routes that answer WITHOUT consuming a body-carrying request must
    * drain it first: the eventual ex.close() otherwise drains the
    * unread body INLINE on a pool thread. A drain that timed out or
    * overflowed has already answered (408/413) and the guard response
    * is skipped. `tooLargeJson` supplies the server's 413 body dialect. */
  def drained(ex: HttpExchange, maxBytes: Int,
              tooLargeJson: Int => String)(body: => Unit): Unit =
    ex.getRequestMethod match {
      case "POST" | "PUT" | "PATCH" | "DELETE" =>
        val ok = readBodyChecked(ex, maxBytes) { max =>
          answerTooLarge(ex, tooLargeJson(max).getBytes(UTF_8))
        }.isDefined
        if (ok) body
      case _ => body
    }

  def readBodyBounded(ex: HttpExchange, maxBytes: Int,
                      timeoutMs: Long = DefaultBodyTimeoutMs): Option[Array[Byte]] = {
    // overflow guard: maxBytes + 1 at Int.MaxValue wraps negative and
    // readNBytes throws for every request on the route (r13 review)
    val limit = if (maxBytes >= Int.MaxValue) Int.MaxValue else maxBytes + 1
    val task = bodyReaders.submit(
      new java.util.concurrent.Callable[Array[Byte]] {
        def call(): Array[Byte] = ex.getRequestBody.readNBytes(limit)
      })
    try Some(task.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS))
    catch {
      case _: java.util.concurrent.TimeoutException =>
        try {
          ex.getResponseHeaders.set("Connection", "close")
          // Content-Type like every other JSON error both servers emit
          ex.getResponseHeaders.set("Content-Type", "application/json")
          val msg = """{"error":"request body read timed out"}""".getBytes(UTF_8)
          ex.sendResponseHeaders(408, msg.length)
          val os = ex.getResponseBody
          os.write(msg)
          os.flush()
        } catch { case _: java.io.IOException => () }
        task.cancel(true)
        None
      case e: java.util.concurrent.ExecutionException =>
        throw Option(e.getCause).getOrElse(e)
    }
  }
}
