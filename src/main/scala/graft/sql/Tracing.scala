package graft.sql

/** One finished span: a named, timed unit of engine work, with its
  * trace/parent linkage and string attributes. */
final case class SpanRow(trace_id: Long, span_id: Long, parent_id: Option[Long],
                         name: String, start_ms: Long, duration_ms: Long,
                         status: String, error: String,
                         attrs: Map[String, String])

/** Per-statement tracing (reference: src/velostream/observability/ —
  * telemetry.rs emits OpenTelemetry spans per statement/batch,
  * span_collector.rs keeps an in-memory collector for inspection).
  *
  * The Spark realization is a driver-side BOUNDED ring buffer of
  * finished spans: spans describe driver-side orchestration (parse,
  * validate, execute, job launches, micro-batches) — a few hundred
  * bytes each, never data-sized, so a fixed-capacity buffer holds hours
  * of activity at any data scale. Distributed task-level detail stays
  * where Spark already puts it (the Spark UI / event log); these spans
  * are the ENGINE's statement-level story, which Spark does not tell.
  *
  * Thread model: `span` nests via a ThreadLocal parent stack (statement
  * execution is single-threaded per caller); `record` is the raw hook
  * for async sources (streaming listener batches). All buffer access
  * synchronizes on the tracer.
  */
final class Tracer(capacity: Int = 8192,
                   clock: () => Long = () => System.currentTimeMillis()) {

  // capacity <= 0 would make the eviction loop below discard EVERY span
  // at record time — a tracer that silently traces nothing (r14 review)
  require(capacity >= 1, s"Tracer capacity must be >= 1, got $capacity")

  private val buf = new scala.collection.mutable.ArrayDeque[SpanRow]()
  private var nextId = 0L
  private val stack = new ThreadLocal[List[(Long, Long)]] { // (traceId, spanId)
    override def initialValue(): List[(Long, Long)] = Nil
  }

  private def allocate(): Long = synchronized { nextId += 1; nextId }

  /** Run `f` inside a span; nested calls on the same thread become
    * children. A throwing body records an ERROR span and rethrows. */
  def span[T](name: String, attrs: Map[String, String] = Map.empty)(f: => T): T = {
    val id = allocate()
    val (traceId, parent) = stack.get() match {
      case (t, s) :: _ => (t, Some(s))
      case Nil => (id, None)
    }
    // clock() runs BEFORE the stack push: an injected clock that throws
    // (the test seam) must not leak a frame that would mis-parent every
    // later span on this thread
    val t0 = clock()
    val nano0 = System.nanoTime()
    stack.set((traceId, id) :: stack.get())
    try {
      val out = f
      record(SpanRow(traceId, id, parent, name, t0,
        (System.nanoTime() - nano0) / 1000000L, "OK", "", attrs))
      out
    } catch {
      // control-flow throwables (a non-local `return` inside the body,
      // scala.util.control.Breaks) mean the body EXITED normally from
      // the caller's point of view — recording them as ERROR would make
      // SHOW TRACES report failures for statements that succeeded
      case e: scala.util.control.ControlThrowable =>
        record(SpanRow(traceId, id, parent, name, t0,
          (System.nanoTime() - nano0) / 1000000L, "OK", "", attrs))
        throw e
      case e: Throwable =>
        record(SpanRow(traceId, id, parent, name, t0,
          (System.nanoTime() - nano0) / 1000000L, "ERROR",
          Option(e.getMessage).getOrElse(e.getClass.getName).take(500), attrs))
        throw e
    } finally stack.set(stack.get().tail)
  }

  /** Raw entry point for async span sources (e.g. streaming-listener
    * micro-batch events) that measure their own timing. */
  def recordSpan(name: String, startMs: Long, durationMs: Long,
                 attrs: Map[String, String] = Map.empty,
                 status: String = "OK", error: String = ""): Unit = {
    val id = allocate()
    record(SpanRow(id, id, None, name, startMs, durationMs, status, error, attrs))
  }

  private def record(row: SpanRow): Unit = synchronized {
    buf.append(row)
    while (buf.length > capacity) buf.removeHead()
  }

  def spans: Vector[SpanRow] = synchronized(buf.toVector)
  def clear(): Unit = synchronized(buf.clear())
}
