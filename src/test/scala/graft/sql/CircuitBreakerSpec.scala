package graft.sql

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import VeloSqlParser._

/** Circuit breaker semantics (reference:
  * src/velostream/sql/execution/circuit_breaker.rs): a crash-looping
  * job trips OPEN after `failureThreshold` consecutive failures, OPEN
  * fails launches fast, HALF_OPEN admits a trial after the recovery
  * timeout, and successes close it again.
  */
class CircuitBreakerSpec extends AnyFunSuite with SparkTestSession {

  test("state machine: closed → open → half-open → closed, with re-trip on trial failure") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 3, recoveryTimeoutMs = 1000L, successThreshold = 2),
      () => now)
    assert(cb.currentState == CircuitBreaker.Closed && cb.allowsLaunch)

    // successes keep resetting the consecutive-failure count
    cb.recordFailure(); cb.recordFailure(); cb.recordSuccess()
    cb.recordFailure(); cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Closed)
    cb.recordFailure() // third consecutive → trip
    assert(cb.currentState == CircuitBreaker.Open && !cb.allowsLaunch)
    assert(cb.retryInMs == 1000L)

    // recovery timeout elapses → half-open admits a trial
    now = 1000L
    assert(cb.currentState == CircuitBreaker.HalfOpen && cb.allowsLaunch)

    // a failed trial (admitted via tryBeginLaunch) re-opens AND
    // restarts the recovery timer
    assert(cb.tryBeginLaunch())
    cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Open)
    assert(cb.retryInMs == 1000L)

    // next window: two successes (successThreshold) of the trial close it
    now = 2000L
    assert(cb.currentState == CircuitBreaker.HalfOpen)
    assert(cb.tryBeginLaunch())
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.HalfOpen)
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)

    // manual reset from open
    cb.recordFailure(); cb.recordFailure(); cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Open)
    cb.reset()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("straggler failures while OPEN do not extend the outage") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 2, recoveryTimeoutMs = 1000L, successThreshold = 1),
      () => now)
    cb.recordFailure(); cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Open)
    // late failure reports from launches that predate the trip, arriving
    // faster than the recovery timeout, must not keep re-tripping
    now = 400L; cb.recordFailure()
    now = 800L; cb.recordFailure()
    assert(cb.retryInMs == 200L) // timer still counts from the ORIGINAL trip
    now = 1000L
    assert(cb.currentState == CircuitBreaker.HalfOpen) // recovery reached
    // and the trial window starts with a clean failure counter: one
    // sub-threshold failure after the trial re-trip, then recovery again
    assert(cb.tryBeginLaunch())
    cb.recordFailure() // trial failed → OPEN again (trip resets counter)
    now = 2000L
    assert(cb.currentState == CircuitBreaker.HalfOpen)
    assert(cb.tryBeginLaunch())
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("stragglers landing AT the recovery boundary are not misread as trial outcomes") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 2, recoveryTimeoutMs = 1000L, successThreshold = 2),
      () => now)
    cb.recordFailure(); cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Open)
    // a stale failure report arriving exactly when the timeout elapses
    // lands in the just-transitioned HALF_OPEN state (the OPEN→HALF_OPEN
    // move is a side effect of the currentState READ inside record*) —
    // with no trial admitted it must be ignored, not re-trip the breaker
    // with no trial ever run
    now = 1000L; cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.HalfOpen,
      "boundary straggler re-tripped the breaker without a trial")
    assert(cb.allowsLaunch)
    // symmetric: stale SUCCESSES from pre-trip launches must not close
    // the breaker without any trial launch either
    cb.recordSuccess(); cb.recordSuccess(); cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.HalfOpen,
      "stale successes closed the breaker without a trial")
    // a real trial still works end-to-end
    assert(cb.tryBeginLaunch())
    cb.recordSuccess(); cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("HALF_OPEN admits a single probe; an abandoned trial releases the slot") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 1, recoveryTimeoutMs = 1000L, successThreshold = 1),
      () => now)
    cb.recordFailure()
    now = 1000L
    assert(cb.allowsLaunch)
    assert(cb.tryBeginLaunch())
    // while the trial is unresolved no second launch is admitted —
    // N concurrent launches of a doomed body is exactly the burn the
    // breaker exists to bound
    assert(!cb.allowsLaunch, "second concurrent HALF_OPEN probe admitted")
    assert(!cb.tryBeginLaunch(), "second HALF_OPEN admission claimed the slot")
    // a trial that ends with no health signal (clean stop, no committed
    // batch) releases the slot instead of deadlocking behind a phantom
    cb.abandonTrial()
    assert(cb.allowsLaunch)
    assert(cb.tryBeginLaunch())
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("concurrent HALF_OPEN admissions: exactly one wins the trial slot") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 1, recoveryTimeoutMs = 1000L, successThreshold = 1),
      () => now)
    cb.recordFailure()
    now = 1000L // HALF_OPEN on next state read
    // the old allowsLaunch-then-beginLaunch() pair was a TOCTOU: both
    // racers could read allowsLaunch=true before either marked the
    // trial. tryBeginLaunch is check-and-claim in one synchronized
    // step — under a real thread race exactly one admission wins.
    val threads = 16
    val ready = new java.util.concurrent.CyclicBarrier(threads)
    val admitted = new java.util.concurrent.atomic.AtomicInteger(0)
    val racers = (1 to threads).map { _ =>
      new Thread(() => {
        ready.await()
        if (cb.tryBeginLaunch()) admitted.incrementAndGet()
      })
    }
    racers.foreach(_.start()); racers.foreach(_.join())
    assert(admitted.get() == 1, s"${admitted.get()} concurrent HALF_OPEN probes admitted")
    // the winning trial resolves normally
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("a crash-looping job trips its breaker: bounded restarts, fail-fast START, half-open retry") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Double)]
    in.addData(Seq((1L, 99.0))) // v >= 5 → assert_true fails every epoch
    val poison = in.toDF().toDF("id", "v").selectExpr("id", "assert_true(v < 5.0) AS chk")
    var now = 0L
    val mgr = new JobManager(spark, _ => poison,
      breakerConfig = CircuitBreaker.Config(
        failureThreshold = 2, recoveryTimeoutMs = 60000L, successThreshold = 1),
      breakerClock = () => now)
    val body = VeloSqlParser.parse("SELECT id FROM whatever") // exec ignores it

    def awaitDead(): Unit = {
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (mgr.statusDf(Some("doomed")).collect().head.getAs[Boolean]("is_active")
             && System.nanoTime() < deadline) Thread.sleep(100)
      assert(!mgr.statusDf(Some("doomed")).collect().head.getAs[Boolean]("is_active"))
    }

    mgr.start("doomed", body, Map.empty)
    awaitDead()
    // death #1: supervision records the failure and restarts on the
    // same checkpoint epoch (breaker still closed: 1 < threshold 2)
    mgr.superviseOnce()
    val st1 = mgr.statusDf(Some("doomed")).collect().head
    assert(st1.getAs[String]("status") == "RUNNING", st1.toString)
    assert(st1.getAs[String]("breaker") == CircuitBreaker.Closed)

    awaitDead()
    // death #2 → trip: no restart, job left FAILED with the error kept
    mgr.superviseOnce()
    val st2 = mgr.statusDf(Some("doomed")).collect().head
    assert(st2.getAs[String]("status") == "FAILED", st2.toString)
    assert(st2.getAs[String]("breaker") == CircuitBreaker.Open)
    assert(st2.getAs[String]("error").nonEmpty)

    // OPEN fails fast: START / RESUME / DEPLOY all rejected immediately
    val e = intercept[ParseException](mgr.start("doomed", body, Map.empty))
    assert(e.getMessage.contains("circuit breaker is OPEN"))
    intercept[ParseException](mgr.resume("doomed"))

    // recovery timeout → HALF_OPEN admits one trial launch again
    now += 60000L
    assert(mgr.statusDf(Some("doomed")).collect().head
      .getAs[String]("breaker") == CircuitBreaker.HalfOpen)
    mgr.start("doomed", body, Map.empty) // trial allowed
    mgr.stop("doomed", force = true)

    // manual reset path
    mgr.resetBreaker("doomed")
    assert(mgr.statusDf(Some("doomed")).collect().head
      .getAs[String]("breaker") == CircuitBreaker.Closed)
  }

  test("recordCompletion resolves a HALF_OPEN trial outright; partial trials release on abandon (r12 trial-wedge fixes)") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 2, recoveryTimeoutMs = 1000L, successThreshold = 3),
      () => now)
    cb.recordFailure(); cb.recordFailure()
    assert(cb.currentState == CircuitBreaker.Open)
    now = 1000L
    // a batch body's one-shot materialization is FULL completion: the
    // trial closes outright — demanding successThreshold micro-batches
    // of a body with no streaming query would wedge the slot forever
    assert(cb.tryBeginLaunch())
    cb.recordCompletion()
    assert(cb.currentState == CircuitBreaker.Closed && cb.allowsLaunch)

    // partial trial (1 of 3 successes) then the query is stopped: the
    // slot must release (abandonTrial) so the NEXT launch can trial —
    // previously it stayed claimed forever with no query to resolve it
    cb.recordFailure(); cb.recordFailure()
    now = 2000L
    assert(cb.tryBeginLaunch())
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.HalfOpen && !cb.allowsLaunch)
    cb.abandonTrial()
    assert(cb.allowsLaunch, "released partial trial must admit the next launch")

    // completion as a straggler (no trial admitted) must not close
    assert(cb.tryBeginLaunch()) // fresh trial after the abandon
    cb.recordFailure() // trial failure → re-trip
    assert(cb.currentState == CircuitBreaker.Open)
    now = 3000L
    assert(cb.currentState == CircuitBreaker.HalfOpen)
    cb.recordCompletion() // straggler: no trial in flight
    assert(cb.currentState == CircuitBreaker.HalfOpen)
  }

  test("abandonTrial drops partial-trial credit — the next trial must earn the full threshold (r13 advice)") {
    var now = 0L
    val cb = new CircuitBreaker(
      CircuitBreaker.Config(failureThreshold = 2, recoveryTimeoutMs = 1000L, successThreshold = 3),
      () => now)
    cb.recordFailure(); cb.recordFailure()
    now = 1000L
    assert(cb.tryBeginLaunch())
    cb.recordSuccess(); cb.recordSuccess() // 2 of 3, then the query stops
    cb.abandonTrial()
    assert(cb.currentState == CircuitBreaker.HalfOpen)
    // fresh trial: one success must NOT close (2 stale + 1 fresh ≠ 3 fresh)
    assert(cb.tryBeginLaunch())
    cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.HalfOpen,
      "stale partial-trial successes must not count toward closing")
    cb.recordSuccess(); cb.recordSuccess()
    assert(cb.currentState == CircuitBreaker.Closed)
  }

  test("r15 review: degenerate Config values reject at construction") {
    // recoveryTimeoutMs <= 0 silently neutered the OPEN state: every
    // state read instantly flipped OPEN -> HALF_OPEN, re-admitting a
    // crash-looping job a trial on every supervision tick
    intercept[IllegalArgumentException](CircuitBreaker.Config(recoveryTimeoutMs = 0L))
    intercept[IllegalArgumentException](CircuitBreaker.Config(recoveryTimeoutMs = -5L))
    intercept[IllegalArgumentException](CircuitBreaker.Config(failureThreshold = 0))
    intercept[IllegalArgumentException](CircuitBreaker.Config(successThreshold = 0))
    assert(CircuitBreaker.Config().recoveryTimeoutMs == 60000L)
  }

  test("supervision restarts continue exactly-once on the same sink") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Double)]
    val healthy = in.toDF().toDF("id", "v")
    val mgr = new JobManager(spark, _ => healthy)
    val body = VeloSqlParser.parse("SELECT id FROM whatever")
    in.addData(Seq((1L, 1.0), (2L, 2.0)))
    mgr.start("steady", body, Map.empty)
    mgr.awaitIdle("steady")
    // healthy query: supervision is a no-op success signal
    mgr.superviseOnce()
    val st = mgr.statusDf(Some("steady")).collect().head
    assert(st.getAs[String]("status") == "RUNNING" && st.getAs[Boolean]("is_active"))
    assert(mgr.sinkDf("steady").count() == 2)
    mgr.stop("steady", force = false)
  }
}
