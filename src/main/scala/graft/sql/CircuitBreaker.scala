package graft.sql

/** Standard closed → open → half-open circuit breaker guarding job
  * launches (reference: src/velostream/sql/execution/circuit_breaker.rs:23-120
  * — CircuitBreakerState, failure_threshold, recovery_timeout,
  * success_threshold).
  *
  * A crash-looping streaming job must trip open and FAIL FAST instead of
  * burning cluster resources on doomed restarts:
  *
  *  - CLOSED: launches allowed; `failureThreshold` consecutive failures
  *    trip the breaker OPEN.
  *  - OPEN: launches rejected immediately; after `recoveryTimeoutMs`
  *    the next state read moves to HALF_OPEN.
  *  - HALF_OPEN: a trial launch is allowed; `successThreshold`
  *    consecutive successes close the breaker, ONE failure re-opens it
  *    (and restarts the recovery timer).
  *
  * The clock is injected so recovery-timeout behavior is testable
  * without sleeping. All driver-side metadata — a handful of longs per
  * job, nothing data-sized.
  */
final class CircuitBreaker(config: CircuitBreaker.Config = CircuitBreaker.Config(),
                           clock: () => Long = () => System.currentTimeMillis()) {
  private var state: String = CircuitBreaker.Closed
  private var consecutiveFailures = 0
  private var consecutiveSuccesses = 0
  private var openedAt = 0L
  // true while a HALF_OPEN trial launch is in flight. Outcomes in
  // HALF_OPEN only count when a trial was actually admitted
  // (beginLaunch): launches here report their results ASYNCHRONOUSLY
  // (unlike the reference's execute() wrapper, circuit_breaker.rs:171,
  // where an outcome is intrinsically tied to an admitted call), so a
  // straggler report from a pre-trip launch can land exactly when the
  // recovery timeout flips OPEN→HALF_OPEN — and without this token a
  // stale failure would re-trip the breaker with no trial ever run
  // (extending the outage forever), while stale successes could CLOSE
  // it without any trial. It also bounds HALF_OPEN to a single probe:
  // allowsLaunch reports false while the trial is unresolved.
  private var trialInFlight = false

  /** Current state, applying the OPEN → HALF_OPEN transition when the
    * recovery timeout has elapsed. */
  def currentState: String = synchronized {
    if (state == CircuitBreaker.Open && clock() - openedAt >= config.recoveryTimeoutMs) {
      state = CircuitBreaker.HalfOpen
      consecutiveSuccesses = 0
      trialInFlight = false
    }
    state
  }

  def allowsLaunch: Boolean = synchronized {
    currentState match {
      case CircuitBreaker.Open => false
      case CircuitBreaker.HalfOpen => !trialInFlight // single probe at a time
      case _ => true
    }
  }

  /** Atomic check-and-claim admission. Returns false when a launch must
    * be rejected (OPEN, or HALF_OPEN with the trial slot already
    * taken); otherwise admits the launch — and in HALF_OPEN claims the
    * single trial slot in the SAME synchronized step, so subsequent
    * outcome reports are credited to it and further launches are
    * rejected until it resolves (success-threshold close, failure
    * re-trip, or abandonTrial). This replaces the former
    * allowsLaunch-then-beginLaunch() pair, which was a TOCTOU: two
    * threads could both read allowsLaunch=true in HALF_OPEN before
    * either marked the trial, admitting two probes. */
  def tryBeginLaunch(): Boolean = synchronized {
    currentState match {
      case CircuitBreaker.Open => false
      case CircuitBreaker.HalfOpen =>
        if (trialInFlight) false
        else { trialInFlight = true; true }
      case _ => true
    }
  }

  /** The in-flight HALF_OPEN trial ended with NO health signal (e.g.
    * the job was stopped cleanly before committing any batch, or the
    * manager lost ownership of it): clear the token so the next launch
    * can run a real trial instead of deadlocking behind a phantom one. */
  def abandonTrial(): Unit = synchronized {
    if (state == CircuitBreaker.HalfOpen) {
      trialInFlight = false
      // partial-trial credit must NOT carry into the next trial: a
      // later HALF_OPEN trial could otherwise close the breaker with
      // fewer fresh successes than successThreshold (r13 advice)
      consecutiveSuccesses = 0
    }
  }

  /** Milliseconds until the next trial launch is allowed; 0 when not OPEN. */
  def retryInMs: Long = synchronized {
    if (currentState != CircuitBreaker.Open) 0L
    else math.max(0L, openedAt + config.recoveryTimeoutMs - clock())
  }

  def recordSuccess(): Unit = synchronized {
    currentState match {
      // only the admitted trial's successes count toward closing — a
      // stale success from a pre-trip launch must not close the breaker
      // without a trial ever running (see trialInFlight)
      case CircuitBreaker.HalfOpen if trialInFlight =>
        consecutiveSuccesses += 1
        if (consecutiveSuccesses >= config.successThreshold) {
          state = CircuitBreaker.Closed
          consecutiveFailures = 0
          trialInFlight = false
        }
      case CircuitBreaker.HalfOpen => () // straggler — no trial to credit
      case _ =>
        consecutiveFailures = 0
    }
  }

  /** A launch ran to FULL, successful completion (a batch body's
    * one-shot materialization): the strongest health signal there is.
    * In HALF_OPEN this closes the breaker outright — demanding
    * `successThreshold` micro-batch successes of a body that completes
    * in one synchronous step would leave the trial slot claimed forever
    * (no further signals can ever arrive), wedging every future launch
    * behind a phantom trial (r12 review). Elsewhere it resets the
    * failure streak like any success. */
  def recordCompletion(): Unit = synchronized {
    currentState match {
      case CircuitBreaker.HalfOpen if trialInFlight =>
        state = CircuitBreaker.Closed
        consecutiveFailures = 0
        consecutiveSuccesses = 0
        trialInFlight = false
      case CircuitBreaker.HalfOpen => () // straggler — no trial to credit
      case _ => consecutiveFailures = 0
    }
  }

  def recordFailure(): Unit = synchronized {
    currentState match {
      case CircuitBreaker.HalfOpen if trialInFlight => trip() // the trial failed — back to OPEN
      // HALF_OPEN with no trial admitted, or already OPEN: straggler
      // reports from launches that predate the trip must not extend the
      // outage — without this (and the counter reset in trip()) a
      // trickle of late failures arriving faster than the recovery
      // timeout would re-trip forever (the OPEN→HALF_OPEN transition
      // happens as a side effect of the currentState READ, so a
      // straggler landing at/after the timeout boundary would otherwise
      // be misread as a failed trial) and a real trial would never run
      case CircuitBreaker.HalfOpen | CircuitBreaker.Open => ()
      case _ =>
        consecutiveFailures += 1
        if (consecutiveFailures >= config.failureThreshold) trip()
    }
  }

  private def trip(): Unit = {
    state = CircuitBreaker.Open
    openedAt = clock()
    consecutiveFailures = 0
    consecutiveSuccesses = 0
    trialInFlight = false
  }

  /** Manual reset (the operator fixed the root cause). */
  def reset(): Unit = synchronized {
    state = CircuitBreaker.Closed
    consecutiveFailures = 0
    consecutiveSuccesses = 0
    trialInFlight = false
  }
}

object CircuitBreaker {
  val Closed = "CLOSED"
  val Open = "OPEN"
  val HalfOpen = "HALF_OPEN"

  /** Defaults follow the reference's CircuitBreakerConfig::default()
    * (circuit_breaker.rs:57-67): 5 consecutive failures open, 60 s
    * recovery, 3 half-open successes close. */
  final case class Config(failureThreshold: Int = 5,
                          recoveryTimeoutMs: Long = 60000L,
                          successThreshold: Int = 3) {
    // validated like Limits/Tracer in this package (r15 review): a
    // zero/negative recovery timeout silently NEUTERS the OPEN state —
    // every state read instantly flips OPEN→HALF_OPEN, re-admitting a
    // crash-looping job a trial on every supervision tick, the exact
    // doomed-restart burn the breaker exists to bound
    require(failureThreshold >= 1,
      s"failureThreshold must be >= 1, got $failureThreshold")
    require(recoveryTimeoutMs > 0,
      s"recoveryTimeoutMs must be positive, got $recoveryTimeoutMs")
    require(successThreshold >= 1,
      s"successThreshold must be >= 1, got $successThreshold")
  }
}
