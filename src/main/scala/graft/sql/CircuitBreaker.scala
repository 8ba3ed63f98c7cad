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

  /** Current state, applying the OPEN → HALF_OPEN transition when the
    * recovery timeout has elapsed. */
  def currentState: String = synchronized {
    if (state == CircuitBreaker.Open && clock() - openedAt >= config.recoveryTimeoutMs) {
      state = CircuitBreaker.HalfOpen
      consecutiveSuccesses = 0
    }
    state
  }

  def allowsLaunch: Boolean = currentState != CircuitBreaker.Open

  /** Milliseconds until the next trial launch is allowed; 0 when not OPEN. */
  def retryInMs: Long = synchronized {
    if (currentState != CircuitBreaker.Open) 0L
    else math.max(0L, openedAt + config.recoveryTimeoutMs - clock())
  }

  def recordSuccess(): Unit = synchronized {
    currentState match {
      case CircuitBreaker.HalfOpen =>
        consecutiveSuccesses += 1
        if (consecutiveSuccesses >= config.successThreshold) {
          state = CircuitBreaker.Closed
          consecutiveFailures = 0
        }
      case _ =>
        consecutiveFailures = 0
    }
  }

  def recordFailure(): Unit = synchronized {
    currentState match {
      case CircuitBreaker.HalfOpen => trip() // the trial failed — back to OPEN
      // already OPEN: straggler reports from launches that predate the
      // trip must not extend the outage — without this (and the counter
      // reset in trip()) a trickle of late failures arriving faster than
      // the recovery timeout would re-trip forever and HALF_OPEN would
      // never be reached
      case CircuitBreaker.Open => ()
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
  }

  /** Manual reset (the operator fixed the root cause). */
  def reset(): Unit = synchronized {
    state = CircuitBreaker.Closed
    consecutiveFailures = 0
    consecutiveSuccesses = 0
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
                          successThreshold: Int = 3)
}
