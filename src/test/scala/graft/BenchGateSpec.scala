package graft

import org.scalatest.funsuite.AnyFunSuite

/** Locks the bench self-validation gate against the r5 signal-quality
  * defect: the old `baseline + 0.4` absolute floor made the gate ~10x a
  * 0.043 s baseline, so an ambient window whose sentinels read 5-7x
  * baseline (the r5 q17/q30/q31/q32 stretch) was never re-timed. The
  * replay cases below use the exact values from that round's artifact.
  */
class BenchGateSpec extends AnyFunSuite {

  test("r5 replay: 5-7x-baseline ambient window now triggers re-timing") {
    // BENCH_r05: sentinel baseline 0.043 s; the judge-measured guards
    // around q17/q30/q31/q32 ran 0.22-0.30 s and passed the old gate.
    val baseline = 0.043
    val gate = Bench.slowGateFor(baseline)
    val r5WindowGuards = Seq(0.22, 0.25, 0.30)
    r5WindowGuards.foreach { g =>
      assert(g > gate, s"guard $g must exceed gate $gate (would be re-timed)")
    }
    // (Historical context, not an assertion: the retired baseline+0.4
    // floor put the gate at 0.443, above every one of these guards —
    // re-deriving that constant here and asserting against it would be
    // a tautology over test-local literals, exercising no production
    // code.)
  }

  test("clean windows at a typical baseline are not flagged") {
    val baseline = 0.043
    val gate = Bench.slowGateFor(baseline)
    // Ordinary jitter: probes within ~2x baseline stay clean.
    Seq(0.043, 0.06, 0.09).foreach(g => assert(g <= gate))
  }

  test("microsecond baseline keeps an absolute noise floor") {
    // The floor's only legitimate job: a near-zero baseline must not
    // flag scheduler noise. 50 ms of jitter over a 1 ms baseline is
    // noise; 200 ms is a real stall.
    val gate = Bench.slowGateFor(0.001)
    assert(gate >= 0.15) // 50 ms of scheduler jitter stays below the floor
    assert(0.2 > gate)   // ...but a 200 ms stall still trips it
  }

  test("min-merge commits the fastest error-free run") {
    // r8 replay: committed total 87.9 s on a uniformly ~26%-slow window
    // vs 65.4 s on a clean same-HEAD run — with n_slow_windows=0, the
    // per-window gate cannot see uniform slowness. The min-merge must
    // pick the clean run's timing.
    assert(Bench.chooseRun(Seq((None, 1.38), (None, 0.72))) === 1)
    // an error in one run must not shadow a clean timing in another
    assert(Bench.chooseRun(Seq((Some("boom"), 0.01), (None, 2.5))) === 1)
    // ...regardless of order
    assert(Bench.chooseRun(Seq((None, 2.5), (Some("boom"), 0.01))) === 0)
    // every run errored → keep run 0 so the failure stays reported
    assert(Bench.chooseRun(Seq((Some("a"), 1.0), (Some("b"), 0.5))) === 0)
  }

  test("large baselines scale multiplicatively, not by the floor") {
    // On a loaded VM where the best-observed sentinel is already 0.5 s,
    // the 2.5x term governs — the floor never loosens a large gate.
    assert(Bench.slowGateFor(0.5) === 1.25)
  }

  test("r16: sibling_seals carries every superseded same-round seal's headline forward") {
    // first seal of a round: nothing to carry
    assert(Bench.siblingSeals(None) == "[]")
    // a prior seal with no siblings of its own: one entry, with the
    // norm median computed from its queries_norm map
    val seal1 =
      """{"metric":"total","value":60.09,"unit":"sec","queries":{"q1":1.0},""" +
        """"queries_norm":{"q1":0.8,"q2":1.0,"q3":1.2},"head":"abc123","sf":"sf0.1"}"""
    val one = Bench.siblingSeals(Some(seal1))
    assert(one == """[{"total":60.09,"norm_median":1.000,"head":"abc123"}]""", one)
    // a re-re-seal: the previous artifact's own sibling rides along,
    // so the final artifact holds the WHOLE same-round band
    val seal2 = seal1.dropRight(1) +
      ""","sibling_seals":[{"total":58.00,"norm_median":0.990,"head":"abc122"}]}"""
    val two = Bench.siblingSeals(Some(seal2))
    assert(two == """[{"total":58.00,"norm_median":0.990,"head":"abc122"},""" +
      """{"total":60.09,"norm_median":1.000,"head":"abc123"}]""", two)
    // negative sentinel-norm placeholders (-1.0 = no sentinel) are
    // excluded from the median, not averaged in
    val seal3 =
      """{"value":10.0,"queries_norm":{"q1":-1.0,"q2":0.5},"head":"ff"}"""
    assert(Bench.siblingSeals(Some(seal3))
      == """[{"total":10.0,"norm_median":0.500,"head":"ff"}]""")
  }

  test("r17 advice: sibling_seals norm_median is locale-proof (sec3, not default-locale %.3f)") {
    // "%.3f".format uses the default JVM locale — under a comma-decimal
    // locale the sealed artifact got "norm_median":0,750: invalid JSON
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      val seal = """{"value":10.0,"queries_norm":{"q1":0.5,"q2":0.75,"q3":1.0},"head":"ff"}"""
      val out = Bench.siblingSeals(Some(seal))
      assert(out == """[{"total":10.0,"norm_median":0.750,"head":"ff"}]""", out)
    } finally java.util.Locale.setDefault(prev)
  }
}
