package graft

import org.scalatest.funsuite.AnyFunSuite

/** Entry-point knob parsing (no Spark session needed). */
class HarnessKnobsSpec extends AnyFunSuite {

  test("r17 review: cpusFromEnv is the ONE positive-integer gate for SPARK_GRAFT_CPUS") {
    // pre-fix: Verify and Bench kept drifted copies, and 0/-2 passed
    // integer-ness only to die inside session construction with an
    // error that never named the knob
    assert(SparkEntry.cpusFromEnv(Some("8")) == 8)
    assert(SparkEntry.cpusFromEnv(None) == 4) // documented default
    for (bad <- Seq("0", "-2", "x", "4.5", ""))
      assert(intercept[IllegalArgumentException](SparkEntry.cpusFromEnv(Some(bad)))
        .getMessage.contains("SPARK_GRAFT_CPUS"), bad)
  }

  test("querySubsetFromEnv validates names and treats empty as no filter") {
    assert(SparkEntry.querySubsetFromEnv(None).isEmpty)
    assert(SparkEntry.querySubsetFromEnv(Some(" , ")).isEmpty)
    assert(SparkEntry.querySubsetFromEnv(Some("q1_agg, q2_filter_project"))
      .contains(Set("q1_agg", "q2_filter_project")))
    assert(intercept[IllegalArgumentException](
      SparkEntry.querySubsetFromEnv(Some("q1_agg,zz_bogus")))
      .getMessage.contains("zz_bogus"))
  }
}
