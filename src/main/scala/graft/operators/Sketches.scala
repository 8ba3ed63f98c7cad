package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the streaming-engine staples
  * beyond HLL (q21 covers APPROX_COUNT_DISTINCT):
  *
  *  - Count-Min heavy hitters: one distributed pass builds a CMS
  *    (merge-able per-partition sketches; only the width×depth counter
  *    grid reaches the driver — a model artifact, not data). Estimates
  *    are then read off the sketch for the candidate keys. At 100 TB
  *    this answers "which keys are hot and roughly how hot" without a
  *    full groupBy materialization; here the exact counts ride along so
  *    the CMS error bound is oracle-checkable (estimate never BELOW the
  *    true count; overshoot ≤ eps·N with the configured confidence —
  *    the q21 pattern: a boolean the oracle expects uniformly TRUE).
  */
object Sketches {

  /** Top-k keys by exact count, each with its Count-Min estimate and a
    * bound check. `eps`/`confidence` size the sketch per Spark's
    * CountMinSketch implementation (width = ⌈2/eps⌉, depth =
    * ⌈2·ln(1/(1-confidence))⌉ — NOT the classical ⌈e/eps⌉/⌈ln(…)⌉;
    * size memory from Spark's formula); fixed seed → deterministic.
    * The key column is surfaced as STRING (the report is human/oracle
    * facing) — join it back to a typed source via an explicit cast. */
  def cmsHeavyHitters(df: DataFrame, keyCol: String, k: Int,
                      eps: Double = 0.001, confidence: Double = 0.99,
                      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // fail at the call site (the sibling operators' convention): k <= 0
    // would otherwise pay the FULL sketch pass before limit(-1) throws
    // (or k=0 silently returns an empty report)
    require(k >= 1, s"heavy-hitter count k must be >= 1, got $k")
    // the report reserves these two output names — a key column named
    // 'n' would yield two ambiguous 'n' columns AFTER the full pass
    // ran. Matching follows the SESSION resolver (the Cols guard
    // convention): under default case-insensitive resolution a key
    // named 'N' collides exactly the same way, and the raw != check
    // let it through to fail only after the scan
    val caseSensitive =
      df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean
    val collides =
      if (caseSensitive) keyCol == "n" || keyCol == "est_ok"
      else keyCol.equalsIgnoreCase("n") || keyCol.equalsIgnoreCase("est_ok")
    require(!collides,
      s"key column '$keyCol' collides with a report column name")
    // nulls: the CMS builder skips them but groupBy reports the null
    // group, and sketch.estimateCount(null) throws on the driver —
    // exclude them consistently (the report covers non-null keys; the
    // eps·N bound uses the same non-null total the sketch saw)
    // DELIBERATE two-pass shape: the sketch build and the exact groupBy
    // each scan the (column-pruned) key column once. Persisting `rows`
    // to fuse them would write the full filtered corpus to executor
    // storage — at the 100 TB target that cache write+read costs MORE
    // than a second single-column parquet scan, and the exact pass
    // exists only to make the bound oracle-checkable (a production
    // caller wanting estimates alone skips it entirely).
    val rows = df.where(col(keyCol).isNotNull)
    val sketch = rows.stat.countMinSketch(keyCol, eps, confidence, seed)
    // the sketch counts every non-null add exactly — a separate count()
    // scan of the input would recompute the same number at full I/O cost
    val total = sketch.totalCount()
    val top = rows.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(k)
      .collect() // ≤ k rows — the heavy-hitter report itself
    val bound = (eps * total).ceil.toLong
    top.toSeq.map { r =>
      val key = r.get(0)
      val exact = r.getAs[Long]("n")
      val est = sketch.estimateCount(key)
      // BINARY keys render as lowercase hex: String.valueOf on a byte
      // array is the JVM identity string ("[B@1a2b3c") — different on
      // every run and unjoinable back to the source
      val keyStr = key match {
        case b: Array[Byte] => b.map("%02x".format(_)).mkString
        case other => String.valueOf(other)
      }
      (keyStr, exact, est >= exact && est <= exact + bound)
    }.toDF(keyCol, "n", "est_ok")
  }
}
