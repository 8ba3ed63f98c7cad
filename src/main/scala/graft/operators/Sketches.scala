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
    // ran. Matching follows the SESSION resolver via the shared Cols
    // helper (hand-rolling the conf read here drifted once already;
    // r13 review)
    require(!Cols.sameName(df, keyCol, "n") && !Cols.sameName(df, keyCol, "est_ok"),
      s"key column '$keyCol' collides with a report column name")
    // CountMinSketch.add handles string/binary/integral keys ONLY
    // (Utils.integralToLong throws for everything else) — a double or
    // timestamp key would pay the full distributed pass and then die
    // inside executor tasks with an opaque IllegalArgumentException;
    // fail HERE like every other parameter (r15 review)
    val keyType = Cols.fieldOf(df, keyCol).dataType
    require(keyType match {
      case org.apache.spark.sql.types.StringType | org.apache.spark.sql.types.BinaryType
         | org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType
         | org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
      case _ => false
    }, s"cmsHeavyHitters key column '$keyCol' is $keyType — Count-Min supports " +
      "string, binary, and integral keys (cast the column first)")
    // nulls: the CMS builder skips them but groupBy reports the null
    // group, and sketch.estimateCount(null) throws on the driver —
    // exclude them consistently (the report covers non-null keys; the
    // eps·N bound uses the same non-null total the sketch saw)
    // ONE corpus scan (r13 review): the former shape scanned the
    // key column twice — once for the sketch, once for the exact
    // groupBy — and the two passes could see DIFFERENT data on a live
    // source (an append between them makes exact > est, an est_ok=false
    // row reporting a mathematically impossible CMS-bound violation
    // that is really input drift). CMS is additive over weighted adds,
    // so building the sketch FROM the aggregated (key, n) pairs is
    // bit-identical to raw adds; the persisted aggregate (distinct-key
    // sized, not corpus sized) serves both the sketch and the top-k
    // from one consistent snapshot.
    // localCheckpoint (eager), NOT persist: a cache partition lost to
    // executor failure under persist RECOMPUTES from lineage against
    // the live source — silently resurrecting the sketch-vs-exact
    // drift this single-scan shape exists to prevent, as an
    // est_ok=false row claiming an impossible CMS-bound violation.
    // With lineage truncated, a lost partition fails LOUDLY instead
    // (the Dedup closure's rule) (r15 review). RDD-level, not
    // Dataset.localCheckpoint: the Dataset form silently changed the
    // storage level to the deserialized default and left no handle to
    // release the blocks — they lingered until GC + ContextCleaner,
    // including when treeAggregate/collect threw (r15 advice). Here
    // the level stays MEMORY_AND_DISK_SER and the finally frees the
    // snapshot deterministically once the ≤k report is on the driver.
    val aggDf = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val aggRdd = aggDf.rdd // external Rows — safe to persist as a snapshot
    aggRdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    aggRdd.localCheckpoint() // keeps the level already set; must precede any job
    try {
      aggRdd.count() // eager: truncate lineage NOW, while the source is this scan
      val sketch = aggRdd.treeAggregate(
          org.apache.spark.util.sketch.CountMinSketch.create(eps, confidence, seed))(
          (s, row) => { s.add(row.get(0), row.getLong(1)); s },
          (a, b) => { a.mergeInPlace(b); a })
      // the sketch counts every non-null add exactly — a separate count()
      // scan of the input would recompute the same number at full I/O cost
      val total = sketch.totalCount()
      val top = df.sparkSession.createDataFrame(aggRdd, aggDf.schema)
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
    } finally aggRdd.unpersist(blocking = false)
  }
}
