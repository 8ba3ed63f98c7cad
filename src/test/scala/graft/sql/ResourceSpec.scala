package graft.sql

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import VeloSqlParser.ParseException

/** The reference's resource manager semantics
  * (src/velostream/sql/execution/resource_manager.rs): named resources
  * with per-job limits, current/peak/violation tracking, warning/
  * critical threshold classification, hard enforcement (a job past its
  * limit is stopped, not hot-looped), and admission control for
  * concurrent operations — all fed from StreamingQueryProgress here.
  */
class ResourceSpec extends AnyFunSuite with SparkTestSession {

  private def memInput(): (MemoryStream[(Long, Double)], VeloContext) = {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Double)]
    val ctx = new VeloContext(spark)
    ctx.register("live_events", in.toDF().toDF("id", "v"))
    (in, ctx)
  }

  /** Progress events arrive on the listener bus after the batch commits,
    * so enforcement is eventually-visible: poll with a deadline. */
  private def awaitStatus(ctx: VeloContext, job: String, want: String,
                          timeoutMs: Long = 30000): String = {
    val deadline = System.currentTimeMillis() + timeoutMs
    var st = ctx.sql(s"SHOW STATUS $job").collect().head.getAs[String]("status")
    while (st != want && System.currentTimeMillis() < deadline) {
      Thread.sleep(100)
      st = ctx.sql(s"SHOW STATUS $job").collect().head.getAs[String]("status")
    }
    st
  }

  test("Limits.fromProps reads the reference property names; malformed values reject") {
    val base = Resources.Limits()
    val l = Resources.Limits.fromProps(Map(
      "max_aggregation_groups" -> "1000", "max_total_memory" -> "1048576",
      "max_processing_time_per_record" -> "2.5", "max_concurrent_operations" -> "4",
      "unrelated.prop" -> "x"), base)
    assert(l.maxAggregationGroups.contains(1000L))
    assert(l.maxTotalMemory.contains(1048576L))
    assert(l.maxProcessingTimePerRecordMs.contains(2.5))
    assert(l.maxConcurrentOperations.contains(4))
    assert(base.maxAggregationGroups.isEmpty) // unset stays unlimited
    intercept[ParseException] {
      Resources.Limits.fromProps(Map("max_aggregation_groups" -> "lots"), base)
    }
    // non-positive limits would kill the job on its first progress event
    // while level() reports OK; Int wrap would turn a huge limit negative
    intercept[ParseException] {
      Resources.Limits.fromProps(Map("max_total_memory" -> "-1"), base)
    }
    intercept[ParseException] {
      Resources.Limits.fromProps(Map("max_processing_time_per_record" -> "0"), base)
    }
    intercept[ParseException] {
      Resources.Limits.fromProps(Map("max_concurrent_operations" -> "2147483648"), base)
    }
    // the dialect is case-insensitive: an uppercase WITH key must hit
    // the limit, not silently leave the job unlimited
    val up = Resources.Limits.fromProps(Map("MAX_TOTAL_MEMORY" -> "4096"), base)
    assert(up.maxTotalMemory.contains(4096L))
    // 'Infinity' parses as a Double but is a nonsense un-trippable limit
    intercept[ParseException] {
      Resources.Limits.fromProps(Map("max_processing_time_per_record" -> "Infinity"), base)
    }
  }

  test("conflicting case variants of one limit key are a statement error, not a lottery") {
    val base = Resources.Limits()
    // which variant wins depends on Map iteration order — the user who
    // believes they tightened the limit must not silently run loose
    val e = intercept[ParseException] {
      Resources.Limits.fromProps(
        Map("max_total_memory" -> "1000", "MAX_TOTAL_MEMORY" -> "999999999"), base)
    }
    assert(e.getMessage.contains("conflicting"))
    // same value under two cases is harmless redundancy, not a conflict
    val ok = Resources.Limits.fromProps(
      Map("max_total_memory" -> "4096", "MAX_TOTAL_MEMORY" -> "4096"), base)
    assert(ok.maxTotalMemory.contains(4096L))
  }

  test("the positive-limit invariant holds for PROGRAMMATIC Limits construction too") {
    // fromProps guards parsed limits, but JobManager(defaultLimits = ...)
    // takes a raw Limits — a nonpositive limit there would kill every
    // monitored job on its first progress event while level() says OK
    intercept[IllegalArgumentException] {
      Resources.Limits(maxTotalMemory = Some(-1L))
    }
    intercept[IllegalArgumentException] {
      Resources.Limits(maxProcessingTimePerRecordMs = Some(Double.PositiveInfinity))
    }
    intercept[IllegalArgumentException] {
      Resources.Limits(warningPct = 0.99, criticalPct = 0.5) // warn above crit
    }
    // r15: thresholds above 1 silently emptied the CRITICAL band (any
    // usage past the limit is already EXHAUSTED, so crit*limit > limit
    // is unreachable); Infinity evaded the NaN-only check too
    intercept[IllegalArgumentException] {
      Resources.Limits(criticalPct = 1.5) // percent-vs-fraction typo
    }
    intercept[IllegalArgumentException] {
      Resources.Limits(warningPct = 80, criticalPct = 95)
    }
    intercept[IllegalArgumentException] {
      Resources.Limits(criticalPct = Double.PositiveInfinity)
    }
    assert(Resources.Limits(maxAggregationGroups = Some(1L)).maxAggregationGroups.contains(1L))
  }

  test("Usage.observed takes the CURRENT limit — a removed limit must not linger as EXHAUSTED") {
    val u1 = Resources.Usage().observed(500.0, Some(1000.0))
    assert(u1.limit.contains(1000.0))
    // next epoch has no limit: the stale 1000 must not survive, or SHOW
    // RESOURCES would classify 5000 as EXHAUSTED against nothing
    val u2 = u1.observed(5000.0, None)
    assert(u2.limit.isEmpty)
    assert(Resources.level(u2.current, u2.limit, 0.8, 0.95) == "OK")
    assert(u2.peak == 5000.0) // peak still tracks across epochs
  }

  test("threshold classification matches the reference bands (80% warn / 95% crit)") {
    val lim = Some(100.0)
    assert(Resources.level(50.0, lim, 0.8, 0.95) == "OK")
    assert(Resources.level(80.0, lim, 0.8, 0.95) == "WARNING")
    assert(Resources.level(95.0, lim, 0.8, 0.95) == "CRITICAL")
    assert(Resources.level(100.0, lim, 0.8, 0.95) == "CRITICAL") // at the limit, not past it
    assert(Resources.level(101.0, lim, 0.8, 0.95) == "EXHAUSTED")
    assert(Resources.level(1e9, None, 0.8, 0.95) == "OK") // no limit → unlimited
  }

  test("state growth past max_aggregation_groups trips the job to FAILED") {
    val (in, ctx) = memInput()
    in.addData(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0))) // 3 groups > limit 2
    ctx.sql(
      """START JOB capped AS
         SELECT id, SUM(v) AS total FROM live_events GROUP BY id EMIT CHANGES
         WITH ('max_aggregation_groups' = '2')""")
    ctx.jobManager.awaitIdle("capped")
    assert(awaitStatus(ctx, "capped", "FAILED") == "FAILED")
    val st = ctx.sql("SHOW STATUS capped").collect().head
    assert(st.getAs[String]("error").contains("resource exhausted: aggregation_groups"))
    assert(!st.getAs[Boolean]("is_active"))
    // the violating usage is on record: EXHAUSTED level, violation counted
    val row = ctx.sql("SHOW RESOURCES capped").collect()
      .find(_.getAs[String]("resource") == "aggregation_groups").get
    assert(row.getAs[Double]("current") == 3.0)
    assert(row.getAs[Double]("limit") == 2.0)
    assert(row.getAs[String]("level") == "EXHAUSTED")
    assert(row.getAs[Long]("violations") >= 1L)
    // a resource-exhausted job must not blindly RESUME (redeploy required)
    intercept[ParseException] { ctx.sql("RESUME JOB capped") }
  }

  test("a job within its limits keeps running and reports usage under SHOW RESOURCES") {
    val (in, ctx) = memInput()
    in.addData(Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))
    ctx.sql(
      """START JOB roomy AS
         SELECT id, SUM(v) AS total FROM live_events GROUP BY id EMIT CHANGES
         WITH ('max_aggregation_groups' = '100')""")
    ctx.jobManager.awaitIdle("roomy")
    // usage lands via the async listener — poll for the row
    val deadline = System.currentTimeMillis() + 30000
    def rows() = ctx.sql("SHOW RESOURCES roomy").collect()
    while (rows().isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
    val byRes = rows().map(r => r.getAs[String]("resource") -> r).toMap
    val groups = byRes("aggregation_groups")
    assert(groups.getAs[Double]("current") == 3.0)
    assert(groups.getAs[Double]("peak") == 3.0)
    assert(groups.getAs[String]("level") == "OK")
    assert(groups.getAs[Long]("violations") == 0L)
    assert(groups.getAs[Double]("utilization_pct") == 3.0)
    // state memory is tracked too (no limit set → OK, null limit)
    assert(byRes("total_memory").getAs[Double]("current") > 0.0)
    assert(byRes("total_memory").isNullAt(byRes("total_memory").fieldIndex("limit")))
    assert(ctx.sql("SHOW STATUS roomy").collect().head.getAs[String]("status") == "RUNNING")
    ctx.sql("STOP JOB roomy")
  }

  test("open windows count against max_aggregation_groups (state rows = groups + windows)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    implicit val sq: org.apache.spark.sql.classic.SQLContext =
      spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val ctx = new VeloContext(spark, defaultTimeCol = "event_time")
    ctx.registerStream("win_events",
      in.toDF().toDF("uid", "ep").withColumn("event_time", timestamp_seconds(col("ep"))),
      "event_time", "10 minutes")
    // 2 uids × 3 distinct 5-minute windows = 6 open state rows > limit 4
    in.addData(for (u <- Seq(1L, 2L); ep <- Seq(100L, 400L, 700L)) yield (u, ep))
    ctx.sql(
      """START JOB wincap AS
         SELECT uid, COUNT(*) AS n FROM win_events GROUP BY uid
         WINDOW TUMBLING(event_time, INTERVAL '5' MINUTE)
         EMIT CHANGES
         WITH ('max_aggregation_groups' = '4')""")
    ctx.jobManager.awaitIdle("wincap")
    assert(awaitStatus(ctx, "wincap", "FAILED") == "FAILED")
    val row = ctx.sql("SHOW RESOURCES wincap").collect()
      .find(_.getAs[String]("resource") == "aggregation_groups").get
    assert(row.getAs[Double]("current") >= 6.0) // the windows ARE the state rows
    assert(row.getAs[String]("level") == "EXHAUSTED")
  }

  test("max_concurrent_operations rejects admission past the running-job limit") {
    val (in, ctx) = memInput()
    in.addData(Seq((1L, 1.0)))
    ctx.sql("START JOB first AS SELECT id, v FROM live_events")
    val e = intercept[ParseException] {
      ctx.sql("""START JOB second AS SELECT id, v FROM live_events
                 WITH ('max_concurrent_operations' = '1')""")
    }
    assert(e.getMessage.contains("resource exhausted: concurrent_operations"))
    // admission violation is on record under the global job "*"; the
    // row's CURRENT reads live usage (1 running / limit 1 → CRITICAL,
    // not the rejected demand: r12 review made reads refresh from the
    // live RUNNING count so a stale EXHAUSTED cannot linger after jobs
    // stop — the rejection itself is the violations counter and peak)
    val row = ctx.sql("SHOW RESOURCES").collect()
      .find(r => r.getAs[String]("job_name") == "*" &&
        r.getAs[String]("resource") == "concurrent_operations").get
    assert(row.getAs[Long]("violations") == 1L)
    assert(row.getAs[Double]("current") == 1.0)
    assert(row.getAs[Double]("peak") == 2.0) // the rejected demand
    assert(row.getAs[String]("level") == "CRITICAL")
    // after the only job stops, the row decays to 0/1 OK instead of
    // reporting the last attempt's demand forever
    ctx.sql("STOP JOB first")
    val after = ctx.sql("SHOW RESOURCES").collect()
      .find(r => r.getAs[String]("job_name") == "*" &&
        r.getAs[String]("resource") == "concurrent_operations").get
    assert(after.getAs[Double]("current") == 0.0)
    assert(after.getAs[String]("level") == "OK")
    // room for one more (first already stopped above) → admitted
    ctx.sql("""START JOB second AS SELECT id, v FROM live_events
               WITH ('max_concurrent_operations' = '1')""")
    assert(ctx.sql("SHOW STATUS second").collect().head.getAs[String]("status") == "RUNNING")
    ctx.sql("STOP JOB second")
  }

  test("case-variant limit values compare NORMALIZED, not raw (r14 review)") {
    // ' 4096' vs '4096' is the same limit twice — not a conflict
    val l = Resources.Limits.fromProps(
      Map("max_total_memory" -> " 4096", "MAX_TOTAL_MEMORY" -> "4096"), Resources.Limits())
    assert(l.maxTotalMemory.contains(4096L))
    // numeric-equal spellings of a fractional limit agree too
    val f = Resources.Limits.fromProps(
      Map("max_processing_time_per_record" -> "1.5",
          "MAX_PROCESSING_TIME_PER_RECORD" -> "1.50"), Resources.Limits())
    assert(f.maxProcessingTimePerRecordMs.contains(1.5))
    // genuinely different values still conflict
    val e = intercept[VeloSqlParser.ParseException](Resources.Limits.fromProps(
      Map("max_total_memory" -> "4096", "MAX_TOTAL_MEMORY" -> "8192"), Resources.Limits()))
    assert(e.getMessage.contains("conflicting"))
  }
}
