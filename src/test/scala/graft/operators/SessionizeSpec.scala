package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestSession

/** Property test: the distributed gaps-and-islands sessionization must
  * agree with a trivially-correct single-machine reference on arbitrary
  * event sets (ScalaCheck generators, fixed seed progression).
  */
class SessionizeSpec extends AnyFunSuite with SparkTestSession {

  private val gap = 100L

  /** Brute-force oracle: per key, sort, split on gap, aggregate. */
  private def oracle(events: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.map(_._2).sorted
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e - cur.head <= gap) (e :: cur) :: done else List(e) :: (cur :: done)
      }
      sessions.map(s => (k, s.size.toLong, s.min, s.max))
    }.toSet

  private val eventsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 2000L)
    } yield (k, t))

  test("sliding keeps pre-1970 windows: size==advance equals tumbling on negative epochs") {
    import spark.implicits._
    // events straddling the epoch; ts as real timestamps
    val df = Seq(-400L, -100L, 50L, 350L)
      .map(s => java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s)))
      .toDF("ts").withColumn("k", lit(1))
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("window_start", "n").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = rows(TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")), Seq(count(lit(1)).as("n"))))
    val s = rows(TimeWindows.sliding(df, "ts", 300L, 300L, Seq(col("k")), Seq(count(lit(1)).as("n"))))
    // a >=0 filter would have silently dropped the two pre-1970 events
    assert(t == s)
    assert(t.map(_._1).min == -600L)
    assert(t.size == 4 && t.forall(_._2 == 1L))
  }

  test("window operators fail fast on bad parameters with named messages") {
    import spark.implicits._
    val df = Seq((java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 1L)).toDF("ts", "k")
    val aggs = Seq(count(lit(1)).as("n"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df, "ts", 0L, Seq(col("k")), aggs)).getMessage.contains("size"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", 600L, 0L, Seq(col("k")), aggs)).getMessage.contains("advance"))
    // size 0 / negative multiples pass the modulo check but would build
    // an illegal per-row sequence deep in executor tasks
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", 0L, 300L, Seq(col("k")), aggs)).getMessage.contains("size"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", -600L, 300L, Seq(col("k")), aggs)).getMessage.contains("size"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")), Seq.empty)).getMessage.contains("aggregate"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", 600L, 300L, Seq(col("k")), Seq.empty)).getMessage.contains("aggregate"))
    // r15: a pathological size/advance ratio (a units mistake) explodes
    // every event size/advance-fold BEFORE the groupBy — reject at the
    // call site instead of OOMing executors hours in
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", 604800L, 1L, Seq(col("k")), aggs))
      .getMessage.contains("size/advance"))
    // sessionize refuses inputs carrying its working columns instead of
    // silently overwriting them
    val clash = Seq((1L, 1L)).toDF("ep", "__graft_session_id")
    assert(intercept[IllegalArgumentException](
      TimeWindows.sessionize(clash, "ep", 100L, Seq(col("ep")), Seq.empty, aggs))
      .getMessage.contains("reserved working column"))
  }

  test("reserved window names and empty-keys sessionize are rejected, not silently wrong") {
    import spark.implicits._
    val aggs = Seq(count(lit(1)).as("n"))
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:10"))).toDF("k", "ts")
    // input carrying a reserved output column would be overwritten
    // (tumbling) or destroyed by the explode (sliding) — refuse instead
    val clash = df.withColumn("window_start", lit(0L))
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(clash, "ts", 300L, Seq(col("k")), aggs))
      .getMessage.contains("reserved"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(clash, "ts", 300L, 300L, Seq(col("k")), aggs))
      .getMessage.contains("reserved"))
    // an aggregate aliased to window_end would be silently REPLACED by
    // the boundary value after the whole pass ran
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")),
        Seq(max(col("ts")).as("window_end")))).getMessage.contains("window_end"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sliding(df, "ts", 600L, 300L, Seq(col("k")),
        Seq(max(col("ts")).as("window_end")))).getMessage.contains("window_end"))
    // empty keys = unpartitioned window = whole dataset on one task
    val ev = Seq((1L, 1L)).toDF("id", "ep")
    assert(intercept[IllegalArgumentException](
      TimeWindows.sessionize(ev, "ep", 10L, Seq.empty, Seq(col("id")),
        Seq(count(lit(1)).as("n")))).getMessage.contains("partition key"))
  }

  test("pre-1970 fractional-second events bucket by FLOOR, matching the DuckDB oracle") {
    import spark.implicits._
    // -0.5s epoch: unix_timestamp truncates it to 0 (bucket [0,300)),
    // but the flooring oracle (epoch_ms // 1000) puts it in [-300,0)
    val df = Seq(java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(-500L)))
      .toDF("ts").withColumn("k", lit(1))
    val t = TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")), Seq(count(lit(1)).as("n")))
      .select("window_start", "window_end").collect().head
    assert((t.getLong(0), t.getLong(1)) == (-300L, 0L), t.toString)
    val s = TimeWindows.sliding(df, "ts", 600L, 300L, Seq(col("k")), Seq(count(lit(1)).as("n")))
      .select("window_start").collect().map(_.getLong(0)).sorted.toSeq
    assert(s == Seq(-600L, -300L), s.toString)
  }

  test("a DOUBLE epoch-seconds ts column floors too (cast via TIMESTAMP, not direct truncation; r13 review)") {
    import spark.implicits._
    // cast(DOUBLE AS LONG) truncates toward zero: -0.5 → 0 → bucket
    // [0,300) — one window late. The inner TIMESTAMP cast floors,
    // matching the SQL-translation path's TUMBLE_START guard.
    val df = Seq(-0.5d).toDF("ts").withColumn("k", lit(1))
    val t = TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")), Seq(count(lit(1)).as("n")))
      .select("window_start", "window_end").collect().head
    assert((t.getLong(0), t.getLong(1)) == (-300L, 0L), t.toString)
  }

  test("reserved-name guards match case-insensitively, like withColumn resolution") {
    import spark.implicits._
    val aggs = Seq(count(lit(1)).as("n"))
    val df = Seq(("a", java.sql.Timestamp.valueOf("2024-01-01 00:00:10"))).toDF("k", "ts")
    // withColumn("window_end", ...) resolves Window_End case-insensitively
    // (spark.sql.caseSensitive=false default) and would silently replace
    // the user's aggregate — the guard must match the same way
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df, "ts", 300L, Seq(col("k")),
        Seq(max(col("ts")).as("Window_End")))).getMessage.contains("window_end"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df.withColumn("WINDOW_START", lit(0L)), "ts", 300L,
        Seq(col("k")), aggs)).getMessage.contains("reserved"))
    // a key aliased window_start duplicates the bucket column — clear
    // require instead of a downstream AMBIGUOUS_REFERENCE
    assert(intercept[IllegalArgumentException](
      TimeWindows.tumbling(df, "ts", 300L, Seq(col("k").as("window_start")), aggs))
      .getMessage.contains("window_start"))
    // sessionize: an aggregate aliased to the working name would vanish
    // in the trailing drop (drop removes every resolving column)
    val ev = Seq((1L, 1L)).toDF("id", "ep")
    assert(intercept[IllegalArgumentException](
      TimeWindows.sessionize(ev, "ep", 10L, Seq(col("id")), Seq.empty,
        Seq(count(lit(1)).as("__graft_session_id")))).getMessage.contains("working name"))
    assert(intercept[IllegalArgumentException](
      TimeWindows.sessionize(ev.withColumn("__GRAFT_SESSION_ID", lit(1L)), "ep", 10L,
        Seq(col("id")), Seq.empty, aggs)).getMessage.contains("reserved working column"))
  }

  test("null-epoch rows belong to NO session (never merged into the first one)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // ascending sort puts nulls first; their gap comparison is NULL →
    // otherwise(0), so without the filter they'd silently inflate the
    // key's first session
    val df = Seq(
      (1L, Some(100L), 1L), (1L, Some(200L), 2L),
      (1L, None, 3L), (1L, None, 4L)
    ).toDF("k", "ep", "id")
    val out = TimeWindows.sessionize(df, "ep", 1800L, Seq(col("k")), Seq(col("id")),
      Seq(count(lit(1)).as("n")))
    val rows = out.collect()
    assert(rows.length == 1 && rows.head.getLong(rows.head.fieldIndex("n")) == 2L)
  }

  test("sessionize == brute-force reference on random event sets") {
    import spark.implicits._
    (1 to 15).foreach { i =>
      // duplicates KEPT: identical (user, ts) pairs are a primary
      // sessionize edge (tie-break ordering, rows-vs-distinct counting)
      // and the fold oracle handles them; .distinct would strip the edge
      val events = eventsGen(Gen.Parameters.default, Seed(42L + i)).get
      val df = events.toDF("user", "ep")
      val got = TimeWindows.sessionize(df, "ep", gap, Seq(col("user")), Seq(col("ep")),
        Seq(count(lit(1)).as("n"), min(col("ep")).as("s"), max(col("ep")).as("e")))
        .select("user", "n", "s", "e")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == oracle(events), s"mismatch on seed ${42L + i}")
    }
  }
}
