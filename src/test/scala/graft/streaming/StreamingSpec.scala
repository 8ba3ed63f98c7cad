package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Streaming semantics the reference defines
  * (docs/sql/watermarks-time-semantics.md, PARSER_GRAMMAR.md EMIT):
  * watermark-based late-record dropping (EMIT FINAL), per-trigger
  * update emission (EMIT CHANGES), and the ROWS WINDOW BUFFER
  * emission sequence.
  */
class StreamingSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  private def runBatches[A](name: String, mode: OutputMode,
                            stream: MemoryStream[A], df: org.apache.spark.sql.DataFrame,
                            batches: Seq[Seq[A]]): org.apache.spark.sql.DataFrame = {
    spark.catalog.dropTempView(name)
    val q = df.writeStream.outputMode(mode).format("memory").queryName(name)
      .trigger(Trigger.ProcessingTime(0)).start()
    batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  test("EMIT FINAL analog: watermark drops late rows, windows emit once closed") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, String, Double)]
    val events = in.toDF().toDF("ep", "k", "v")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val agg = StreamOps.tumblingAgg(events, "ts", "5 minutes", "10 minutes",
      Seq("k"), Seq("count(1)" -> "n"))
    val out = runBatches("wm_final", OutputMode.Append(), in, agg, Seq(
      Seq((100L, "a", 1.0), (200L, "a", 1.0)),   // window [0,300)
      Seq((4000L, "a", 1.0)),                    // watermark → 4000-600=3400; [0,300) closes
      Seq((150L, "a", 9.0)),                     // LATE: below watermark → dropped
      Seq((8000L, "a", 1.0))                     // advance again
    ))
    val w0 = out.where(unix_timestamp(col("window_start")) === 0)
    // the late row at ep=150 must NOT be counted: n stays 2
    assert(w0.collect().map(_.getAs[Long]("n")).toSeq == Seq(2L))
    // each closed window emitted exactly once
    assert(out.groupBy("window_start", "k").count().where(col("count") > 1).isEmpty)
  }

  test("EMIT CHANGES analog: update mode emits refreshed aggregates per trigger") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[String]
    val agg = in.toDF().toDF("k").groupBy("k").agg(count(lit(1)).as("n"))
    val out = runBatches("emit_changes", OutputMode.Update(), in, agg, Seq(
      Seq("x", "x", "y"), Seq("x", "y"), Seq("z")))
    val rows = out.collect().map(r => (r.getString(0), r.getLong(1)))
    // changelog: x appears with n=2 (trigger 1) and n=3 (trigger 2)
    assert(rows.filter(_._1 == "x").map(_._2).sorted.toSeq == Seq(2L, 3L))
    assert(rows.filter(_._1 == "z").map(_._2).toSeq == Seq(1L))
  }

  test("ROWS WINDOW BUFFER emission sequence (reference rows_window semantics)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[StreamOps.BufEvent]
    val out0 = StreamOps.rowsBufferAgg(in.toDS(), n = 3)
    val out = runBatches("rows_buf", OutputMode.Update(), in, out0.toDF(), Seq(
      Seq(StreamOps.BufEvent(1, 1, 101, 10.0), StreamOps.BufEvent(1, 2, 102, 20.0)),
      Seq(StreamOps.BufEvent(1, 3, 103, 30.0), StreamOps.BufEvent(1, 4, 104, 40.0)),
      Seq(StreamOps.BufEvent(2, 1, 201, 5.0))))
    val k1 = out.where(col("key") === 1).orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Int]("buf_n"), r.getAs[Double]("buf_sum")))
    // one emission per arriving record; buffer bounded at 3 (40+30+20 for the 4th)
    assert(k1.toSeq == Seq((101L, 1, 10.0), (102L, 2, 30.0), (103L, 3, 60.0), (104L, 3, 90.0)))
    // state persists ACROSS triggers (103 continues the batch-1 buffer)
    assert(out.where(col("key") === 2).collect().map(_.getAs[Int]("buf_n")).toSeq == Seq(1))
  }

  test("r17 review: publish drops part files the sink manifest does not name (failed-attempt orphans)") {
    // a failed task attempt's part file sits in the staging dir but only
    // the successful attempt enters the FileStreamSink manifest —
    // pre-fix, publish deleted the manifest and renamed the dir, so the
    // published sink listed BOTH files and duplicated the failed
    // attempt's rows
    val staging = java.nio.file.Files.createTempDirectory("graft_orphan").toString
    val meta = new java.io.File(staging, "_spark_metadata")
    assert(meta.mkdirs())
    java.nio.file.Files.writeString(new java.io.File(meta, "0").toPath,
      "v1\n" + s"""{"path":"file://$staging/part-committed.parquet","size":10,"isDir":false,"modificationTime":1,"blockReplication":1,"blockSize":1,"action":"add"}""")
    java.nio.file.Files.writeString(new java.io.File(staging, "part-committed.parquet").toPath, "C")
    java.nio.file.Files.writeString(new java.io.File(staging, "part-orphan.parquet").toPath, "O")
    StreamOps.dropUncommittedOrphans(staging)
    val left = new java.io.File(staging).listFiles().filter(_.isFile).map(_.getName).toSet
    assert(left == Set("part-committed.parquet"), left.mkString(","))
    // an EMPTY manifest deletes nothing (the zero-batch fallback part is
    // written outside the log — it must survive)
    val staging2 = java.nio.file.Files.createTempDirectory("graft_orphan2").toString
    val meta2 = new java.io.File(staging2, "_spark_metadata")
    assert(meta2.mkdirs())
    java.nio.file.Files.writeString(new java.io.File(meta2, "0").toPath, "v1\n")
    java.nio.file.Files.writeString(new java.io.File(staging2, "part-fallback.parquet").toPath, "F")
    StreamOps.dropUncommittedOrphans(staging2)
    assert(new java.io.File(staging2, "part-fallback.parquet").exists())
  }

  test("r17 oracle review: q43 drops null-field events instead of dying in the BufEvent encode") {
    import spark.implicits._
    // ALL FOUR BufEvent fields are primitives — a null in ANY of them
    // used to kill the query (AssertNotNull), not drop the row; the
    // oracle (and the reference's typed-record contract) excludes them
    val dir = java.nio.file.Files.createTempDirectory("graft_q43_nulls").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    Seq[(java.lang.Long, java.sql.Timestamp, java.lang.Long, String, java.lang.Double, String)](
      (1L, ts0, 7L, "click", 1.5, null),                // clean
      (2L, null, 7L, "click", 2.5, null),               // null ts
      (3L, ts0, null, "click", 3.5, null),              // null user_id
      (4L, ts0, 7L, "click", null, null),               // null value
      (null, ts0, 7L, "click", 4.5, null)               // null event_id
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val out = graft.SparkEntry.queries("q43_rows_buffer")(spark, dir).collect()
    // only the clean row survives the primitive-field contract
    assert(out.map(_.getAs[Long]("event_id")).toSeq == Seq(1L), out.mkString(","))
  }

  test("ROWS WINDOW buffers in ord order regardless of input partitioning/arrival order") {
    import spark.implicits._
    // flatMapGroupsWithState gives no within-group order guarantee; feed
    // one key's events REVERSED and spread over many partitions — the
    // buffer must still fold in ord order (its only meaningful order)
    val events = (1 to 6).reverse.map(i =>
      StreamOps.BufEvent(1, ord = i.toLong, id = 100L + i, v = i * 10.0))
    val ds = spark.createDataset(events).repartition(6)
    val out = StreamOps.rowsBufferAgg(ds, n = 3).collect()
      .sortBy(_.event_id).map(e => (e.event_id, e.buf_sum)).toSeq
    // ord order 1..6 → trailing-3 sums 10, 30, 60, 90, 120, 150
    assert(out == Seq((101L, 10.0), (102L, 30.0), (103L, 60.0),
      (104L, 90.0), (105L, 120.0), (106L, 150.0)))
  }

  test("rows buffer recovers from NaN/Infinity once the bad value leaves the ring (r13 review)") {
    import spark.implicits._
    // ord 1: 10, ord 2: NaN, ord 3: +Inf, ord 4..6: finite. With n=3
    // the NaN leaves the ring at ord 5 and the Inf at ord 6 — the old
    // running sum stayed NaN forever (NaN - NaN = NaN persisted in
    // state); the count-bookkept sum must recover exactly
    val events = Seq(
      StreamOps.BufEvent(1, 1L, 101L, 10.0),
      StreamOps.BufEvent(1, 2L, 102L, Double.NaN),
      StreamOps.BufEvent(1, 3L, 103L, Double.PositiveInfinity),
      StreamOps.BufEvent(1, 4L, 104L, 40.0),
      StreamOps.BufEvent(1, 5L, 105L, 50.0),
      StreamOps.BufEvent(1, 6L, 106L, 60.0))
    val out = StreamOps.rowsBufferAgg(spark.createDataset(events), n = 3).collect()
      .sortBy(_.event_id).map(e => (e.event_id, e.buf_sum)).toSeq
    assert(out(0) == ((101L, 10.0)))
    assert(out(1)._2.isNaN)                      // NaN in ring
    assert(out(2)._2.isNaN)                      // NaN dominates Inf
    assert(out(3)._2.isNaN)                      // ring = NaN, Inf, 40
    assert(out(4)._2 == Double.PositiveInfinity) // ring = Inf, 40, 50
    assert(out(5) == ((106L, 150.0)),            // fully recovered
      s"sum must recover once non-finite values leave the ring: $out")
  }

  test("rows buffer recovers from FINITE-sum overflow once the big values leave the ring (r14 review)") {
    import spark.implicits._
    // two finite values whose sum overflows double: the ring sum is
    // honestly +Inf while they cohabit (IEEE's own answer), but the
    // Kahan compensation turns NaN at the overflow — without the
    // rebuild, every later sum (and the state, forever) read NaN even
    // after the big values left the ring
    val big = 1.7e308
    val events = Seq(
      StreamOps.BufEvent(1, 1L, 101L, big),
      StreamOps.BufEvent(1, 2L, 102L, big),
      StreamOps.BufEvent(1, 3L, 103L, 30.0),
      StreamOps.BufEvent(1, 4L, 104L, 40.0),
      StreamOps.BufEvent(1, 5L, 105L, 50.0),
      StreamOps.BufEvent(1, 6L, 106L, 60.0))
    val out = StreamOps.rowsBufferAgg(spark.createDataset(events), n = 3).collect()
      .sortBy(_.event_id).map(e => (e.event_id, e.buf_sum)).toSeq
    assert(out(0) == ((101L, big)))
    assert(out(1)._2 == Double.PositiveInfinity) // big + big overflows
    assert(out(2)._2 == Double.PositiveInfinity) // ring = big, big, 30
    assert(out(3)._2 == big,                     // ring = big, 30, 40 — FINITE again
      s"one big value no longer overflows; the rebuild must restore a finite sum: $out")
    assert(out(4) == ((105L, 120.0)),            // ring = 30, 40, 50 — exact
      s"sum must recover once the overflow leaves the ring: $out")
    assert(out(5) == ((106L, 150.0)), out.toString)
  }

  test("rows buffer magnitude-collapse rebuild: exact sum after a dwarfing value leaves (r14/r15)") {
    import spark.implicits._
    // 1e20 dwarfs the rest: while resident, 1/2/4 are rounded away and
    // the signed sum collapses to 0 when it drops — the rebuild must
    // restore the exact Kahan sum of the survivors. The r15 gate also
    // requires |dropped| to dwarf the ring's ABSOLUTE scale (a
    // symmetric ±x window keeps sum ≈ 0 with no collapse and must NOT
    // pay an O(window) rebuild per drop) — this case crosses both.
    val events = Seq(
      StreamOps.BufEvent(1, 1L, 101L, 1e20),
      StreamOps.BufEvent(1, 2L, 102L, 1.0),
      StreamOps.BufEvent(1, 3L, 103L, 2.0),
      StreamOps.BufEvent(1, 4L, 104L, 4.0),
      StreamOps.BufEvent(1, 5L, 105L, 8.0))
    val out = StreamOps.rowsBufferAgg(spark.createDataset(events), n = 3).collect()
      .sortBy(_.event_id).map(e => (e.event_id, e.buf_sum)).toSeq
    assert(out(0) == ((101L, 1e20)))
    assert(out(3) == ((104L, 7.0)), // ring = 1, 2, 4 — collapse rebuilt
      s"the collapse rebuild must restore the survivors' exact sum: $out")
    assert(out(4) == ((105L, 14.0)), out.toString) // ring = 2, 4, 8
    // symmetric ±x ring: running sum ≈ 0 on every drop, no collapse —
    // sums stay exact with the absolute-scale gate declining the rebuild
    val sym = Seq(1e5, -1e5, 1e5, -1e5, 3.0, 5.0).zipWithIndex.map { case (v, i) =>
      StreamOps.BufEvent(2, i + 1L, 201L + i, v) }
    val symOut = StreamOps.rowsBufferAgg(spark.createDataset(sym), n = 2).collect()
      .sortBy(_.event_id).map(_.buf_sum).toSeq
    assert(symOut == Seq(1e5, 0.0, 0.0, 0.0, -1e5 + 3.0, 8.0), symOut.toString)
  }

  test("rows buffer reserved-name guards are case-insensitive like the resolver (r13 review)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val st = MemoryStream[(Long, Long)]
    val df = st.toDF().toDF("id", "ep").withColumn("ts", timestamp_seconds(col("ep")))
    // withColumn resolves case-insensitively, so 'Window_Start' WOULD
    // be silently replaced — the guard must catch the cased spelling
    intercept[IllegalArgumentException](
      StreamOps.tumblingAgg(df.withColumnRenamed("id", "Window_Start"),
        "ts", "5 minutes", "10 minutes", Seq("Window_Start"), Seq("count(1)" -> "n")))
    intercept[IllegalArgumentException](
      StreamOps.sessionAgg(df, "ts", "30 minutes", "10 minutes",
        Seq("id"), Seq("count(1)" -> "SESSION_END")))
  }

  test("rows buffer rejects a non-positive size instead of emitting NaN averages") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(StreamOps.BufEvent(1, 1L, 1L, 1.0)))
    val e = intercept[IllegalArgumentException](StreamOps.rowsBufferAgg(ds, n = 0))
    assert(e.getMessage.contains("positive"))
  }

  test("ROWS WINDOW EMIT ON BUFFER FULL: warm-up is silent, fewer outputs than inputs") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[StreamOps.BufEvent]
    val out0 = StreamOps.rowsBufferAgg(in.toDS(), n = 3, emitOnFull = true)
    val out = runBatches("rows_buf_full", OutputMode.Update(), in, out0.toDF(), Seq(
      Seq(StreamOps.BufEvent(1, 1, 101, 10.0), StreamOps.BufEvent(1, 2, 102, 20.0)),
      Seq(StreamOps.BufEvent(1, 3, 103, 30.0), StreamOps.BufEvent(1, 4, 104, 40.0))))
    val k1 = out.orderBy("event_id").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Double]("buf_sum")))
    // records 101/102 buffer silently; emission starts once the ring fills
    assert(k1.toSeq == Seq((103L, 60.0), (104L, 90.0)))
  }

  test("streaming exact dedup: duplicates within the watermark horizon dropped across triggers") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Long, String)] // (fingerprint, ep, payload)
    val df = in.toDF().toDF("fp", "ep", "payload")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val deduped = StreamOps.dedupStream(df, "ts", "1 hour", Seq("fp"))
      .select("fp", "ep", "payload")
    spark.catalog.dropTempView("sdd")
    val q = deduped.writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("sdd").trigger(Trigger.ProcessingTime(0)).start()
    in.addData(Seq((11L, 100L, "a"), (22L, 110L, "b"), (11L, 120L, "a-dup")))
    q.processAllAvailable()
    in.addData(Seq((11L, 200L, "a-dup2"), (33L, 210L, "c"))) // dup arrives in a LATER trigger
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sdd").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(rows.map(_._1).sorted.toSeq == Seq(11L, 22L, 33L)) // one survivor per fingerprint
    assert(rows.toMap.apply(11L) == "a")                      // the FIRST arrival wins
  }

  test("stream-stream interval join with watermark-bounded state (FR-085)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val orders = MemoryStream[(Long, Long)]   // (order_id, ep)
    val ships = MemoryStream[(Long, Long)]    // (order_id, ep)
    val o = orders.toDF().toDF("o_id", "o_ep").withColumn("o_ts", timestamp_seconds(col("o_ep")))
    val s2 = ships.toDF().toDF("s_id", "s_ep").withColumn("s_ts", timestamp_seconds(col("s_ep")))
    val joined = StreamOps.intervalJoinStream(o, s2, "o_ts", "s_ts", "10 seconds",
      col("o_id") === col("s_id"), 0L, 3600L)
      .select("o_id", "o_ep", "s_ep")
    spark.catalog.dropTempView("ivj")
    val q = joined.writeStream.outputMode(OutputMode.Append()).format("memory")
      .queryName("ivj").trigger(Trigger.ProcessingTime(0)).start()
    orders.addData(Seq((1L, 100L), (2L, 200L)))
    q.processAllAvailable()
    ships.addData(Seq((1L, 1000L), (2L, 9999L))) // order 2 ships outside the 1h band
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ivj").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(rows.toSet == Set((1L, 1000L)))
  }

  test("interval join rejects an inverted band; windowed aggs reject reserved output names") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val st = MemoryStream[(Long, Long)]
    val df = st.toDF().toDF("id", "ep").withColumn("ts", timestamp_seconds(col("ep")))
    // lower > upper is unsatisfiable — the query would run forever
    // emitting zero rows with no error
    intercept[IllegalArgumentException](
      StreamOps.intervalJoinStream(df, df, "ts", "ts", "10 seconds",
        col("id") === col("id"), 3600L, 0L))
    // a key named window_start would be silently REPLACED post-agg
    intercept[IllegalArgumentException](
      StreamOps.tumblingAgg(df.withColumnRenamed("id", "window_start"),
        "ts", "5 minutes", "10 minutes", Seq("window_start"), Seq("count(1)" -> "n")))
    intercept[IllegalArgumentException](
      StreamOps.sessionAgg(df, "ts", "30 minutes", "10 minutes",
        Seq("id"), Seq("count(1)" -> "session_end")))
  }

  test("runToParquet returns a READABLE dir even when no window ever closes") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val st = MemoryStream[(Long, Long)]
    // one event: the watermark (max ts - 1h grace) never passes any
    // window end, so append mode emits nothing — the sink dir holds
    // only _spark_metadata and a bare read would die with "Unable to
    // infer schema"
    st.addData(Seq((1L, 1000L)))
    val agg = StreamOps.tumblingAgg(
      st.toDF().toDF("id", "ep").withColumn("ts", timestamp_seconds(col("ep"))),
      "ts", "5 minutes", "1 hour", Seq.empty, Seq("count(1)" -> "n"))
    val out = StreamOps.runToParquet(agg, "graft_empty_stream")
    val back = spark.read.parquet(out)
    assert(back.count() == 0)
    assert(back.columns.contains("window_start") && back.columns.contains("n"))
  }

  test("runToParquet is readable even when the source yields ZERO batches") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    // no addData at all: the file sink commits NOTHING and leaves an
    // empty _spark_metadata log — readers then use the metadata index,
    // which cannot see a fallback part written outside the log, so the
    // log must be removed before the fallback write
    val st = MemoryStream[(Long, Long)]
    val agg = StreamOps.tumblingAgg(
      st.toDF().toDF("id", "ep").withColumn("ts", timestamp_seconds(col("ep"))),
      "ts", "5 minutes", "1 hour", Seq.empty, Seq("count(1)" -> "n"))
    val out = StreamOps.runToParquet(agg, "graft_zerobatch_stream")
    val back = spark.read.parquet(out)
    assert(back.count() == 0)
    assert(back.columns.contains("window_start") && back.columns.contains("n"))
  }

  test("changelog input carrying _batch_id and non-positive buffer TTL are rejected") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val st = MemoryStream[(Long, Long)]
    val withTag = st.toDF().toDF("k", "_batch_id")
    assert(intercept[IllegalArgumentException](
      StreamOps.runChangelog(withTag)).getMessage.contains("_batch_id"))
    val ds = spark.emptyDataset[StreamOps.BufEvent]
    assert(intercept[IllegalArgumentException](
      StreamOps.rowsBufferAgg(ds, 3, stateTtlMs = Some(0L))).getMessage.contains("stateTtlMs"))
  }

  test("multi-job: several concurrent streaming queries in one session (reference server model)") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val ins = (1 to 3).map(_ => MemoryStream[(String, Double)])
    val queries = ins.zipWithIndex.map { case (in, ix) =>
      val name = s"multi_job_$ix"
      spark.catalog.dropTempView(name)
      in.toDF().toDF("k", "v").groupBy("k").agg(sum("v").as("total"))
        .writeStream.outputMode(OutputMode.Complete()).format("memory")
        .queryName(name).trigger(Trigger.ProcessingTime(0)).start()
    }
    ins.zipWithIndex.foreach { case (in, ix) => in.addData(Seq(("a", ix + 1.0), ("b", 1.0))) }
    queries.foreach(_.processAllAvailable())
    ins.foreach(in => in.addData(Seq(("a", 10.0))))
    queries.foreach(_.processAllAvailable())
    queries.foreach(_.stop())
    (0 until 3).foreach { ix =>
      val a = spark.table(s"multi_job_$ix").where(col("k") === "a").collect().head.getDouble(1)
      assert(a == ix + 11.0, s"job $ix aggregated independently")
    }
  }

  test("a declared sink survives a FAILED run; a successful run replaces it wholesale") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val dir = java.nio.file.Files.createTempDirectory("graft_swap").toString
    val sink = s"$dir/swap_out"
    // generation 1: a successful run populates the declared sink
    val in1 = MemoryStream[Long]
    in1.addData(Seq(1L, 2L))
    assert(StreamOps.runToParquet(in1.toDF().toDF("v"), sinkPath = Some(sink)) == sink)
    assert(spark.read.parquet(sink).as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    // a run that dies mid-stream leaves the previous contents EXACTLY
    // as they were: the destructive swap is deferred until success
    // (before the staging fix, the sink was wiped BEFORE the run — a
    // failing statement destroyed the old output and wrote nothing)
    val in2 = MemoryStream[Long]
    in2.addData(Seq(-1L))
    val doomed = in2.toDF().toDF("v").selectExpr("v", "assert_true(v > 0) AS chk")
    intercept[Exception](StreamOps.runToParquet(doomed, sinkPath = Some(sink)))
    assert(spark.read.parquet(sink).select("v").as[Long].collect().sorted.toSeq == Seq(1L, 2L),
      "failed run must not touch the declared sink")
    // and the failure cleaned its staging dir — no litter next to the sink
    val litter = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.contains("staging"))
    assert(litter.isEmpty, litter.mkString(","))
    // generation 2 REPLACES generation 1 (batch ids restart per run, so
    // merging generations would corrupt _spark_metadata readers)
    val in3 = MemoryStream[Long]
    in3.addData(Seq(7L))
    StreamOps.runToParquet(in3.toDF().toDF("v"), sinkPath = Some(sink))
    assert(spark.read.parquet(sink).as[Long].collect().toSeq == Seq(7L))
  }

  test("session streaming: merged session windows via session_window") {
    import spark.implicits._
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val in = MemoryStream[(Long, Long)]
    val events = in.toDF().toDF("ep", "user")
      .withColumn("ts", timestamp_seconds(col("ep")))
    val agg = StreamOps.sessionAgg(events, "ts", "30 seconds", "10 seconds",
      Seq("user"), Seq("count(1)" -> "n"))
    val out = runBatches("sess", OutputMode.Append(), in, agg, Seq(
      Seq((100L, 1L), (110L, 1L), (125L, 1L)), // one session (gaps < 30s)
      Seq((500L, 1L)),                         // far ahead → watermark closes session 1
      Seq((10000L, 1L))))                      // closes session 2
    val sessions = out.orderBy("session_start").collect().map(_.getAs[Long]("n"))
    assert(sessions.take(2).toSeq == Seq(3L, 1L))
  }

  test("pre-r13 rows-buffer checkpoint fails LOUD on restart — never silent wrong sums (MIGRATING r13 note)") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    implicit val sq: org.apache.spark.sql.classic.SQLContext = spark.sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext]
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ckpt_oldstate").toString
    try {
      // phase 1: a query with the PRE-r13 state tuple (List[Double],
      // Double) commits state into the checkpoint — the old shape
      // MIGRATING.md documents, run through the same
      // groupByKey/flatMapGroupsWithState pipeline
      val in1 = MemoryStream[StreamOps.BufEvent]
      val oldShaped = in1.toDS().groupByKey(_.k).flatMapGroupsWithState(
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: Long, it: Iterator[StreamOps.BufEvent],
         state: GroupState[(List[Double], Double)]) =>
          val (buf0, _) = state.getOption.getOrElse((List.empty[Double], 0.0))
          var buf = buf0
          val out = it.toSeq.sortBy(e => (e.ord, e.id)).map { e =>
            buf = (buf :+ e.v).takeRight(3)
            StreamOps.BufEmit(key, e.id, buf.size, buf.sum, buf.sum / buf.size)
          }
          state.update((buf, buf.sum))
          out.iterator
      }
      val q1 = oldShaped.toDF().writeStream.outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", ckpt).start()
      in1.addData(StreamOps.BufEvent(1, 1, 101, 10.0))
      q1.processAllAvailable()
      q1.stop()

      // phase 2: the r13-shaped operator restarts on the SAME checkpoint.
      // The new MemoryStream replays the committed offset (one element),
      // then the next batch must hit the state-schema gate — the
      // documented failure mode is a loud state-incompatibility error,
      // NOT a silently-misdecoded buffer emitting wrong sums.
      val in2 = MemoryStream[StreamOps.BufEvent]
      in2.addData(StreamOps.BufEvent(1, 1, 101, 10.0))
      val q2 = StreamOps.rowsBufferAgg(in2.toDS(), n = 3).toDF()
        .writeStream.outputMode(OutputMode.Update())
        .format("noop").option("checkpointLocation", ckpt).start()
      val e = intercept[Exception] {
        in2.addData(StreamOps.BufEvent(1, 2, 102, 20.0))
        q2.processAllAvailable()
        // belt-and-braces: if no exception surfaced through
        // processAllAvailable, the query must at least have died
        q2.awaitTermination(10000)
        assert(q2.exception.isDefined, "restart on an old-shape checkpoint MUST fail")
        throw q2.exception.get
      }
      try q2.stop() catch { case _: Throwable => () }
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
      val all = msgs(e).mkString(" | ").toLowerCase(java.util.Locale.ROOT)
      assert(all.contains("state") && (all.contains("schema") || all.contains("compatib")),
        s"expected a state-schema incompatibility error, got: $all")
    } finally graft.Fs.deleteRecursively(new java.io.File(ckpt))
  }
}
