package graft

import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev-only micro-profiler for the streaming one-shot queries: prints
  * every micro-batch's duration breakdown (triggerExecution, addBatch,
  * state-store commit times, sink metrics) so the ~1 s/batch floor can
  * be attributed to a specific phase instead of guessed at.
  */
object StreamProf {
  /** In-JVM stack sampler: every `periodMs` snapshots all threads whose
    * name matches, histograms the deepest graft/spark frame. */
  private class Sampler(nameSubstrs: Seq[String], periodMs: Long) {
    import scala.jdk.CollectionConverters._
    val hist = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val states = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    val deep = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
    private val deepPats: Seq[String] = sys.env.get("SPARK_GRAFT_PROF_DEEP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    @volatile private var running = true
    private val t = new Thread(() => {
      while (running) {
        val all = Thread.getAllStackTraces.asScala
        for ((th, frames) <- all
             if nameSubstrs.exists(th.getName.contains) && frames.nonEmpty) {
          states.computeIfAbsent(s"${th.getState}",
            _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
          // histogram the topmost frame + the topmost org.apache.spark frame
          val top = frames.head
          val sparkFrame = frames.find(f => f.getClassName.startsWith("org.apache.spark")
            || f.getClassName.startsWith("graft")).map(f =>
            s"${f.getClassName}.${f.getMethodName}").getOrElse("-")
          val key = s"${top.getClassName}.${top.getMethodName} | $sparkFrame"
          hist.computeIfAbsent(key,
            _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
          // FULL-stack capture for suspect frames (SPARK_GRAFT_PROF_DEEP:
          // comma-separated substrings): the two-frame histogram above
          // can't attribute e.g. a forkAndExec to the caller that forked
          for (pat <- deepPats if frames.exists(f =>
                 s"${f.getClassName}.${f.getMethodName}".contains(pat))) {
            val stackKey = frames.take(18).map(f =>
              s"${f.getClassName}.${f.getMethodName}").mkString(" <- ")
            deep.computeIfAbsent(s"[$pat] $stackKey",
              _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
          }
        }
        Thread.sleep(periodMs)
      }
    }, "streamprof-sampler")
    t.setDaemon(true)
    t.start()
    def stopAndPrint(label: String, topN: Int = 25): Unit = {
      running = false
      System.err.println(s"[sprof] === sampler $label: thread states ${states.asScala.map { case (k, v) => s"$k=${v.get}" }.mkString(" ")}")
      hist.asScala.toSeq.sortBy(-_._2.get).take(topN).foreach { case (k, v) =>
        System.err.println(f"[sprof]   ${v.get}%6d  $k")
      }
      if (!deep.isEmpty) {
        System.err.println(s"[sprof] === deep stacks ($label):")
        deep.asScala.toSeq.sortBy(-_._2.get).take(12).foreach { case (k, v) =>
          System.err.println(f"[sprof]  deep ${v.get}%5d  $k")
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val which = sys.env.getOrElse("SPARK_GRAFT_PROF_QUERY", "q34_tumbling_stream")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROF_REPS", "3").toInt
    val spark = graft.api.GraftSession(s"local[${SparkEntry.cpusFromEnv()}]",
      SparkEntry.cpusFromEnv())
    // dev-only A/B knob: SPARK_GRAFT_PROF_CONF="k=v;k=v" applied on top
    // of the shipped session so a conf hypothesis can be measured
    // without touching GraftSession
    sys.env.get("SPARK_GRAFT_PROF_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        System.err.println(s"[sprof] conf override $k=$v")
        spark.conf.set(k.trim, v.trim)
      })
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        System.err.println(s"[sprof] started ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        System.err.println(s"[sprof] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=$dur")
        p.stateOperators.foreach { so =>
          System.err.println(s"[sprof]   state op=${so.operatorName} " +
            s"commitTimeMs=${so.commitTimeMs} rowsUpdated=${so.numRowsUpdated} " +
            s"rowsRemoved=${so.numRowsRemoved} rowsTotal=${so.numRowsTotal} " +
            s"memUsed=${so.memoryUsedBytes} custom=${so.customMetrics}")
        }
        Option(p.sink).foreach(s => System.err.println(s"[sprof]   sink=$s"))
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        System.err.println(s"[sprof] terminated ${e.id}")
    })
    // warm
    spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
    val fn = SparkEntry.queries(which)
    var sampler: Sampler = null
    (1 to reps).foreach { i =>
      if (i == 2) sampler = new Sampler(
        Seq("Executor task launch", "stream execution thread", "state-store-maintenance"), 10L)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      System.err.println(f"[sprof] run $i $which wall=${(System.nanoTime() - t0) / 1e9}%.3f s")
      try spark.catalog.clearCache()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (sampler != null) sampler.stopAndPrint(s"$which runs 2..$reps")
    spark.stop()
  }
}
