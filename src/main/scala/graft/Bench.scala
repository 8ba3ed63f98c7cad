package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{count, lit}
import java.nio.file.{Files, Paths}

/** Benchmark harness. Runs each `SparkEntry.queries` entry against
  * `SPARK_GRAFT_SF_DIR` and emits ONE JSON line with per-query wall
  * seconds, row counts, and error status.
  *
  * Execution is forced through the `noop` sink (not `count()`): a
  * count() lets Catalyst prune every projection, so map-only queries
  * (lang-id, fingerprint, …) would bench at scan-only cost. The noop
  * sink materializes every output column and discards rows — the honest
  * per-operator cost, with zero write overhead.
  *
  * Output goes to stdout AND to `SPARK_GRAFT_BENCH_OUT` (default
  * `bench_out.json` in the cwd) so the driver can parse it even when
  * sbt log prefixes mangle stdout.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").map(_.trim).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warmup so the first timed query doesn't absorb ~5 s of
    // JIT + first-scan setup cost that isn't the query's own.
    try {
      spark.range(100000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/nation.parquet").write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    case class R(sec: Double, rows: Long, err: Option[String])
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results: Seq[(String, R)] = names.map { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val r =
        try {
          val df = fn(spark, sfDir)
          // SINGLE execution: the noop write forces full column
          // materialization, and an Observation rides the same run to
          // report the row count (a narrow CollectMetrics node — no
          // second execution, no double-counting vs rec/s baselines).
          val obs = org.apache.spark.sql.Observation(s"rows_$name")
          df.observe(obs, count(lit(1)).as("n"))
            .write.format("noop").mode("overwrite").save()
          val rows = obs.get("n") match { case l: Long => l; case x => x.toString.toLong }
          R((System.nanoTime() - t0) / 1e9, rows, None)
        } catch {
          case e: Throwable =>
            R((System.nanoTime() - t0) / 1e9, -1L,
              Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200)))
        } finally {
          // queries must not contaminate each other: unpersist every
          // cached table/DF (CTAS materializations, cluster labels).
          // Temp VIEWS stay — they are metadata the shared VeloContext
          // relies on; only their cached data is contamination.
          try spark.catalog.clearCache() catch { case _: Throwable => () }
        }
      System.err.println(f"[bench] $name%-24s ${r.sec}%8.3f s  rows=${r.rows}${r.err.map(" ERR " + _).getOrElse("")}")
      name -> r
    }

    def jstr(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def sec3(s: Double): String = f"$s%.3f"
    val qs = results.map { case (k, r) => s"${jstr(k)}:${sec3(r.sec)}" }.mkString("{", ",", "}")
    val rowsJson = results.map { case (k, r) => s"${jstr(k)}:${r.rows}" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, R(_, _, Some(e))) => s"${jstr(k)}:${jstr(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2.sec).sum
    // stdout line stays COMPACT (rounded secs, no rows/error detail): the
    // driver only captures the last few KB of stdout, and a long line gets
    // cut mid-object → unparseable. Full detail goes to bench_out.json.
    val stdoutJson =
      s"""{"metric":"total","value":${sec3(total)},"unit":"sec","queries":$qs,"n_errors":${results.count(_._2.err.isDefined)},"sf":${jstr(sfDir)}}"""
    val fullJson =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rows":$rowsJson,"errors":$errs,"n_errors":${results.count(_._2.err.isDefined)},"sf":${jstr(sfDir)}}"""
    println(stdoutJson)
    System.out.flush()
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    Files.writeString(Paths.get(out), fullJson + "\n")
    spark.stop()
  }
}
