package graft

import java.nio.file.{Files, Paths}

/** Measurement aid (optimization rounds): write each declared query's
  * `.explain("formatted")` physical plan to `<outDir>/<name>_<tag>.txt`
  * so plan claims (Exchange counts, join strategies, PushedFilters)
  * are checkable artifacts, per the optimization guide §7.2.
  *
  * Usage: runMain graft.PlanDump <outDir> <tag>
  * Respects SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS / SPARK_GRAFT_QUERIES.
  *
  * NOTE: building a query's DataFrame can itself run Spark jobs for the
  * non-lazy stages some operators need (streaming runs, CTAS, trainer
  * collects) — the dump records the plan of the FINAL frame a bench
  * attempt executes, which for those queries is the post-materialization
  * read, annotated as such by the query's own comments in SparkEntry.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = if (args.length >= 1) args(0) else "plans/r17"
    val tag = if (args.length >= 2) args(1) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = SparkEntry.cpusFromEnv()
    val only = SparkEntry.querySubsetFromEnv()
    val spark = graft.api.GraftSession(s"local[$cpus]", cpus)
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted.filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"), plan)
        System.err.println(s"[plandump] $name -> $outDir/${name}_$tag.txt (${plan.length} chars)")
      } catch {
        case scala.util.control.NonFatal(e) =>
          Files.writeString(Paths.get(outDir, s"${name}_$tag.txt"),
            s"PLAN DUMP FAILED: ${e.getMessage}\n")
          System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
      } finally {
        try spark.catalog.clearCache()
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
    spark.stop()
  }
}
