package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    // fail LOUDLY on a delete that didn't happen: the pre-run clear
    // exists so a failing query can't green against its previous run's
    // parquet — a silently-failed delete re-opens exactly that hole
    if (!f.delete() && f.exists())
      sys.error(s"could not delete stale output ${f.getAbsolutePath} — " +
        "a broken query would silently pass against the previous run")
  }
  def main(args: Array[String]): Unit = {
    // a usage line, not a bare MatchError: Verify is the correctness-gate
    // entry point, and a driver-script quoting slip should say what it
    // got wrong
    if (args.length != 2) {
      System.err.println(s"usage: graft.Verify <sfDir> <outDir> (got ${args.length} args)")
      sys.exit(2)
    }
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // the shared session factory: the gate must run under the SAME config
    // (AQE, timezone, nanos handling, registered kernels) as production —
    // a hand-rolled builder here already drifted once
    val spark = graft.api.GraftSession(s"local[$cpus]", cpus.toInt)
    new java.io.File(outDir).mkdirs()
    // optional subset for local iteration (driver sets no filter). A name
    // that matches NO query is a typo, and a typo must not filter the run
    // to zero queries and exit green — an empty-but-consistent manifest
    // reads as a clean gate (r11 review; Bench has the same guard)
    // empty tokens dropped and an all-empty value treated as NO filter:
    // SPARK_GRAFT_QUERIES="" or a trailing comma used to produce
    // Set("") and abort with an unreadable 'unknown queries:' message
    // naming an invisible empty string (r13 review)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    only.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      if (unknown.nonEmpty) {
        System.err.println(
          s"SPARK_GRAFT_QUERIES names unknown queries: ${unknown.toSeq.sorted.mkString(", ")}")
        sys.exit(2)
      }
    }
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      // clear the target FIRST: a query that fails before its write must
      // not leave the previous run's parquet behind — the DuckDB compare
      // would silently PASS on stale data and green a broken query
      deleteRecursively(new java.io.File(s"$outDir/$name"))
      // repartition(1), not coalesce(1): coalesce collapses the WHOLE
      // final stage to one task back to the previous shuffle boundary,
      // serializing the scan+kernels of shuffle-free queries; the
      // explicit shuffle keeps upstream compute parallel and funnels
      // only the small verify output (r13 review)
      try fn(spark, sfDir).repartition(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case scala.util.control.NonFatal(e) =>
        // NonFatal: an OOM/interrupt must kill the gate run nonzero,
        // not read as one query's stderr line in a corrupted JVM
        // followed by a green exit (r13 review)
        System.err.println(s"[verify] $name failed: " +
          Option(e.getMessage).getOrElse(e.getClass.getName))
      }
    }
    // shared escaper (JsonOut): a tab or CR in builder-authored SQL
    // would otherwise make the driver's json.load fail and silently
    // zero the round's correctness.
    val q: String => String = JsonOut.jstr
    // apply the SAME subset filter as the query loop: a restricted run
    // (SPARK_GRAFT_QUERIES) must not emit oracle entries for queries it
    // never wrote, or the checker reports phantom missing-dir failures
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the full attempted-query manifest: without it the checker can only
    // see directories that EXIST, so a rows-only query that failed (its
    // target was cleared above, and nothing was written) simply vanishes
    // from the report and the run exits green
    val attempted = SparkEntry.queries.keys.toSeq.sorted
      .filter(name => only.forall(_.contains(name)))
    Files.writeString(Paths.get(s"$outDir/queries.json"),
      attempted.map(q).mkString("[", ",", "]"))
    spark.stop()
  }
}
