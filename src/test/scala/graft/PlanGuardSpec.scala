package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression guards: the scale-critical plan properties
  * (pushdown, pruning, broadcast strategy, TakeOrdered collapse,
  * partial aggregation) asserted as tests, so a refactor that silently
  * degrades a plan — a lost filter pushdown, a broadcast that became a
  * shuffle join — fails the suite instead of only showing up in bench
  * numbers. Complements the human-readable `graft.PlanAudit` dump.
  */
class PlanGuardSpec extends AnyFunSuite with SparkTestSession {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q1: lineitem scan is column-pruned and the shipdate predicate is pushed") {
    val p = plan("q1_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_comment"), "scan reads columns the query never touches")
    assert(p.contains("partial_"), "aggregation lost its map-side partial step")
  }

  test("q2: ORDER BY + LIMIT collapses to TakeOrderedAndProject (no global sort)") {
    val p = plan("q2_filter_project")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters"), "status/price filters not pushed to the scan")
  }

  test("q4: the customer dim side broadcasts (no shuffle join against the fact)") {
    assert(plan("q4_multi_join").contains("BroadcastHashJoin"))
  }

  test("q40: top-N per group ranks inside the partition (no global sort before filter)") {
    val p = plan("q40_topn_per_group")
    assert(p.contains("RunningWindowFunction") || p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q55: as-of join stays broadcast + rank, never a cartesian") {
    val p = plan("q55_asof_join")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct"), "as-of candidate join degraded to a cartesian")
  }

  test("q63: deterministic sample is a pure scan+filter — no keyed shuffle") {
    val p = plan("q63_stratified_sample")
    // the table loader's round-robin repartition is the ONLY exchange
    // allowed; the sample itself must not introduce a keyed shuffle
    assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
      s"a pure map acquired a keyed shuffle:\n$p")
  }

  test("q64: contamination joins broadcast the benchmark side") {
    val p = plan("q64_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"))
    // per-gram DF must come from a partial-aggregating groupBy, never a
    // window: window functions have no map-side combine, so a hot
    // boilerplate gram would collocate ALL its occurrences on one task
    // BEFORE the maxDf cap could drop it
    assert(!p.contains("RunningWindowFunction") && !p.toLowerCase.contains("window"), p)
  }

  test("q77: duplicated-span DF comes from a splittable groupBy+join, never a window") {
    // AQE skew-split applies to JOINS, not windows: a hot boilerplate
    // shingle under a window would funnel its whole row set through one
    // unsplittable task
    val p = plan("q77_dup_spans")
    assert(!p.contains("RunningWindowFunction") && !p.toLowerCase.contains("window("), p)
    assert(!p.contains("CartesianProduct"))
  }

  test("q68: shard packing sorts within salt partitions only (no global sort)") {
    val p = plan("q68_shard_pack")
    // window sort is per-salt: partial sort with global=false; a global
    // ordered partition would appear as a range-partitioned global sort
    assert(!p.contains("rangepartitioning"), s"global sort detected:\n$p")
  }

  test("q71/q72/q73: codec pipelines stay narrow — decode never shuffles") {
    Seq("q71_image_decode", "q72_audio_decode", "q73_video_frames").foreach { name =>
      val p = plan(name)
      // the loader's round-robin repartition is the only allowed exchange;
      // encode→decode must be chained maps, never a keyed redistribution
      assert(!p.contains("hashpartitioning") && !p.contains("rangepartitioning"),
        s"$name: codec stage acquired a keyed shuffle:\n$p")
      assert(!p.contains("CartesianProduct"), name)
    }
  }

  test("q74/q75: PQ scans never cross-join; re-rank joins are broadcast") {
    Seq("q74_ann_pq", "q75_ann_ivfpq").foreach { name =>
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      // the ADC scan is a narrow mapPartitions over codes; candidate
      // generation must never degenerate to a cartesian/nested-loop of
      // the corpus, and the re-rank pulls vectors via broadcast joins
      assert(!p.contains("CartesianProduct"), s"$name grew a cartesian:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"$name re-rank lost its broadcast:\n$p")
    }
  }

  test("q58: LSH pairs dedup on a SLIM exchange — score computed before it, pair key only") {
    val df = SparkEntry.queries("q58_embed_dedup_lsh")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    // exactly-once EMISSION must come from the pair-key dedup exchange:
    // a "first-matching-band" filter instead is unsound under the bucket
    // cap (a pair whose first band was capped vanishes — r5 review
    // finding), so this exchange is REQUIRED, and it must carry only
    // (id_a, id_b, cos) — cosine runs in the join row, pre-exchange
    assert(p.contains("hashpartitioning(id_a"),
      s"pair-dedup exchange missing — first-band-only emission drops capped-bucket pairs:\n$p")
  }

  test("q48 dialect rows-window emits the same plan shape as hand-written q9") {
    // r8 flagged q48 at ~1.6x q9; the full-plan diff showed IDENTICAL
    // structure (one hash exchange on l_suppkey, one sort, one Window —
    // q48 even carries one window function to q9's two) and min-merged
    // timings at parity (0.71 vs 0.74 s at sf0.1). Lock the shape so a
    // parser change that adds an exchange or a wider projection fails
    // here instead of surfacing as a bench mystery.
    def shape(p: String): (Int, Int, Int) = {
      val lines = p.linesIterator.takeWhile(!_.contains("== Initial Plan ==")).toSeq
      (lines.count(_.contains("Exchange")),
        lines.count(l => l.trim.startsWith("+- Window") || l.trim.startsWith("Window")),
        lines.count(_.contains("FileScan")))
    }
    val p9 = shape(plan("q9_rows_frame"))
    val p48 = shape(plan("q48_sql_rows_window"))
    assert(p48 === p9, s"q48 plan shape $p48 diverged from q9 $p9")
    // and the q48 scan must stay pruned to the 5 referenced columns
    assert(!plan("q48_sql_rows_window").contains("l_comment"),
      "dialect path reads columns the query never touches")
  }

  test("dialect queries follow a dir SWITCH within one session (ctx cache rebuilds)") {
    // temp views are SESSION-global: a (session, dir)-keyed context
    // cache would hand back a context whose views a later dir silently
    // repointed — queries would read the WRONG scale factor's data
    val small = SparkEntry.queries("q45_sql_agg")(spark, "/root/testdata/sf0.001")
      .agg(org.apache.spark.sql.functions.sum("n_items")).collect().head.getLong(0)
    val big = SparkEntry.queries("q45_sql_agg")(spark, "/root/testdata/sf0.01")
      .agg(org.apache.spark.sql.functions.sum("n_items")).collect().head.getLong(0)
    val smallAgain = SparkEntry.queries("q45_sql_agg")(spark, "/root/testdata/sf0.001")
      .agg(org.apache.spark.sql.functions.sum("n_items")).collect().head.getLong(0)
    assert(big > small, s"sf0.01 ($big rows) should dwarf sf0.001 ($small)")
    assert(smallAgain == small, "switching back to sf0.001 must re-read the small dir")
  }
}
