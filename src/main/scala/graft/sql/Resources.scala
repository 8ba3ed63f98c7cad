package graft.sql

/** Spark-native analog of the reference's resource manager
  * (reference: src/velostream/sql/execution/resource_manager.rs:29 —
  * ResourceManager tracks named resource usage against configurable
  * limits with warning/critical thresholds, violation counters and
  * automatic enforcement).
  *
  * On Spark the executor/driver memory budget is owned by the cluster
  * manager and Spark's own MemoryManager — a library re-implementing
  * that would fight the runtime. What a STREAMING job owner genuinely
  * controls, and what kills jobs at 100 TB, is unbounded STATE growth:
  * an aggregation whose group-key cardinality explodes, a window that
  * never expires. Those are exactly the reference's `aggregation_groups`
  * / `windows_per_key` / `total_memory` limits, and Spark exposes the
  * live values per micro-batch via `StreamingQueryProgress
  * .stateOperators` (numRowsTotal = groups/windows held in the state
  * store, memoryUsedBytes = state memory). So usage feeds from query
  * progress — no extra pass over the data — and enforcement stops the
  * job the moment a batch commits state past its limit.
  *
  * Resource names follow resource_manager.rs:302-312:
  *  - `aggregation_groups`          — state rows (groups + open windows)
  *  - `total_memory`                — state-store bytes
  *  - `processing_time_per_record`  — batch ms / input rows
  *  - `concurrent_operations`       — RUNNING jobs, gated at admission
  *
  * Deviation (documented): the reference configures limits engine-wide
  * (StreamingConfig); here they ride each job's `WITH (...)` properties
  * — on a shared Spark cluster, admission control is the cluster
  * manager's job, and per-job limits are the part a library can enforce
  * deterministically.
  */
object Resources {

  /** Limit set for one job. `None` = unlimited (reference's Option
    * fields, resource_manager.rs:65-86). Thresholds default to the
    * reference's 80% warning / 95% critical (resource_manager.rs:110). */
  final case class Limits(
      maxAggregationGroups: Option[Long] = None,
      maxTotalMemory: Option[Long] = None,
      maxProcessingTimePerRecordMs: Option[Double] = None,
      maxConcurrentOperations: Option[Int] = None,
      warningPct: Double = 0.8,
      criticalPct: Double = 0.95) {

    // the positive/finite invariant must hold for EVERY construction,
    // not just fromProps-parsed ones: a programmatic Limits (e.g.
    // JobManager's defaultLimits parameter) with a zero/negative limit
    // would make enforcement kill a job on its first progress event
    // while level() (which guards l > 0) reports the same row OK
    require(maxAggregationGroups.forall(_ > 0),
      s"maxAggregationGroups must be positive, got $maxAggregationGroups")
    require(maxTotalMemory.forall(_ > 0),
      s"maxTotalMemory must be positive, got $maxTotalMemory")
    require(maxProcessingTimePerRecordMs.forall(v => !v.isNaN && !v.isInfinite && v > 0),
      s"maxProcessingTimePerRecordMs must be positive and finite, got $maxProcessingTimePerRecordMs")
    require(maxConcurrentOperations.forall(_ > 0),
      s"maxConcurrentOperations must be positive, got $maxConcurrentOperations")
    // the UPPER bound matters too: criticalPct = 1.5 (a 0.15 typo) or
    // 95 (a percent-vs-fraction mixup) passed the old check, silently
    // emptying the CRITICAL band — any usage past the limit is already
    // EXHAUSTED, so crit·limit > limit is unreachable and the job jumps
    // from OK straight to a kill with no early-warning tier (Infinity
    // also evaded the NaN-only finiteness check) (r15 review)
    require(!warningPct.isNaN && !criticalPct.isNaN
        && warningPct > 0 && warningPct <= criticalPct && criticalPct <= 1.0,
      s"thresholds must satisfy 0 < warningPct <= criticalPct <= 1, got $warningPct/$criticalPct")

    def limitFor(resource: String): Option[Double] = resource match {
      case "aggregation_groups" => maxAggregationGroups.map(_.toDouble)
      case "total_memory" => maxTotalMemory.map(_.toDouble)
      case "processing_time_per_record" => maxProcessingTimePerRecordMs
      case "concurrent_operations" => maxConcurrentOperations.map(_.toDouble)
      case _ => None
    }

    /** Any monitored (per-progress) limit set → the job needs the
      * progress listener. concurrent_operations is admission-time only. */
    def monitorsProgress: Boolean =
      maxAggregationGroups.isDefined || maxTotalMemory.isDefined ||
        maxProcessingTimePerRecordMs.isDefined
  }

  object Limits {
    /** Parse the reference's limit property names out of a job's
      * `WITH (...)` clause; unset keys inherit `base`. A malformed
      * number is a statement error, not a silently-ignored limit. */
    def fromProps(props: Map[String, String], base: Limits): Limits = {
      // the dialect is case-insensitive everywhere else, so a user
      // writing WITH (MAX_TOTAL_MEMORY = ...) must hit the limit, not
      // silently run unlimited — match keys case-insensitively. Two
      // case variants of the SAME limit key with DIFFERENT values is a
      // statement error, not a map-iteration-order lottery: the user
      // who believes they tightened a limit must not silently run with
      // the loose one.
      val limitKeys = Set("max_aggregation_groups", "max_total_memory",
        "max_processing_time_per_record", "max_concurrent_operations")
      // compare NORMALIZED values, not raw strings: ' 4096' vs '4096'
      // (or '1.5' vs '1.50') is the same limit twice, not a conflict
      // (r14 review). Unparseable values fall back to trimmed-string
      // compare; the per-key parsers below still reject them loudly.
      def normVal(v: String): String =
        try new java.math.BigDecimal(v.trim).stripTrailingZeros.toPlainString
        catch { case _: NumberFormatException => v.trim }
      props.keys.groupBy(_.toLowerCase(java.util.Locale.ROOT))
        .filter { case (lk, ks) =>
          limitKeys(lk) && ks.toSeq.map(k => normVal(props(k))).distinct.length > 1 }
        .foreach { case (lk, ks) =>
          throw new VeloSqlParser.ParseException(
            s"conflicting values for $lk: case variants ${ks.mkString(", ")} disagree") }
      val p = props.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
      // a limit must be a POSITIVE number: zero/negative would make
      // enforcement kill the job on its first progress event while
      // level() (which guards l > 0) reports the resource as OK
      def long(k: String): Option[Long] = p.get(k).map { v =>
        val n =
          try v.trim.toLong
          catch { case _: NumberFormatException =>
            throw new VeloSqlParser.ParseException(s"$k must be an integer, got '$v'") }
        if (n <= 0) throw new VeloSqlParser.ParseException(
          s"$k must be a positive integer, got '$v'")
        n
      }
      def dbl(k: String): Option[Double] = p.get(k).map { v =>
        val n =
          try v.trim.toDouble
          catch { case _: NumberFormatException =>
            throw new VeloSqlParser.ParseException(s"$k must be a number, got '$v'") }
        // isInfinite: 'Infinity' parses as a Double and passes <= 0, but
        // an infinite limit is a nonsense row enforcement can never trip
        if (n.isNaN || n.isInfinite || n <= 0) throw new VeloSqlParser.ParseException(
          s"$k must be a positive finite number, got '$v'")
        n
      }
      Limits(
        maxAggregationGroups = long("max_aggregation_groups").orElse(base.maxAggregationGroups),
        maxTotalMemory = long("max_total_memory").orElse(base.maxTotalMemory),
        maxProcessingTimePerRecordMs =
          dbl("max_processing_time_per_record").orElse(base.maxProcessingTimePerRecordMs),
        maxConcurrentOperations =
          long("max_concurrent_operations").map { n =>
            // Long→Int would silently wrap (2147483648 → -2147483648)
            if (n > Int.MaxValue) throw new VeloSqlParser.ParseException(
              s"max_concurrent_operations must be at most ${Int.MaxValue}, got '$n'")
            n.toInt
          }.orElse(base.maxConcurrentOperations),
        warningPct = base.warningPct,
        criticalPct = base.criticalPct)
    }
  }

  /** Per-resource usage (reference ResourceMetrics: current, peak,
    * violation count — resource_manager.rs:47-62). Carries the limit it
    * was last checked against so a SHOW row is self-contained even for
    * the global admission resource, whose limit rides the admitting
    * job's props. */
  final case class Usage(current: Double = 0.0, peak: Double = 0.0,
                         violations: Long = 0, limit: Option[Double] = None) {
    // the CURRENT limit always wins — carrying a stale previous limit
    // forward when the new epoch has none would make SHOW RESOURCES
    // report EXHAUSTED levels against a limit that no longer exists
    def observed(v: Double, l: Option[Double]): Usage =
      Usage(v, math.max(peak, v), violations, l)
    def violated: Usage = copy(violations = violations + 1)
  }

  /** Threshold classification (resource_manager.rs:276-291): past the
    * limit = EXHAUSTED (the hard-enforcement level), else CRITICAL /
    * WARNING bands, else OK. No limit → OK by definition. */
  def level(current: Double, limit: Option[Double], warn: Double, crit: Double): String =
    limit match {
      case Some(l) if l > 0 =>
        if (current > l) "EXHAUSTED"
        else if (current >= crit * l) "CRITICAL"
        else if (current >= warn * l) "WARNING"
        else "OK"
      case _ => "OK"
    }
}
