package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators mirroring the reference's three join classes
  * (reference: src/velostream/sql/execution/join/, PARSER_GRAMMAR.md
  * "JOIN Clause"):
  *
  *  - stream-table: fact joined to a CTAS-materialized dimension →
  *    broadcast hash join (dim fits in memory; zero shuffle of the fact).
  *  - stream-stream interval join: equi-key + time-band predicate →
  *    shuffled hash/sort-merge on the key; the band predicate is applied
  *    post-match (Spark pushes it into the join condition). In streaming,
  *    the same condition bounds state retention on both sides.
  *  - general inner/left/right/full equi-joins.
  *
  * Scale: only the equi-key reaches the shuffle; time-band stays a
  * residual predicate → no cross product. Dims are always broadcast.
  */
object Joins {

  /** Stream-table join: broadcast the (small) table side.
    *
    * The hint applies only where a dim-side hash build EXISTS: a
    * right/full outer join cannot build its right side (every Spark
    * broadcast join strategy rejects it), so the planner silently
    * dropped the hint and shuffled the fact anyway — the scaladoc's
    * "zero shuffle of the fact" was a lie for those types (r17 review).
    * They still JOIN (the reference grammar allows all four types); the
    * hint is simply omitted, and the shuffle is the honest cost of
    * keeping unmatched dim rows visible across all fact partitions. */
  def streamTable(fact: DataFrame, dim: DataFrame, cond: Column,
                  joinType: String = "inner"): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.{FullOuter, RightOuter}
    org.apache.spark.sql.catalyst.plans.JoinType(joinType) match {
      case RightOuter | FullOuter => fact.join(dim, cond, joinType)
      case _ => fact.join(broadcast(dim), cond, joinType)
    }
  }

  /** Missing-table-data strategies for stream-table enrichment
    * (reference: server/graceful_degradation.rs:16-41 — what happens
    * when a stream record finds no table row):
    *  - FailFast (the reference default): strict consistency — the
    *    first unmatched record raises at execution;
    *  - SkipRecord: drop unenrichable records (inner join);
    *  - EmitWithNulls: keep every stream record, null enrichment
    *    (left outer join);
    *  - UseDefaults: keep every record, fill the named dim columns
    *    from fallback values.
    * The reference's WaitAndRetry is the micro-batch loop itself on
    * Spark: a stream-static join re-reads the static side every
    * trigger, so a late-loaded table IS retried on the next batch —
    * no operator code needed.
    */
  sealed trait MissingDataStrategy
  object MissingDataStrategy {
    case object FailFast extends MissingDataStrategy
    case object SkipRecord extends MissingDataStrategy
    case object EmitWithNulls extends MissingDataStrategy
    final case class UseDefaults(defaults: Map[String, Any]) extends MissingDataStrategy
  }

  /** Stream-table join with a graceful-degradation strategy for stream
    * records the table cannot enrich. Broadcast like [[streamTable]];
    * the strategy only changes join type + a codegen'd projection, so
    * the happy path costs the same as the plain join. */
  def streamTableDegraded(fact: DataFrame, dim: DataFrame, cond: Column,
                          strategy: MissingDataStrategy): DataFrame = {
    import MissingDataStrategy._
    // reserved working column, same convention as the window operators:
    // withColumn would silently REPLACE (then drop) a same-named caller
    // column on the dim side, and a fact-side copy dies later with
    // AMBIGUOUS_REFERENCE far from the call site (r12 review)
    Cols.requireAbsent("streamTableDegraded", Seq("fact" -> fact, "dim" -> dim),
      Seq("__graft_matched"))
    // the ONE marked-dim join shape FailFast and UseDefaults share —
    // the two verbatim copies could drift on a future marker change
    // (r17 review)
    def markedJoin(f: DataFrame, d: DataFrame, c: Column): DataFrame =
      f.join(broadcast(d.withColumn("__graft_matched", lit(true))), c, "left_outer")
    strategy match {
      case SkipRecord => fact.join(broadcast(dim), cond, "inner")
      case EmitWithNulls => fact.join(broadcast(dim), cond, "left_outer")
      case UseDefaults(defaults) =>
        // Cols (the session resolver), not columns.contains: a
        // differently-cased default name resolves fine at runtime and
        // must not be rejected, and a differently-cased fact-side clash
        // dies with AMBIGUOUS_REFERENCE far from the call site (r12
        // review — exactly the escape Cols.scala documents)
        val missing = defaults.keySet.filterNot(Cols.has(dim, _))
        require(missing.isEmpty, s"UseDefaults names non-table columns: ${missing.mkString(", ")}")
        // case-variant DUPLICATE default keys resolve to the same dim
        // column: the foldLeft's withColumn would silently overwrite one
        // default with the other, the winner following Map iteration
        // order — reject like every other resolver-level collision in
        // this family (r15 review)
        val dup = defaults.keySet.toSeq.combinations(2).collectFirst {
          case Seq(a, b) if Cols.sameName(dim, a, b) => s"$a / $b"
        }
        require(dup.isEmpty,
          s"UseDefaults keys resolve to the same column: ${dup.getOrElse("")}")
        // a defaulted name also present on the stream side would make
        // col(c) ambiguous at runtime — reject up front
        val clash = defaults.keySet.filter(Cols.has(fact, _))
        require(clash.isEmpty,
          s"UseDefaults columns also exist on the stream side: ${clash.mkString(", ")}")
        // the default must FIT the dim column's type: when/otherwise
        // coerces to the common type, so a string default on an int
        // column silently widened the enriched column to STRING for
        // EVERY row, matched ones included — a changed output schema
        // far from the call site (r17 review). Up-castable literals
        // (Int default for a LONG column) are cast to the dim type so
        // the output schema is exactly the input dim schema.
        import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
        val badType = defaults.toSeq.map { case (c, v) =>
          (c, Cols.fieldOf(dim, c).dataType, Literal(v).dataType)
        }.collectFirst {
          case (c, dimT, litT) if litT != dimT && !Cast.canUpCast(litT, dimT) =>
            s"$c (table column is $dimT, default is $litT)"
        }
        require(badType.isEmpty,
          s"UseDefaults value type does not fit the table column: ${badType.getOrElse("")}")
        // defaults apply ONLY when the lookup found no table row — a
        // matched row whose dim value is genuinely NULL keeps its NULL
        // (coalesce cannot tell the two apart), so route through the
        // same match marker the FailFast branch uses. ONE projection
        // (withColumns), not a withColumn per default: each fold step
        // stacked a Project plus a full analysis pass (r17 review).
        val joined = markedJoin(fact, dim, cond)
        joined.withColumns(defaults.map { case (c, v) =>
          val dimT = Cols.fieldOf(dim, c).dataType
          c -> when(col("__graft_matched").isNull, lit(v).cast(dimT)).otherwise(col(c))
        }).drop("__graft_matched")
      case FailFast =>
        // left join + a match marker asserted in a FILTER: an unmatched
        // record raises AT EXECUTION with a named error. The assert must
        // live in a predicate — a projected-then-dropped check column
        // would be pruned by the optimizer and never evaluated.
        // assert_true returns null on success, so `.isNull` keeps every
        // surviving row; the matched path is one codegen'd branch.
        markedJoin(fact, dim, cond)
          .where(assert_true(col("__graft_matched").isNotNull,
            lit("stream-table join: missing table data for stream record " +
              "(FailFast strategy; use SkipRecord/EmitWithNulls/UseDefaults to degrade)")).isNull)
          .drop("__graft_matched")
    }
  }

  /** Stream-stream interval join: equi-key plus
    * `right.ts BETWEEN left.ts + lower AND left.ts + upper`.
    */
  def interval(left: DataFrame, right: DataFrame, keyCond: Column,
               leftTs: Column, rightTs: Column,
               lowerSeconds: Long, upperSeconds: Long,
               joinType: String = "inner"): DataFrame = {
    // fail at the call site (sibling-operator convention): an inverted
    // band — swapped arguments intending [-x, +x] — makes the condition
    // unsatisfiable, and a multi-hour join would run to completion and
    // report zero (inner) or all-null (outer) rows with no error
    require(lowerSeconds <= upperSeconds,
      s"interval band is empty: lowerSeconds ($lowerSeconds) > upperSeconds ($upperSeconds)")
    val band = rightTs >= leftTs + expr(s"INTERVAL $lowerSeconds SECOND") &&
      rightTs <= leftTs + expr(s"INTERVAL $upperSeconds SECOND")
    left.join(right, keyCond && band, joinType)
  }

  /** AS-OF join: for each left row, the single LATEST right row with
    * `rightTs ≤ leftTs` (within `toleranceSeconds` lookback) on the same
    * key — the state-lookup pattern of enriching a stream with the most
    * recent reference value (quotes-for-trades, config-as-of).
    *
    * Realization: a time-band equi-join generates the bounded candidate
    * set (tolerance caps state/skew — an unbounded as-of would carry all
    * history), then a per-left-row rank keeps the latest. The rank
    * partitions by a minted per-ROW id (a user id column may carry
    * duplicates or nulls): millions of tiny partitions spread across
    * reducers — no hot task, and one output row per left input row.
    */
  def asOf(left: DataFrame, right: DataFrame, key: String,
           leftTs: String, rightTs: String, toleranceSeconds: Long,
           strict: Boolean = false,
           keepUnmatched: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // a negative tolerance makes the band unsatisfiable (same silent-
    // empty failure the interval() guard rejects) — and so does
    // strict with tolerance 0: rightTs ∈ [leftTs, leftTs) is EMPTY,
    // the whole join would run and return nothing with no error (r12)
    require(toleranceSeconds >= 0,
      s"toleranceSeconds must be >= 0, got $toleranceSeconds")
    require(!(strict && toleranceSeconds == 0),
      "asOf with strict=true and toleranceSeconds=0 is an empty band " +
        "(rightTs >= leftTs AND rightTs < leftTs) — no row can ever match")
    // reserved working columns, same convention as the window operators
    // (the right side can carry them into the joined frame too — r12);
    // __graft-namespaced like sessionize's, so a caller's ad-hoc _rk
    // column no longer collides (r15 review)
    Cols.requireAbsent("asOf", Seq("left" -> left, "right" -> right),
      Seq("__graft_asof_row", "__graft_rk"))
    // Rank partitions by a PER-ROW id minted before the join, not by
    // a user id column: duplicate id values (an append/reload duplicate)
    // or null ids (ONE window partition for all of them) would merge
    // several left rows' candidate sets and row_number()===1 would
    // silently collapse them into one output row — violating the
    // 'for each left row' contract. The minted id only isolates rows
    // (its values never reach the output), so plan-dependent id
    // assignment cannot change the result set.
    val leftRow = left.withColumn("__graft_asof_row", monotonically_increasing_id())
    // SUBQUERY-ALIASED sides (r15 review): the old pre-join df(col)
    // attribute references used AFTER the join (drop(right(key)), the
    // window's orderBy(right(rightTs)), the tie hash) mis-bind when
    // `right` shares lineage with `left` — the self-join enrichment
    // shape this scaladoc advertises. DeduplicateRelations re-aliases
    // the right subtree's exprIds and only the join CONDITION is fixed
    // up by dataset-id tags, so a post-join right(key) reference
    // semantically matched the LEFT attribute (or tripped
    // AMBIGUOUS_SELF_JOIN). Name-qualified references through fresh
    // subquery aliases bind by plan position, never by exprId, and
    // cannot cross sides.
    val L = "__graft_asof_l"; val R = "__graft_asof_r"
    def q(side: String, c: String): Column =
      col(s"$side.`${c.replace("`", "``")}`")
    val upper =
      if (strict) q(R, rightTs) < q(L, leftTs) // self-join enrichment: prior rows only
      else q(R, rightTs) <= q(L, leftTs)
    // keepUnmatched = pandas merge_asof semantics: every left row
    // survives, null-enriched when no right row lands in the tolerance
    // band. Default false preserves the inner behavior q55 oracles.
    val joinType = if (keepUnmatched) "left_outer" else "inner"
    val cand = leftRow.alias(L).join(right.alias(R),
      q(L, key) === q(R, key) && upper &&
        q(R, rightTs) >= q(L, leftTs) - expr(s"INTERVAL $toleranceSeconds SECOND"),
      joinType)
      .drop(q(R, key))
    // Equal-timestamp right rows would otherwise tie in the rank and the
    // kept enrichment row would follow shuffle order — different columns
    // on different reruns/cluster layouts. Break ties by a content hash
    // of the right row so the result is a pure function of the data.
    // Hash only hash-supported types: a map column anywhere in the row
    // would fail analysis (hash over MapType is rejected), and the join
    // must not crash because the reference table carries an attributes
    // map. Rows differing ONLY in unhashable columns still tie — there
    // is nothing deterministic left to order them by.
    // Cols.sameName, not !=: a case-variant key column under the
    // default resolver was dropped by the join but KEPT by this filter,
    // so the tie hash referenced a dropped attribute — an eager
    // AnalysisException far from the cause (r15 review)
    val tieCols = right.schema.fields
      .filter(f => !Cols.sameName(right, f.name, key) && Cols.hashable(f.dataType))
      .map(f => q(R, f.name))
    val rightTieBreak = if (tieCols.nonEmpty) xxhash64(tieCols.toSeq: _*) else lit(0L)
    val w = Window.partitionBy(col("__graft_asof_row"))
      .orderBy(q(R, rightTs).desc_nulls_last, rightTieBreak.asc)
    cand.withColumn("__graft_rk", row_number().over(w))
      .where(col("__graft_rk") === 1).drop("__graft_rk", "__graft_asof_row")
  }

  /** Skew-safe shuffle equi-join for when one join key is hot enough to
    * overwhelm a single reducer and the small side is too big to
    * broadcast: the fact side salts its key into `salt` sub-keys (a
    * deterministic hash of `factSaltSource`, so plans stay
    * deterministic), the other side replicates each row `salt` times.
    * Shuffle load per reducer drops by ~`salt` on the hot key at the
    * cost of replicating the smaller side. (AQE's skew-join splitting
    * handles sort-merge skew adaptively; this is the explicit operator
    * for aggregation-feeding joins and pre-AQE plans.)
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String,
                 factSaltSource: Column, salt: Int = 8,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer are UNSOUND under salting: the replicated side's
    // salt-1 non-matching replicas each emit a null-padded row, and a
    // genuinely unmatched right row appears `salt` times — reject loudly
    require(Set("inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
        "left_semi", "anti", "leftanti", "left_anti")(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"saltedJoin supports inner/left/semi/anti join types; '$joinType' would " +
        "duplicate the replicated side's unmatched rows")
    // salt <= 0 would not fail: pmod(_, 0) yields null salts on the fact
    // side and sequence(0, salt-1) still emits rows, so the join silently
    // returns zero (inner) or all-null-padded (left) rows
    require(salt >= 1, s"salt must be >= 1, got $salt")
    // reserved working column: withColumn would silently REPLACE a
    // same-named caller column with the computed salt, then drop it —
    // the caller's data vanishes from the output (r12 review);
    // __graft-namespaced so a caller's ad-hoc _salt column no longer
    // collides (r15 review)
    Cols.requireAbsent("saltedJoin", Seq("fact" -> fact, "other" -> other),
      Seq("__graft_salt"))
    val saltedFact = fact.withColumn("__graft_salt",
      pmod(xxhash64(factSaltSource), lit(salt)).cast("int"))
    // sequence of int literals already yields IntegerType elements — no
    // cast needed on the replicated side (r15 review: the old re-cast
    // was a dead projection)
    val replicated = other
      .withColumn("__graft_salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(replicated, Seq(key, "__graft_salt"), joinType).drop("__graft_salt")
  }
}
