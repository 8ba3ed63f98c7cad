package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and dataset splitting for training-data
  * pipelines (train/val/test assignment, per-stratum downsampling,
  * held-out carving — the bookkeeping every 100 TB curation run needs
  * before anything reaches a trainer).
  *
  * Everything here is a PURE MAP over a hash of the row's key:
  *  - no RNG state → the same row lands in the same split on any
  *    cluster size, any partitioning, any rerun (unlike
  *    `df.sample`/`randomSplit`, whose output depends on partition
  *    layout);
  *  - no shuffle → linear scan cost at any scale;
  *  - engine-portable → the assignment is `md5(key)` hex-prefix
  *    thresholding, replayable bit-for-bit by any engine with md5
  *    (the DuckDB oracle recomputes the exact member set).
  *
  * The reference has no sampling surface (velostream is a streaming
  * engine); this is part of the beyond-reference training-pipeline
  * layer, alongside dedup/similarity/text-analysis.
  */
object Sampling {

  /** Lowercase-hex threshold on the first 4 md5 hex chars covering
    * `fraction` of the 16-bit prefix space (error < 2⁻¹⁶). */
  private def hexThreshold(fraction: Double): String =
    f"${math.max(0L, math.min(65535L, math.round(fraction * 65536L)))}%04x"

  // NULL keys propagate NULL (not a shared md5(salt) constant —
  // concat_ws SKIPS nulls, which would pile every null-key row into one
  // arbitrary split/sample decision): under the split CASE they fall to
  // the ELSE arm (last split), and sampleFilter never selects them —
  // exactly what the DuckDB oracle's 'graft:'||CAST(id AS VARCHAR)
  // (NULL-propagating ||) computes, so the two engines agree.
  // length-prefixed salt: '<len>:<salt>:<key>' parses unambiguously —
  // a bare ':' delimiter made (salt, key) pairs collide across the
  // boundary (salt 'graft:en' + key '42' == salt 'graft' + key
  // 'en:42'), so two logically distinct strata could draw the SAME
  // member set instead of independent samples. The oracle (splitCase /
  // q63) pins the identical preimage.
  private def hashPrefix(key: Column, salt: String): Column =
    when(key.isNull, lit(null).cast("string"))
      .otherwise(substring(md5(concat_ws(":",
        lit(salt.length.toString), lit(salt), key.cast("string"))), 1, 4))

  /** Split-label column: assigns each key to the named splits by
    * cumulative md5-prefix thresholds. Fractions must sum to ~1; the
    * LAST split takes the remainder (no threshold rounding loss). */
  def splitColumn(key: Column, splits: Seq[(String, Double)], salt: String = "graft"): Column = {
    require(splits.size >= 2, "need at least two splits")
    // a negative fraction can still sum to 1 — its split would silently
    // receive ZERO rows (threshold clamps to 0000) and its neighbor the
    // slack, a wrong dataset split with no error
    splits.foreach { case (name, f) =>
      require(f >= 0.0, s"split '$name' has negative fraction $f") }
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split fractions must sum to 1 (got $total)")
    val h = hashPrefix(key, salt)
    val cum = splits.init.map(_._2).scanLeft(0.0)(_ + _).tail
    // sub-resolution guard, same rule as sampleFilter: a positive
    // fraction whose cumulative threshold ROUNDS onto its neighbor's
    // owns an empty slice of the 2^-16 space and silently receives
    // zero rows — the exact no-error wrong-split the negative-fraction
    // require above documents. Fixed-width lowercase hex compares
    // numerically, so string order is the threshold order.
    var prevTh = "0000"
    splits.init.zip(cum.map(hexThreshold)).foreach { case ((name, f), th) =>
      if (f > 0.0) require(th > prevTh,
        s"split '$name' (fraction $f) rounds to an empty slice at the " +
          "sampler's 2^-16 resolution — it would receive zero rows silently")
      prevTh = th
    }
    // the LAST split is the remainder arm: below resolution it would
    // receive only the ffff clamp sliver (~1/65536 of keys) — rows its
    // declared ~0 fraction never asked for
    require(math.round(splits.last._2 * 65536L) >= 1,
      s"last split '${splits.last._1}' (fraction ${splits.last._2}) is below " +
        "the sampler's 2^-16 resolution")
    val first = when(h < lit(hexThreshold(cum.head)), lit(splits.head._1))
    splits.init.drop(1).zip(cum.drop(1))
      .foldLeft(first) { case (acc, ((name, _), cf)) =>
        acc.when(h < lit(hexThreshold(cf)), lit(name))
      }
      .otherwise(lit(splits.last._1))
  }

  /** TZ-independent hash preimage: a TIMESTAMP key under the plain
    * string cast renders via `spark.sql.session.timeZone`, so the SAME
    * physical row would land in a different split when the session TZ
    * changes (or vs another engine) — silent train/test migration
    * across reruns. Normalized to epoch micros, which every engine
    * renders identically. Dates and all other types cast stably. */
  private def stableKey(df: DataFrame, key: Column): Column =
    df.select(key).schema.head.dataType match {
      case org.apache.spark.sql.types.TimestampType => unix_micros(key)
      case _ => key
    }

  private def fieldOf(df: DataFrame, name: String) = Cols.fieldOf(df, name)

  /** Deterministic train/val/test assignment keyed on `idCol`. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)] =
                  Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                outCol: String = "split", salt: String = "graft"): DataFrame =
    df.withColumn(outCol, splitColumn(stableKey(df, col(idCol)), splits, salt))

  /** Membership predicate for a deterministic `fraction` sample keyed
    * on `key` (stratify by putting the stratum in the key or the salt).
    *
    * DOMAIN SEPARATION: the effective salt is `"sample." + salt`, so a
    * default-salted sample composed with a default-salted split is NOT
    * degenerate — with a shared preimage the 10% sample would be
    * exactly the lowest-hash slice and lie entirely inside the FIRST
    * split (val/test of a sampled corpus receive ZERO rows, silently;
    * r14 review). The q63 oracle pins the 'sample.'-prefixed preimage.
    */
  def sampleFilter(key: Column, fraction: Double, salt: String = "graft"): Column = {
    // a NEGATIVE fraction (a sign bug in target/total arithmetic) would
    // clamp to the 0000 threshold — an always-false predicate after the
    // full scan; splitColumn rejects the equivalent input loudly, so
    // this sibling must too (r14 review). fraction == 0.0 stays legal:
    // it explicitly asks for the empty sample.
    require(fraction >= 0.0, s"negative sample fraction $fraction")
    // the >1 overshoot from the same target/total arithmetic-bug class
    // fails loudly too: silently treating 1.7 as keep-all let a
    // pipeline train on the whole corpus believing it sampled (r15
    // review). fraction == 1.0 stays legal (explicit keep-all).
    require(fraction <= 1.0, s"sample fraction $fraction exceeds 1.0")
    // a fraction below the sampler's 2^-16 resolution rounds to the
    // 0000 threshold — an "everything filtered" sample with no error
    require(fraction == 0.0 || fraction >= 1.0 || math.round(fraction * 65536L) >= 1,
      s"fraction $fraction is below the sampler's 2^-16 resolution " +
        "(smallest non-empty sample is ~1.53e-5); hash on a wider prefix instead")
    // fraction >= 1 still NEVER selects null keys — lit(true) made
    // membership discontinuous at 1.0 vs the null-propagating contract
    // every fraction < 1 (and the oracle) follows (r14 review)
    if (fraction >= 1.0) key.isNotNull
    else hashPrefix(key, "sample." + salt) < lit(hexThreshold(fraction))
  }

  /** Deterministic sample: keeps ~`fraction` of rows, same rows on
    * every rerun and every cluster layout. */
  def deterministicSample(df: DataFrame, keyCol: Column, fraction: Double,
                          salt: String = "graft"): DataFrame =
    df.where(sampleFilter(stableKey(df, keyCol), fraction, salt))

  /** LEAKAGE-FREE train/val/test split: near-duplicate documents must
    * land in the SAME split — hashing each doc independently puts one
    * copy of a near-dup pair in train and its twin in test, leaking
    * training data into evaluation. Given the verified near-dup `pairs`
    * (id_a, id_b — the LSH→verify output), docs are keyed by their
    * connected-component representative (min doc id of the cluster;
    * singletons key by themselves) and the md5-prefix split applies to
    * the REPRESENTATIVE, so a whole near-dup cluster moves as one unit.
    * Same scale shape as `Dedup.clusterPairs` + `hashSplit`. */
  def leakageFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Double)] =
                         Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
                       outCol: String = "split", salt: String = "graft",
                       // clusterPairs pass-throughs (r17 review: its
                       // non-convergence exception says "raise
                       // maxIterations" — this entry point must expose
                       // the knob the advice names; localThreshold rides
                       // along so the distributed closure can be forced
                       // from here like direct clusterPairs callers do)
                       maxIterations: Int = 20,
                       localThreshold: Long = 200000L): DataFrame = {
    // internal name: df plausibly ALREADY carries a cluster_id from an
    // upstream dedup stage — joining another one in would make every
    // col("cluster_id") reference ambiguous and the final drop would
    // remove the user's column
    val repCol = "__graft_split_rep"
    require(!Cols.has(df, repCol), s"input must not carry the $repCol working column")
    val clusters = Dedup.clusterPairs(pairs, maxIterations = maxIterations,
        localThreshold = localThreshold)
      .select(col("id").as(idCol), col("cluster_id").as(repCol))
    val joined = df.join(clusters, Seq(idCol), "left")
    // stableKey, like hashSplit/deterministicSample: a TIMESTAMP id
    // would otherwise hash via its session-TZ string rendering — the
    // exact TZ-dependent split-migration bug r12 fixed for the sibling
    // paths resurfaced here (r14 review)
    joined.withColumn(outCol,
        splitColumn(stableKey(joined, coalesce(col(repCol), col(idCol))), splits, salt))
      .drop(repCol)
  }

  /** Pack documents into training shards with a bounded weight budget
    * per shard (the sharding/sequence-packing stage before a training
    * run: each shard holds consecutive docs until `budget` tokens/chars
    * are exceeded, then the next shard opens).
    *
    * Scale shape: rows are salted into `parallelism` independent
    * streams (`id % parallelism` — engine-portable, so the oracle
    * replays the exact assignment) and packed by a running-sum window
    * WITHIN each stream — `parallelism` bounded sorts instead of one
    * global ordered partition, which would serialize a 100 TB corpus
    * through a single task. A doc opens shard
    * `salt·10⁶ + floor(exclusive_cumsum / budget)`: next-fit packing,
    * deterministic on any cluster layout.
    *
    * `parallelism` ≤ 0 (the default) SIZES ITSELF from the plan's
    * Catalyst statistics: enough salt streams that each window
    * partition sorts ≤ ~1 GiB of input. A fixed stream count would
    * put corpus/N bytes through one sorting task — at 100 TB with
    * N=32 that is a ~3 TB spill-bound straggler. Auto-sizing depends
    * on file statistics, so pin `parallelism` explicitly when the
    * shard assignment must be replayable by another engine (the q68
    * oracle pins 32).
    */
  def packIntoShards(df: DataFrame, idCol: String, weightCol: String,
                     budget: Long, parallelism: Int = 0,
                     outCol: String = "shard_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // budget 0 → Infinity/NaN cumsum quotients → ANSI overflow deep in
    // executor tasks; negative → negative shard ids colliding with the
    // previous salt stream's id space. Reject at the call site.
    require(budget > 0, s"shard weight budget must be positive, got $budget")
    // the 2^20-salt × 2^40-shard namespace invariant (see outCol below)
    // holds only when salts fit 20 bits: a larger explicit parallelism
    // overflows salt*2^40 in a long (ANSI: mid-job ARITHMETIC_OVERFLOW;
    // non-ANSI: silent cross-stream shard merges)
    require(parallelism <= (1 << 20),
      s"parallelism must be <= 2^20 (shard-id namespace bound), got $parallelism")
    // the salt is id % parallelism — pmod over a non-numeric id would
    // be a per-row ANSI cast error (or an all-null salt collapsing the
    // corpus into ONE sort partition, the exact straggler salting
    // prevents). Field lookup follows the SESSION resolver (fieldOf),
    // not df.schema(name)'s always-case-sensitive exact match — a
    // case-mismatched name col() resolves fine would otherwise throw a
    // spurious "field does not exist" here (r14 review).
    val idType = fieldOf(df, idCol).dataType
    require(Cols.isIntegralId(idType),
      s"packIntoShards needs an integral id column, '$idCol' is $idType")
    // the weight must be NUMERIC for the null/NaN/negative sanitization
    // layer below to mean anything: a string weight would bypass it and
    // implicitly cast inside the window sum — under ANSI a corrupt value
    // throws deep in executor tasks AFTER the shuffle; in legacy mode it
    // casts to null, cum goes null, and the row falls out of every shard
    // silently — the exact failure the coalesce below promises to
    // prevent. Reject at the call site like budget/idCol/parallelism
    // (r17 review)
    val weightType = fieldOf(df, weightCol).dataType
    require(weightType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packIntoShards needs a numeric weight column, '$weightCol' is $weightType")
    // graft-prefixed + guarded working columns (the leakageFreeSplit /
    // sessionize convention): bare `_salt`/`_cum` would silently
    // REPLACE same-named input columns (an upstream salting stage's
    // output, say) and then drop() would delete the user's data
    val saltCol = "__graft_pack_salt"
    val cumCol = "__graft_pack_cum"
    for (c <- Seq(saltCol, cumCol))
      require(!Cols.has(df, c), s"input must not carry the $c working column")
    val p =
      if (parallelism > 0) parallelism
      else {
        // auto-size from PLAN STATISTICS ONLY (a constant floor, never
        // defaultParallelism): the salt-stream count determines every
        // shard id, and deriving it from cluster core count would pack
        // the identical corpus into different shard ids on a 16-core
        // vs 64-core cluster — shard ids must be a function of the
        // data, per the determinism contract below
        val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
        val perStream = BigInt(1L << 30) // target ≤ ~1 GiB sorted per salt stream
        // UNUSABLE stats guard: an RDD-backed frame reports
        // defaultSizeInBytes (Long.MaxValue) and size-only join
        // estimation MULTIPLIES child sizes — either way `bytes` is a
        // fiction ≥ exbibytes, and trusting it degenerates to the 2^20
        // cap: ~1 doc per salt stream, floor(cumsum/budget)=0
        // everywhere, packing silently a no-op while the window
        // shuffles into a million partitions. Real inputs at the 100 TB
        // design point are < 2^50; anything ≥ 2^60 is estimator
        // garbage → fall back to the constant floor (callers that know
        // their scale pass `parallelism` explicitly).
        val bySize =
          if (bytes >= (BigInt(1L) << 60)) BigInt(0)
          else ((bytes + perStream - 1) / perStream).min(BigInt(1 << 20))
        math.max(32, bySize.toInt)
      }
    // explicit ROWS frame: the default frame is RANGE, under which rows
    // TIED on idCol share one inclusive cumsum — two 600-weight docs
    // with the same id under a 1000 budget would both read cum=1200 and
    // land (overfull) in the same shard. ROWS gives each row its own
    // running prefix regardless of ties. Weight rides as a SECONDARY
    // order key: under a ROWS frame the running sum of idCol-tied rows
    // depends on their arrival order, so without the tiebreak a retry
    // or re-layout could swap which tied doc crosses a shard boundary.
    // DETERMINISM CONTRACT: shard membership is a pure function of the
    // data when (idCol, weight) pairs are unique per salt stream —
    // idCol unique (the normal primary-key case) suffices; rows fully
    // tied on BOTH keys are mutually interchangeable (shard SIZES stay
    // deterministic, membership among the indistinguishable-by-key
    // rows does not).
    val w = Window.partitionBy(col(saltCol))
      .orderBy(col(idCol), coalesce(col(weightCol), lit(0L)))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null weight = unweighted doc (weighs 0): the window sum SKIPS
    // nulls, but `cum - weight` would go null and the row would fall
    // out of every shard silently — coalesce keeps it packed. Negative
    // weights (corrupt rows) clamp to 0 for the same reason: a negative
    // cumsum prefix floors to shard -1, numerically inside the PREVIOUS
    // salt stream's id space — silent cross-stream merges. NaN (a
    // floating weight column's corruption mode) is bookkept the same
    // way: greatest() propagates NaN (Spark orders NaN greatest), the
    // running sum goes NaN for the REST of the stream, and floor(NaN)=0
    // packs every later doc into one unbounded mega-shard (r14 review)
    val rawW = {
      import org.apache.spark.sql.types.{DoubleType, FloatType}
      fieldOf(df, weightCol).dataType match {
        case DoubleType | FloatType =>
          // non-finite, not just NaN (r15 review): +Infinity passes
          // nanvl/greatest, poisons the running sum for the REST of the
          // stream (floor(Inf/budget) = Long.MaxValue overflows the
          // salt*2^40 + shard arithmetic — ANSI crash, or a legacy wrap
          // into OTHER streams' shard namespaces), and the Inf row
          // itself lands on floor(Inf-Inf = NaN) = shard 0. Corrupt
          // weights bookkeep as 0 like NaN/null/negative.
          val w = col(weightCol).cast("double")
          coalesce(when(w.isNaN || w === Double.PositiveInfinity
            || w === Double.NegativeInfinity, lit(null)).otherwise(w), lit(0.0))
        case _ => coalesce(col(weightCol), lit(0L))
      }
    }
    val weight = greatest(rawW, lit(0L))
    // a NULL id has no salt (pmod propagates null) — those rows would
    // carry shard_id NULL and fall out of every shard silently, the
    // exact failure the null-weight coalesce above exists to prevent.
    // They pack into a DEDICATED stream (index p, one past the real
    // salts — inside the 2^20 namespace bound since p <= 2^20), ordered
    // by the weight tiebreak; all-null ids are fully tied on idCol, so
    // the determinism caveat above applies to them (r14 review).
    df.withColumn(saltCol, coalesce(pmod(col(idCol), lit(p)), lit(p)))
      .withColumn(cumCol, sum(weight).over(w))
      .withColumn(outCol,
        // 2^40 shard ids per salt stream: a 10^6 namespace would wrap
        // into the next stream once a stream packs >10^6 shards (small
        // budgets), silently merging shards across streams. 2^20 salts
        // × 2^40 shards stays inside a long.
        (col(saltCol) * lit(1L << 40) +
          floor((col(cumCol) - weight).cast("double") / budget)).cast("long"))
      .drop(saltCol, cumCol)
  }
}
