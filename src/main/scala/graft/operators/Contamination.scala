package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark-contamination detection: which corpus documents share
  * enough word k-grams with an evaluation/benchmark document that they
  * would leak the benchmark into training — the standard
  * decontamination pass a training-data pipeline runs before a corpus
  * ships (n-gram overlap against eval sets).
  *
  * Scale shape (linear, no O(n²)):
  *  1. explode DISTINCT k-grams on both sides (the shingle kernel
  *     dedups per document);
  *  2. drop k-grams whose corpus document-frequency exceeds `maxDf` —
  *     boilerplate/stopword grams are uninformative for contamination
  *     AND are the only source of hot join keys, so the cap is both a
  *     precision and a skew guard (same role as the LSH bucket cap);
  *  3. join corpus↔benchmark on the k-gram — a shuffle keyed by gram,
  *     candidate pairs only where grams actually collide;
  *  4. count shared grams per (doc, benchmark doc), keep pairs with
  *     ≥ `minShared`.
  *
  * At 100 TB the benchmark side is small (eval sets, thousands of
  * docs) — Catalyst broadcasts it after the explode, so the corpus
  * never shuffles: the join is a broadcast hash join on the gram.
  */
object Contamination {

  /** (doc_id, bench_id, n_shared) for every corpus×benchmark pair
    * sharing ≥ `minShared` distinct word k-grams. Self-pairs (same id
    * in both frames) are excluded.
    *
    * The corpus gram stream is semi-joined against the benchmark's
    * gram set BEFORE anything aggregates: corpus document frequency is
    * only needed for grams that can match the benchmark, so the DF
    * shuffle carries bench-matching grams (tiny — bounded by the eval
    * sets) instead of every gram in a 100 TB corpus. Per-gram DF is
    * unchanged by the restriction (it counts corpus docs per gram). */
  def ngramOverlap(corpus: DataFrame, bench: DataFrame, textCol: String, idCol: String,
                   k: Int = 3, minShared: Int = 3, maxDf: Long = 1000L): DataFrame = {
    // fail at the call site (sibling-operator convention): maxDf = 0
    // would drop EVERY gram and report "no contamination" with no error
    // after paying the full corpus scan; minShared/k <= 0 likewise
    // degenerate silently
    require(k >= 1, s"gram size k must be >= 1, got $k")
    require(minShared >= 1, s"minShared must be >= 1, got $minShared")
    require(maxDf >= 1, s"maxDf must be >= 1, got $maxDf")
    val cg = corpus.select(col(idCol).as("doc_id"),
      explode(Dedup.shingles(col(textCol), k)).as("g"))
      // drop the EMPTY gram: a blank/whitespace-only doc shingles to
      // [""] (the kernel's sub-k whole-text rule over normWords("") =
      // [""]), so unrelated blank corpus and bench docs would pair as
      // "contamination" sharing no actual text — and "" would be the
      // hottest join key until blank-doc count exceeds maxDf
      .where(length(col("g")) > 0)
    val bg = bench.select(col(idCol).as("bench_id"),
      explode(Dedup.shingles(col(textCol), k)).as("g"))
      .where(length(col("g")) > 0)
    // EXPLICIT broadcast of the bench gram set: bench is often passed
    // as a filtered slice of the corpus (q64 does exactly that), and
    // Spark's size-only estimator passes a Filter's child size through
    // unchanged — so the planner would estimate bg at corpus scale and
    // sort-merge this semi-join, shuffle-writing the ENTIRE exploded
    // corpus gram stream before AQE could downgrade it. The hint keeps
    // the documented contract: the corpus never shuffles.
    // Two kernel passes over the corpus by design, NO per-occurrence
    // persist: the bench-matching occurrence stream is Σ_g∈bench DF(g)
    // rows — corpus-proportional for common grams ('of the and' has
    // DF ~10^8 at 10^10 docs), so materializing it to executor storage
    // would write terabytes that the very next operation (the maxDf
    // cap) throws away. Pass 1's first exchange is keyed (g, doc_id)
    // since the r15 rewrite — each key is one (gram, doc) pair, so for
    // a hot gram the shuffle DOES carry its full bench-matching doc
    // stream, hash-SPREAD across reducers by doc_id (never one task);
    // the outer per-gram sum then gets full map-side partials. Size
    // that first exchange for the occurrence stream, not for (gram,
    // count) rows (r16 review: the old comment predated the rewrite).
    // Pass 2 re-shingles filtered to the CAPPED gram set, so the only
    // per-occurrence rows that flow beyond pass 1 are the
    // ≤ maxDf × |bench grams| survivors.
    // The previous window (`count(1).over(partitionBy g)`) was a scale
    // trap: window functions have NO map-side partial aggregation, so
    // every occurrence of a hot boilerplate gram — exactly what maxDf
    // exists to drop — shuffled to ONE task before the cap could filter.
    val benchGrams = bg.select("g").distinct()
    // DF counts DISTINCT corpus docs per gram, not occurrence rows: a
    // corpus accidentally unioned twice (duplicate doc_id rows — a
    // common ingest bug) would double every DF, pushing genuine grams
    // over the maxDf cap (r14 review). With unique ids the two counts
    // are identical.
    // null-id docs count per OCCURRENCE row (the shingle kernel dedups
    // grams per document, so each null-id row is one distinct doc's
    // occurrence): a distinct count alone skips nulls, reading _df = 0
    // for a gram living only in null-id docs — a hot boilerplate gram
    // there would bypass the cap entirely, re-opening the skew blowup
    // the cap exists to prevent (r14 review follow-up; oracle mirrors).
    //
    // r15 plan shape: ONE regular aggregation keyed (g, doc_id)
    // replaces r14's two-phase distinct aggregate (countDistinct +
    // conditional sum planned as an Expand ×2 over the whole
    // bench-matching stream — the round's one real perf regression).
    // The (g, doc_id) groupBy dedups dup-ingest rows (the shingle
    // kernel already dedups grams per doc, so for unique ids it is a
    // semantic no-op) while `_occ` preserves the per-occurrence
    // bookkeeping the null-id group needs; the outer per-gram sum then
    // has full map-side partial aggregation, so a hot gram's DF
    // arrives as per-partition partials, never as raw rows on one
    // reducer.
    val docGrams = cg.join(broadcast(benchGrams), Seq("g"), "left_semi")
      .groupBy("g", "doc_id").agg(count(lit(1)).as("_occ"))
    val keptGrams = docGrams.groupBy("g")
      .agg(sum(when(col("doc_id").isNull, col("_occ")).otherwise(1L)).as("_df"))
      .where(col("_df") <= maxDf).select("g")
    val kept = cg.join(broadcast(keptGrams), Seq("g"))
    // self-pair exclusion requires KNOWN identity: a null-id corpus doc
    // and a null-id bench doc are not provably the same document, so
    // the old null-safe equality (null <=> null = true) silently
    // dropped their pair — missed contamination. Pairs with a null id
    // on either side always SURFACE (the report's contract); note the
    // groupBy necessarily merges all null-id docs into one row — ids
    // are the caller's identity key (r14 review; oracle mirrors).
    //
    // n_shared = DISTINCT shared grams (the scaladoc's contract). Both
    // pair inputs dedup on (gram, id) first — nulls merge, exactly as
    // the pair groupBy merges them — so each shared gram yields exactly
    // ONE row per (doc group, bench group) and a plain count IS the
    // distinct-gram count, with no Expand over the pair stream. Both
    // dedups run on CAPPED streams (≤ maxDf docs per gram; bench is
    // eval-set-sized), so the extra exchange is bounded, not
    // corpus-proportional.
    val ddPairs = kept.dropDuplicates("g", "doc_id")
    val bgd = bg.dropDuplicates("g", "bench_id")
    // EXPLICIT broadcast, same reasoning as benchGrams above: bgd is
    // eval-set-sized by contract, but when bench is a filtered corpus
    // slice the size-only estimator sees it at exploded-corpus scale
    // and sort-merge-joins — shuffle-writing the whole capped corpus
    // pair stream plus sorts on both sides (r16 review)
    ddPairs.join(broadcast(bgd), Seq("g"))
      .where(col("doc_id").isNull || col("bench_id").isNull
        || col("doc_id") =!= col("bench_id"))
      .groupBy("doc_id", "bench_id").agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }
}
