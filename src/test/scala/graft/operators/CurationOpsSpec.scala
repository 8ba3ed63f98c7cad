package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** The r4 training-pipeline additions: deterministic splitting/sampling,
  * benchmark-contamination overlap, repetition quality gate. All are
  * also oracled end-to-end (q62–q65); these specs pin the properties the
  * oracle can't see: determinism under partition layout, split
  * disjointness, planted contamination recall, and gate behavior on
  * crafted degenerate documents. */
class CurationOpsSpec extends AnyFunSuite with SparkTestSession {

  test("hashSplit: total cover, disjoint, ~requested fractions, layout-independent") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val split = Sampling.hashSplit(ids, "id")
    val counts = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 10000L)                  // total cover, no row lost
    assert(math.abs(counts("train") - 8000L) < 300)      // ~binomial tolerance
    assert(math.abs(counts("val") - 1000L) < 150)
    assert(math.abs(counts("test") - 1000L) < 150)

    // same assignment regardless of partition layout / repeated runs
    val a = split.where(col("split") === "val").select("id").collect().map(_.getLong(0)).sorted
    val b = Sampling.hashSplit(ids.repartition(17), "id")
      .where(col("split") === "val").select("id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
  }

  test("deterministicSample: stable member set, salt changes it, fraction honored") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    val s1 = Sampling.deterministicSample(ids, col("id"), 0.1).collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(ids.repartition(7), col("id"), 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2)                                     // layout-independent
    assert(math.abs(s1.size - 1000) < 150)
    val salted = Sampling.deterministicSample(ids, col("id"), 0.1, salt = "other")
      .collect().map(_.getLong(0)).toSet
    assert(salted != s1)                                 // salt re-draws the sample
    // nested sampling: a 10% sample of a 20% sample ⊂ the 20% sample
    val outer = Sampling.deterministicSample(ids, col("id"), 0.2)
    val inner = Sampling.deterministicSample(outer, col("id"), 0.2, salt = "inner")
      .collect().map(_.getLong(0)).toSet
    assert(inner.subsetOf(Sampling.deterministicSample(ids, col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet))
  }

  test("ngramOverlap: planted contamination found, unrelated doc clean, hot grams capped") {
    import spark.implicits._
    val benchText = "the quick brown fox jumps over the lazy dog near the river bank today"
    val corpus = Seq(
      (1L, benchText + " plus a tail of extra words"),       // contaminated (shares many 3-grams)
      (2L, "completely different content about spark plans and shuffle exchanges"),
      (3L, "boiler plate boiler plate boiler plate boiler plate")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val hits = Contamination.ngramOverlap(corpus, bench, "text", "doc_id",
        k = 3, minShared = 3, maxDf = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(hits.exists { case (d, b, n) => d == 1L && b == 100L && n >= 10 })
    assert(!hits.exists(_._1 == 2L))

    // a gram present in EVERY corpus doc is dropped by the DF cap
    val common = Seq(
      (1L, "alpha beta gamma one"), (2L, "alpha beta gamma two"),
      (3L, "alpha beta gamma three"), (4L, "alpha beta gamma four")
    ).toDF("doc_id", "text")
    val b2 = Seq((99L, "alpha beta gamma five")).toDF("doc_id", "text")
    val capped = Contamination.ngramOverlap(common, b2, "text", "doc_id",
      k = 3, minShared = 1, maxDf = 3L)
    assert(capped.where(col("n_shared") >= 1).collect()
      .forall(_.getLong(2) <= 1)) // "alpha beta gamma" (df=4) never counts
  }

  test("ngramOverlap: a NULL-id corpus doc is still reported (null-safe self-pair filter)") {
    import spark.implicits._
    // plain =!= would evaluate to NULL for the null-id row and where()
    // would silently drop the contaminated pair
    val benchText = "one two three four five six seven eight nine ten"
    val corpus = Seq((Option(1L), benchText), (Option.empty[Long], benchText))
      .toDF("doc_id", "text")
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val hits = Contamination.ngramOverlap(corpus, bench, "text", "doc_id",
      k = 3, minShared = 3).collect()
    assert(hits.exists(_.isNullAt(0)), "null-id contaminated doc dropped from the report")
    assert(hits.exists(r => !r.isNullAt(0) && r.getLong(0) == 1L))
  }

  test("leakageFreeSplit: a near-dup cluster lands in ONE split") {
    import spark.implicits._
    val docs = (0L until 300L).map(i => (i, s"doc $i")).toDF("id", "text")
    // three clusters: {10,11,12}, {20,21}, {100,200} — plus singletons
    val pairs = Seq((10L, 11L), (11L, 12L), (20L, 21L), (100L, 200L)).toDF("id_a", "id_b")
    val split = Sampling.leakageFreeSplit(docs, "id", pairs)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(split.size == 300)
    assert(Set(split(10L), split(11L), split(12L)).size == 1)
    assert(split(20L) == split(21L) && split(100L) == split(200L))
    // cluster members get the REPRESENTATIVE's split, not their own hash
    assert(split(11L) == Sampling.hashSplit(Seq(10L).toDF("id"), "id")
      .collect().head.getAs[String]("split"))
  }

  test("r17 review: non-numeric weight rejects at the call site; leakageFreeSplit exposes the closure knobs") {
    import spark.implicits._
    // a STRING weight bypassed the whole null/NaN/negative sanitization
    // layer pre-fix: legacy-mode cast-to-null sent the row's cumsum null
    // and it fell out of every shard silently
    val badW = Seq((1L, "N/A"), (2L, "300")).toDF("id", "w")
    val e = intercept[IllegalArgumentException](
      Sampling.packIntoShards(badW, "id", "w", budget = 1000L, parallelism = 2))
    assert(e.getMessage.contains("numeric weight"))
    assert(e.getMessage.contains("StringType"))

    // clusterPairs' non-convergence advice says "raise maxIterations" —
    // the knob must be reachable from this entry point. A 6-chain needs
    // ~3 doubling rounds; maxIterations=1 on the FORCED distributed path
    // must surface clusterPairs' failure, and the forced path with ample
    // iterations must agree with the default adaptive path.
    val docs = (0L until 40L).map(i => (i, s"doc $i")).toDF("id", "text")
    val chain = (0L until 6L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    intercept[IllegalStateException](
      Sampling.leakageFreeSplit(docs, "id", chain,
        maxIterations = 1, localThreshold = 0L).collect())
    val forced = Sampling.leakageFreeSplit(docs, "id", chain, localThreshold = 0L)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    val default = Sampling.leakageFreeSplit(docs, "id", chain)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("split")).toMap
    assert(forced == default)
    assert((0L until 6L).map(forced).toSet.size == 1) // the chain is one cluster
  }

  test("packIntoShards: budget bound holds, assignment layout-independent") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (0L until 2000L).map(i => (i, 50L + rnd.nextInt(900))).toDF("id", "w")
    val packed = Sampling.packIntoShards(docs, "id", "w", budget = 5000L, parallelism = 8)
    val stats = packed.groupBy("shard_id").agg(sum("w").as("tot"), max("w").as("mx")).collect()
    // next-fit: a shard's load can exceed the budget only by its last doc
    stats.foreach(r => assert(r.getAs[Long]("tot") <= 5000L + 949L, r.toString))
    assert(stats.length > 2000 * 50 / 5000) // shards actually fill up
    val a = packed.select("id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Sampling.packIntoShards(docs.repartition(13), "id", "w", budget = 5000L, parallelism = 8)
      .select("id", "shard_id").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.sameElements(b)) // same shard for every doc on any layout
  }

  test("packing/splitting guard rails: bad budget, negative fraction, null weight, cluster_id input") {
    import spark.implicits._
    val docs = Seq((1L, 10L), (2L, 20L)).toDF("id", "w")
    // budget 0 → Infinity quotient → ANSI overflow mid-job; reject now
    intercept[IllegalArgumentException](
      Sampling.packIntoShards(docs, "id", "w", budget = 0L, parallelism = 2))
    // a negative fraction sums to 1 but its split would silently get 0 rows
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("id"), Seq("a" -> -0.1, "b" -> 0.6, "c" -> 0.5)))
    // null weight packs as weight 0 instead of a silently-null shard_id
    val withNull = Seq((1L, Some(10L)), (2L, None), (3L, Some(20L)))
      .toDF("id", "w")
    val packed = Sampling.packIntoShards(withNull, "id", "w", budget = 100L, parallelism = 1)
    assert(packed.where(col("shard_id").isNull).count() == 0)
    assert(packed.count() == 3)
    // input already carrying cluster_id must not make the split ambiguous
    val dfc = Seq((1L, 99L), (2L, 99L)).toDF("id", "cluster_id")
    val prs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val out = Sampling.leakageFreeSplit(dfc, "id", prs)
    assert(out.columns.count(_ == "cluster_id") == 1) // user's column intact
    assert(out.select("split").distinct().count() == 1) // pair moves as one unit
    // packIntoShards refuses inputs carrying its working columns instead
    // of silently overwriting (and then deleting) the user's data
    val packClash = Seq((1L, 10L, 0L)).toDF("id", "w", "__graft_pack_salt")
    assert(intercept[IllegalArgumentException](
      Sampling.packIntoShards(packClash, "id", "w", budget = 100L, parallelism = 1))
      .getMessage.contains("working column"))
    // heavy-hitter k is validated before the sketch pass runs
    assert(intercept[IllegalArgumentException](
      Sketches.cmsHeavyHitters(docs, "id", k = 0)).getMessage.contains("k"))
  }

  test("r12 review: sub-resolution splits reject, timestamp keys split TZ-stably, blank docs don't contaminate, garbage stats don't degenerate packing") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // a positive fraction that rounds onto its neighbor's threshold
    // would silently receive ZERO rows — reject like sampleFilter does
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("id"), Seq("train" -> 0.5, "cal" -> 1e-6, "test" -> 0.499999)))
    // a below-resolution LAST split would receive only the ffff clamp sliver
    intercept[IllegalArgumentException](
      Sampling.splitColumn(col("id"), Seq("train" -> 0.5, "test" -> (0.5 - 1e-7), "z" -> 1e-7)))
    // the normal case still passes
    Sampling.splitColumn(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))

    // TIMESTAMP split keys: same physical row, same split, ANY session
    // timezone (string-cast rendering was TZ-dependent — silent
    // train/test migration across engines/sessions)
    val ts = Seq.tabulate(64)(i =>
      (i.toLong, new java.sql.Timestamp(1700000000000L + i * 3600000L)))
      .toDF("rid", "etime")
    val tzConf = "spark.sql.session.timeZone"
    val prior = spark.conf.get(tzConf)
    val utc = try {
      spark.conf.set(tzConf, "UTC")
      Sampling.hashSplit(ts, "etime").select("rid", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    } finally spark.conf.set(tzConf, prior)
    val la = try {
      spark.conf.set(tzConf, "America/Los_Angeles")
      Sampling.hashSplit(ts, "etime").select("rid", "split").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    } finally spark.conf.set(tzConf, prior)
    assert(utc == la, "timestamp-keyed split membership must not depend on session TZ")

    // blank/whitespace-only docs: the "" gram must not pair unrelated
    // blank corpus and bench docs as contamination
    val corpus = Seq((1L, "   "), (2L, ""), (3L, "real shared gram text here"))
      .toDF("doc_id", "text")
    val bench = Seq((50L, " "), (51L, "real shared gram text here")).toDF("doc_id", "text")
    val hits = Contamination.ngramOverlap(corpus, bench, "text", "doc_id",
      k = 3, minShared = 1, maxDf = 100L).collect()
    assert(!hits.exists(r => r.getLong(0) == 1L || r.getLong(0) == 2L),
      s"blank docs must not register as contamination: ${hits.mkString(",")}")
    assert(hits.exists(r => r.getLong(0) == 3L && r.getLong(1) == 51L))

    // an RDD-backed frame reports defaultSizeInBytes (Long.MaxValue):
    // auto-parallelism must fall back to the floor, not the 2^20 cap
    // (which packs ~1 doc per salt stream — a silent no-op packing)
    val rdd = spark.sparkContext.parallelize((0L until 200L).map(i =>
      org.apache.spark.sql.Row(i, 10L)))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("w", org.apache.spark.sql.types.LongType)))
    val rddDf = spark.createDataFrame(rdd, schema)
    assert(rddDf.queryExecution.optimizedPlan.stats.sizeInBytes > (BigInt(1L) << 60),
      "precondition: the RDD-backed frame reports garbage stats")
    val packed = Sampling.packIntoShards(rddDf, "id", "w", budget = 10000L)
    val nShards = packed.select("shard_id").distinct().count()
    assert(nShards <= 32L,
      s"garbage plan stats must fall back to the 32-stream floor, got $nShards shards")
  }

  test("sampling/packing edge guards: null keys, tiny fractions, weights, id types") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // null keys: NOT one shared md5(salt) bucket — split lands in the
    // LAST split (the SQL CASE ELSE, matching the DuckDB oracle's
    // NULL-propagating ||), sample never selects them
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    val splits = withNull.withColumn("s",
      Sampling.splitColumn(col("id"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)))
    assert(splits.where(col("id").isNull).collect().head.getString(1) == "test")
    assert(withNull.where(Sampling.sampleFilter(col("id"), 0.99)).where(col("id").isNull).count() == 0)
    // a fraction below 2^-16 would round to threshold 0000 → silent empty sample
    intercept[IllegalArgumentException](Sampling.sampleFilter(col("id"), 5e-6))
    // negative weights clamp to 0 instead of flooring into the previous
    // salt stream's shard-id space
    val negW = Seq((0L, -500L), (32L, 100L)).toDF("doc_id", "w")
    val shards = Sampling.packIntoShards(negW, "doc_id", "w", budget = 1000L, parallelism = 32)
    assert(shards.where(col("shard_id") < 0).count() == 0)
    // non-integral id and oversized parallelism reject at the call site
    val strId = Seq(("doc-1", 10L)).toDF("doc_id", "w")
    intercept[IllegalArgumentException](
      Sampling.packIntoShards(strId, "doc_id", "w", budget = 1000L, parallelism = 2))
    intercept[IllegalArgumentException](
      Sampling.packIntoShards(negW, "doc_id", "w", budget = 1000L, parallelism = 1 << 21))
  }

  test("packIntoShards: rows tied on idCol pack by ROWS frame, not one shared RANGE cumsum") {
    import spark.implicits._
    // three 600-weight docs with the SAME id under a 1000 budget: the
    // default RANGE frame gives all three one inclusive cumsum (1800),
    // packing all into one overfull shard and skipping shard 0; the
    // explicit ROWS frame gives each row its own running prefix
    // (0/600/1200 exclusive) → shards {0, 0, 1}, next-fit bound intact
    val tied = Seq((7L, 600L), (7L, 600L), (7L, 600L)).toDF("id", "w")
    val shards = Sampling.packIntoShards(tied, "id", "w", budget = 1000L, parallelism = 1)
      .groupBy("shard_id").agg(sum("w").as("tot")).collect()
      .map(r => r.getAs[Long]("shard_id") -> r.getAs[Long]("tot")).toMap
    assert(shards == Map(0L -> 1200L, 1L -> 600L), shards.toString)
  }

  test("packIntoShards auto-sizes its salt-stream count from plan stats") {
    import spark.implicits._
    val docs = (0L until 500L).map(i => (i, 100L)).toDF("id", "w")
    // default parallelism ≤ 0 → derive from Catalyst sizeInBytes: at
    // test scale that floors at defaultParallelism, never a fixed 32
    val packed = Sampling.packIntoShards(docs, "id", "w", budget = 1000L)
    val streams = packed.select((col("shard_id") / 1000000L).cast("long")).distinct().count()
    val expected = spark.sparkContext.defaultParallelism
    assert(streams >= math.min(expected, 500L),
      s"expected ~$expected salt streams, saw $streams")
    // budget bound still holds under auto-sizing
    val tot = packed.groupBy("shard_id").agg(sum("w").as("t")).collect()
    tot.foreach(r => assert(r.getAs[Long]("t") <= 1000L))
  }

  test("repetitionMetrics: degenerate repetition gated out, normal prose kept") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),              // one word
      (2L, "buy now buy now buy now buy now buy now buy now"),      // repeated phrase
      (3L, "a genuinely varied sentence with many distinct words appearing once each")
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetitionMetrics(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Double]("top_word_frac"), r.getAs[Double]("dup_2gram_frac"), r.getAs[Boolean]("keep")))).toMap
    assert(m(1L)._1 == 1.0 && !m(1L)._3)
    assert(m(2L)._2 > 0.5 && !m(2L)._3)                  // "buy now buy" style dup 2-grams
    assert(m(3L)._1 <= 0.2 && m(3L)._2 <= 0.2 && m(3L)._3)
  }

  test("r16 review: the contamination pair join broadcasts the bench side (no sort-merge)") {
    import spark.implicits._
    val docs = (0L until 60L)
      .map(i => (i, s"alpha bravo charlie delta echo foxtrot golf hotel item$i"))
      .toDF("doc_id", "text")
    val bench = docs.where($"doc_id" % 50 === 0) // the q64 shape: a filtered slice
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val prior = spark.conf.get(thr)
    try {
      // auto-broadcast off: only EXPLICIT hints survive. Pre-fix, the
      // final pair join sort-merged exactly when bench is a filtered
      // corpus slice (the size-only estimator passes the Filter's
      // child size through unchanged), shuffle-writing the whole
      // capped pair stream the scaladoc promises never shuffles.
      spark.conf.set(thr, "-1")
      val plan = Contamination.ngramOverlap(docs, bench, "text", "doc_id",
        k = 3, minShared = 1, maxDf = 100L)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("SortMergeJoin"), plan.take(2000))
      assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    } finally spark.conf.set(thr, prior)
  }

  test("r16 review: repetitionMetrics excludes NULL-id docs instead of pooling them") {
    import spark.implicits._
    // two null-id docs that SHARE an n_distinct_2grams value (3 each):
    // the doc_id grouping pooled them into one pseudo-document whose
    // fractions described nothing — and the oracle's doc_id join drops
    // them, so the gate silently diverged the moment a corpus gained a
    // null-id doc. A per-document metric needs identity: excluded.
    val docs = Seq(
      (Option.empty[Long], "a b a b"),
      (Option.empty[Long], "c d c d"),
      (Some(7L), "a genuinely varied sentence with many distinct words")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionMetrics(docs, "text", "doc_id").collect()
    assert(out.length == 1 && out.head.getLong(0) == 7L,
      out.map(_.toString).mkString(","))
  }

  test("unigramNll: exact hand-computed scores, OOV floor, vocab cut determinism") {
    import spark.implicits._
    // corpus word counts: "a" ×4, "b" ×3, "z" ×1 → total 8
    val docs = Seq((1L, "a a a"), (2L, "b b z"), (3L, "a b")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramNll(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_words"), r.getAs[Double]("nll"))).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    assert(out(1L) == ((3L, r4(-math.log(4.0 / 8)))))
    assert(out(2L) == ((3L, r4((-2 * math.log(3.0 / 8) - math.log(1.0 / 8)) / 3))))
    assert(out(3L) == ((2L, r4((-math.log(4.0 / 8) - math.log(3.0 / 8)) / 2))))
    // vocab cut: with vocabSize=1 only "a" stays in-vocab; everything
    // else scores the OOV floor 1/(total+1) = 1/9
    val cut = TextAnalysis.unigramNll(docs, "text", "doc_id", vocabSize = 1)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("nll")).toMap
    assert(cut(1L) == r4(-math.log(4.0 / 8)))
    assert(cut(2L) == r4(-math.log(1.0 / 9))) // all three words OOV
    // rare-word docs score worse than common-word docs
    assert(out(2L)._2 > out(1L)._2)
  }

  test("zero-content docs: word counts are 0 and repetitionMetrics emits no row") {
    import spark.implicits._
    val docs = Seq((1L, ""), (2L, " \t\n "), (3L, "real words here")).toDF("doc_id", "text")
    val counts = docs.select(col("doc_id"), TextAnalysis.tokenCountWs(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("n")).toMap
    // split() yields [""] on empty text — the count must not report the
    // phantom token as a word
    assert(counts == Map(1L -> 0, 2L -> 0, 3L -> 3))
    val q = docs.select(
      col("doc_id") +: TextAnalysis.qualityMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> (r.getAs[Double]("n_words"), r.getAs[Double]("mean_word_len"))).toMap
    assert(q(1L) == ((0.0, 0.0)) && q(2L) == ((0.0, 0.0)))
    val reps = TextAnalysis.repetitionMetrics(docs, "text", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(reps == Set(3L)) // nothing to measure on wordless docs
  }

  test("qualityStruct == qualityMetrics on every metric (single-eval twin parity; r13 review)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The quick brown fox, it JUMPED over the lazy dog!"),
      (2L, ""),
      (3L, " \t spaced\nout\ttext with the and of stop words "),
      (4L, "UPPER.CASE;PUNCT'S \"quoted\" (parens)?!"),
      (5L, "wörds wíth ünïcode and the usual stop words a an of"))
      .toDF("doc_id", "text")
    val names = TextAnalysis.qualityMetricNames
    val viaCols = docs.select(
      col("doc_id") +: TextAnalysis.qualityMetrics(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> names.map(n => r.getAs[Double](n))).toMap
    val viaStruct = docs
      .select(col("doc_id"), TextAnalysis.qualityStruct(col("text")).as("_q"))
      .select(col("doc_id") +: names.map(n => col("_q")(n).as(n)): _*)
      .collect().map(r => r.getLong(0) -> names.map(n => r.getAs[Double](n))).toMap
    assert(viaStruct == viaCols,
      s"struct twin diverged: ${viaStruct.toSeq.diff(viaCols.toSeq)}")
    // the struct names cover exactly the per-column metric names
    assert(TextAnalysis.qualityMetrics(col("text")).map(_._1) == names)
  }

  test("langScore rejects an unsupported language at the call site (r13 review)") {
    val e = intercept[IllegalArgumentException](TextAnalysis.langScore(col("text"), "it"))
    assert(e.getMessage.contains("supported"), e.getMessage)
  }

  test("r15: split-then-sample composition keeps EVERY split populated (q63 salt-domain gate)") {
    import spark.implicits._
    // the composed-pipeline property the r14 domain separation exists
    // for, gated in BOTH orders (sample-then-split is case (1) of the
    // r14 batch test below): with a shared hash preimage the sample
    // would be exactly the lowest-hash slice — i.e. a strict subset of
    // the FIRST split — so sampling a split corpus would silently
    // empty val and test
    val ids = (0L until 10000L).toDF("id")
    val sampledSplits = Sampling.hashSplit(ids, "id")
      .where(Sampling.sampleFilter(col("id"), 0.1))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Seq("train", "val", "test"))
      assert(sampledSplits.getOrElse(s, 0L) > 0,
        s"split '$s' lost every row under a default-salted sample: $sampledSplits")
  }

  test("r15 review: Infinity weights bookkeep as 0; fractions above 1.0 reject") {
    import spark.implicits._
    // +Infinity passed the NaN-only guard: the running sum went Inf for
    // the rest of the stream and floor(Inf/budget) overflowed the
    // salt-stream shard arithmetic
    val infW = Seq((0L, 600.0), (4L, Double.PositiveInfinity), (8L, 600.0), (12L, 600.0))
      .toDF("doc_id", "w")
    val packed = Sampling.packIntoShards(infW, "doc_id", "w", budget = 1000L, parallelism = 1)
    val shards = packed.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exclusive-cumsum starts: 0, 600, 600 (Inf->0), 1200 -> shards 0,0,0,1
    assert(shards(4L) == shards(0L) && shards(12L) != shards(0L),
      s"an Infinity weight must not poison the running sum: $shards")
    assert(packed.where(col("shard_id") < 0).count() == 0)
    // a fraction above 1.0 (target/total arithmetic bug) silently
    // became keep-all — the pipeline trained on the whole corpus
    // believing it sampled
    val e = intercept[IllegalArgumentException](Sampling.sampleFilter(col("doc_id"), 1.7))
    assert(e.getMessage.contains("exceeds"), e.getMessage)
    assert(Seq(Tuple1(1L)).toDF("id")
      .where(Sampling.sampleFilter(col("id"), 1.0)).count() == 1) // keep-all stays legal
  }

  test("r14 review batch: sample domain separation, null-id packing, NaN weights, dup-row contamination") {
    import spark.implicits._
    val ids = (0L until 10000L).toDF("id")
    // (1) default-salted sample composed with default-salted split is
    // NOT degenerate: before domain separation the sample was exactly
    // the lowest-hash slice, entirely inside the FIRST split (empty
    // val/test with no error)
    val sampled = Sampling.deterministicSample(ids, col("id"), 0.1)
    val comp = Sampling.hashSplit(sampled, "id").groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(comp.getOrElse("val", 0L) > 0 && comp.getOrElse("test", 0L) > 0,
      s"sample-then-split must populate every split, got $comp")

    // (2) fraction >= 1.0 still never selects null keys (membership was
    // discontinuous at 1.0)
    val withNull = Seq(Some(1L), Some(2L), None).toDF("id")
    assert(withNull.where(Sampling.sampleFilter(col("id"), 1.0)).count() == 2)
    // (3) negative fractions reject loudly
    intercept[IllegalArgumentException](Sampling.sampleFilter(col("id"), -0.05))

    // (4) null-id rows pack into a DEDICATED salt stream instead of
    // silently carrying shard_id NULL
    val nullIds = Seq((Some(1L), 10L), (None, 10L), (None, 10L)).toDF("doc_id", "w")
    val packedN = Sampling.packIntoShards(nullIds, "doc_id", "w", budget = 1000L, parallelism = 4)
    assert(packedN.where(col("shard_id").isNull).count() == 0,
      "null-id rows must still receive a shard")
    assert(packedN.where(col("doc_id").isNull).select("shard_id").distinct().count() == 1)

    // (5) a NaN weight is bookkept like null (weight 0), not a poison
    // that floors every later doc in the stream into shard 0
    val nanW = Seq((0L, 600.0), (4L, Double.NaN), (8L, 600.0), (12L, 600.0))
      .toDF("doc_id", "w")
    val packedNaN = Sampling.packIntoShards(nanW, "doc_id", "w", budget = 1000L, parallelism = 1)
    val shardsByDoc = packedNaN.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // exclusive-cumsum starts: 0, 600, 600(NaN->0), 1200 -> shards
    // 0,0,0,1. Under the poison, doc 12's start would be NaN -> shard 0.
    assert(shardsByDoc(4L) == shardsByDoc(0L) && shardsByDoc(12L) != shardsByDoc(0L),
      s"NaN weight must not poison the running sum: $shardsByDoc")

    // (6) id-column lookup follows the session resolver, not an exact
    // case-sensitive schema lookup
    val cased = Seq((1L, 10L)).toDF("Doc_Id", "w")
    assert(Sampling.packIntoShards(cased, "doc_id", "w", budget = 100L, parallelism = 2)
      .count() == 1)

    // (7) duplicate corpus rows must not double-count shared grams or
    // document frequency
    val doc = "alpha beta gamma delta epsilon zeta"
    val corpusDup = Seq((1L, doc), (1L, doc), (2L, "unrelated words entirely here"))
      .toDF("doc_id", "text")
    val bench = Seq((50L, doc)).toDF("doc_id", "text")
    val hits = Contamination.ngramOverlap(corpusDup, bench, "text", "doc_id",
      k = 3, minShared = 1, maxDf = 1L).collect()
    // maxDf = 1: with row-counted DF the duplicated rows read df=2 and
    // every gram would be capped away (false negative); with distinct-
    // doc DF the overlap survives, and n_shared counts DISTINCT grams
    val hit1 = hits.filter(r => r.getLong(0) == 1L && r.getLong(1) == 50L)
    assert(hit1.length == 1, s"expected one (1,50) pair, got ${hits.mkString(",")}")
    assert(hit1.head.getLong(2) == 4L, s"4 distinct shared 3-grams, got ${hit1.head.getLong(2)}")

    // (8) null-vs-null ids are NOT assumed to be a self-pair — the
    // contamination must surface (identity is unknowable without ids)
    val corpusN = Seq((Option.empty[Long], doc)).toDF("doc_id", "text")
    val benchN = Seq((Option.empty[Long], doc)).toDF("doc_id", "text")
    val hitsN = Contamination.ngramOverlap(corpusN, benchN, "text", "doc_id",
      k = 3, minShared = 1, maxDf = 10L).collect()
    assert(hitsN.length == 1 && hitsN.head.isNullAt(0) && hitsN.head.isNullAt(1),
      s"null-id contamination must surface, got ${hitsN.mkString(",")}")

    // (9) leakageFreeSplit is TZ-stable on timestamp ids (same rule as
    // hashSplit — the rep/id coalesce goes through stableKey now)
    val tsIds = Seq.tabulate(32)(i =>
      new java.sql.Timestamp(1700000000000L + i * 3600000L)).toDF("etime")
    val noPairs = Seq.empty[(java.sql.Timestamp, java.sql.Timestamp)].toDF("id_a", "id_b")
    val tzConf = "spark.sql.session.timeZone"
    val prior = spark.conf.get(tzConf)
    def splitsUnder(tz: String) = try {
      spark.conf.set(tzConf, tz)
      Sampling.leakageFreeSplit(tsIds, "etime", noPairs)
        .select(col("etime").cast("long"), col("split")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    } finally spark.conf.set(tzConf, prior)
    assert(splitsUnder("UTC") == splitsUnder("America/Los_Angeles"),
      "leakage-free split membership must not depend on session TZ")
  }
}
