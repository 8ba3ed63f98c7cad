package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftKernels
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** The native codegen kernels (GraftKernels) must be bit-for-bit
  * equivalent to the interpreted HOF expression trees they replaced —
  * checked on the real test corpus plus crafted edge cases.
  */
class KernelParitySpec extends AnyFunSuite with SparkTestSession {

  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$sf/embeddings.parquet")

  private def edgeDocs = {
    import spark.implicits._
    Seq(
      "",
      " ",
      "a",
      "one two three four five",
      "  Leading  and   trailing   spaces  ",
      "Tabs\tand\nnewlines\r\nmixed  in",
      "ALL CAPS PUNCT!!! ... ??? ",
      "repeated repeated repeated repeated repeated",
      // non-ASCII casings: the kernels must lower through the SAME entry
      // point SQL lower() uses (ICU by default in Spark 4) — JVM
      // default-locale toLowerCase diverges on post-Unicode-13 casings
      // like Vithkuqi U+10570 (the surrogate pair below) and is
      // -Duser.language-sensitive on dotted/dotless I
      "İstanbul STRASSE ΣΊΣΥΦΟΣ Ünïcode",
      "vithkuqi \ud801\udd70 capital letter", // U+10570
      "Faß ESZETT ẞ mixed"
    ).toDF("text").withColumn("doc_id", monotonically_increasing_id())
  }

  test("minhash signature kernel == interpreted HOF tree") {
    for (d <- Seq(docs, edgeDocs)) {
      val k = 3; val numHashes = 16
      val hof = d.select(col("doc_id"),
        Dedup.minhashSignatureHof(Dedup.shinglesHof(col("text"), k), numHashes).as("sig"))
      val ker = d.select(col("doc_id"),
        GraftKernels.minhashSigCol(col("text"), k, numHashes).as("sig"))
      assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
    }
  }

  test("shingles kernel == interpreted HOF tree") {
    for (d <- Seq(docs, edgeDocs)) {
      val hof = d.select(col("doc_id"), Dedup.shinglesHof(col("text"), 3).as("sh"))
      val ker = d.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
    }
  }

  test("k <= 0 rejected at plan build and in the SQL kernel path") {
    // k=0 would silently collapse every doc to the single shingle "" —
    // identical signatures for the whole corpus, no error anywhere
    intercept[IllegalArgumentException](GraftKernels.minhashSigCol(col("text"), 0, 16))
    intercept[IllegalArgumentException](GraftKernels.shinglesCol(col("text"), -1))
    // SQL functions reach the kernel without the Column-builder gate
    GraftKernels.registerSqlFunctions(spark)
    val err = intercept[Exception](
      docs.limit(1).selectExpr("minhash_sig(text, 0, 16)").collect())
    assert(err.getMessage != null)
  }

  test("simhash kernel == interpreted HOF tree") {
    for (d <- Seq(docs, edgeDocs)) {
      val hof = d.select(col("doc_id"), Dedup.simhashHof(col("text")).as("s"))
      val ker = d.select(col("doc_id"), Dedup.simhash(col("text")).as("s"))
      assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
    }
  }

  test("simhashMd5 word hash == DuckDB md5_number_lower (pinned cross-engine constants)") {
    import spark.implicits._
    // a single-word document's simhash IS its word hash (every bit
    // votes alone), so the kernel's md5-lower-64 is directly observable.
    // Constants pinned from DuckDB 1.0 `md5_number_lower(word)` — the
    // exact function the q25 oracle replays; a byte-order or digest-slice
    // regression in md5Lower64 breaks these, and with them the q25 gate.
    val pinned = Seq(
      ("hello", java.lang.Long.parseUnsignedLong("10575884659879408057")),
      ("world", java.lang.Long.parseUnsignedLong("16660491718927469399")),
      ("", java.lang.Long.parseUnsignedLong("9098107892288553193")))
    val got = pinned.map(_._1).toDF("text")
      .select(GraftKernels.simhashMd5Col(col("text")).as("s"))
      .collect().map(_.getLong(0))
    assert(got.toSeq == pinned.map(_._2))
    // multi-word voting still applies on top of the portable hash:
    // identical texts fingerprint identically, so exact duplicates pair
    // at hamming 0 through the replayable pipeline
    val docs = Seq((1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "an entirely different document body")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", replayableHash = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 0)))
  }

  test("fingerprint kernel == interpreted HOF tree") {
    for (d <- Seq(docs, edgeDocs)) {
      val hof = d.select(col("doc_id"), TextAnalysis.fingerprintHof(col("text")).as("fp"))
      val ker = d.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
    }
  }

  test("cosine kernel == interpreted HOF tree on real embeddings") {
    val e = embs.select(col("vec_id"), col("embedding"))
    val pairs = e.crossJoin(
      e.select(col("vec_id").as("vid2"), col("embedding").as("e2")))
      .where(col("vec_id") < col("vid2")).limit(2000)
    val both = pairs.select(
      Similarity.cosineHof(col("embedding"), col("e2")).as("hof"),
      Similarity.cosine(col("embedding"), col("e2")).as("ker"))
    val mismatches = both.where(col("hof") =!= col("ker")).count()
    assert(mismatches === 0)
  }

  test("sign sketch kernel == interpreted HOF tree") {
    val numBits = 48; val dim = 64
    val hof = embs.select(col("vec_id"), Similarity.signSketchHof(col("embedding"), numBits, dim).as("sk"))
    val ker = embs.select(col("vec_id"), Similarity.signSketch(col("embedding"), numBits, dim).as("sk"))
    assert(hof.exceptAll(ker).isEmpty && ker.exceptAll(hof).isEmpty)
  }

  test("cosine pins corrupt rows to 0.0 — including NaN/Inf ELEMENTS") {
    import spark.implicits._
    // a NaN cosine would rank ABOVE every real score (Spark's NaN-is-
    // largest ordering) and pass every `cos >= minCos` near-dup filter,
    // so one corrupt row would "near-dup" its entire bucket
    val bad = Seq(
      (1L, Array(Float.NaN, 1.0f, 2.0f), Array(1.0f, 1.0f, 2.0f)),
      (2L, Array(Float.PositiveInfinity, 1.0f, 2.0f), Array(1.0f, 1.0f, 2.0f)),
      (3L, Array(1.0f, 2.0f, 3.0f), Array(Float.NegativeInfinity, 2.0f, 3.0f)),
      (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 2.0f, 3.0f)),
      (5L, Array[Float](), Array(1.0f, 2.0f, 3.0f))
    ).toDF("id", "a", "b")
    val out = bad.select(Similarity.cosine(col("a"), col("b")).as("cos")).collect()
    assert(out.forall(_.getDouble(0) == 0.0))
  }

  test("null vector ELEMENTS are corrupt rows: cosine 0.0, sketch/cells degrade like empty") {
    // unchecked, UnsafeArrayData reads a null slot as 0.0 (a plausible
    // near-match) and a reused vectorized column vector reads STALE
    // bytes — a nondeterministic score; the defined edge is 0.0/empty
    val df = spark.sql(
      "SELECT array(CAST(NULL AS FLOAT), 1.0F, 2.0F) AS a, array(5.0F, 1.0F, 2.0F) AS b")
    assert(df.select(Similarity.cosine(col("a"), col("b")).as("c"))
      .collect().head.getDouble(0) == 0.0)
    // sketch: identical to the empty-vector sketch (all projections 0)
    val skNull = df.select(GraftKernels.signSketchCol(
      col("a"), Similarity.planes(16, 3), 16, 3, floatElems = true).as("s"))
      .collect().head.getLong(0)
    assert(skNull == 0L)
    // cell assignment: same deterministic pinning as a zero-norm vector
    val cents = Array(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0)
    val cellsNull = df.select(GraftKernels.nearestCentroidsCol(
      col("a"), cents, 3, 3, 2, floatElems = true).as("c"))
      .collect().head.getSeq[Int](0)
    val cellsZero = spark.sql("SELECT array(0.0F, 0.0F, 0.0F) AS a")
      .select(GraftKernels.nearestCentroidsCol(
        col("a"), cents, 3, 3, 2, floatElems = true).as("c"))
      .collect().head.getSeq[Int](0)
    assert(cellsNull == cellsZero)
  }

  test("dim = 0 is rejected at plan build (empty quantizer would silently collapse ANN)") {
    intercept[IllegalArgumentException](
      GraftKernels.nearestCentroidsCol(col("a"), Array[Double](), 4, 0, 2, floatElems = true))
    intercept[IllegalArgumentException](
      GraftKernels.signSketchCol(col("a"), Array[Double](), 16, 0, floatElems = true))
  }

  test("SQL COSINE_SIM coerces array<double> input at analysis instead of misreading bytes") {
    GraftKernels.registerSqlFunctions(spark)
    // array(…) of double literals — without declared inputTypes the
    // kernel would read 4-byte floats on an 8-byte stride: silent garbage
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c").collect().head.getDouble(0)
    assert(math.abs(r - 1.0) < 1e-6)
    val r2 = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(0.0D, 1.0D)) AS c").collect().head.getDouble(0)
    assert(math.abs(r2) < 1e-6)
    // and a bigint shingle k is coerced to int rather than CCE mid-job
    val sh = spark.sql("SELECT shingles('a b c d', CAST(2 AS BIGINT)) AS s")
      .collect().head.getSeq[String](0)
    assert(sh == Seq("a b", "b c", "c d"))
  }

  test("nearestCentroidsCol rejects mis-sized centroids / bad nprobe at plan build") {
    // a quantizer trained at a different dim would AIOOBE inside
    // executor tasks; nprobe=0 would silently return zero candidates
    val flat = Array.fill(4 * 8)(0.5)
    intercept[IllegalArgumentException](
      GraftKernels.nearestCentroidsCol(col("e"), flat, nCentroids = 4, dim = 16, nprobe = 2, floatElems = true))
    intercept[IllegalArgumentException](
      GraftKernels.nearestCentroidsCol(col("e"), flat, nCentroids = 4, dim = 8, nprobe = 0, floatElems = true))
    intercept[IllegalArgumentException](
      GraftKernels.nearestCentroidsCol(col("e"), flat, nCentroids = 0, dim = 8, nprobe = 2, floatElems = true))
  }

  test("regex cache stays bounded past 1024 distinct patterns and keeps caching (r13 advice)") {
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    // flood past the cap with distinct literal patterns
    (0 until 1100).foreach { i =>
      GraftKernels.veloRegexpReplace(u(s"pat$i end"), u(s"pat$i"), u("X"), u(""))
    }
    assert(GraftKernels.regexCacheSize <= 1024,
      s"cache grew past the cap: ${GraftKernels.regexCacheSize}")
    // a NEW pattern arriving at the cap must still produce correct
    // results (and gets cached via evict-one, not compiled per row)
    val before = GraftKernels.regexCacheSize
    val r = GraftKernels.veloRegexpReplace(u("abcabc"), u("b(c)"), u("[$1]"), u("g"))
    assert(r.toString == "a[c]a[c]")
    assert(GraftKernels.regexCacheSize <= 1024 && GraftKernels.regexCacheSize >= before - 1)
    // and the pattern IS resident now — a second call hits the cache
    val r2 = GraftKernels.veloRegexpReplace(u("bc"), u("b(c)"), u("<$1>"), u(""))
    assert(r2.toString == "<c>")
  }

  test("kernels run inside whole-stage codegen (no interpreted fallback)") {
    val plan = docs.select(GraftKernels.simhashCol(col("text"))).queryExecution.executedPlan
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(plan.toString.contains("*(1) Project [static_invoke(graft.functions.GraftKernels.simhash"))
  }

  test("selectTopCells: descending score, ties to lowest index, NaN never preferred (r14 review)") {
    import GraftKernels.selectTopCells
    // plain descending
    assert(selectTopCells(Array(0.1, 0.9, 0.5), 2).toSeq == Seq(1, 2))
    // ties break toward the LOWEST index
    assert(selectTopCells(Array(0.5, 0.9, 0.9, 0.5), 3).toSeq == Seq(1, 2, 0))
    // n past the score count clamps
    assert(selectTopCells(Array(0.3, 0.7), 5).toSeq == Seq(1, 0))
    // NaN is never preferred over a real score; an all-NaN row still
    // selects deterministically (0..n-1), matching the kernel's -inf pin
    assert(selectTopCells(Array(Double.NaN, 0.1, Double.NaN), 2).toSeq == Seq(1, 0))
    assert(selectTopCells(Array(Double.NaN, Double.NaN), 2).toSeq == Seq(0, 1))
  }

  test("hammingBitsCol rejects length-mismatched chunk arrays (r14 advice)") {
    import spark.implicits._
    val df = Seq((Array(1L, 2L), Array(1L))).toDF("a", "b")
    val e = intercept[Exception](
      df.select(GraftKernels.hammingBitsCol(col("a"), col("b"))).collect())
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("length mismatch")), messages(e).mkString(" | "))
  }

  test("r16 review: hammingBits fails loud on a null chunk element, not a silent 0-read") {
    import spark.implicits._
    // getLong on a null slot reads 0 (or stale column-vector bytes) —
    // a silently undercounted distance that lets a corrupt pair
    // through the embed-LSH prefilter
    val df = spark.sql("SELECT array(1L, CAST(NULL AS BIGINT)) AS a, array(1L, 2L) AS b")
    val e = intercept[Exception](
      df.select(GraftKernels.hammingBitsCol(col("a"), col("b"))).collect())
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("null chunk element")), messages(e).mkString(" | "))
  }

  test("r17 review: rustDouble prints SHORTEST round-trip digits on JDK 17 (1e23 class)") {
    import org.apache.spark.unsafe.types.UTF8String
    def rd(d: Double): String = GraftKernels.rustDouble(d).toString
    // JDK 17's Double.toString(1e23) is "9.999999999999999E22" (round-
    // trip but NOT shortest, JDK-4511638) — Rust f64 Display prints the
    // shortest digits, so the pre-fix render silently diverged from the
    // reference on every such double
    assert(rd(1e23) == "100000000000000000000000")
    assert(rd(-1e23) == "-100000000000000000000000")
    // values where toString IS already shortest must be unchanged
    assert(rd(0.1) == "0.1")
    assert(rd(1.5) == "1.5")
    assert(rd(3.141592653589793) == "3.141592653589793")
    assert(rd(1.0) == "1")
    assert(rd(6.02e23) == "602000000000000000000000")
    // round-trip safety: parse back equals the input for a digit sweep
    for (d <- Seq(1e23, 9.9e22, 1.2345678901234567e8, 2.2250738585072014e-308))
      assert(java.lang.Double.parseDouble(
        new java.math.BigDecimal(rd(d)).toString) == d, d.toString)
  }

  test("r17 review: Rust named groups with underscores compile and expand (synthetic java names)") {
    GraftKernels.registerSqlFunctions(spark)
    import spark.implicits._
    // (?P<word_id>...) is a valid Rust regex-crate pattern; Java group
    // names reject '_', so the verbatim rewrite threw
    // PatternSyntaxException on EVERY row pre-fix
    // call_function + lit, not selectExpr: SQL literal unescaping
    // would mangle the backslashes under test
    val out = Seq(Tuple1("order 123 shipped")).toDF("s")
      .select(call_function("velo_regexp_replace", col("s"),
        lit("(?P<word_id>\\d+)"), lit("id=$" + "{word_id}"), lit("g")).as("r"))
      .collect().head.getString(0)
    assert(out == "order id=123 shipped")
    // two named groups keep their identities through the renaming
    val out2 = Seq(Tuple1("a-7")).toDF("s")
      .select(call_function("velo_regexp_replace", col("s"),
        lit("(?P<l_x>[a-z])-(?P<n_y>\\d)"), lit("$" + "{n_y}$" + "{l_x}"), lit("")).as("r"))
      .collect().head.getString(0)
    assert(out2 == "7a")
  }

  test("r17 review: expression-builder SQL functions validate arity (SPLIT silently dropped args)") {
    GraftKernels.registerSqlFunctions(spark)
    import spark.implicits._
    val df = Seq(Tuple1("a,b,c")).toDF("s")
    // pre-fix: the third argument was silently ignored and part 1
    // returned — the caller asking for part 2 got wrong DATA, no error
    val e = intercept[Throwable](
      df.selectExpr("velo_split(s, ',', 2)").collect())
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("SPLIT") && m.contains("argument")),
      msgs(e).mkString(" | "))
    // correct arity still works
    assert(df.selectExpr("velo_split(s, ',')").collect().head.getString(0) == "a")
    // too FEW args fail with the named message, not IndexOutOfBounds
    val e2 = intercept[Throwable](df.selectExpr("velo_nullif(s)").collect())
    assert(msgs(e2).exists(m => m.contains("NULLIF")), msgs(e2).mkString(" | "))
  }

  test("r17 review: regexp-replace no-match fast path returns the input unchanged") {
    GraftKernels.registerSqlFunctions(spark)
    import spark.implicits._
    val rows = Seq(Tuple1("no digits here"), Tuple1("has 42")).toDF("s")
      .select(call_function("velo_regexp_replace", col("s"),
        lit("\\d+"), lit("N"), lit("g")).as("r"))
      .collect().map(_.getString(0)).toSeq
    assert(rows.toSeq == Seq("no digits here", "has N"))
  }
}
