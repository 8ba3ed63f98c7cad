package graft.sql

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Sweep of the reference's 75-function catalog
  * (docs/sql/FUNCTION_CATALOG.md) through the dialect front-end — every
  * function name must parse, translate, and execute on Spark.
  */
class FunctionSurfaceSpec extends AnyFunSuite with SparkTestSession {

  private lazy val ctx: VeloContext = {
    val c = new VeloContext(spark, defaultTimeCol = "event_time")
    import spark.implicits._
    val t = Seq(
      (1L, "AAPL", 100.0, 10L, "{\"k\": 7}", Timestamp.valueOf("2024-03-05 10:00:00")),
      (2L, "AAPL", 101.5, 12L, "{\"k\": 9}", Timestamp.valueOf("2024-03-05 10:04:00")),
      (3L, "MSFT", 55.0, 5L, "{\"k\": 1}", Timestamp.valueOf("2024-03-05 11:00:00")),
      (4L, "MSFT", 57.5, 6L, "{\"k\": 3}", Timestamp.valueOf("2024-03-06 09:30:00"))
    ).toDF("id", "symbol", "price", "volume", "props", "event_time")
    c.registerStreamLike("t", t, "event_time", "id")
    c
  }

  private def runs(sql: String): Unit = {
    val df = ctx.sql(sql)
    assert(df.collect().nonEmpty, s"no rows from: $sql")
  }

  test("aggregate function surface") {
    runs("""SELECT symbol, COUNT(*), SUM(price), AVG(price), MIN(price), MAX(price),
            APPROX_COUNT_DISTINCT(volume), COUNT_DISTINCT(volume),
            FIRST(price), LAST(price), MEDIAN(price),
            STDDEV(price), STDDEV_SAMP(price), STDDEV_POP(price),
            VARIANCE(price), VAR_SAMP(price), VAR_POP(price)
            FROM t GROUP BY symbol""")
    runs("""SELECT symbol, STRING_AGG(symbol, ','), GROUP_CONCAT(symbol, '|'),
            LISTAGG(symbol, ';'), COLLECT(price)
            FROM t GROUP BY symbol""")
    runs("""SELECT symbol, CORR(price, volume), COVAR_POP(price, volume),
            COVAR_SAMP(price, volume), REGR_SLOPE(price, volume),
            REGR_INTERCEPT(price, volume), REGR_R2(price, volume)
            FROM t GROUP BY symbol""")
    runs("SELECT PERCENTILE_CONT(price, 0.5) AS p50, PERCENTILE_DISC(price, 0.5) AS pd50 FROM t")
  }

  test("window inverse-distribution percentiles (advanced.md form)") {
    val df = ctx.sql(
      """SELECT symbol, price,
         PERCENTILE_CONT(0.5) OVER (PARTITION BY symbol ORDER BY price) AS median_price,
         PERCENTILE_CONT(0.95) OVER (PARTITION BY symbol ORDER BY price) AS p95
         FROM t""")
    val m = df.where(col("symbol") === "AAPL").collect().head.getAs[Double]("median_price")
    assert(m == 100.75) // interpolated between 100 and 101.5
  }

  test("r16 review: EXTRACT('') terminates as a passthrough, not an infinite rewrite loop") {
    // the two-arg branch computed field = "" and then neither emitted a
    // token nor advanced the cursor — the rewrite loop spun forever and
    // one malformed statement hung the server thread. Run on a daemon
    // thread so a regression fails the assert instead of the suite.
    @volatile var done = false
    val th = new Thread(() => {
      try ctx.sql("SELECT EXTRACT('', id) AS z FROM t").collect()
      catch { case _: Throwable => () } // any error is fine; the pin is termination
      done = true
    })
    th.setDaemon(true); th.start(); th.join(60000)
    assert(done, "EXTRACT('') hung the token rewrite")
  }

  test("r16 review: ROUND on DECIMAL follows the ScaledInteger arm (unscaled/f64, keeps scale)") {
    val r = ctx.sql(
      """SELECT ROUND(CAST(1.005 AS DECIMAL(10,3)), 2) AS up,
         ROUND(CAST(1.004 AS DECIMAL(10,3)), 2) AS down,
         ROUND(CAST(1.005 AS DECIMAL(10,3)), 5) AS noop,
         ROUND(CAST(-2.5 AS DECIMAL(10,1)), 0) AS negHalf,
         ROUND(CAST(NULL AS DECIMAL(10,2)), 1) AS nul
         FROM t WHERE id = 1""").collect().head
    // the reference divides the UNSCALED integer: 1005/10 = 100.5
    // exactly in f64 → rounds half AWAY to 101 → ScaledInteger(1010, 3)
    // = 1.010 at the ORIGINAL scale. The former exact-decimal arm said
    // 1.01@2 and the former full-value f64 arm said 1.000 (1.005*100 =
    // 100.4999…) — both wrong, and they disagreed with each other.
    val up = r.getAs[java.math.BigDecimal]("up")
    assert(up.compareTo(new java.math.BigDecimal("1.010")) == 0, up.toString)
    assert(up.scale == 3, s"scale must be kept, got ${up.scale}")
    assert(r.getAs[java.math.BigDecimal]("down")
      .compareTo(new java.math.BigDecimal("1.000")) == 0)
    // precision >= scale is a no-op (functions.rs:455)
    assert(r.getAs[java.math.BigDecimal]("noop")
      .compareTo(new java.math.BigDecimal("1.005")) == 0)
    assert(r.getAs[java.math.BigDecimal]("negHalf")
      .compareTo(new java.math.BigDecimal("-3")) == 0, "half away from zero")
    assert(r.get(r.fieldIndex("nul")) == null)
  }

  test("r17 advice: decimal ROUND boundary round-up widens one digit instead of nulling") {
    // ROUND(9.99@(3,2), 0) rebuilds unscaled 1000 — MakeDecimal at the
    // DECLARED precision 3 nulled it out under non-ANSI, where the
    // reference's i64-backed ScaledInteger (no precision to overflow)
    // reads 10.00; the result type widens one digit so the boundary
    // value survives (value parity over type parity)
    val r = ctx.sql(
      """SELECT ROUND(CAST(9.99 AS DECIMAL(3,2)), 0) AS up,
         ROUND(CAST(-9.99 AS DECIMAL(3,2)), 0) AS dn,
         ROUND(CAST(9.5 AS DECIMAL(2,1)), 0) AS half,
         ROUND(CAST(1.23 AS DECIMAL(3,2)), -25) AS tiny
         FROM t WHERE id = 1""").collect().head
    val up = r.getAs[java.math.BigDecimal]("up")
    assert(up != null && up.compareTo(new java.math.BigDecimal("10.00")) == 0,
      s"boundary round-up must read 10.00, got $up")
    assert(up.scale == 2, s"scale must be kept, got ${up.scale}")
    assert(r.getAs[java.math.BigDecimal]("dn")
      .compareTo(new java.math.BigDecimal("-10.00")) == 0, "negative boundary")
    assert(r.getAs[java.math.BigDecimal]("half")
      .compareTo(new java.math.BigDecimal("10.0")) == 0, "half away from zero at boundary")
    // scale - p >= 19: the divisor exceeds Long range (the former
    // Cast(divD, LongType) overflowed); the quotient provably rounds
    // to 0, so that is the answer — not saturation garbage
    assert(r.getAs[java.math.BigDecimal]("tiny")
      .compareTo(java.math.BigDecimal.ZERO) == 0, "huge negative precision rounds to zero")
  }

  test("r16 review: ARRAY_CONTAINS reconciles native-arm types and uses the values_equal epsilon") {
    val r = ctx.sql(
      """SELECT ARRAY_CONTAINS(ARRAY(CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)), 2) AS crossNative,
         ARRAY_CONTAINS(ARRAY(1, 2, 3), CAST(2 AS BIGINT)) AS widthNative,
         ARRAY_CONTAINS(ARRAY(CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)), CAST(0.3 AS DOUBLE)) AS epsNative,
         ARRAY_CONTAINS('[0.30000000000000004]', CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)) AS epsJson,
         ARRAY_CONTAINS(ARRAY('a', 'b'), 1) AS kindMiss
         FROM t WHERE id = 1""").collect().head
    // the bare EqualNullSafe arm had no type reconciliation: a
    // double-array vs INT literal died with a datatype-mismatch
    // internal error (the analyzer never coerces inside a
    // RuntimeReplaceable replacement) where values_equal:1687
    // cross-compares Integer and Float via f64
    assert(r.getAs[Boolean]("crossNative"), "Integer-vs-Float cross-compare")
    assert(r.getAs[Boolean]("widthNative"), "int element vs BIGINT value")
    // values_equal:1685 float equality is |a-b| < f64::EPSILON, so
    // 0.1+0.2 equals 0.3 in the reference; exact EqualTo read false
    assert(r.getAs[Boolean]("epsNative"), "native-arm epsilon")
    assert(r.getAs[Boolean]("epsJson"), "JSON-arm epsilon")
    // kind mismatch stays false (values_equal falls through)
    assert(!r.getAs[Boolean]("kindMiss"))
  }

  test("r16 review: REGEXP is Unicode-first; literal (?P< sequences survive; string-ts sub-second EXTRACT") {
    val r = ctx.sql(
      """SELECT REGEXP('héllo', '^\w+$') AS uni,
         REGEXP('hello', '(?P<g>ell)') AS named,
         REGEXP_REPLACE('P<x>y', '\(?P<x>y', '$x') AS litSeq,
         REGEXP_REPLACE('P', '[(?P<x>]', 'Z') AS inClass,
         EXTRACT(MILLISECOND FROM '2024-03-05 10:30:44.123') AS msStr
         FROM t WHERE id = 1""").collect().head
    // REGEXP used to lower to Spark's regexp_like (Java-default ASCII
    // \w, no (?P<…> spelling) — the Rust regex crate is Unicode-first
    assert(r.getAs[Boolean]("uni"), "Rust \\w matches é")
    assert(r.getAs[Boolean]("named"), "(?P<…> spelling compiles")
    // the blind (?P< rewrite dropped a literal 'P' (matching different
    // text) and registered a group the compiled pattern lacks, so '$x'
    // threw IllegalArgumentException per matching row; as a literal
    // sequence the missing-group reference expands to "" like Rust
    assert(r.getAs[String]("litSeq") == "", r.getAs[String]("litSeq"))
    assert(r.getAs[String]("inClass") == "Z", "char-class 'P' must still match")
    // the sub-second arms now take the EPOCH arm's TIMESTAMP hop
    assert(r.getAs[Long]("msStr") == 123L, "string time column works")
  }

  test("r16 review: percentile OVER with a NULLS FIRST/LAST tail parses; DESC still inverts") {
    val r = ctx.sql(
      """SELECT PERCENTILE_CONT(0.95)
           OVER (PARTITION BY symbol ORDER BY price DESC NULLS LAST) AS lo
         FROM t WHERE symbol = 'AAPL'""").collect().head
    // the NULLS LAST tail used to ride into the value expression (a
    // downstream parse error); stripped, the DESC inversion applies:
    // 0.95 of the way DOWN {100, 101.5} = the 0.05 ascending quantile
    assert(math.abs(r.getAs[Double]("lo") - 100.075) < 1e-9, r.toString)
  }

  test("window function surface (LAG/LEAD/ranks/values)") {
    runs("""SELECT id, LAG(price, 1) OVER w, LEAD(price, 1) OVER w,
            ROW_NUMBER() OVER w, RANK() OVER w, DENSE_RANK() OVER w,
            FIRST_VALUE(price) OVER w, LAST_VALUE(price) OVER w,
            NTH_VALUE(price, 2) OVER w, PERCENT_RANK() OVER w, CUME_DIST() OVER w
            FROM t WINDOW w AS (PARTITION BY symbol ORDER BY event_time)""")
  }

  test("ranking ties are STANDARD SQL, diverging from the reference's position-based evaluator (documented)") {
    // Audit conclusion for window_functions.rs (the last evaluator
    // family): its RANK/DENSE_RANK are row_number-like — position in
    // the sorted buffer, NO tie handling — and the file SAYS so
    // ("For simplified implementation, DENSE_RANK behaves like RANK.
    // In a complete implementation, this would count distinct values",
    // window_functions.rs:586; PERCENT_RANK/CUME_DIST:714,749 and
    // NTILE's ceil-tiling:775 are position-based the same way). The
    // reference's own tests pin none of the tie/tiling details (
    // enhanced_window_functions_test.rs asserts is_ok), and its docs
    // describe standard SQL ranking — so this library implements the
    // DOCUMENTED semantics (standard, tie-aware, DuckDB-verified in
    // q8/q40), not the acknowledged-incomplete evaluator positions.
    import spark.implicits._
    val ties = Seq((1L, "A", 10.0), (2L, "A", 10.0), (3L, "A", 20.0), (4L, "A", 20.0),
      (5L, "A", 30.0)).toDF("tid", "g", "v")
    ctx.register("tie_t", ties)
    val r = ctx.sql(
      """SELECT tid, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk,
         PERCENT_RANK() OVER w AS prk, CUME_DIST() OVER w AS cd
         FROM tie_t WINDOW w AS (PARTITION BY g ORDER BY v)""")
      .collect().map(x => x.getAs[Long]("tid") -> x).toMap
    assert(r(1L).getAs[Int]("rk") == 1 && r(2L).getAs[Int]("rk") == 1,
      "tied values share a rank (standard), not buffer positions 1,2 (reference evaluator)")
    assert(r(3L).getAs[Int]("rk") == 3, "rank after a 2-way tie skips (standard gaps)")
    assert(r(3L).getAs[Int]("drk") == 2, "dense rank counts distinct values")
    assert(r(1L).getAs[Double]("prk") == 0.0 && r(2L).getAs[Double]("prk") == 0.0)
    assert(r(2L).getAs[Double]("cd") == 0.4, "CUME_DIST counts rows <= value, not position")
  }

  test("math function surface") {
    runs("""SELECT ABS(-price), ROUND(price, 1), CEIL(price), CEILING(price),
            FLOOR(price), SQRT(price), POWER(price, 2), POW(2, 3),
            MOD(volume, 3), LEAST(price, 50), GREATEST(price, 50) FROM t""")
  }

  test("string function surface") {
    // SPLIT returns the FIRST part (a string) and JOIN is variadic
    // delimiter-first — the reference's functions.rs semantics
    runs("""SELECT UPPER(symbol), LOWER(symbol), SUBSTRING(symbol, 1, 2),
            REPLACE(symbol, 'A', 'X'), TRIM(symbol), LTRIM(symbol), RTRIM(symbol),
            LENGTH(symbol), LEN(symbol), CONCAT(symbol, '-', symbol),
            SPLIT(symbol, 'A'), JOIN('_', SPLIT(symbol, 'A'), symbol),
            LEFT(symbol, 2), RIGHT(symbol, 2), POSITION('A', symbol),
            REGEXP(symbol, '^[A-M]') FROM t""")
  }

  test("string parity edges through the dialect: byte LENGTH, first-part SPLIT, NULL in JOIN") {
    val r = ctx.sql(
      """SELECT LENGTH('héllo') AS blen, SPLIT('a,b,c', ',') AS first_part,
         JOIN(',', 'a', CAST(NULL AS STRING), 7) AS joined,
         TRIM('	tabbed	') AS utrimmed FROM t LIMIT 1""").collect().head
    assert(r.getAs[Int]("blen") == 6)           // bytes, not chars
    assert(r.getAs[String]("first_part") == "a")
    assert(r.getAs[String]("joined") == "a,NULL,7")
    assert(r.getAs[String]("utrimmed") == "tabbed")
  }

  test("date/time function surface") {
    runs("""SELECT NOW(), CURRENT_TIMESTAMP, TIMESTAMP(),
            EXTRACT(YEAR FROM event_time), EXTRACT(MONTH FROM event_time),
            DATE_FORMAT(event_time, 'yyyy-MM-dd'),
            DATEDIFF(event_time, event_time),
            TUMBLE_START(event_time, INTERVAL '5' MINUTE),
            TUMBLE_END(event_time, INTERVAL '5' MINUTE),
            FROM_UNIXTIME(1700000000), UNIX_TIMESTAMP(event_time) FROM t""")
  }

  test("epoch surfaces FLOOR pre-1970 fractional timestamps (chrono timestamp() parity)") {
    // the reference's UNIX_TIMESTAMP / EXTRACT(EPOCH) go through
    // chrono's timestamp() — a euclidean floor — so -0.5 s reads -1,
    // where Spark's unix_timestamp truncates toward zero and reads 0
    // (r11 oracle audit: four engine surfaces carried the truncating
    // form and the oracle's flooring helpers would have tripped on the
    // first pre-1970 fractional row)
    val r = ctx.sql(
      """SELECT UNIX_TIMESTAMP(CAST('1969-12-31 23:59:59.5' AS TIMESTAMP)) AS u,
         EXTRACT(EPOCH FROM CAST('1969-12-31 23:59:59.5' AS TIMESTAMP)) AS e,
         TUMBLE_START(CAST('1969-12-31 23:59:59.5' AS TIMESTAMP), INTERVAL '5' MINUTE) AS tb,
         UNIX_TIMESTAMP() AS nowish
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Long]("u") == -1L, s"UNIX_TIMESTAMP truncated: ${r.getAs[Long]("u")}")
    assert(r.getAs[Long]("e") == -1L, s"EXTRACT(EPOCH) truncated: ${r.getAs[Long]("e")}")
    assert(r.getAs[Long]("tb") == -300L, s"TUMBLE_START bucketed late: ${r.getAs[Long]("tb")}")
    assert(r.getAs[Long]("nowish") > 1700000000L) // zero-arg form still the current time
    // the library-level helpers floor the same way
    import graft.functions.VeloFunctions
    import spark.implicits._
    val df = Seq(java.sql.Timestamp.valueOf("1969-12-31 23:59:59.5")).toDF("ts")
    val h = df.select(VeloFunctions.veloUnixTimestamp(col("ts")).as("u"),
      VeloFunctions.tumbleStart(col("ts"), 300L).as("tb")).collect().head
    assert(h.getAs[Long]("u") == -1L && h.getAs[Long]("tb") == -300L)
  }

  test("EXTRACT sub-second parts (functions.rs:1921-1923: the fraction, not postgres)") {
    // Spark's own extract() has no MILLISECOND/MICROSECOND/NANOSECOND —
    // the dialect must rewrite them, or a reference-valid statement
    // AnalysisExceptions through SQL while working via the Scala API
    val r = ctx.sql(
      """SELECT EXTRACT(MILLISECOND FROM TIMESTAMP '2024-03-05 10:30:44.123') AS ms,
         EXTRACT(MICROSECOND FROM TIMESTAMP '2024-03-05 10:30:44.123') AS us,
         EXTRACT(NANOSECOND FROM TIMESTAMP '2024-03-05 10:30:44.123') AS ns
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Long]("ms") == 123L)
    assert(r.getAs[Long]("us") == 123000L)
    assert(r.getAs[Long]("ns") == 123000000L)
  }

  test("DATE_FORMAT accepts chrono strftime patterns (functions.rs:2403)") {
    // the reference formats through chrono — every demo/doc query writes
    // '%Y-%m-%d'; Java patterns would render '2024' for 'yyyy' but
    // garbage for '%Y' ('%' literal + week-based-year 'Y')
    val r = ctx.sql(
      """SELECT DATE_FORMAT(event_time, '%Y-%m-%d %H:00:00') AS hr,
         DATE_FORMAT(event_time, '%Y-%m') AS mo,
         DATE_FORMAT(event_time, '%H:%M:%S') AS tod,
         DATE_FORMAT(event_time, 'yyyy-MM-dd') AS javaStyle
         FROM t WHERE id = 1""").collect().head
    assert(r.getAs[String]("hr") == "2024-03-05 10:00:00")
    assert(r.getAs[String]("mo") == "2024-03")
    assert(r.getAs[String]("tod") == "10:00:00")
    assert(r.getAs[String]("javaStyle") == "2024-03-05") // both worlds work
    // %e: chrono SPACE-pads single-digit days ("Mar  5") — Java has no
    // such pattern letter; the lowering post-fills via lpad (r12)
    val e = ctx.sql(
      """SELECT DATE_FORMAT(event_time, '%b %e') AS be,
         DATE_FORMAT(event_time, '%Y#%m') AS hash
         FROM t WHERE id = 1""").collect().head
    assert(e.getAs[String]("be") == "Mar  5", e.getAs[String]("be"))
    assert(e.getAs[String]("hash") == "2024#03") // '#' is Java-reserved; quoted
  }

  test("DATEDIFF units are calendar-component diffs (functions.rs:1977-2005)") {
    val r = ctx.sql(
      """SELECT
         DATEDIFF('years', TIMESTAMP '2023-12-31 23:00:00', TIMESTAMP '2024-01-01 01:00:00') AS y,
         DATEDIFF('months', TIMESTAMP '2024-01-31 00:00:00', TIMESTAMP '2024-02-01 00:00:00') AS mo,
         DATEDIFF('quarters', TIMESTAMP '2023-12-15 00:00:00', TIMESTAMP '2024-01-15 00:00:00') AS q,
         DATEDIFF('days', TIMESTAMP '2024-01-01 23:00:00', TIMESTAMP '2024-01-02 01:00:00') AS d,
         DATEDIFF('hours', TIMESTAMP '2024-01-01 23:00:00', TIMESTAMP '2024-01-02 01:00:00') AS h,
         DATEDIFF('minutes', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:01:30') AS mi,
         DATEDIFF('weeks', TIMESTAMP '2019-12-30 00:00:00', TIMESTAMP '2020-01-06 00:00:00') AS w1,
         DATEDIFF('weeks', TIMESTAMP '2021-01-01 00:00:00', TIMESTAMP '2021-01-04 00:00:00') AS w2
         FROM t LIMIT 1""").collect().head
    // component diffs, NOT elapsed periods (timestampdiff would say 0/0/0)
    assert(r.getAs[Long]("y") == 1L,  "Dec 31 -> Jan 1 is 1 year in the reference")
    assert(r.getAs[Long]("mo") == 1L, "Jan 31 -> Feb 1 is 1 month (day-of-month ignored)")
    assert(r.getAs[Long]("q") == 1L,  "Q4 -> Q1 across the year boundary")
    assert(r.getAs[Long]("d") == 1L,  "calendar-DATE diff, not full 24h periods")
    assert(r.getAs[Long]("h") == 2L,  "hours divide raw elapsed millis")
    assert(r.getAs[Long]("mi") == 1L, "docs use minutes; elapsed millis div, truncated")
    // weeks = 52*delta(ISO week-year) + delta(ISO week): 2019-12-30 is
    // week 1 OF 2020, so one week apart reads 1; 2021-01-01 is week 53
    // OF 2020 and 2021-01-04 week 1 of 2021 -> (1)*52 + (1-53) = 0
    assert(r.getAs[Long]("w1") == 1L)
    assert(r.getAs[Long]("w2") == 0L)
  }

  test("JSON paths use the reference dot-segment language (functions.rs:1215)") {
    val r = ctx.sql(
      """SELECT JSON_EXTRACT('{"a":[{"b":7},{"b":9}]}', '$.a.1.b') AS idx,
         JSON_EXTRACT('{"k":42}', 'k') AS bare,
         JSON_VALUE('{"a":{"b":"x"}}', '$.a.b') AS nested,
         JSON_EXTRACT('not json', '$.k') AS bad
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[String]("idx") == "9",  "array index as dot-numeric segment")
    assert(r.getAs[String]("bare") == "42", "bare path without $. accepted")
    assert(r.getAs[String]("nested") == "x")
    assert(r.get(r.fieldIndex("bad")) == null, "invalid JSON is NULL, not an error")
  }

  test("JSON_EXISTS: JSON-null-valued key EXISTS; invalid JSON false; NULL in NULL out (functions.rs:1099)") {
    val r = ctx.sql(
      """SELECT JSON_EXISTS('{"k": null}', '$.k') AS nullkey,
         JSON_EXISTS('{"k": null}', '$.missing') AS missing,
         JSON_EXISTS('not json', '$.k') AS badjson,
         JSON_EXISTS(CAST(NULL AS STRING), '$.k') AS nulljson,
         JSON_EXISTS('{"a":[{"b":1}]}', '$.a.0.b') AS dotidx
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Boolean]("nullkey"), "a key holding JSON null exists")
    assert(!r.getAs[Boolean]("missing"))
    assert(!r.getAs[Boolean]("badjson"))
    assert(r.get(r.fieldIndex("nulljson")) == null)
    assert(r.getAs[Boolean]("dotidx"))
  }

  test("CONCAT skips NULL arguments (functions.rs:1419) and stringifies") {
    val r = ctx.sql(
      """SELECT CONCAT('a', CAST(NULL AS STRING), 'b') AS skipped,
         CONCAT(symbol, '-', volume) AS mixed
         FROM t WHERE id = 1""").collect().head
    assert(r.getAs[String]("skipped") == "ab", "Spark concat would NULL the whole result")
    assert(r.getAs[String]("mixed") == "AAPL-10")
  }

  test("POSITION is byte-based with a byte start offset (functions.rs:2489)") {
    val r = ctx.sql(
      """SELECT POSITION('l', 'héllo') AS bytepos,
         POSITION('l', 'héllo', 5) AS from5,
         POSITION('A', 'ABCA', 2) AS threeArg,
         POSITION('A', 'ABCA', CAST(NULL AS INT)) AS nullStart,
         POSITION('zz', 'abc') AS absent
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Int]("bytepos") == 4, "'l' in 'héllo' is byte 4 (char 3)")
    assert(r.getAs[Int]("from5") == 5)
    assert(r.getAs[Int]("threeArg") == 4)
    assert(r.get(r.fieldIndex("nullStart")) == null)
    assert(r.getAs[Int]("absent") == 0)
  }

  test("ROUND branches on type: int passthrough, floats via f64 multiply (functions.rs:424)") {
    val r = ctx.sql(
      """SELECT ROUND(CAST(1.005 AS DOUBLE), 2) AS edge,
         ROUND(volume, 2) AS intPass,
         ROUND(CAST(2.5 AS DOUBLE)) AS half,
         ROUND(CAST(-2.5 AS DOUBLE)) AS negHalf,
         ROUND(CAST(NULL AS DOUBLE), 2) AS nul
         FROM t WHERE id = 1""").collect().head
    // the reference rounds the BINARY value: 1.005 is
    // 1.00499999999999989…, so ×100 = 100.49999999999999 which rounds
    // DOWN to 1.0 — decimal-exact engines (Spark's builtin round,
    // DuckDB) read the shortest representation "1.005" and say 1.01.
    assert(r.getAs[Double]("edge") == 1.0)
    assert(r.getAs[Long]("intPass") == 10L, "integers pass through ROUND unchanged")
    assert(r.getAs[Double]("half") == 3.0)
    assert(r.getAs[Double]("negHalf") == -3.0, "half away from zero, like Rust f64::round")
    assert(r.get(r.fieldIndex("nul")) == null)
  }

  test("ARRAY_LENGTH / MAP_KEYS / ARRAY_CONTAINS accept JSON strings (functions.rs:1388,1611,1722)") {
    val r = ctx.sql(
      """SELECT ARRAY_LENGTH('[1,2,3]') AS jlen,
         ARRAY_LENGTH(ARRAY(1,2)) AS alen,
         MAP_KEYS('{"a":1,"b":2}') AS jkeys,
         ARRAY_CONTAINS('[1,2,3]', 2) AS jhit,
         ARRAY_CONTAINS('["1","2"]', 2) AS typeGate,
         ARRAY_CONTAINS('[1.0, 2]', 2) AS crossNum
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Int]("jlen") == 3)
    assert(r.getAs[Int]("alen") == 2)
    assert(r.getAs[scala.collection.Seq[String]]("jkeys").sorted.toSeq == Seq("a", "b"))
    assert(r.getAs[Boolean]("jhit"))
    assert(!r.getAs[Boolean]("typeGate"), "String(\"2\") never equals Integer(2) in values_equal")
    assert(r.getAs[Boolean]("crossNum"), "Integer and Float cross-compare in values_equal")
  }

  test("ARRAY_CONTAINS numeric gate admits DECIMAL variants and compares integers exactly (values_equal:1679)") {
    // variant types '[2.5]' as DECIMAL(2,1), not DOUBLE — the gate must
    // admit it or the reference's Integer/Float cross-compare is lost;
    // and Integer==Integer is an exact i64 compare, so 2^53+1 must not
    // collapse onto its f64 neighbour
    val r = ctx.sql(
      """SELECT ARRAY_CONTAINS('[2.5]', 2.5) AS decForm,
         ARRAY_CONTAINS('[2.5e0]', 2.5) AS expForm,
         ARRAY_CONTAINS('[2.5]', 2) AS decMiss,
         ARRAY_CONTAINS('[9007199254740993]', 9007199254740993) AS bigHit,
         ARRAY_CONTAINS('[9007199254740993]', 9007199254740992) AS bigMiss
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Boolean]("decForm"), "decimal-form float element must match")
    assert(r.getAs[Boolean]("expForm"))
    assert(!r.getAs[Boolean]("decMiss"))
    assert(r.getAs[Boolean]("bigHit"))
    assert(!r.getAs[Boolean]("bigMiss"),
      "i64 compare is exact; a Double-cast compare would alias 2^53+1 to 2^53")
  }

  test("ROUND with NULL precision is NULL for every input type (functions.rs:435)") {
    val r = ctx.sql(
      """SELECT ROUND(volume, CAST(NULL AS INT)) AS intNull,
         ROUND(price, CAST(NULL AS INT)) AS dblNull,
         ROUND(volume, 2) AS intPass
         FROM t WHERE id = 1""").collect().head
    assert(r.get(r.fieldIndex("intNull")) == null,
      "the reference evaluates precision BEFORE the value-type match")
    assert(r.get(r.fieldIndex("dblNull")) == null)
    assert(r.getAs[Long]("intPass") == 10L)
  }

  test("DATEDIFF accepts 'ms' but rejects bare 'm' like the reference evaluator") {
    val r = ctx.sql(
      """SELECT DATEDIFF('ms', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-01 00:00:01') AS ms
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Long]("ms") == 1000L)
    // bare 'm' means month (T-SQL) or minute elsewhere — silently
    // reading milliseconds would corrupt results; it must error
    intercept[Exception] {
      ctx.sql("SELECT DATEDIFF('m', event_time, event_time) FROM t").collect()
    }
  }

  test("all-digit JSON segments read numeric OBJECT keys too (walk_json_path functions.rs:1192)") {
    val r = ctx.sql(
      """SELECT JSON_EXTRACT('{"2024": 5}', '$.2024') AS numKey,
         JSON_EXTRACT('[7, 8]', '$.1') AS stillIdx,
         JSON_EXTRACT('{"a": [{"2024": 3}]}', '$.a.0.2024') AS mixed,
         JSON_EXISTS('{"2024": null}', '$.2024') AS nullNumKey,
         JSON_QUERY('{"2024": {"b": 1}}', '$.2024') AS qNumKey
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[String]("numKey") == "5", "digit segment as object key on an object node")
    assert(r.getAs[String]("stillIdx") == "8", "digit segment as index on an array node")
    assert(r.getAs[String]("mixed") == "3", "index then key in one path")
    assert(r.getAs[Boolean]("nullNumKey"))
    assert(r.getAs[String]("qNumKey") == """{"b":1}""")
  }

  test("ARRAY_CONTAINS is null-safe (values_equal:1679 — NULL==NULL true, no-match is false not NULL)") {
    val r = ctx.sql(
      """SELECT ARRAY_CONTAINS(ARRAY(1, CAST(NULL AS INT)), CAST(NULL AS INT)) AS nullHit,
         ARRAY_CONTAINS(ARRAY(1, CAST(NULL AS INT)), 9) AS noMatchWithNulls,
         ARRAY_CONTAINS(CAST(NULL AS ARRAY<INT>), 1) AS nullArr
         FROM t LIMIT 1""").collect().head
    assert(r.getAs[Boolean]("nullHit"), "searching NULL finds a null element")
    assert(!r.getAs[Boolean]("noMatchWithNulls"),
      "Spark's array_contains reads NULL here; the reference says false")
    assert(r.get(r.fieldIndex("nullArr")) == null)
  }

  test("conditional + JSON + array/map + header surface") {
    runs("""SELECT COALESCE(NULL, symbol), NULLIF(symbol, 'AAPL'),
            CAST(price AS BIGINT),
            JSON_EXTRACT(props, '$.k'), JSON_VALUE(props, '$.k'),
            ARRAY(price, volume), STRUCT(symbol, price), MAP('s', symbol),
            ARRAY_LENGTH(ARRAY(1, 2, 3)), ARRAY_CONTAINS(ARRAY(1, 2), 2),
            MAP_KEYS(MAP('a', 1)), MAP_VALUES(MAP('a', 1)),
            HEADER('source'), HAS_HEADER('source'), HEADER_KEYS(),
            SET_HEADER('x', 'y'), REMOVE_HEADER('source')
            FROM t""")
  }

  test("SET_HEADER re-stamps an EXISTING key (upsert, not DUPLICATE_MAP_KEY)") {
    // every registered source carries a 'source' header — re-stamping it
    // is the normal case and must not hit mapKeyDedupPolicy=EXCEPTION
    val out = ctx.sql("""SELECT HEADER('source') AS h FROM
      (SELECT SET_HEADER('source', 'restamped') AS _headers, symbol FROM t)""")
    val vs = out.collect().map(_.getAs[String]("h")).distinct.toSeq
    assert(vs == Seq("restamped"))
  }

  test("STRING_AGG family stringifies floats Rust-style, and COLLECT is a STRING alias (aggregation/functions.rs:46)") {
    // one aggregate behind four names: STRING_AGG / GROUP_CONCAT /
    // LISTAGG / COLLECT all join the STRINGIFIED values — floats render
    // through Rust Display ("100", never cast's "100.0"); COLLECT
    // therefore returns a joined STRING with the ',' default, not an
    // array; a NON-LITERAL separator falls back to ',' (the reference
    // reads the separator out of the AST literal only)
    val r = ctx.sql(
      """SELECT STRING_AGG(price, ',') AS sa, COLLECT(price) AS co,
         STRING_AGG(symbol, symbol) AS dynSep
         FROM t WHERE symbol = 'AAPL' GROUP BY symbol""").collect().head
    assert(r.getAs[String]("sa").split(",").sorted.toSeq == Seq("100", "101.5"),
      "floats render as Rust Display: 100.0 is '100'")
    assert(r.getAs[String]("co").split(",").sorted.toSeq == Seq("100", "101.5"),
      "COLLECT is a STRING_AGG alias returning a joined string")
    assert(r.getAs[String]("dynSep").split(",").sorted.toSeq == Seq("AAPL", "AAPL"),
      "non-literal separator defaults to ','")
  }

  test("CONCAT / JOIN stringify floats Rust-style (functions.rs:1430,1027 f.to_string())") {
    val r = ctx.sql(
      """SELECT CONCAT('p=', price) AS c1, CONCAT('v=', price / 2) AS c2,
         JOIN('|', price, volume) AS j1
         FROM t WHERE id = 1""").collect().head
    assert(r.getAs[String]("c1") == "p=100", "cast would render 'p=100.0'")
    assert(r.getAs[String]("c2") == "v=50")
    assert(r.getAs[String]("j1") == "100|10")
  }

  test("aggregate edge parity: sample n<2 is NULL, population n=1 is 0, MEDIAN interpolates (aggregation/compute.rs:70-127)") {
    val r = ctx.sql(
      """SELECT STDDEV(price) AS sd, STDDEV_POP(price) AS sdp,
         VARIANCE(price) AS va, VAR_POP(price) AS vap,
         MEDIAN(price) AS me
         FROM t WHERE id = 1""").collect().head
    assert(r.get(r.fieldIndex("sd")) == null, "sample stddev of one value is NULL (count < 2)")
    assert(r.getAs[Double]("sdp") == 0.0, "population stddev of one value is 0.0")
    assert(r.get(r.fieldIndex("va")) == null)
    assert(r.getAs[Double]("vap") == 0.0)
    assert(r.getAs[Double]("me") == 100.0)
    // even-count MEDIAN averages the two middle values (compute.rs:115)
    val m2 = ctx.sql("SELECT MEDIAN(price) AS me FROM t WHERE symbol = 'AAPL'")
      .collect().head.getAs[Double]("me")
    assert(m2 == 100.75)
  }

  test("NULLIF type dispatch (values_equal:1679): epsilon floats; timestamp/decimal pairs never NULL") {
    // literal typing matters: BOTH engines parse decimal-point literals
    // as exact decimals (reference: LiteralValue::Decimal →
    // ScaledInteger, parser/expressions.rs:809), and values_equal has
    // NO ScaledInteger arm — so a decimal literal on either side means
    // NULLIF never nulls. The epsilon Float compare needs real doubles.
    val r = ctx.sql(
      """SELECT NULLIF(CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE), CAST(0.3 AS DOUBLE)) AS eps,
         NULLIF(price, CAST(100.0 AS DOUBLE)) AS dblHit,
         NULLIF(price, CAST(99.0 AS DOUBLE)) AS dblMiss,
         NULLIF(price, 100.0) AS decCross,
         NULLIF(1.5, 1.5) AS decPair,
         NULLIF(volume, 10) AS intHit,
         NULLIF(event_time, event_time) AS tsPair,
         NULLIF(symbol, volume) AS crossType
         FROM t WHERE id = 1""").collect().head
    assert(r.get(r.fieldIndex("eps")) == null,
      "|0.30000000000000004 - 0.3| < f64::EPSILON — the reference's absolute-epsilon compare nulls it")
    assert(r.get(r.fieldIndex("dblHit")) == null)
    assert(r.getAs[Double]("dblMiss") == 100.0)
    assert(r.getAs[Double]("decCross") == 100.0,
      "Float-vs-ScaledInteger has no values_equal arm — never NULL, even when numerically equal")
    assert(r.get(r.fieldIndex("decPair")) != null,
      "values_equal has NO ScaledInteger arm — equal decimal literals never NULL")
    assert(r.get(r.fieldIndex("intHit")) == null, "Integer==Integer is an exact i64 compare")
    assert(r.get(r.fieldIndex("tsPair")) != null,
      "values_equal has NO Timestamp arm — equal timestamps never NULL")
    assert(r.getAs[String]("crossType") == "AAPL",
      "String never equals Integer in values_equal")
  }

  test("NULLIF on float arrays recurses element-wise with the epsilon compare (values_equal:1690)") {
    val r = ctx.sql(
      """SELECT NULLIF(ARRAY(CAST(0.1 AS DOUBLE) + CAST(0.2 AS DOUBLE)),
                       ARRAY(CAST(0.3 AS DOUBLE))) AS epsArr,
         NULLIF(ARRAY(CAST(1.0 AS DOUBLE)), ARRAY(CAST(2.0 AS DOUBLE))) AS missArr,
         NULLIF(ARRAY(CAST(1.0 AS DOUBLE)),
                ARRAY(CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) AS lenArr,
         NULLIF(ARRAY(CAST(NULL AS DOUBLE)), ARRAY(CAST(NULL AS DOUBLE))) AS nullArr
         FROM t WHERE id = 1""").collect().head
    assert(r.get(r.fieldIndex("epsArr")) == null,
      "values_equal recurses into arrays — float ELEMENTS use the absolute-epsilon compare")
    assert(r.get(r.fieldIndex("missArr")) != null)
    assert(r.get(r.fieldIndex("lenArr")) != null, "length mismatch is never equal")
    assert(r.get(r.fieldIndex("nullArr")) == null,
      "Null==Null is true inside array recursion (values_equal:1681)")
  }

  test("HEADER_KEYS is a comma-joined string; SET_HEADER stringifies values (functions.rs:375,2613)") {
    val r2 = ctx.sql(
      """SELECT HEADER_KEYS() AS hk, SET_HEADER('n', price) AS h,
         SET_HEADER('z', CAST(NULL AS STRING)) AS hz
         FROM t WHERE id = 1""").collect().head
    assert(r2.getAs[String]("hk") == "source", "comma-joined STRING, not an array")
    assert(r2.getAs[scala.collection.Map[String, String]]("h").get("n").contains("100"),
      "header value stringified Rust-style (100.0 → '100')")
    assert(r2.getAs[scala.collection.Map[String, String]]("hz").get("z").contains("null"),
      "NULL header value renders as the string 'null' (functions.rs:2619)")
  }

  test("DELTA aggregate: max-min spread per group (functions.rs:1807)") {
    val rows = ctx.sql("SELECT symbol, DELTA(price) AS spread FROM t GROUP BY symbol")
      .collect().map(r => r.getAs[String]("symbol") -> r.getAs[Double]("spread")).toMap
    assert(rows == Map("AAPL" -> 1.5, "MSFT" -> 2.5))
  }

  test("JSON_EXISTS / JSON_QUERY semantics (functions.rs:1098,1138)") {
    import spark.implicits._
    ctx.register("jt", Seq(
      (1L, """{"a": {"b": 5}, "arr": [1,2], "s": "txt"}"""),
      (2L, """{"other": 1}""")).toDF("jid", "doc"))
    val r = ctx.sql(
      """SELECT jid,
         JSON_EXISTS(doc, '$.a.b') AS has_ab,
         JSON_EXISTS(doc, '$.missing') AS has_missing,
         JSON_QUERY(doc, '$.a') AS obj,
         JSON_QUERY(doc, '$.arr') AS arr,
         JSON_QUERY(doc, '$.s') AS scalar_is_null
         FROM jt""").collect().map(x => x.getAs[Long]("jid") -> x).toMap
    assert(r(1L).getAs[Boolean]("has_ab") && !r(1L).getAs[Boolean]("has_missing"))
    assert(r(1L).getAs[String]("obj") == """{"b":5}""")
    assert(r(1L).getAs[String]("arr") == "[1,2]")
    assert(r(1L).getAs[String]("scalar_is_null") == null) // scalars → NULL from JSON_QUERY
    assert(!r(2L).getAs[Boolean]("has_ab"))
  }

  test("SPLIT_PART and POSITION forms pass through to Spark natives") {
    val sp = ctx.sql("SELECT SPLIT_PART('a-b-c', '-', 2) AS p, POSITION('PL' IN symbol) AS pos FROM t WHERE id = 1")
      .collect().head
    assert(sp.getAs[String]("p") == "b" && sp.getAs[Int]("pos") == 3)
  }

  test("INTERVAL literals and timestamp arithmetic (interval_test.rs forms)") {
    val r = ctx.sql(
      """SELECT id,
         event_time + INTERVAL '5' MINUTES AS plus_5m,
         event_time - INTERVAL '30' SECONDS AS minus_30s,
         event_time + INTERVAL '1' DAY AS plus_1d
         FROM t WHERE id = 1""").collect().head
    val base = java.sql.Timestamp.valueOf("2024-03-05 10:00:00").getTime
    assert(r.getAs[java.sql.Timestamp]("plus_5m").getTime == base + 300000L)
    assert(r.getAs[java.sql.Timestamp]("minus_30s").getTime == base - 30000L)
    assert(r.getAs[java.sql.Timestamp]("plus_1d").getTime == base + 86400000L)
  }

  test("INTERVAL MONTH/YEAR are fixed 30/365 days; NANO/MICRO truncate to millis (types.rs:1402)") {
    // the reference collapses every interval to fixed millis BEFORE the
    // timestamp add (interval_to_millis) — a calendar-aware MONTH (what
    // Spark's own interval would do: 2024-03-05 + 1 MONTH = 2024-04-05,
    // 31 days later) would diverge by a day here
    val r = ctx.sql(
      """SELECT id,
         event_time + INTERVAL '1' MONTH AS plus_1mo,
         event_time - INTERVAL '2' YEARS AS minus_2y,
         event_time + INTERVAL '2500000' NANOSECONDS AS plus_ns,
         event_time + INTERVAL '1500' MICROSECONDS AS plus_us
         FROM t WHERE id = 1""").collect().head
    val base = java.sql.Timestamp.valueOf("2024-03-05 10:00:00").getTime
    assert(r.getAs[java.sql.Timestamp]("plus_1mo").getTime == base + 30L * 86400000L)
    assert(r.getAs[java.sql.Timestamp]("minus_2y").getTime == base - 2L * 365L * 86400000L)
    // 2,500,000 ns → 2 ms (i64 division truncates); 1500 µs → 1 ms, not 1.5
    assert(r.getAs[java.sql.Timestamp]("plus_ns").getTime == base + 2L)
    assert(r.getAs[java.sql.Timestamp]("plus_us").getTime == base + 1L)
  }

  test("SELECT-clause alias reuse (SELECT-ALIAS-REUSE.md) via Spark's lateral column aliases") {
    val r = ctx.sql(
      """SELECT price / volume AS unit_price,
         unit_price * 100 AS unit_price_pct,
         unit_price_pct + 1 AS chained_twice
         FROM t WHERE id = 1""").collect().head
    assert(r.getAs[Double]("unit_price") == 10.0)
    assert(r.getAs[Double]("unit_price_pct") == 1000.0)
    assert(r.getAs[Double]("chained_twice") == 1001.0)
    // also inside aggregates-with-grouping
    val g = ctx.sql(
      """SELECT symbol, MAX(price) AS top, top - MIN(price) AS spread
         FROM t GROUP BY symbol""").collect()
      .map(x => x.getAs[String]("symbol") -> x.getAs[Double]("spread")).toMap
    assert(g == Map("AAPL" -> 1.5, "MSFT" -> 2.5))
  }

  test("CASE / BETWEEN / LIKE / IS NULL / IN pass through to Catalyst") {
    runs("""SELECT CASE WHEN price > 100 THEN 'hi' ELSE 'lo' END,
            price BETWEEN 50 AND 200, symbol LIKE 'A%',
            props IS NOT NULL, volume IN (5, 10, 12) FROM t""")
  }

  test("all 7 reference subquery types (subquery-support.md)") {
    // scalar in SELECT — the scalar must be the real MAX, on every row
    val sc = ctx.sql("SELECT id, (SELECT MAX(price) FROM t) AS max_p FROM t").collect()
    assert(sc.length == 4 && sc.forall(_.getDouble(1) == 101.5))
    // WHERE EXISTS (correlated): both symbols have a same-symbol sibling
    assert(ctx.sql("SELECT id FROM t a WHERE EXISTS (SELECT 1 FROM t b WHERE b.symbol = a.symbol AND b.id <> a.id)")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // only the globally most expensive row (id 2, price 101.5) survives
    assert(ctx.sql("SELECT id FROM t a WHERE NOT EXISTS (SELECT 1 FROM t b WHERE b.price > a.price)")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    // IN: only AAPL rows have a price > 100 sibling symbol
    assert(ctx.sql("SELECT id FROM t WHERE symbol IN (SELECT symbol FROM t WHERE price > 100)")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // NOT IN: ids {1,2,3,4} minus volumes {10,12,5,6} → {1,2,3,4}∩∅... ids not in volumes
    assert(ctx.sql("SELECT id FROM t WHERE id NOT IN (SELECT volume FROM t)")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 3L, 4L))
    // ANY: price > min MSFT price (55.0) → every row except id 3
    assert(ctx.sql("SELECT id FROM t WHERE price > ANY (SELECT price FROM t WHERE symbol = 'MSFT')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L, 4L))
    assert(ctx.sql("SELECT id FROM t WHERE price > ALL (SELECT price FROM t WHERE symbol = 'MSFT')")
      .collect().map(_.getLong(0)).toSet == Set(1L, 2L))
    // scalar subquery in HAVING: 2 rows have volume < 7 → both groups
    // (n=2 each) pass; a dropped predicate would ALSO return both, so
    // assert the counts too
    val hv = ctx.sql("""SELECT symbol, COUNT(*) AS n FROM t GROUP BY symbol
            HAVING COUNT(*) >= (SELECT COUNT(*) FROM t WHERE volume < 7)""")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(hv == Map("AAPL" -> 2L, "MSFT" -> 2L))
    // HAVING EXISTS / NOT EXISTS, correlated on the group key
    // (reference: "HAVING EXISTS with GROUP BY and WINDOW queries")
    val he = ctx.sql(
      """SELECT symbol, COUNT(*) AS n FROM t GROUP BY symbol
         HAVING EXISTS (SELECT 1 FROM t u WHERE u.symbol = t.symbol AND u.volume > 10)""")
    assert(he.collect().map(_.getString(0)).toSeq == Seq("AAPL"))
    val hne = ctx.sql(
      """SELECT symbol, COUNT(*) AS n FROM t GROUP BY symbol
         HAVING NOT EXISTS (SELECT 1 FROM t u WHERE u.symbol = t.symbol AND u.volume > 10)""")
    assert(hne.collect().map(_.getString(0)).toSeq == Seq("MSFT"))
  }

  test("TUMBLE grouping form + watermark WITH properties (watermarks-time-semantics.md)") {
    val df = ctx.sql(
      """SELECT
            symbol,
            SUM(price) as total_sales,
            COUNT(*) as transaction_count
         FROM t
         GROUP BY
            symbol,
            TUMBLE(event_time, INTERVAL '5' MINUTE)
         WITH (
            'watermark.strategy' = 'bounded_out_of_orderness',
            'watermark.max_out_of_orderness' = '30s',
            'late.data.strategy' = 'dead_letter'
         )
         EMIT CHANGES""")
    // rows 1+2 share the 10:00-10:05 bucket
    assert(df.count() == 3)
  }

  // ---- r12: cross-evaluator pins for the last bare-'implemented'
  //      FUNCPARITY rows (each test reads the referenced Rust arm) ----

  test("math parity edges: ABS/CEIL/FLOOR/POWER types and values (functions.rs:405-577)") {
    val r = ctx.sql(
      """SELECT ABS(0 - 5) AS ai, ABS(CAST(0.0 - 5.5 AS DOUBLE)) AS af,
         CEIL(CAST(1.2 AS DOUBLE)) AS c1, CEIL(CAST(0.0 - 1.2 AS DOUBLE)) AS c2,
         CEILING(CAST(3.0 AS DOUBLE)) AS c3,
         FLOOR(CAST(1.8 AS DOUBLE)) AS f1, FLOOR(CAST(0.0 - 1.2 AS DOUBLE)) AS f2,
         POWER(2, 3) AS p1, POW(2.0, 0.5) AS p2,
         SQRT(CAST(4.0 AS DOUBLE)) AS sq, SQRT(CAST(0 - 1 AS DOUBLE)) AS sqneg
         FROM t WHERE id = 1""")
    val row = r.collect().head
    val tp = r.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    // ABS keeps the input kind (Integer→Integer, Float→Float,
    // functions.rs:405-422)
    assert(!tp("ai").contains("double") && row.getAs[Number]("ai").longValue == 5L)
    assert(tp("af") == "double" && row.getAs[Double]("af") == 5.5)
    // CEIL/FLOOR of a float return an INTEGER (i64), not a float
    // (functions.rs:474-511: `f.ceil() as i64`) — Spark's bigint result
    // is the same shape
    assert(tp("c1") == "bigint" && row.getAs[Long]("c1") == 2L)
    assert(row.getAs[Long]("c2") == -1L && row.getAs[Long]("c3") == 3L)
    assert(tp("f1") == "bigint" && row.getAs[Long]("f1") == 1L)
    assert(row.getAs[Long]("f2") == -2L)
    // POWER always returns Float, including Integer^Integer
    // (functions.rs:549-577: `(b as f64).powf(e as f64)`)
    assert(tp("p1") == "double" && row.getAs[Double]("p1") == 8.0)
    assert(math.abs(row.getAs[Double]("p2") - math.sqrt(2.0)) < 1e-12)
    assert(row.getAs[Double]("sq") == 2.0)
    // DOCUMENTED DIVERGENCE: the reference ERRORS the whole query on a
    // negative SQRT input (functions.rs:512-547); a 100 TB batch dying
    // on one bad row is the wrong trade, so this engine keeps IEEE NaN
    // (degrade-don't-throw). Pinned so a silent change trips a test.
    assert(java.lang.Double.isNaN(row.getAs[Double]("sqneg")))
  }

  test("MOD truncates toward zero like the reference; LEAST/GREATEST skip NULLs and promote numerics (functions.rs:578-620,2531-2586)") {
    val r = ctx.sql(
      """SELECT MOD(0 - 7, 3) AS m1, MOD(7, 0 - 3) AS m2,
         MOD(CAST(7.5 AS DOUBLE), CAST(2.0 AS DOUBLE)) AS mf,
         LEAST(2, CAST(1.5 AS DOUBLE)) AS l1, LEAST(NULL, 5) AS l2, LEAST('b', 'a') AS l3,
         GREATEST(2, CAST(2.5 AS DOUBLE)) AS g1, GREATEST(NULL, 5) AS g2
         FROM t WHERE id = 1""")
    val row = r.collect().head
    // Rust % truncates toward zero: -7 % 3 = -1, 7 % -3 = 1 — Spark's
    // % is the same convention (NOT pmod)
    assert(row.getAs[Number]("m1").longValue == -1L)
    assert(row.getAs[Number]("m2").longValue == 1L)
    assert(row.getAs[Double]("mf") == 1.5)
    // promote_numeric_types: Integer promotes to Float when mixed
    // (functions.rs:2249); NULL never wins min/max (compare_values_*
    // 2216-2246: "anything is less than NULL") — Spark's least/greatest
    // skip NULLs identically
    assert(row.getAs[Double]("l1") == 1.5)
    assert(row.getAs[Number]("l2").longValue == 5L)
    assert(row.getAs[String]("l3") == "a")
    assert(row.getAs[Double]("g1") == 2.5)
    assert(row.getAs[Number]("g2").longValue == 5L)
  }

  test("FROM_UNIXTIME returns a TIMESTAMP value, not a formatted string (functions.rs:2413-2447)") {
    val r = ctx.sql(
      """SELECT FROM_UNIXTIME(1700000000) AS ft, FROM_UNIXTIME(1.5) AS ff,
         FROM_UNIXTIME(NULL) AS fn FROM t WHERE id = 1""")
    val tp = r.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(tp("ft") == "timestamp" && tp("ff") == "timestamp")
    val row = r.collect().head
    // chrono from_timestamp(1700000000, 0).naive_utc() — session zone
    // is pinned UTC, so the rendered wall-clock matches
    assert(row.getAs[Timestamp]("ft").toString == "2023-11-14 22:13:20.0")
    // the Float arm keeps sub-second precision (nanos in the reference,
    // micros here — Spark's native precision)
    assert(row.getAs[Timestamp]("ff").toString == "1970-01-01 00:00:01.5")
    assert(row.isNullAt(row.fieldIndex("fn")))
  }

  test("REGEXP_REPLACE replaces FIRST match by default; 'g' replaces all, 'i' case-insensitive (functions.rs:784-868)") {
    val r = ctx.sql(
      """SELECT REGEXP_REPLACE('aaa', 'a', 'b') AS first_only,
         REGEXP_REPLACE('aaa', 'a', 'b', 'g') AS all_g,
         REGEXP_REPLACE('AaA', 'a', 'b', 'gi') AS ci,
         REGEXP_REPLACE('x1y2', '[0-9]', '#', 'g') AS digits,
         REGEXP_REPLACE(NULL, 'a', 'b') AS rnull
         FROM t WHERE id = 1""")
    val row = r.collect().head
    // Rust Regex::replace (no flag) rewrites only the first match —
    // Spark's builtin would give 'bbb' here
    assert(row.getAs[String]("first_only") == "baa")
    assert(row.getAs[String]("all_g") == "bbb")
    assert(row.getAs[String]("ci") == "bbb")
    assert(row.getAs[String]("digits") == "x#y#")
    assert(row.isNullAt(row.fieldIndex("rnull")))
  }

  test("REGEXP_REPLACE ${N} braced refs do not absorb trailing digits (Rust ${1}0 = group 1 + literal 0)") {
    val r = ctx.sql(
      """SELECT REGEXP_REPLACE('abcdefghijkl', '(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)(l)', '${1}0') AS braced,
         REGEXP_REPLACE('abcdefghijkl', '(a)(b)(c)(d)(e)(f)(g)(h)(i)(j)(k)(l)', '$10') AS unbraced,
         REGEXP_REPLACE('xy', '(x)(y)', '${1}23') AS braced_23
         FROM t WHERE id = 1""")
    val row = r.collect().head
    // Rust: ${1}0 is group 1 then literal "0" — the old Java-syntax
    // translation emitted $10, which Java greedily parsed as group 10
    assert(row.getAs[String]("braced") == "a0")
    // UNBRACED $10 is the ambiguous spelling: Rust parses the longest
    // digit run as the group NAME/number → group 10 ("j")
    assert(row.getAs[String]("unbraced") == "j")
    assert(row.getAs[String]("braced_23") == "x23")
  }

  test("JOIN delimiter is strict: non-string type and NULL value error as the reference does (functions.rs:1011-1019)") {
    // non-string-typed delimiter → error at plan/analysis time
    val e1 = intercept[Throwable](ctx.sql(
      "SELECT JOIN(1, 'a', 'b') AS j FROM t WHERE id = 1").collect())
    assert(e1.getMessage != null)
    // NULL delimiter value → per-row error, not a silently-NULL row
    val e2 = intercept[Throwable](ctx.sql(
      "SELECT JOIN(CAST(NULL AS STRING), 'a', 'b') AS j FROM t WHERE id = 1").collect())
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(messages(e2).exists(_.contains("JOIN delimiter must be a string")), messages(e2))
    // string delimiters still work, with NULL VALUES rendered 'NULL'
    val ok = ctx.sql("SELECT JOIN('-', 'a', NULL, 'b') AS j FROM t WHERE id = 1")
      .collect().head.getAs[String]("j")
    assert(ok == "a-NULL-b")
  }

  test("REGEXP_REPLACE replacement/pattern corners follow Rust: missing groups empty, literal $, Unicode classes") {
    val r = ctx.sql(
      """SELECT REGEXP_REPLACE('aaa', 'a', '$1') AS missing_group,
         REGEXP_REPLACE('cost', 't', 'US$', 'g') AS trailing_dollar,
         REGEXP_REPLACE('ab', '(a)', '[$1]') AS real_group,
         REGEXP_REPLACE('price', 'p', '$$') AS dollar_escape,
         REGEXP_REPLACE('ÉCLAIR', 'é', 'x', 'i') AS uni_fold
         FROM t WHERE id = 1""")
    val row = r.collect().head
    // Rust expands a reference to a group the pattern does not define
    // to the EMPTY string; Java's Matcher would throw
    // IndexOutOfBoundsException per row and kill the whole job
    assert(row.getAs[String]("missing_group") == "aa")
    // a lone/trailing '$' is literal in Rust; Java alone would throw
    // 'Illegal group reference'
    assert(row.getAs[String]("trailing_dollar") == "cosUS$")
    assert(row.getAs[String]("real_group") == "[a]b")
    assert(row.getAs[String]("dollar_escape") == "$rice")
    // Rust regex case-folding is Unicode by default; Java's (?i) is
    // ASCII-only without (?U) (the velo_trim precedent)
    assert(row.getAs[String]("uni_fold") == "xCLAIR")
  }

  test("STRUCT duplicate literal names keep ONE field (reference HashMap semantics); MAP rejects non-string/integer keys at analysis") {
    val r = ctx.sql("SELECT STRUCT('a', 1, 'a', 2) AS s FROM t WHERE id = 1")
    val s = r.collect().head.getAs[org.apache.spark.sql.Row]("s")
    // the reference's HashMap keeps one 'a' (last insert wins);
    // un-deduped named_struct would make `.a` access ambiguous
    assert(s.schema.fieldNames.toSeq == Seq("a"))
    assert(s.getAs[Number]("a").longValue == 2L)
    // reference: "MAP keys must be strings or integers" (runtime error
    // there, analysis-time rejection here)
    val e = intercept[Exception](
      ctx.sql("SELECT MAP(CAST(1.5 AS DOUBLE), 'x') AS m FROM t").collect())
    assert(String.valueOf(e.getMessage).toLowerCase.contains("map keys") ||
      String.valueOf(e.getMessage).contains("DATATYPE_MISMATCH"))
  }

  test("STRUCT name/value-pair and positional arms; ARRAY constructor; MAP stringifies integer keys (functions.rs:1306-1383)") {
    val r = ctx.sql(
      """SELECT STRUCT('a', 1, 'b', symbol) AS s_named,
         STRUCT(symbol, price, volume) AS s_pos,
         ARRAY(1, 2, 3) AS arr,
         MAP(1, 'x', 'k', 'y') AS m
         FROM t WHERE id = 1""")
    val row = r.collect().head
    val sNamed = row.getAs[org.apache.spark.sql.Row]("s_named")
    // even argument count = name/value pairs (functions.rs:1324-1343)
    assert(sNamed.schema.fieldNames.toSeq == Seq("a", "b"))
    assert(sNamed.getAs[Number]("a").longValue == 1L && sNamed.getAs[String]("b") == "AAPL")
    // odd argument count = positional field0..fieldN (functions.rs:1345-1350)
    val sPos = row.getAs[org.apache.spark.sql.Row]("s_pos")
    assert(sPos.schema.fieldNames.toSeq == Seq("field0", "field1", "field2"))
    assert(sPos.getAs[String]("field0") == "AAPL")
    assert(row.getAs[scala.collection.Seq[Any]]("arr").map(_.asInstanceOf[Number].longValue) ==
      Seq(1L, 2L, 3L))
    // MAP keys must be strings or integers and integers STRINGIFY
    // (functions.rs:1369-1379) — every reference map is string-keyed
    val m = row.getAs[Map[String, String]]("m")
    assert(m == Map("1" -> "x", "k" -> "y"))
  }

  test("r12 review batch: EPOCH on string ts, NULLIF array literal, dynamic-precision decimal ROUND, named WINDOW rewrite, JSON_EXISTS dynamic-path NULLs") {
    import spark.implicits._
    val rows = Seq(
      (1L, "2024-06-01 10:00:00", 2.5, java.math.BigDecimal.valueOf(12345, 2), 1,
        Seq(0.1 + 0.2), "{\"k\": 1}", "$.k"),
      (2L, "2024-06-01 11:00:00", 7.5, java.math.BigDecimal.valueOf(98765, 2), 0,
        Seq(0.5), null, "$.k")
    ).toDF("rid", "sts", "d", "dec", "prec", "farr", "payload", "pathc")
    ctx.register("r12_t", rows)
    // EXTRACT(EPOCH FROM <string ts>) casts through TIMESTAMP — a bare
    // BIGINT cast of the string read NULL on every row (silent wrong
    // output)
    val ep = ctx.sql("SELECT EXTRACT(EPOCH FROM sts) AS e FROM r12_t WHERE rid = 1")
      .collect().head
    assert(!ep.isNullAt(0) && ep.getAs[Long]("e") == 1717236000L)
    // NULLIF(float-array COLUMN, array literal): containsNull mismatch
    // must not skip the element-wise epsilon compare — [0.1+0.2] vs
    // [0.3] IS equal in the reference (absolute-epsilon floats)
    val nf = ctx.sql("SELECT NULLIF(farr, ARRAY(CAST(0.3 AS DOUBLE))) AS n FROM r12_t")
      .collect().map(r => r.isNullAt(0))
    assert(nf.toSeq == Seq(true, false))
    // decimal column + per-record precision: the reference evaluates
    // precision per record; Spark's Round demands a foldable scale, so
    // the dynamic path goes through the f64 arithmetic the reference's
    // ScaledInteger arm uses anyway
    val dr = ctx.sql("SELECT ROUND(dec, prec) AS r FROM r12_t ORDER BY rid")
      .collect().map(_.getAs[java.math.BigDecimal]("r").doubleValue)
    assert(dr.toSeq == Seq(123.5, 988.0))
    // named WINDOW clause goes through the dialect rewriter: LEN is a
    // dialect name (byte length) that reaches Catalyst as velo-lowered
    // code, not an undefined function
    val nw = ctx.sql(
      """SELECT rid, COUNT(*) OVER w AS c FROM r12_t
         WINDOW w AS (PARTITION BY LEN(sts))""")
    assert(nw.collect().length == 2)
    // JSON_EXISTS with a DYNAMIC path keeps the reference NULL rules
    // where expressible: NULL json → NULL (a bare IS-NOT-NULL probe
    // read it as false)
    val je = ctx.sql("SELECT JSON_EXISTS(payload, pathc) AS x FROM r12_t ORDER BY rid")
      .collect()
    assert(je(0).getAs[Boolean]("x") && je(1).isNullAt(0))
  }

  test("NOW/CURRENT_TIMESTAMP surface as TIMESTAMP here — documented divergence from the reference's epoch-millis Integer (functions.rs:2319-2337)") {
    // The reference returns Integer milliseconds since epoch from both.
    // This engine keeps TIMESTAMP so event-time comparisons and
    // interval arithmetic type-check (`event_time > NOW() - INTERVAL
    // …`); epoch millis are one UNIX_TIMESTAMP()*1000 away. The pin
    // here is the TYPE CHOICE, so a silent change trips a test.
    val r = ctx.sql("SELECT NOW() AS n, CURRENT_TIMESTAMP AS c FROM t WHERE id = 1")
    val tp = r.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(tp("n") == "timestamp" && tp("c") == "timestamp")
    assert(r.collect().nonEmpty)
  }
}
