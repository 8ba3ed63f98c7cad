package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import graft.functions.VeloFunctions._

/** Every VeloFunctions combinator (the reference's 75-function catalog
  * as Column API) evaluated against expected values — none of the
  * surface is implemented-but-unverified.
  */
class VeloFunctionsSpec extends AnyFunSuite with SparkTestSession {

  private lazy val df = {
    import spark.implicits._
    Seq((" Hello World ", -3.7, 10L, 2.0, Timestamp.valueOf("2024-03-05 10:30:45"),
      """{"a": {"b": 7}}"""))
      .toDF("s", "x", "n", "p", "ts", "j")
  }

  private def one(c: org.apache.spark.sql.Column): Any =
    df.select(c.as("r")).collect().head.get(0)

  test("math surface") {
    assert(one(veloAbs(col("x"))) == 3.7)
    assert(one(veloRound(col("x"), 1)) == -3.7)
    assert(one(veloCeil(col("x"))) == -3L)
    assert(one(veloFloor(col("x"))) == -4L)
    assert(one(veloSqrt(lit(16.0))) == 4.0)
    assert(one(veloPower(col("p"), lit(3))) == 8.0)
    assert(one(veloMod(col("n"), lit(3))) == 1L)
    assert(one(veloLeast(col("n"), lit(3))) == 3L)
    assert(one(veloGreatest(col("n"), lit(3))) == 10L)
  }

  test("string surface") {
    assert(one(veloUpper(veloTrim(col("s")))) == "HELLO WORLD")
    assert(one(veloLower(veloTrim(col("s")))) == "hello world")
    assert(one(veloSubstring(veloTrim(col("s")), 1, 5)) == "Hello")
    assert(one(veloReplace(veloTrim(col("s")), "World", "W.")) == "Hello W.")
    assert(one(veloLtrim(col("s"))) == "Hello World ")
    assert(one(veloRtrim(col("s"))) == " Hello World")
    assert(one(veloLength(veloTrim(col("s")))) == 11)
    assert(one(veloConcat(lit("a"), lit("-"), lit("b"))) == "a-b")
    // reference SPLIT returns the FIRST part as a string
    // (functions.rs split_function); the full array is the
    // Spark-native veloSplitParts extension
    assert(one(veloSplit(veloTrim(col("s")), " ")) == "Hello")
    assert(one(size(veloSplitParts(veloTrim(col("s")), " "))) == 2)
    assert(one(veloJoin("_", lit("Hello"), lit("World"))) == "Hello_World")
    assert(one(veloLeft(veloTrim(col("s")), 2)) == "He")
    assert(one(veloRight(veloTrim(col("s")), 2)) == "ld")
    assert(one(veloPosition("World", veloTrim(col("s")))) == 7)
    assert(one(veloRegexp(veloTrim(col("s")), "^Hel")) == true)
  }

  test("reference edge parity: usize wraps, byte lengths, Unicode trim, variadic JOIN (functions.rs)") {
    import spark.implicits._
    val df = Seq(Tuple1("héllo")).toDF("u")
    def one[T](c: org.apache.spark.sql.Column): T =
      df.select(c).collect().head.get(0).asInstanceOf[T]
    // negative SUBSTRING start wraps to a huge skip → empty (NOT
    // Spark's count-from-the-end); negative len → rest of string
    assert(one[String](veloSubstring(col("u"), -3, 3)) == "")
    assert(one[String](veloSubstring(col("u"), 2, -1)) == "éllo")
    // negative LEFT/RIGHT n wraps to take-everything → whole string
    assert(one[String](veloLeft(col("u"), -1)) == "héllo")
    assert(one[String](veloRight(col("u"), -1)) == "héllo")
    // LENGTH is UTF-8 BYTES (é = 2 bytes); POSITION is 1-based bytes
    assert(one[Int](veloLength(col("u"))) == 6)
    assert(one[Int](veloPosition("l", col("u"))) == 4)
    // TRIM strips all Unicode whitespace like Rust str::trim
    assert(one[String](veloTrim(lit("\thello\n"))) == "hello")
    assert(one[String](veloLtrim(lit(" x "))) == "x ")
    assert(one[String](veloRtrim(lit(" x\r\n"))) == " x")
    // JOIN(delim, v1, v2, …): delimiter FIRST, non-strings
    // stringified, NULL rendered as the literal 'NULL'
    assert(one[String](veloJoin(",", lit("a"), lit(null).cast("string"), lit(7))) == "a,NULL,7")
  }

  test("date/time surface") {
    assert(one(veloExtract("YEAR", col("ts"))) == 2024)
    assert(one(veloExtract("MONTH", col("ts"))) == 3)
    assert(one(veloExtract("DAY", col("ts"))) == 5)
    assert(one(veloExtract("HOUR", col("ts"))) == 10)
    assert(one(veloExtract("MINUTE", col("ts"))) == 30)
    assert(one(veloExtract("SECOND", col("ts"))) == 45)
    assert(one(veloExtract("DOW", col("ts"))) == 2) // Tuesday, 0=Sunday
    assert(one(veloExtract("DOY", col("ts"))) == 65)
    // reference functions.rs:1910-1927 also supports these parts
    assert(one(veloExtract("QUARTER", col("ts"))) == 1)
    assert(one(veloExtract("EPOCH", col("ts"))) == 1709634645L)
    assert(one(veloExtract("MILLISECOND", col("ts"))) == 0)
    assert(one(veloExtract("MICROSECOND", col("ts"))) == 0)
    assert(one(veloExtract("NANOSECOND", col("ts"))) == 0L)
    // sub-second parts are the FRACTION (reference timestamp_subsec_*),
    // not the postgres seconds-inclusive reading — a .0-second timestamp
    // reads 0 under both conventions, so pin one with nonzero seconds
    // AND a nonzero fraction, plus a pre-1970 instant (chrono's subsec
    // accessors never go negative; Java % would)
    val frac = to_timestamp(lit("2024-03-05 10:30:44.123"))
    assert(one(veloExtract("MILLISECOND", frac)) == 123)
    assert(one(veloExtract("MICROSECOND", frac)) == 123000)
    assert(one(veloExtract("NANOSECOND", frac)) == 123000000L)
    val pre1970 = to_timestamp(lit("1969-12-31 23:59:59.123"))
    assert(one(veloExtract("MILLISECOND", pre1970)) == 123)
    assert(one(veloExtract("MICROSECOND", pre1970)) == 123000)
    assert(one(veloDateFormat(col("ts"), "yyyy/MM/dd")) == "2024/03/05")
    assert(one(veloDateDiff(col("ts"), to_timestamp(lit("2024-03-08 00:00:00")))) == 3)
    assert(one(veloUnixTimestamp(col("ts"))) == 1709634645L)
    assert(one(veloFromUnixtime(lit(1709634645L))).toString == "2024-03-05 10:30:45.0")
    assert(one(tumbleStart(col("ts"), 3600L)) == 1709632800L)
    assert(one(tumbleEnd(col("ts"), 3600L)) == 1709636400L)
    assert(one(veloNow()).isInstanceOf[Timestamp])
  }

  test("conditional + JSON + array/map surface") {
    assert(one(veloCoalesce(lit(null), lit("x"))) == "x")
    assert(one(veloNullif(lit("a"), lit("a"))) == null)
    assert(one(veloCast(col("n"), "string")) == "10")
    assert(one(jsonExtract(col("j"), "$.a.b")) == "7")
    assert(one(jsonValue(col("j"), "$.a.b")) == "7")
    assert(one(arrayLength(veloArray(lit(1), lit(2), lit(3)))) == 3)
    assert(one(arrayContains(veloArray(lit(1), lit(2)), 2)) == true)
    assert(one(veloStruct(lit(1).as("a"), lit("b").as("s"))).toString == "[1,b]")
    assert(one(arrayLength(mapKeys(veloMap(lit("k"), lit("v"))))) == 1)
    assert(one(element_at(mapValues(veloMap(lit("k"), lit("v"))), 1)) == "v")
  }

  test("header ops surface") {
    val h = veloMap(lit("a"), lit("1"), lit("b"), lit("2"))
    assert(one(header(h, "a")) == "1")
    assert(one(hasHeader(h, "z")) == false)
    assert(one(arrayLength(headerKeys(h))) == 2)
    assert(one(header(setHeader(h, "c", lit("3")), "c")) == "3")
    assert(one(hasHeader(removeHeader(h, "a"), "a")) == false)
    // SET_HEADER on an EXISTING key is an upsert — naive map_concat
    // throws DUPLICATE_MAP_KEY at runtime on the re-stamp case
    assert(one(header(setHeader(h, "a", lit("9")), "a")) == "9")
    assert(one(arrayLength(headerKeys(setHeader(h, "a", lit("9"))))) == 2)
    // key PRESENCE, not value-nullness: a header carried with a NULL
    // value (legal in Kafka) must report true — contains_key semantics,
    // matching the reference and the SQL dialect's HAS_HEADER
    val withNull = veloMap(lit("trace"), lit(null).cast("string"))
    assert(one(hasHeader(withNull, "trace")) == true)
    assert(one(hasHeader(withNull, "absent")) == false)
  }

  test("header ops treat a NULL map as empty (headerless Kafka records)") {
    // Spark's kafka source emits a null headers column for records with
    // no headers; map_filter/map_concat/map_contains_key all propagate
    // that null — the first stamp would silently vanish and HAS_HEADER
    // would go three-valued instead of false
    val nullMap = lit(null).cast("map<string,string>")
    assert(one(hasHeader(nullMap, "k")) == false)
    assert(one(header(setHeader(nullMap, "job", lit("graft")), "job")) == "graft")
    assert(one(arrayLength(headerKeys(nullMap))) == 0)
    assert(one(arrayLength(headerKeys(removeHeader(nullMap, "k")))) == 0)
  }

  test("tumbling window size <= 0 rejected at plan build") {
    // size 0 divides by zero: every row lands in one silent NULL bucket
    intercept[IllegalArgumentException](tumbleStart(col("ts"), 0L))
    intercept[IllegalArgumentException](tumbleEnd(col("ts"), -5L))
  }

  test("exact decimal money surface") {
    import spark.implicits._
    val m = Seq(0.1, 0.2, 0.3).toDF("v")
    // double sum of 0.1+0.2+0.3 != 0.6 exactly; decimal sum is exact
    val exact = m.agg(sum(money(col("v"))).cast("double")).collect().head.getDouble(0)
    assert(exact == 0.6)
  }

  test("r12 review: EPOCH floors pre-1970, JOIN renders floats like CONCAT, %e space-pads, '#' literal survives") {
    // EXTRACT(EPOCH): cast-to-long FLOORS — unix_timestamp truncates
    // toward zero and read 0 for this pre-1970 fractional instant,
    // disagreeing with veloUnixTimestamp and the dialect lowering
    assert(one(veloExtract("EPOCH",
      lit("1969-12-31 23:59:59.5").cast("timestamp"))) == -1L)
    assert(one(veloExtract("EPOCH", lit("2024-03-05 00:00:01"))) == 1709596801L)
    // JOIN stringifies through the SAME Rust-Display kernel as CONCAT:
    // 1234567.0 renders "1234567" (f.to_string()), not Spark's "1234567.0"
    assert(one(veloJoin(",", lit(1234567.0), lit("x"))) == "1234567,x")
    assert(one(veloConcat(lit(1234567.0))) == "1234567")
    // chrono %e is SPACE-padded day-of-month: "Jan  5", not "Jan 5"
    assert(one(veloDateFormat(lit("2026-01-05 10:00:00").cast("timestamp"),
      "%b %e")) == "Jan  5")
    assert(one(veloDateFormat(lit("2026-01-15 10:00:00").cast("timestamp"),
      "%b %e")) == "Jan 15")
    // '#' is reserved by Java's DateTimeFormatter — unquoted it throws;
    // chrono renders it literally
    assert(one(veloDateFormat(lit("2026-01-05 10:00:00").cast("timestamp"),
      "%Y#%m")) == "2026#01")
  }

  test("r14 review: '[' ']' literals survive, string ts epoch/bucket, negative LEFT stringifies") {
    def one(c: org.apache.spark.sql.Column): Any =
      spark.range(1).select(c).collect().head.get(0)
    // '[' / ']' open DateTimeFormatter OPTIONAL SECTIONS — unquoted
    // they silently vanish from the output (balanced) or throw
    // (unbalanced); chrono renders them literally
    assert(one(veloDateFormat(lit("2024-03-05 10:00:00").cast("timestamp"),
      "%Y[%m]")) == "2024[03]")
    assert(one(veloDateFormat(lit("2024-03-05 10:00:00").cast("timestamp"),
      "%H]")) == "10]")
    // STRING time columns work through the timestamp hop, like the
    // dialect's UNIX_TIMESTAMP/TUMBLE_START lowerings and EXTRACT(EPOCH)
    assert(one(veloUnixTimestamp(lit("1970-01-01 00:01:00"))) == 60L)
    assert(one(tumbleStart(lit("1970-01-01 00:01:07"), 60L)) == 60L)
    // timestamp inputs unchanged (pre-1970 fractional still FLOORS)
    assert(one(veloUnixTimestamp(lit("1969-12-31 23:59:59.5").cast("timestamp"))) == -1L)
    // negative LEFT/RIGHT on a NON-string column stringifies like the
    // positive arm does — the result type must not flip with n's sign
    assert(one(veloLeft(lit(12345), -1)) == "12345")
    assert(one(veloRight(lit(12345), 2)) == "45")
  }

  test("r16 review: Column API routes through the Velo expressions, not the Spark builtins") {
    // veloRound must answer like velo_round: 1.005's f64 product is
    // 100.4999… → 1.0 through the reference's multiply-round-divide,
    // where Spark's round reads the shortest decimal form and says
    // 1.01 — the divergence pin; 8.835 agrees both ways (its binary
    // value sits ABOVE the edge) and just checks the path works
    assert(one(veloRound(lit(1.005), 2)) == 1.0, "binary 1.005 rounds down through f64")
    assert(one(veloRound(lit(8.835), 2)) == 8.84)
    // integers pass through at ANY precision (the reference's arm)
    assert(one(veloRound(lit(127L), -1)) == 127L)
    // arrayContains: null-safe false (not NULL) on no-match-with-nulls,
    // epsilon floats, JSON-string payloads — the velo_array_contains rules
    assert(one(arrayContains(array(lit(1.0), lit(null).cast("double")), 3.0))
      == false, "reference says false; Spark's array_contains says NULL")
    // r17: the non-nullable same-type search takes a codegen fast arm
    // (builtin array_contains + coalesce) — its answers must be
    // bit-identical to the lambda arm on all three edges: found,
    // no-match-with-null-element (FALSE, not NULL), null array (NULL)
    assert(one(arrayContains(array(lit("R"), lit("O")), "R")) == true)
    assert(one(arrayContains(array(lit("N"), lit(null).cast("string")), "R"))
      == false, "fast arm: no-match with null element reads FALSE")
    assert(one(arrayContains(lit(null).cast("array<string>"), "R")) == null,
      "fast arm: NULL array reads NULL")
    assert(one(arrayContains(array(lit(0.1) + lit(0.2)), 0.3)) == true, "epsilon compare")
    assert(one(arrayContains(lit("[1,2,3]"), 2)) == true, "JSON-string payload")
    // arrayLength / mapKeys accept the reference's JSON-text payloads
    assert(one(arrayLength(lit("[1,2,3]"))) == 3)
    assert(one(mapKeys(lit("""{"a":1,"b":2}""")))
      .asInstanceOf[scala.collection.Seq[_]] == Seq("a", "b"))
    assert(one(mapKeys(struct(lit(1).as("f1"), lit(2).as("f2"))))
      .asInstanceOf[scala.collection.Seq[_]] == Seq("f1", "f2"))
    // veloRegexp compiles Unicode classes + Rust named-group spelling
    assert(one(veloRegexp(lit("héllo"), "^\\w+$")) == true, "Rust \\w is Unicode")
    assert(one(veloRegexp(lit("hello"), "(?P<g>ell)")) == true, "(?P<…> spelling")
    // sub-second EXTRACT works on STRING time columns (the EPOCH hop)
    assert(one(veloExtract("MILLISECOND", lit("2024-03-05 10:30:44.123"))) == 123)
  }
}
