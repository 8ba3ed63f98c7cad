package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference engine's scalar/aggregate function surface, re-expressed
  * as Spark `Column` combinators (codegen'd built-ins wherever possible).
  *
  * Catalog source: reference docs/sql/FUNCTION_CATALOG.md (75 functions)
  * and src/velostream/sql/execution/expression/. Names follow the
  * reference (velostream is case-insensitive; we expose lowerCamel).
  *
  * Everything here stays inside WholeStageCodegen — no Scala UDFs.
  */
object VeloFunctions {

  // ---- Math (reference: FUNCTION_CATALOG.md "Math Functions") ----
  def veloAbs(c: Column): Column = abs(c)
  def veloRound(c: Column, scale: Int = 0): Column = round(c, scale)
  def veloCeil(c: Column): Column = ceil(c)
  def veloFloor(c: Column): Column = floor(c)
  def veloSqrt(c: Column): Column = sqrt(c)
  def veloPower(c: Column, p: Column): Column = pow(c, p)
  def veloMod(a: Column, b: Column): Column = a % b
  def veloLeast(cs: Column*): Column = least(cs: _*)
  def veloGreatest(cs: Column*): Column = greatest(cs: _*)

  // ---- String (reference: string function table; edge semantics
  //      mirror functions.rs — the observable behavior a reference
  //      user's queries depend on, including its usize-wrap edges) ----
  def veloUpper(c: Column): Column = upper(c)
  def veloLower(c: Column): Column = lower(c)
  /** 1-based SUBSTRING(str, pos, len) — reference edge semantics
    * (functions.rs substring_function): `start as usize` wraps a
    * NEGATIVE pos to a huge skip → EMPTY string (Spark's substring
    * counts negatives from the END — a silent row-level divergence);
    * a negative len wraps to take-everything → rest of string;
    * pos 0 saturates to 1. */
  def veloSubstring(c: Column, pos: Int, len: Int): Column =
    if (pos < 0) when(c.isNull, lit(null).cast("string")).otherwise(lit(""))
    else if (len < 0) substring(c, math.max(pos, 1), Int.MaxValue)
    else substring(c, math.max(pos, 1), len)
  // literal substring replace: the built-in StringReplace, not a
  // quoted-pattern trip through the regex engine
  def veloReplace(c: Column, find: String, repl: String): Column =
    replace(c, lit(find), lit(repl))
  /** TRIM family strips ALL Unicode whitespace (Rust str::trim /
    * char::is_whitespace — functions.rs:740), not just ASCII space
    * like Spark's trim: '\thello\n' must trim to 'hello' on both
    * engines. (?U) = Java UNICODE_CHARACTER_CLASS, whose \s is the
    * same White_Space property Rust uses. */
  def veloTrim(c: Column): Column = regexp_replace(c, "(?U)^\\s+|(?U)\\s+$", "")
  def veloLtrim(c: Column): Column = regexp_replace(c, "(?U)^\\s+", "")
  def veloRtrim(c: Column): Column = regexp_replace(c, "(?U)\\s+$", "")
  /** LENGTH is BYTE length (reference: s.len() over UTF-8 bytes,
    * functions.rs:915) — 'héllo' is 6, not 5. */
  def veloLength(c: Column): Column = octet_length(c)
  def veloConcat(cs: Column*): Column = concat(cs: _*)
  /** SPLIT(str, delim) returns the FIRST part as a STRING — the
    * reference's documented behavior (functions.rs split_function:
    * 'Return first part for simplicity'); an array-returning split
    * would change both type and value of ported queries. The full
    * array remains available as [[veloSplitParts]]. */
  def veloSplit(c: Column, sep: String): Column = substring_index(c, sep, 1)
  /** All parts (Spark-native extension; not the reference's SPLIT). */
  def veloSplitParts(c: Column, sep: String): Column =
    split(c, java.util.regex.Pattern.quote(sep))
  /** JOIN(delim, v1, v2, …) — the reference's VARIADIC scalar join
    * (functions.rs join_function): delimiter FIRST, non-strings
    * stringified, NULL rendered as the literal 'NULL' (concat_ws
    * alone would silently SKIP nulls). */
  def veloJoin(sep: String, parts: Column*): Column =
    concat_ws(sep, parts.map(p => coalesce(p.cast("string"), lit("NULL"))): _*)
  /** LEFT/RIGHT with a NEGATIVE n return the WHOLE string (reference:
    * `n as usize` wraps to take-everything — Spark returns empty). */
  def veloLeft(c: Column, n: Int): Column = if (n < 0) c else left(c, lit(n))
  def veloRight(c: Column, n: Int): Column = if (n < 0) c else right(c, lit(n))
  /** 1-based BYTE position of needle (reference: str::find byte
    * offsets, functions.rs:2517 — 'l' in 'héllo' is 4, not 3);
    * 0 when absent. */
  def veloPosition(needle: String, haystack: Column): Column = {
    val charPos = instr(haystack, needle)
    when(charPos === 0, lit(0))
      .otherwise(octet_length(substring(haystack, lit(1), charPos - 1)) + 1)
  }
  /** REGEXP(str, pattern) — true when the pattern matches anywhere. */
  def veloRegexp(c: Column, pattern: String): Column = c.rlike(pattern)

  // ---- Date/Time (reference: date/time table) ----
  def veloNow(): Column = current_timestamp()
  def veloExtract(field: String, ts: Column): Column = field.toUpperCase(java.util.Locale.ROOT) match {
    case "YEAR"   => year(ts)
    case "MONTH"  => month(ts)
    case "DAY"    => dayofmonth(ts)
    case "HOUR"   => hour(ts)
    case "MINUTE" => minute(ts)
    case "SECOND" => second(ts)
    case "DOW"    => dayofweek(ts) - lit(1) // 0=Sunday, matches DuckDB/postgres dow
    case "DOY"    => dayofyear(ts)
    case "WEEK"   => weekofyear(ts)
    // the reference's EXTRACT supports these too (functions.rs:1910-1927).
    // Sub-second fields are the 0-bounded FRACTION (functions.rs:1921-1923
    // timestamp_subsec_*), NOT the postgres seconds-inclusive reading —
    // EXTRACT(MILLISECOND FROM '…44.123') = 123, not 44123. pmod keeps
    // the fraction non-negative pre-1970, matching chrono's accessors
    // (Java % would yield -877 for 1969-12-31 23:59:59.123).
    case "QUARTER"     => quarter(ts)
    case "EPOCH"       => unix_timestamp(ts)
    case "MILLISECOND" => pmod(unix_millis(ts), lit(1000L)).cast("int")
    case "MICROSECOND" => pmod(unix_micros(ts), lit(1000000L)).cast("int")
    case "NANOSECOND"  => (pmod(unix_micros(ts), lit(1000000L)) * 1000L).cast("long")
    case other    => throw new IllegalArgumentException(s"EXTRACT field $other")
  }
  def veloDateFormat(ts: Column, fmt: String): Column = date_format(ts, fmt)
  /** DATEDIFF in whole days (b - a). */
  def veloDateDiff(a: Column, b: Column): Column = datediff(b, a)
  def veloUnixTimestamp(ts: Column): Column = unix_timestamp(ts)
  // timestamp_seconds: direct arithmetic cast — to_timestamp(from_unixtime(..))
  // would pay a per-row format-then-parse string round-trip for the same value
  def veloFromUnixtime(epoch: Column): Column = timestamp_seconds(epoch)
  /** TUMBLE_START: epoch-aligned bucket start (seconds). */
  def tumbleStart(ts: Column, sizeSeconds: Long): Column = {
    // size 0 would divide by zero → every row lands in one silent NULL
    // bucket (non-ANSI) or throws mid-job (ANSI); reject at plan build
    require(sizeSeconds >= 1, s"window size must be >= 1 second, got $sizeSeconds")
    (floor(unix_timestamp(ts) / sizeSeconds) * sizeSeconds).cast("long")
  }
  def tumbleEnd(ts: Column, sizeSeconds: Long): Column =
    tumbleStart(ts, sizeSeconds) + lit(sizeSeconds)

  // ---- Conditional ----
  def veloCoalesce(cs: Column*): Column = coalesce(cs: _*)
  def veloNullif(a: Column, b: Column): Column = nullif(a, b)
  def veloCast(c: Column, to: String): Column = c.cast(to)

  // ---- JSON (reference: JSON_EXTRACT / JSON_VALUE over payload strings) ----
  /** JSON_EXTRACT(json, '$.path') — JSON text of the matched node. */
  def jsonExtract(c: Column, path: String): Column = get_json_object(c, path)
  /** JSON_VALUE — scalar string value at path (same as extract for scalars). */
  def jsonValue(c: Column, path: String): Column = get_json_object(c, path)

  // ---- Array / Map ----
  def veloArray(cs: Column*): Column = array(cs: _*)
  def veloStruct(cs: Column*): Column = struct(cs: _*)
  def veloMap(cs: Column*): Column = map(cs: _*)
  def arrayLength(c: Column): Column = size(c)
  def arrayContains(c: Column, v: Any): Column = array_contains(c, v)
  def mapKeys(c: Column): Column = map_keys(c)
  def mapValues(c: Column): Column = map_values(c)

  // ---- Kafka-header analogs ----
  // The reference reads Kafka record headers (HEADER('k'), HAS_HEADER...).
  // Spark's kafka source exposes them as an array<struct<key,value>>; our
  // canonical in-DataFrame shape is a map<string,string> column `_headers`.
  // A headerless record carries a NULL map (Spark's kafka source emits
  // null headers; Serde.headersToMap propagates it) — map_filter/
  // map_concat/map_contains_key all return NULL on a null map, which
  // would silently drop the first stamp and make HAS_HEADER three-valued.
  // Normalize to the empty map once, here and in the dialect rendering.
  private def orEmpty(headers: Column): Column = coalesce(headers, map())
  def header(headers: Column, key: String): Column = element_at(headers, key)
  // contains_key, NOT value-isNotNull: a header present with a NULL
  // value (legal in Kafka) must report true — the reference checks key
  // presence, and the SQL dialect path already maps HAS_HEADER to
  // map_contains_key; the two API paths must agree
  def hasHeader(headers: Column, key: String): Column =
    map_contains_key(orEmpty(headers), lit(key))
  def headerKeys(headers: Column): Column = map_keys(orEmpty(headers))
  /** SET_HEADER is an UPSERT: the existing key is removed first —
    * map_concat alone throws DUPLICATE_MAP_KEY at runtime (Spark's
    * default mapKeyDedupPolicy=EXCEPTION) the moment the header is
    * already present, which is the normal re-stamp case. */
  def setHeader(headers: Column, key: String, value: Column): Column =
    map_concat(map_filter(orEmpty(headers), (k, _) => k =!= key), map(lit(key), value))
  def removeHeader(headers: Column, key: String): Column =
    map_filter(orEmpty(headers), (k, _) => k =!= key)

  // ---- Exact decimal (reference: ScaledInteger financial arithmetic) ----
  /** The reference stores money as scaled i128 for exact, fast arithmetic.
    * Spark analog: DecimalType — exact, order-independent aggregation.
    */
  def money(c: Column, precision: Int = 18, scale: Int = 4): Column =
    c.cast(org.apache.spark.sql.types.DecimalType(precision, scale))
}
