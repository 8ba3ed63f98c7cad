package graft.sql

import scala.collection.mutable.ArrayBuffer

/** Parser for the velostream SQL dialect
  * (reference: docs/sql/PARSER_GRAMMAR.md, docs/sql/FUNCTION_CATALOG.md,
  * docs/sql/comprehensive-sql-ctas-guide.md).
  *
  * Design: the parser owns the dialect-specific SUPERSTRUCTURE —
  * statement kinds (SELECT / CTAS / CSAS / INSERT / SHOW), clause
  * boundaries, `WINDOW TUMBLING|SLIDING|SESSION(...)` specs,
  * `OVER (ROWS WINDOW BUFFER n ROWS …)`, `EMIT CHANGES|FINAL`,
  * `kafka://topic` sources, `PRIMARY KEY` annotations, `WITH` property
  * maps, and the reference's function-name surface. Expression parsing
  * inside clauses is DELEGATED to Catalyst: clauses are re-emitted as
  * Spark SQL token streams after dialect rewrites. Spark-first — the
  * optimizer sees one ordinary SQL plan; nothing is interpreted per row.
  */
object VeloSqlParser {

  // ============================ tokens ============================

  sealed trait TokKind
  case object TIdent extends TokKind
  case object TNumber extends TokKind
  case object TString extends TokKind  // text includes the quotes
  case object TSymbol extends TokKind

  final case class Tok(kind: TokKind, text: String) {
    def isKw(kw: String): Boolean = kind == TIdent && text.equalsIgnoreCase(kw)
    def upper: String = text.toUpperCase(java.util.Locale.ROOT)
  }

  class ParseException(msg: String) extends RuntimeException(msg)
  /** A TRANSIENT rejection (circuit breaker open/half-open, admission
    * capacity exhausted): retrying can succeed, so the HTTP layer maps
    * this to 503. A structured subtype, because classifying by message
    * SUBSTRING was spoofable — user query text echoed into a parse
    * error ("unexpected trailing tokens: resource exhausted") flipped a
    * permanent 400 into a retry-forever 503 (r14 review). */
  final class TransientRejectionException(msg: String) extends ParseException(msg)
  /** Structured unknown-job rejection (STOP/PAUSE/RESUME/ROLLBACK of a
    * name the manager does not hold) — the HTTP layer maps it to 404 by
    * TYPE; a message-substring check was the exact fragile pattern the
    * r14 review removed from the deploy arm (r15 review). */
  final class UnknownJobException(msg: String) extends ParseException(msg)

  /** True when the character at `s(i)` (the first '-' of a would-be
    * '--' line comment, or the '/' of a would-be slash-star block
    * comment) sits INSIDE a kafka://… / file://… URI token per
    * tokenize's rule below: the tokenizer consumes '-' and '/' as URI
    * characters there ('--' is legal in Kafka topic names; a path can
    * end in '/' right before a glob '*'), so any statement splitter
    * must NOT open a comment — the two boundary machines (SqlApp's
    * line splitter and VeloContext.splitStatements) both delegate here
    * so they cannot desync from the tokenizer again (r15 advice;
    * block-comment arm r17 review). A URI runs from a "://" to the
    * first non-URI character, and the "://" must be preceded by the
    * kafka/file scheme word. */
  def insideUriToken(s: String, i: Int): Boolean = {
    var j = i - 1
    while (j >= 0 && (s(j).isLetterOrDigit || "._/-".indexOf(s(j)) >= 0)) j -= 1
    j >= 0 && s(j) == ':' && i >= j + 3 &&
      s(j + 1) == '/' && s(j + 2) == '/' && {
        var w = j - 1
        while (w >= 0 && (s(w).isLetterOrDigit || s(w) == '_')) w -= 1
        // tokenize lexes a leading digit run as its own NUMBER token and
        // the ident starts at the first letter ('1kafka://t--x' is
        // number 1 + scheme kafka there), so the back-scanned word must
        // drop that digit prefix or the splitter desyncs on exactly the
        // inputs this helper exists for (r16 review); a letter-prefixed
        // word ('xkafka') stays whole — ONE ident ≠ kafka in tokenize
        val word = s.substring(w + 1, j).dropWhile(_.isDigit)
          .toLowerCase(java.util.Locale.ROOT)
        word == "kafka" || word == "file"
      }
  }

  def tokenize(sql: String): Vector[Tok] = {
    val out = ArrayBuffer[Tok]()
    var i = 0
    val n = sql.length
    while (i < n) {
      val c = sql(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql(i + 1) == '-') { // line comment
        while (i < n && sql(i) != '\n') i += 1
      } else if (c.isLetter || c == '_') {
        val s = i
        while (i < n && (sql(i).isLetterOrDigit || sql(i) == '_')) i += 1
        val word = sql.substring(s, i)
        // kafka://topic-name and file://path SOURCES (outside string
        // literals only): registered as views named after the sanitized
        // last path segment
        if ((word.equalsIgnoreCase("kafka") || word.equalsIgnoreCase("file"))
            && i + 2 < n && sql(i) == ':' && sql(i + 1) == '/' && sql(i + 2) == '/') {
          i += 3
          val us = i
          while (i < n && (sql(i).isLetterOrDigit || "._/-".indexOf(sql(i)) >= 0)) i += 1
          val raw = sql.substring(us, i)
          // a scheme with no topic/path ('kafka://' — an unsubstituted
          // template var, say) produced an EMPTY identifier, and the
          // empty FROM was then silently dropped at emission: the query
          // ran as a constant SELECT, one row instead of per-record
          // rows, no error. 'file:///' additionally hit split('/') on
          // an all-slash string = empty array → NoSuchElementException
          // (r17 review).
          val segs = raw.split('/')
          if (segs.isEmpty || segs.last.isEmpty)
            throw new ParseException(
              s"empty ${word.toLowerCase(java.util.Locale.ROOT)}:// source (missing topic/path)")
          val seg = segs.last.replace('-', '_').replace(".", "_")
          out += Tok(TIdent, seg)
        } else out += Tok(TIdent, word)
      } else if (c.isDigit || (c == '.' && i + 1 < n && sql(i + 1).isDigit)) {
        val s = i
        while (i < n && (sql(i).isDigit || sql(i) == '.')) i += 1
        if (i < n && (sql(i) == 'e' || sql(i) == 'E')) {
          i += 1; if (i < n && (sql(i) == '+' || sql(i) == '-')) i += 1
          while (i < n && sql(i).isDigit) i += 1
        }
        out += Tok(TNumber, sql.substring(s, i))
      } else if (c == '\'' || c == '"' || c == '`') {
        val quote = c; val s = i; i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          if (sql(i) == quote) {
            if (i + 1 < n && sql(i + 1) == quote) { sb.append(quote); i += 2 }
            else { closed = true; i += 1 }
          } else { sb.append(sql(i)); i += 1 }
        }
        if (!closed) throw new ParseException(s"unterminated string starting at $s")
        if (quote == '\'')
          // the dialect's ONLY string escape is '' (standard SQL; the
          // reference's sqlparser does the same) — backslash is an
          // ordinary character. The token is re-emitted into spark.sql()
          // where the DEFAULT parser escape-processes backslashes, so
          // 'C:\tmp' would silently become "C:<TAB>mp" and a trailing
          // backslash would be a Catalyst parse error far from the
          // dialect gate. Store the token SPARK-ESCAPED (backslashes
          // doubled); unquoteString collapses them back when code needs
          // the VALUE (r14 review).
          out += Tok(TString, sql.substring(s, i).replace("\\", "\\\\"))
        else // quoted identifier → Spark backtick form (re-escaping any
          // interior backtick: the unescaped text would otherwise emit
          // `a`b` — malformed Spark SQL from valid dialect input)
          out += Tok(TIdent, "`" + sb.toString.replace("`", "``") + "`")
      } else {
        val two = if (i + 1 < n) sql.substring(i, i + 2) else ""
        if (two == "/*") {
          // standard SQL block comment (non-nesting): without this, '/'
          // and '*' lex as arithmetic and the comment TEXT becomes
          // expression tokens, failing far from the cause
          val close = sql.indexOf("*/", i + 2)
          if (close < 0) throw new ParseException(s"unterminated block comment starting at $i")
          i = close + 2
        }
        else if (Set("!=", "<>", "<=", ">=", "||", "->").contains(two)) { out += Tok(TSymbol, two); i += 2 }
        else if (";(),.*+-/%^=<>[]~".indexOf(c) >= 0) { out += Tok(TSymbol, c.toString); i += 1 }
        else throw new ParseException(s"unexpected character '$c' at $i")
      }
    }
    out.toVector
  }

  /** Decode a tokenized single-quoted literal to its VALUE. Tokens are
    * stored Spark-escaped (see tokenize), so this collapses the doubled
    * backslashes as well as the '' quote escape. */
  def unquoteString(text: String): String =
    text.substring(1, text.length - 1).replace("''", "'").replace("\\\\", "\\")

  /** Encode a VALUE as a Spark-SQL single-quoted literal token text
    * (backslashes doubled for Spark's default escape-processing parser,
    * quotes doubled per standard SQL). */
  def quoteString(value: String): String =
    "'" + value.replace("\\", "\\\\").replace("'", "''") + "'"

  def render(tokens: Seq[Tok]): String = {
    val sb = new StringBuilder
    tokens.foreach { t =>
      if (sb.nonEmpty) sb.append(' ')
      sb.append(t.text)
    }
    sb.toString
  }

  // ============================ AST ============================

  sealed trait EmitMode
  case object EmitChanges extends EmitMode
  case object EmitFinal extends EmitMode

  /** `partitionCols`: the reference's trailing partition-key window
    * arguments (SESSION(time, gap, partition_col) — session-windows.md).
    * They become ADDITIONAL grouping keys at lowering: silently
    * dropping them (the old behavior) merged time-adjacent sessions
    * ACROSS keys whenever the query carried no matching GROUP BY. */
  sealed trait WindowSpec {
    def timeCol: Option[String]
    def partitionCols: Seq[String]
  }
  final case class Tumbling(sizeSec: Long, timeCol: Option[String],
                            partitionCols: Seq[String] = Nil) extends WindowSpec
  final case class Sliding(sizeSec: Long, advanceSec: Long, timeCol: Option[String],
                           partitionCols: Seq[String] = Nil) extends WindowSpec
  final case class Session(gapSec: Long, timeCol: Option[String],
                           partitionCols: Seq[String] = Nil) extends WindowSpec

  final case class JoinClause(joinType: String, table: String, alias: Option[String], on: Vector[Tok],
                              withinSeconds: Option[Long] = None)

  final case class SelectStmt(
      fields: Vector[Vector[Tok]],          // rewritten select items (PRIMARY KEY stripped)
      keyFields: Vector[String],            // PRIMARY KEY-annotated output names
      from: String,
      fromAlias: Option[String],
      joins: Vector[JoinClause],
      where: Option[Vector[Tok]],
      groupBy: Option[Vector[Tok]],
      having: Option[Vector[Tok]],
      window: Option[WindowSpec],
      namedWindows: Option[Vector[Tok]], // standard `WINDOW w AS (...)` clause, passed through
      orderBy: Option[Vector[Tok]],
      limit: Option[Long],
      emit: Option[EmitMode],
      into: Vector[String] = Vector.empty, // `INTO sink[, sink…]` (multi-sink job wiring)
      props: Map[String, String] = Map.empty, // `WITH (k=v, …)` on the select
      distinct: Boolean = false)         // SELECT DISTINCT (reference ast.rs:216)

  sealed trait VeloStatement
  final case class Select(s: SelectStmt) extends VeloStatement
  /** UNION [ALL] chain of selects. `ops(i)` is true when the operator
    * between selects(i) and selects(i+1) is UNION ALL — per-operator,
    * because a mixed chain (A UNION B UNION ALL C) has different dedup
    * semantics per step and a single flag silently collapses them.
    * `all` remains the all-operators summary for callers that only need
    * the homogeneous case. */
  final case class Union(selects: Vector[SelectStmt], all: Boolean,
                         ops: Vector[Boolean] = Vector.empty) extends VeloStatement {
    /** Per-operator keywords, falling back to the uniform flag. */
    def opKeywords: Vector[String] = {
      val o = if (ops.length == selects.length - 1) ops
              else Vector.fill(math.max(selects.length - 1, 0))(all)
      o.map(a => if (a) " UNION ALL " else " UNION ")
    }
    def render(renderSelect: SelectStmt => String): String =
      selects.zipWithIndex.map { case (s, ix) =>
        val txt = renderSelect(s)
        // a NON-LAST arm carrying ORDER BY / LIMIT must parenthesize:
        // Spark's grammar allows those only at the end of the whole
        // query-term chain, so the bare concatenation died as a
        // Catalyst ParseException far from the dialect gate (r17
        // review). The LAST arm stays bare — its trailing ORDER/LIMIT
        // deliberately scopes to the whole union, as in standard SQL.
        if (ix < selects.length - 1 && (s.orderBy.nonEmpty || s.limit.isDefined))
          s"($txt)"
        else txt
      }.zip(opKeywords :+ "").map { case (s, op) => s + op }.mkString
  }
  /** WITH [RECURSIVE] name AS (select|union), … body (CTEs). RECURSIVE
    * passes straight through — Spark ≥4.0 executes recursive CTEs
    * natively (UnionLoop), so the dialect's transitive-closure queries
    * run distributed with no extra machinery here. */
  final case class WithCtes(ctes: Vector[(String, VeloStatement)], body: VeloStatement,
                            recursive: Boolean = false) extends VeloStatement
  /** CREATE STREAM|TABLE|SINK|SOURCE name WITH (props) — an external
    * source/sink DECLARATION (no AS SELECT): config-file/topic wiring
    * the runner resolves against its environment. */
  final case class CreateSourceDecl(kind: String, name: String, props: Map[String, String],
                                    columns: Vector[(String, String)] = Vector.empty) extends VeloStatement
  /** `columns`: optional declared schema (reference ast.rs:856 ColumnDef
    * via commands.rs:37) — (name, Spark SQL type) pairs applied to the
    * select output POSITIONALLY (rename + cast), matching the
    * reference's `CREATE TABLE t (c INT, …) AS SELECT …` binding. */
  final case class CreateTableAs(name: String, select: SelectStmt, props: Map[String, String],
                                 columns: Vector[(String, String)] = Vector.empty) extends VeloStatement
  final case class CreateStreamAs(name: String, select: SelectStmt, props: Map[String, String],
                                  columns: Vector[(String, String)] = Vector.empty) extends VeloStatement
  final case class InsertInto(table: String, columns: Vector[String], select: Option[SelectStmt], values: Vector[Vector[Vector[Tok]]]) extends VeloStatement
  /** UPDATE t SET col = expr [, …] [WHERE cond] */
  final case class Update(table: String, sets: Vector[(String, Vector[Tok])], where: Option[Vector[Tok]]) extends VeloStatement
  /** DELETE FROM t [WHERE cond] */
  final case class Delete(table: String, where: Option[Vector[Tok]]) extends VeloStatement
  /** SHOW <resource> [arg] — resource kinds per reference ast.rs:471-496:
    * STREAMS|TABLES|TOPICS|FUNCTIONS|JOBS (arg = LIKE pattern),
    * SCHEMA|PARTITIONS|VERSIONS name, STATUS|METRICS|RESOURCES [job],
    * PROPERTIES [STREAM|TABLE] name. (TRACES and RESOURCES surface the
    * reference's observability spans and resource_manager state — engine
    * components without their own SHOW kind in ast.rs.) */
  final case class Show(what: String, arg: Option[String] = None) extends VeloStatement
  /** DESCRIBE name (reference ast.rs:495). */
  final case class Describe(name: String) extends VeloStatement

  // ---- job lifecycle statements (reference ast.rs:306-366, the SQL
  //      surface of the reference's multi-job server) ----
  sealed trait DeployStrategy
  case object BlueGreen extends DeployStrategy
  final case class Canary(percentage: Int) extends DeployStrategy
  case object Rolling extends DeployStrategy
  case object Replace extends DeployStrategy

  /** START JOB name AS <query> [WITH (props)] */
  final case class StartJob(name: String, body: VeloStatement,
                            props: Map[String, String]) extends VeloStatement
  /** STOP JOB name [FORCE] */
  final case class StopJob(name: String, force: Boolean) extends VeloStatement
  final case class PauseJob(name: String) extends VeloStatement
  final case class ResumeJob(name: String) extends VeloStatement
  /** DEPLOY JOB name [VERSION 'v'] AS <query> [STRATEGY …] [WITH (props)] */
  final case class DeployJob(name: String, version: String, body: VeloStatement,
                             props: Map[String, String],
                             strategy: DeployStrategy) extends VeloStatement
  /** ROLLBACK JOB name [VERSION 'v'] */
  final case class RollbackJob(name: String, targetVersion: Option[String]) extends VeloStatement

  // ============================ parser ============================

  /** Parse one statement (trailing ';' tolerated). `defaultTimeCol` is
    * the event-time column used when a window spec / ROWS WINDOW omits
    * one (the reference uses the record timestamp). */
  def parse(sql: String, defaultTimeCol: String = "ts",
            timeColOf: String => Option[String] = _ => None): VeloStatement = {
    // every malformed-but-lexable input must surface as a ParseException:
    // callers (job server 400s, SqlApp's is-this-a-job probe, the
    // validator's parse-error bucket) catch ONLY ParseException, and a
    // leaked NumberFormat/NoSuchElement/IllegalArgument from deep in a
    // rewrite turns a user syntax mistake into a 500/crash
    try {
      val toks0 = tokenize(sql)
      val toks = if (toks0.nonEmpty && toks0.last.text == ";") toks0.dropRight(1) else toks0
      if (toks.isEmpty) throw new ParseException("empty statement")
      val p = new P(toks, defaultTimeCol, timeColOf)
      val stmt = p.statement()
      p.expectEof()
      stmt
    } catch {
      case e: ParseException => throw e
      // StackOverflowError is NOT NonFatal, so a deeply-nested input
      // (an untrusted job-server request of 10k 'SELECT 1 FROM ('
      // repetitions) escaped the ParseException-only contract and
      // crashed the serving thread with a 500. By the time this catch
      // runs the recursion has unwound, so wrapping here is safe — the
      // parser's recursion depth is the only unbounded stack consumer
      // on this path (r17 review).
      case _: StackOverflowError =>
        throw new ParseException("statement nesting too deep")
      case scala.util.control.NonFatal(e) =>
        throw new ParseException(
          s"malformed statement (${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)})")
    }
  }

  // timeColOf threads the context's per-stream event-time resolver into
  // the NESTED renders (derived tables, union wrappers) that flatten to
  // SQL text at parse time: rendered with the bare default, a WITHIN
  // band inside a subquery bound to the context default time column
  // instead of each stream's registered one (r12 review).
  private final class P(toks: Vector[Tok], defaultTimeCol: String,
                        timeColOf: String => Option[String] = _ => None) {
    private var pos = 0
    /** Context-dependent clause stops (e.g. STRATEGY while inside a
      * DEPLOY JOB body) — checked by exprSpan alongside clauseStarts. */
    private var dynStops: Set[String] = Set.empty
    /** The valid deployment-strategy forms — ONE constant shared by the
      * exprSpan clause boundary, the alias gate (isClauseTok), and
      * strategyClause's own match (r14 review: the boundary's inline
      * Set literal would silently desync from a newly added strategy,
      * swallowing its clause into the body's last span). */
    private val StrategyForms = Set("BLUE_GREEN", "ROLLING", "REPLACE", "CANARY")
    /** Is a STRATEGY token at a clause boundary, judged by what follows
      * (next, nextNext)? A valid form is; so is a lone trailing
      * identifier at the very END of the statement — that is a strategy
      * clause with a TYPO'd form, and stopping here lets strategyClause
      * report 'unknown deployment strategy <word>' instead of a deep
      * Catalyst error on the silently swallowed span (r14 review). A
      * column/alias named `strategy` mid-query stays an identifier —
      * including one whose trailing token is an expression-tail keyword
      * (`ORDER BY strategy DESC`), which the typo heuristic previously
      * swallowed as 'unknown deployment strategy DESC' (r14 advice). */
    private val ExprTailKws = Set("DESC", "ASC", "NULLS", "FIRST", "LAST")
    private def strategyBoundary(next: Option[Tok], nextNext: Option[Tok]): Boolean =
      next.exists(n => StrategyForms.contains(n.upper)) ||
        (next.exists(n => n.kind == TIdent && !ExprTailKws.contains(n.upper)) &&
          nextNext.isEmpty)
    private def peek(o: Int = 0): Option[Tok] = if (pos + o < toks.length) Some(toks(pos + o)) else None
    private def at(kw: String, o: Int = 0): Boolean = peek(o).exists(_.isKw(kw))
    private def take(): Tok = {
      if (pos >= toks.length) throw new ParseException("unexpected end of statement")
      val t = toks(pos); pos += 1; t
    }
    private def expectKw(kw: String): Unit =
      if (at(kw)) pos += 1 else throw new ParseException(s"expected $kw, got ${peek().map(_.text).getOrElse("<eof>")}")
    private def expectSym(s: String): Unit = {
      if (peek().exists(t => t.kind == TSymbol && t.text == s)) pos += 1
      else throw new ParseException(s"expected '$s', got ${peek().map(_.text).getOrElse("<eof>")}")
    }
    private def ident(): String = {
      val t = take()
      if (t.kind != TIdent) throw new ParseException(s"expected identifier, got ${t.text}")
      t.text
    }
    def expectEof(): Unit =
      if (pos < toks.length)
        throw new ParseException(s"unexpected trailing tokens: ${render(toks.drop(pos).take(5))}")

    def statement(): VeloStatement = {
      if (at("CREATE")) createStatement()
      else if (at("INSERT")) insertStatement()
      else if (at("UPDATE")) updateStatement()
      else if (at("DELETE")) deleteStatement()
      else if (at("SHOW") || at("LIST")) showStatement()
      else if (at("DESCRIBE") || at("DESC")) { take(); Describe(ident()) }
      else if (at("START")) startJobStatement()
      else if (at("STOP")) { take(); jobKw(); val n = ident()
        StopJob(n, force = if (at("FORCE")) { take(); true } else false) }
      else if (at("PAUSE")) { take(); jobKw(); PauseJob(ident()) }
      else if (at("RESUME")) { take(); jobKw(); ResumeJob(ident()) }
      else if (at("DEPLOY")) deployJobStatement()
      else if (at("ROLLBACK")) { take(); jobKw(); val n = ident()
        RollbackJob(n, if (at("VERSION")) { take(); Some(unquote(take())) } else None) }
      else if (at("WITH")) cteStatement()
      else if (at("SELECT")) selectOrUnion()
      else throw new ParseException(s"unsupported statement start: ${peek().map(_.text).getOrElse("")}")
    }

    /** JOB (or its reference-test synonym QUERY) after a lifecycle verb. */
    private def jobKw(): Unit =
      if (at("JOB") || at("QUERY")) pos += 1
      else throw new ParseException(s"expected JOB, got ${peek().map(_.text).getOrElse("<eof>")}")

    /** The query a job runs: SELECT/UNION/CTE or CREATE STREAM|TABLE AS. */
    private def jobBody(): VeloStatement =
      if (at("CREATE")) createStatement()
      else if (at("WITH")) cteStatement()
      else selectOrUnion()

    /** Job props: an explicit trailing WITH(...) or, for a SELECT body,
      * the props its own WITH clause already captured. */
    private def liftProps(body: VeloStatement): Map[String, String] = body match {
      case Select(s) => s.props
      case CreateStreamAs(_, _, p, _) => p
      case CreateTableAs(_, _, p, _) => p
      // a CTE/UNION body's trailing WITH was consumed by the INNERMOST
      // select's trailing-clause loop — recurse, or resource limits on
      // a CTE/UNION job body are silently dropped at admission
      case WithCtes(_, b, _) => liftProps(b)
      // ALL branches, not just the last (the CTAS/INSERT hoist rule):
      // the trailing-clause loop attaches a WITH to the branch it just
      // read, so `SELECT … WITH ('max.memory'='1g') UNION SELECT …`
      // put the props on branch 0 and a last-branch read silently
      // dropped the resource limit at admission (r16 review)
      case u: Union => u.selects.flatMap(_.props.toSeq).toMap
      case _ => Map.empty
    }

    private def startJobStatement(): VeloStatement = {
      expectKw("START"); jobKw()
      val name = ident()
      expectKw("AS")
      val body = jobBody()
      val explicit = if (at("WITH")) { take(); propMap() } else Map.empty[String, String]
      StartJob(name, body, liftProps(body) ++ explicit)
    }

    /** DEPLOY JOB name [VERSION 'v'] [STRATEGY s] AS <query> [STRATEGY s]
      * — the reference's tests put STRATEGY on either side of AS. */
    private def deployJobStatement(): VeloStatement = {
      expectKw("DEPLOY"); jobKw()
      val name = ident()
      val version = if (at("VERSION")) { take(); unquote(take()) } else "1.0.0"
      var strategy: Option[DeployStrategy] = None
      def strategyClause(): Unit = {
        take() // STRATEGY
        // conflict, not last-one-wins (the asInsertBody EMIT rule, r17
        // review): STRATEGY accepted on BOTH sides of AS silently let
        // the post-AS clause overwrite — a 10% canary became a full
        // blue-green deploy with no error
        if (strategy.isDefined)
          throw new ParseException(
            "duplicate STRATEGY clause (given both before and after AS)")
        val t = take().upper
        strategy = Some(t match {
          case "BLUE_GREEN" => BlueGreen
          case "ROLLING" => Rolling
          case "REPLACE" => Replace
          case "CANARY" =>
            expectSym("(")
            val pct = take().text.toInt // validation is the deployer's job (reference parity)
            expectSym(")")
            Canary(pct)
          // the match arms above ARE StrategyForms — a new strategy must
          // land in both (the shared constant keeps the BOUNDARY in sync)
          case other => throw new ParseException(s"unknown deployment strategy $other")
        })
      }
      if (at("STRATEGY")) strategyClause()
      expectKw("AS")
      // STRATEGY after the query ends the body's trailing clause spans
      dynStops += "STRATEGY"
      val body = try jobBody() finally { dynStops -= "STRATEGY" }
      if (at("STRATEGY")) strategyClause()
      val explicit = if (at("WITH")) { take(); propMap() } else Map.empty[String, String]
      DeployJob(name, version, body, liftProps(body) ++ explicit,
        strategy.getOrElse(BlueGreen))
    }

    /** SHOW/LIST <resource> [args] — see Show scaladoc for the surface.
      * `SHOW JOB STATUS|VERSIONS|METRICS [name]` is accepted as an alias
      * of `SHOW STATUS|VERSIONS|METRICS [name]`. */
    private def showStatement(): VeloStatement = {
      take() // SHOW | LIST
      val what0 = take().upper
      val what = if (what0 == "JOB") take().upper else what0
      what match {
        case "STREAMS" | "TABLES" | "TOPICS" | "FUNCTIONS" | "JOBS" | "TRACES" =>
          val pat = if (at("LIKE")) { take(); Some(unquote(take())) } else None
          Show(what, pat)
        case "SCHEMA" | "PARTITIONS" | "VERSIONS" => Show(what, Some(ident()))
        case "STATUS" | "METRICS" | "RESOURCES" =>
          Show(what, if (peek().exists(_.kind == TIdent)) Some(ident()) else None)
        case "PROPERTIES" =>
          // SHOW PROPERTIES [STREAM|TABLE|SOURCE|SINK] name
          if (at("STREAM") || at("TABLE") || at("SOURCE") || at("SINK")) take()
          Show("PROPERTIES", if (peek().exists(_.kind == TIdent)) Some(ident()) else None)
        case other => throw new ParseException(s"SHOW $other not supported")
      }
    }

    private def selectOrUnion(): VeloStatement = {
      var sels = Vector(selectStatement())
      var ops = Vector.empty[Boolean]
      while (at("UNION")) {
        take()
        val isAll = if (at("ALL")) { take(); true } else false
        ops :+= isAll
        sels :+= selectStatement()
      }
      if (sels.length == 1) Select(sels.head)
      else Union(sels, ops.forall(identity), ops)
    }

    /** WITH [RECURSIVE] name AS (select|union) [, …]* <select|union> —
      * a recursive CTE's body is a base ∪ step UNION [ALL] chain. */
    private def cteStatement(): VeloStatement = {
      expectKw("WITH")
      val recursive = if (at("RECURSIVE")) { take(); true } else false
      var ctes = Vector.empty[(String, VeloStatement)]
      var more = true
      while (more) {
        val n = ident()
        expectKw("AS")
        expectSym("(")
        val s = selectOrUnion()
        expectSym(")")
        ctes :+= (n -> s)
        if (peek().exists(_.text == ",")) take() else more = false
      }
      WithCtes(ctes, selectOrUnion(), recursive)
    }

    private def createStatement(): VeloStatement = {
      expectKw("CREATE")
      val kind =
        if (at("STREAM") || at("TABLE") || at("SINK") || at("SOURCE")) take().upper
        else throw new ParseException("expected STREAM, TABLE, SINK or SOURCE after CREATE")
      // threaded through as a prop: swallowing the clause would INVERT
      // it — the executor's createOrReplaceTempView overwrites, the one
      // outcome IF NOT EXISTS exists to prevent
      val ifNotExists =
        if (at("IF")) { take(); expectKw("NOT"); expectKw("EXISTS"); true } else false
      def withIne(p: Map[String, String]): Map[String, String] =
        if (ifNotExists) p + ("if_not_exists" -> "true") else p
      val name = ident()
      // optional declared schema before AS (reference commands.rs:37,
      // clauses.rs:440): CREATE STREAM|TABLE t (col TYPE [NOT NULL], …) AS …
      val columnDefs: Vector[(String, String)] =
        if (peek().exists(_.text == "(")) columnDefinitions() else Vector.empty
      if (at("WITH")) {
        // declaration form: CREATE STREAM name [(col TYPE, …)] WITH
        // (config …) — a declared schema on a declaration is source
        // metadata, carried on the statement (not silently dropped)
        take()
        val props = propMap()
        CreateSourceDecl(kind, name, props, columnDefs)
      } else {
        expectKw("AS")
        // the inner select consumes its trailing INTO/WITH/EMIT clauses;
        // the body may be a UNION chain
        selectOrUnion() match {
          case Select(sel) =>
            if (kind == "STREAM") CreateStreamAs(name, sel, withIne(sel.props), columnDefs)
            else CreateTableAs(name, sel, withIne(sel.props), columnDefs)
          case u: Union =>
            // ONE derived-table wrapper (asInsertBody) for both the
            // CTAS and INSERT union paths: the two were line-for-line
            // twins — same ALL-branch EMIT/INTO/props hoist, same
            // unionKeys — and a fix to one hoist had to land twice or
            // the paths silently diverged (r16 review; the r12 EMIT/
            // INTO fix was exactly that class)
            val wrapped = asInsertBody(u)
            if (kind == "STREAM") CreateStreamAs(name, wrapped, withIne(wrapped.props), columnDefs)
            else CreateTableAs(name, wrapped, withIne(wrapped.props), columnDefs)
          case other => throw new ParseException(s"unsupported CREATE body: $other")
        }
      }
    }

    /** A union's routable keys: the branches' shared PRIMARY KEY set,
      * or none when branches disagree. */
    private def unionKeys(u: Union): Vector[String] = {
      val ks = u.selects.map(_.keyFields)
      if (ks.nonEmpty && ks.forall(_ == ks.head)) ks.head else Vector.empty
    }

    /** A UNION body in a single-SelectStmt position (INSERT INTO …
      * SELECT): wrapped as a derived table, same as CTAS union bodies —
      * including the CTAS path's ALL-branch EMIT/INTO hoist: the parser
      * attaches trailing clauses to the branch it just read, so a
      * last-branch-only read silently dropped sink wiring and emit mode
      * written before the UNION keyword (r12 review). */
    private def asInsertBody(stmt: VeloStatement): SelectStmt = stmt match {
      case Select(s) => s
      case u: Union =>
        val emits = u.selects.flatMap(_.emit).distinct
        if (emits.length > 1)
          throw new ParseException("UNION branches declare conflicting EMIT modes")
        SelectStmt(
          fields = Vector(Vector(Tok(TSymbol, "*"))), keyFields = unionKeys(u),
          from = "(" + u.render(toSparkSql(_, defaultTimeCol, timeColOf)) + ")",
          fromAlias = Some("_u"), joins = Vector.empty, where = None, groupBy = None,
          having = None, window = None, namedWindows = None, orderBy = None,
          limit = None, emit = emits.headOption,
          into = u.selects.flatMap(_.into).distinct,
          props = u.selects.flatMap(_.props.toSeq).toMap)
      case other => throw new ParseException(s"unsupported INSERT body: $other")
    }

    /** `(name TYPE [NOT NULL], …)` → (name, Spark SQL type string).
      * Type names per reference clauses.rs:471 (ScaledInteger DECIMAL
      * maps to DECIMAL(18,4), the dialect's financial precision). */
    private def columnDefinitions(): Vector[(String, String)] = {
      def dataType(): String = take().upper match {
        case "INT" | "INTEGER" => "INT"
        case "BIGINT" | "LONG" => "BIGINT"
        case "FLOAT" | "DOUBLE" | "REAL" => "DOUBLE"
        case "STRING" | "VARCHAR" | "TEXT" => "STRING"
        case "BOOLEAN" | "BOOL" => "BOOLEAN"
        case "TIMESTAMP" => "TIMESTAMP"
        case "DECIMAL" | "NUMERIC" =>
          // explicit DECIMAL(p, s) is honored; bare DECIMAL defaults to
          // the dialect's financial precision. Without this branch the
          // '(' broke the column loop with a misleading "expected ')'"
          if (peek().exists(_.text == "(")) {
            take()
            val p = take().text.toIntOption.getOrElse(
              throw new ParseException("DECIMAL precision must be a number"))
            expectSym(",")
            val sc = take().text.toIntOption.getOrElse(
              throw new ParseException("DECIMAL scale must be a number"))
            expectSym(")")
            if (p < 1 || p > 38 || sc < 0 || sc > p)
              throw new ParseException(s"invalid DECIMAL($p,$sc)")
            s"DECIMAL($p,$sc)"
          } else "DECIMAL(18,4)"
        case "ARRAY" =>
          expectSym("("); val inner = dataType(); expectSym(")")
          s"ARRAY<$inner>"
        case "MAP" =>
          expectSym("("); val k = dataType()
          expectSym(","); val v = dataType(); expectSym(")")
          s"MAP<$k, $v>"
        case other => throw new ParseException(s"unknown data type: $other")
      }
      expectSym("(")
      var defs = Vector.empty[(String, String)]
      var more = true
      while (more) {
        val colName = ident()
        val tpe = dataType()
        if (at("NOT")) { take(); expectKw("NULL") } // Spark nullability is advisory
        defs :+= (colName -> tpe)
        if (peek().exists(_.text == ",")) take() else more = false
      }
      expectSym(")")
      defs
    }

    private def propMap(): Map[String, String] = {
      expectSym("(")
      val m = scala.collection.mutable.LinkedHashMap[String, String]()
      var done = false
      while (!done) {
        // keys may be quoted strings OR dotted identifiers
        // (market_data.config_file = '…')
        val kb = new StringBuilder(unquote(take()))
        while (peek().exists(_.text == ".")) { take(); kb.append('.').append(unquote(take())) }
        expectSym("=")
        // an unquoted negative number is two tokens ('-', '1') — the
        // Kafka-style `replication = -1` form; reading one token made
        // the trailing digit a misleading "expected ')'" error (r14
        // review). A '+' sign is tolerated for symmetry.
        val v = peek() match {
          case Some(t) if t.kind == TSymbol && (t.text == "-" || t.text == "+")
              && peek(1).exists(_.kind == TNumber) =>
            val sign = take().text
            (if (sign == "-") "-" else "") + take().text
          case _ => unquote(take())
        }
        m += kb.toString -> v
        if (peek().exists(_.text == ",")) take() else done = true
      }
      expectSym(")")
      m.toMap
    }

    private def unquote(t: Tok): String =
      if (t.kind == TString) unquoteString(t.text)
      // collapse the doubled interior backticks tokenize re-escapes —
      // `a``b` must decode to a`b, the inverse of the encode (r14
      // review: the TString branch round-trips; this one did not)
      else t.text.stripPrefix("`").stripSuffix("`").replace("``", "`")

    private def emitMode(): EmitMode = {
      val t = take()
      if (t.isKw("CHANGES")) EmitChanges
      else if (t.isKw("FINAL")) EmitFinal
      else throw new ParseException(s"expected CHANGES or FINAL after EMIT, got ${t.text}")
    }

    private def insertStatement(): VeloStatement = {
      expectKw("INSERT"); expectKw("INTO")
      val table = ident()
      var cols = Vector.empty[String]
      if (peek().exists(_.text == "(")) {
        take()
        var done = false
        while (!done) {
          cols :+= ident()
          if (peek().exists(_.text == ",")) take() else done = true
        }
        expectSym(")")
      }
      // selectOrUnion: every other select position accepts UNION chains
      if (at("SELECT")) InsertInto(table, cols, Some(asInsertBody(selectOrUnion())), Vector.empty)
      else {
        expectKw("VALUES")
        var rows = Vector.empty[Vector[Vector[Tok]]]
        var more = true
        while (more) {
          expectSym("(")
          var row = Vector.empty[Vector[Tok]]
          var done = false
          while (!done) {
            // rewrite like every other expression position (UPDATE SET
            // does): dialect forms (TIMESTAMP(), LEN, …) must not reach
            // Catalyst verbatim just because they sit in a VALUES row
            row :+= rewriteTokens(exprSpan(stopAtComma = true), defaultTimeCol)
            if (peek().exists(_.text == ",")) take() else done = true
          }
          expectSym(")")
          rows :+= row
          if (peek().exists(_.text == ",")) take() else more = false
        }
        InsertInto(table, cols, None, rows)
      }
    }

    /** UPDATE t SET a = expr, b = expr WHERE cond
      * (reference: src/velostream/sql/execution/processors/update.rs) */
    private def updateStatement(): VeloStatement = {
      expectKw("UPDATE")
      val table = ident()
      expectKw("SET")
      var sets = Vector.empty[(String, Vector[Tok])]
      var more = true
      while (more) {
        val c = ident()
        expectSym("=")
        sets :+= (c -> rewriteTokens(exprSpan(stopAtComma = true), defaultTimeCol))
        if (peek().exists(_.text == ",")) take() else more = false
      }
      val where = if (at("WHERE")) { take(); Some(rewriteTokens(exprSpan(stopAtComma = false), defaultTimeCol)) } else None
      Update(table, sets, where)
    }

    private def deleteStatement(): VeloStatement = {
      expectKw("DELETE"); expectKw("FROM")
      val table = ident()
      val where = if (at("WHERE")) { take(); Some(rewriteTokens(exprSpan(stopAtComma = false), defaultTimeCol)) } else None
      Delete(table, where)
    }

    /** Collect a balanced-paren token span until a top-level comma,
      * clause keyword, or EOF. */
    private def exprSpan(stopAtComma: Boolean): Vector[Tok] = {
      val out = ArrayBuffer[Tok]()
      var depth = 0
      var done = false
      while (!done && pos < toks.length) {
        val t = toks(pos)
        if (t.kind == TSymbol && t.text == "(") { depth += 1; out += take() }
        else if (t.kind == TSymbol && t.text == ")") {
          if (depth == 0) done = true else { depth -= 1; out += take() }
        } else if (depth == 0 && t.kind == TSymbol && t.text == "," && stopAtComma) done = true
        // a top-level ';' always ends the expression: swallowing it
        // would parse "… WHERE x > 0; SELECT b" as one statement with a
        // garbage WHERE, and validity probes would admit it
        else if (depth == 0 && t.kind == TSymbol && t.text == ";") done = true
        else if (depth == 0 && t.kind == TIdent && (clauseStarts.contains(t.upper) || dynStops.contains(t.upper))
                 // JOIN/LEFT/RIGHT are also catalog FUNCTIONS — a '('
                 // right after means a call, not a clause boundary
                 && !(Set("JOIN", "LEFT", "RIGHT").contains(t.upper) && peek(1).exists(_.text == "("))
                 // ORDER/GROUP are clause starts only as ORDER BY / GROUP
                 // BY — otherwise they are ordinary identifiers
                 // (`order.items`, a column named `group`)
                 && !(Set("ORDER", "GROUP").contains(t.upper) && !peek(1).exists(_.isKw("BY")))
                 // WITHIN GROUP (ORDER BY …) is part of an inverse-
                 // distribution aggregate, not the stream-join WITHIN
                 && !(t.upper == "WITHIN" && peek(1).exists(_.isKw("GROUP")))
                 // STRATEGY is a clause boundary only per
                 // strategyBoundary — a column named `strategy` inside
                 // a DEPLOY body must stay an ordinary identifier (r14
                 // review: `SELECT strategy, count(*) … GROUP BY
                 // strategy` read as an empty select item), while a
                 // trailing typo'd form still gets the clear error
                 && !(t.upper == "STRATEGY" && !strategyBoundary(peek(1), peek(2)))) done = true
        else out += take()
      }
      out.toVector
    }

    private val clauseStarts = Set(
      "FROM", "WHERE", "GROUP", "HAVING", "WINDOW", "ORDER", "LIMIT", "EMIT",
      "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "ON", "WITH", "INTO",
      "WITHIN", "UNION")

    private def selectStatement(): SelectStmt = {
      expectKw("SELECT")
      val distinct = if (at("DISTINCT")) { take(); true } else false
      // select list
      var fields = Vector.empty[Vector[Tok]]
      var keys = Vector.empty[String]
      var more = true
      while (more) {
        var span = exprSpan(stopAtComma = true)
        if (span.isEmpty) throw new ParseException("empty select item")
        // PRIMARY KEY annotation (FR-089): strip, record the output name.
        // length >= 3: a select item of ONLY `PRIMARY KEY` must be a
        // ParseException, not a NoSuchElementException on the empty rest
        if (span.length >= 3 && span(span.length - 2).isKw("PRIMARY") && span.last.isKw("KEY")) {
          span = span.dropRight(2)
          // the key must be a NAMED output: on an unaliased expression
          // the trailing token is ')' — recording it would silently
          // disable sink key routing (the bogus name matches no column)
          if (span.last.kind != TIdent)
            throw new ParseException(
              "PRIMARY KEY must annotate a column or aliased select item " +
                "(alias the expression first: expr AS name PRIMARY KEY)")
          keys :+= span.last.text.stripPrefix("`").stripSuffix("`").replace("``", "`")
        } else if (span.length == 2 && span.head.isKw("PRIMARY") && span.last.isKw("KEY"))
          throw new ParseException("PRIMARY KEY must annotate a select item")
        fields :+= span
        if (peek().exists(_.text == ",")) take() else more = false
      }
      // FROM: a table name or a derived table `( SELECT … )`
      var from = ""
      var fromAlias: Option[String] = None
      def tableSource(): String =
        if (peek().exists(_.text == "(")) {
          take()
          // selectOrUnion, not selectStatement: UNION is valid inside a
          // derived table just as it is at top level and in CTE bodies
          val sub = selectOrUnion()
          expectSym(")")
          val rendered = sub match {
            case Select(s) => toSparkSql(s, defaultTimeCol, timeColOf)
            case u: Union => u.render(toSparkSql(_, defaultTimeCol, timeColOf))
            case other => throw new ParseException(s"unsupported derived table: $other")
          }
          "(" + rendered + ")"
        } else ident()
      // the SAME STRATEGY lookahead as exprSpan's boundary: without it
      // a FROM/JOIN alias named `strategy` was rejected as an alias and
      // the leftover token misfed strategyClause (r14 review). These
      // gates run on peek(), so the following tokens are peek(1)/peek(2).
      def isClauseTok(t: Tok): Boolean =
        (clauseStarts.contains(t.upper) || dynStops.contains(t.upper)) &&
          !(t.upper == "STRATEGY" && !strategyBoundary(peek(1), peek(2)))
      // `FROM src WITH ('config_file' = '…')` — the reference attaches
      // source configs directly to the FROM/JOIN source, with query
      // clauses (WHERE/GROUP BY/EMIT…) continuing after
      // (ctas_named_sources_sinks_test.rs). Recorded in the statement's
      // prop bag; the deployment layer resolves them.
      var srcProps = Map.empty[String, String]
      def sourceWith(): Unit =
        if (at("WITH") && peek(1).exists(_.text == "(")) {
          take()
          val m = propMap()
          // per-source WITH maps flatten into ONE statement-level bag —
          // a second source re-declaring the same key with a DIFFERENT
          // value would silently overwrite the first (FROM a WITH
          // ('config_file'='a.yaml') JOIN b WITH ('config_file'=
          // 'b.yaml') → a.yaml vanished from the deployment wiring).
          // Same value re-stated is harmless; a conflict errors (r17
          // review).
          val clash = m.collect {
            case (k, v) if srcProps.get(k).exists(_ != v) => k
          }
          if (clash.nonEmpty)
            throw new ParseException(
              s"conflicting source WITH value(s) for ${clash.mkString(", ")} " +
                "across this statement's sources (namespace the keys per source)")
          srcProps ++= m
        }
      if (at("FROM")) {
        take()
        from = tableSource()
        if (at("AS")) { take(); fromAlias = Some(ident()) }
        else if (peek().exists(t => t.kind == TIdent && !isClauseTok(t)))
          fromAlias = Some(ident())
        sourceWith()
      }
      // JOINs
      var joins = Vector.empty[JoinClause]
      var scanning = true
      while (scanning) {
        val jt =
          if (at("JOIN")) { take(); "INNER" }
          else if (at("INNER") && at("JOIN", 1)) { take(); take(); "INNER" }
          else if ((at("LEFT") || at("RIGHT") || at("FULL"))) {
            val k = take().upper
            if (at("OUTER")) take()
            expectKw("JOIN"); k
          } else if (at("CROSS") && at("JOIN", 1)) { take(); take(); "CROSS" }
          else { scanning = false; "" }
        if (scanning) {
          val t = tableSource()
          var alias: Option[String] = None
          if (at("AS")) { take(); alias = Some(ident()) }
          else if (peek().exists(tk => tk.kind == TIdent && tk.upper != "ON" && !isClauseTok(tk)))
            alias = Some(ident())
          sourceWith()
          val on =
            if (jt == "CROSS") Vector.empty[Tok]
            else { expectKw("ON"); exprSpan(stopAtComma = false) }
          // `WITHIN INTERVAL 'n' UNIT` — the reference's stream-stream
          // time-proximity join shorthand (docs/sql/by-task/join-streams.md)
          val within =
            if (at("WITHIN")) {
              take()
              val span = exprSpan(stopAtComma = false)
              Some(parseDuration(span).getOrElse(
                throw new ParseException(s"WITHIN expects an interval, got ${render(span)}")))
            } else None
          joins :+= JoinClause(jt, t, alias, on, within)
        }
      }
      // WHERE / GROUP BY / HAVING / WINDOW in flexible order (the
      // reference's own tests use both HAVING-before-WINDOW — the
      // documented grammar — and HAVING-after-WINDOW).
      var where: Option[Vector[Tok]] = None
      var groupBy: Option[Vector[Tok]] = None
      var having: Option[Vector[Tok]] = None
      var window: Option[WindowSpec] = None
      var namedWindows: Option[Vector[Tok]] = None
      var scanning2 = true
      while (scanning2) {
        if (at("WHERE") && where.isEmpty) { take(); where = Some(exprSpan(stopAtComma = false)) }
        else if (at("GROUP") && groupBy.isEmpty) { take(); expectKw("BY"); groupBy = Some(exprSpan(stopAtComma = false)) }
        else if (at("HAVING") && having.isEmpty) { take(); having = Some(exprSpan(stopAtComma = false)) }
        // velostream WINDOW TUMBLING|SLIDING|SESSION(...) vs the standard
        // SQL named-window clause `WINDOW w AS (...)` — disambiguate by
        // the keyword after WINDOW.
        else if (at("WINDOW") && window.isEmpty && namedWindows.isEmpty) {
          if (peek(1).exists(t => Set("TUMBLING", "SLIDING", "SESSION").contains(t.upper))) {
            take(); window = Some(windowSpec())
          } else {
            take(); namedWindows = Some(exprSpan(stopAtComma = false))
          }
        }
        else scanning2 = false
      }
      val orderBy = if (at("ORDER")) { take(); expectKw("BY"); Some(exprSpan(stopAtComma = false)) } else None
      val limit = if (at("LIMIT")) { take(); Some(take().text.toLong) } else None
      // trailing job-wiring clauses may come in any order:
      // INTO sink[, sink…] (multi-sink fan-out), WITH (props), EMIT …
      var into: Vector[String] = Vector.empty
      var props = Map.empty[String, String]
      var emit: Option[EmitMode] = None
      var progress = true
      while (progress) {
        progress = false
        if (at("INTO")) {
          take()
          into :+= ident()
          while (peek().exists(_.text == ",")) { take(); into :+= ident() }
          progress = true
        }
        if (at("WITH")) { take(); props ++= propMap(); progress = true }
        if (at("EMIT")) { take(); emit = Some(emitMode()); progress = true }
      }
      // TUMBLE_START/END need aggregate wrapping under a WINDOW clause
      // AND under the Flink-style GROUP BY TUMBLE(...) form — the group
      // key is the window struct, so a bare time expression in the
      // select would reference the time column outside any aggregate
      val aggWrap = window.isDefined ||
        groupBy.exists(_.exists(t => t.isKw("TUMBLE") || t.isKw("HOP") || t.isKw("SESSION")))
      // the statement's EFFECTIVE time column: when the WINDOW clause
      // declares one, every one-arg TUMBLE_START/END in the select list
      // must bucket THAT column — rewriting with only the context
      // default silently emitted per-group MIN of the default column's
      // buckets next to window() grouping on the declared column (r17
      // review; the query ran whenever the default column existed,
      // which a Kafka record timestamp always does)
      val effTimeCol = window.flatMap(_.timeCol).getOrElse(defaultTimeCol)
      SelectStmt(fields.map(rewriteTokens(_, effTimeCol, aggWrap)), keys, from, fromAlias,
        joins.map(j => j.copy(on = rewriteTokens(j.on, defaultTimeCol))),
        where.map(rewriteTokens(_, defaultTimeCol)), groupBy.map(rewriteTokens(_, defaultTimeCol)),
        // namedWindows go through the rewriter like every other clause:
        // captured raw they reached Catalyst verbatim, so a dialect form
        // inside WINDOW w AS (PARTITION BY LEN(x) …) — legal everywhere
        // else — died as an undefined function (r12 review)
        having.map(rewriteTokens(_, effTimeCol, aggWrap)), window,
        namedWindows.map(rewriteTokens(_, defaultTimeCol)),
        // aggWrap on ORDER BY too (r17 review): fields and HAVING got
        // the MIN-wrap but ORDER BY TUMBLE_START(...) emitted a bare
        // group-constant referencing the time column outside any
        // aggregate — AnalysisException on a query whose identical
        // select-list expression is accepted
        orderBy.map(rewriteTokens(_, effTimeCol, aggWrap)), limit, emit, into,
        srcProps ++ props, distinct)
    }

    private def windowSpec(): WindowSpec = {
      val kind = take().upper
      expectSym("(")
      // args: durations and/or a time-column identifier, in either order
      var durations = Vector.empty[Long]
      var timeCol: Option[String] = None
      var pcols = Vector.empty[String]
      var more = true
      while (more) {
        val span = exprSpan(stopAtComma = true)
        // an empty span (trailing comma) would set timeCol to "" and
        // render window(, '…') — garbage that dies in Catalyst
        if (span.isEmpty)
          throw new ParseException("empty window argument (trailing comma?)")
        parseDuration(span) match {
          case Some(sec) => durations :+= sec
          case None =>
            // FIRST non-duration argument is the time column (the old
            // last-one-wins silently replaced it — the reference's
            // SESSION(time_expr, gap, partition_col) form made the
            // PARTITION KEY the time column). Later bare identifiers are
            // the reference's trailing partition-key args, CAPTURED as
            // extra grouping keys (dropping them merged time-adjacent
            // sessions across keys when no matching GROUP BY existed);
            // anything else — e.g. a typo'd duration unit like
            // '5 MINUTS' — errors.
            val bareIdent = span.nonEmpty && span.head.kind == TIdent &&
              span.forall(tk => tk.kind == TIdent || tk.text == ".")
            // a non-duration span that STARTS like a duration (number or
            // INTERVAL) is a malformed duration — a typo'd unit
            // ('5 MINUTS') or a unit parseDuration lacks (MONTH/YEAR are
            // not fixed-length windows). Silently making it the "time
            // column" violated the parse-don't-pass contract: the
            // garbage died only inside spark.sql(), past the validator's
            // parse gate (r12 review).
            if (span.head.kind == TNumber || span.head.isKw("INTERVAL"))
              throw new ParseException(
                s"malformed window duration '${render(span)}' (use e.g. " +
                  "INTERVAL '5' MINUTE, 5 MINUTES, or 5m; MONTH/YEAR are not " +
                  "fixed-length window sizes)")
            // the time column is an EXPRESSION position: run the dialect
            // function rewrites before capturing its text, like every
            // other expression span — raw capture let FROM_UNIXTIME(e)
            // reach Catalyst as Spark's native from_unixtime (a STRING
            // with second precision, silently truncating sub-second
            // event times before bucketing) and dialect-only forms die
            // unresolved inside spark.sql() (r14 review)
            if (timeCol.isEmpty)
              timeCol = Some(render(rewriteTokens(span, defaultTimeCol))
                .replace(" . ", "."))
            else if (bareIdent) pcols :+= render(span).replace(" . ", ".")
            else
              throw new ParseException(
                s"unrecognized window argument '${render(span)}' " +
                  s"(time column already set to '${timeCol.get}'; a duration must " +
                  "be e.g. INTERVAL '5' MINUTE, 5 MINUTES, or 5m)")
        }
        if (peek().exists(_.text == ",")) take() else more = false
      }
      expectSym(")")
      // ParseException, not require: IllegalArgumentException would leak
      // through the callers' ParseException-only contracts
      def need(ok: Boolean, msg: String): Unit = if (!ok) throw new ParseException(msg)
      kind match {
        case "TUMBLING" =>
          // exactly ONE: a second duration (user likely meant SLIDING)
          // must not be silently discarded
          need(durations.length == 1, "TUMBLING takes exactly one size duration")
          Tumbling(durations.head, timeCol, pcols)
        case "SLIDING" =>
          need(durations.length == 2, "SLIDING needs size and advance durations")
          Sliding(durations(0), durations(1), timeCol, pcols)
        case "SESSION" =>
          need(durations.length == 1, "SESSION takes exactly one gap duration")
          Session(durations.head, timeCol, pcols)
        case other => throw new ParseException(s"unknown window kind $other")
      }
    }
  }

  /** duration = INTERVAL '5' MINUTE | INTERVAL 5 MINUTE | 5 MINUTE(S)
    * | 5m / 30s / 100ms / 2h / 1d. Returns seconds (MS rounds down). */
  def parseDuration(span: Seq[Tok]): Option[Long] = {
    val ts = span.filterNot(t => t.isKw("INTERVAL"))
    if (ts.isEmpty || ts.length > 2) return None
    val numTok = ts.head
    // kept as DOUBLE until the unit applies: `1.5m` is a legitimate
    // 90-second duration, and the old toDouble.toLong truncated the
    // fraction BEFORE the unit multiply — a silently shrunk window/band
    val num: Option[Double] = numTok.kind match {
      case TNumber => numTok.text.toDoubleOption
      case TString =>
        numTok.text.substring(1, numTok.text.length - 1).trim.toLongOption.map(_.toDouble)
      case _ => None
    }
    num.flatMap { v =>
      if (ts.length == 2) {
        val u = ts(1).upper
        // sub-second values do NOT truncate to 0 silently: 500ms as a
        // WITHIN band would become "<= 0 seconds apart" (exact-match
        // join) and a 0-second window is invalid downstream — only
        // whole-second results are accepted, so the caller errors loudly
        val secs: Option[Double] =
          if (u == "MS" || u.startsWith("MILLISECOND")) Some(v / 1000.0)
          else unitSeconds(u).map(v * _)
        secs.filter(s => s.isFinite && s == math.floor(s)).map(_.toLong)
      } else None
      // a lone NUMBER is ambiguous with a column reference — reject.
    }.filter(_ > 0) // a ZERO duration is degenerate everywhere it is used
  }

  /** Units whose value-context INTERVAL literal must be rewritten to a
    * fixed-duration Spark literal to match the reference's
    * interval_to_millis (types.rs:1402): quantity transform + target
    * unit. See the rewriteTokens branch for the full rationale. */
  private val fixedIntervalRewrite: Map[String, (Long => Long, String)] = {
    val month: Long => Long = _ * 30L
    val year: Long => Long = _ * 365L
    val nano: Long => Long = _ / 1000000L  // i64 division truncates toward 0, like Rust
    val micro: Long => Long = _ / 1000L
    Map(
      "MONTH" -> (month, "DAY"), "MONTHS" -> (month, "DAY"),
      "YEAR" -> (year, "DAY"), "YEARS" -> (year, "DAY"),
      "NANOSECOND" -> (nano, "MILLISECOND"), "NANOSECONDS" -> (nano, "MILLISECOND"),
      "MICROSECOND" -> (micro, "MILLISECOND"), "MICROSECONDS" -> (micro, "MILLISECOND"))
  }

  private def unitSeconds(u: String): Option[Long] = u.toUpperCase(java.util.Locale.ROOT) match {
    case "SECOND" | "SECONDS" | "S" | "SEC" | "SECS" => Some(1L)
    case "MINUTE" | "MINUTES" | "M" | "MIN" | "MINS" => Some(60L)
    case "HOUR" | "HOURS" | "H" => Some(3600L)
    case "DAY" | "DAYS" | "D" => Some(86400L)
    case "WEEK" | "WEEKS" | "W" => Some(604800L) // reference shorthand: SESSION(1w)
    case _ => None
  }

  // ==================== dialect token rewrites ====================

  /** Spark-native names for the reference's function surface
    * (FUNCTION_CATALOG.md). Only names that differ are listed. */
  private val renames: Map[String, String] = Map(
    // JSON_EXTRACT / JSON_VALUE are lowered arg-aware in rewriteTokens
    // (reference dot-numeric path translation), not by this map
    // STRING_AGG/GROUP_CONCAT/LISTAGG/COLLECT are handled arg-aware in
    // rewriteTokens (reference-default ',' separator, velo_str value
    // rendering; COLLECT is a STRING_AGG alias in the reference —
    // aggregation/functions.rs:46 — returning a joined STRING)
    // NULLIF goes through values_equal's type dispatch (epsilon float
    // compare; timestamp/date/decimal pairs NEVER null — VeloExprs)
    "NULLIF" -> "velo_nullif",
    // type-dispatched in VeloExprs: the evaluator accepts JSON STRINGS
    // for array/map ops (functions.rs:1388,1611,1722), ROUND branches
    // int-passthrough / f64-multiply / decimal (functions.rs:424), and
    // ARRAY_CONTAINS compares null-safe (values_equal:1679)
    "ARRAY_LENGTH" -> "velo_array_length",
    "ARRAY_CONTAINS" -> "velo_array_contains",
    "MAP_KEYS" -> "velo_map_keys",
    "ROUND" -> "velo_round",
    // LENGTH/LEN are BYTE length in the reference (s.len() over UTF-8);
    // Spark's length counts characters — divergent on any multibyte text
    "LEN" -> "octet_length",
    "LENGTH" -> "octet_length",
    // velo_regexp, not regexp_like: Spark compiles Java-default
    // classes (ASCII \w/\s, no (?P<…> spelling) where the reference's
    // Rust regex crate is Unicode-first — same kernel + pattern cache
    // as REGEXP_REPLACE (r16 review)
    "REGEXP" -> "velo_regexp",
    // reference-parity functions registered by GraftKernels: SPLIT
    // returns the FIRST part (functions.rs 'for simplicity'), JOIN is
    // variadic delimiter-first with NULL rendered literally, TRIM
    // family strips Unicode whitespace like Rust str::trim
    "SPLIT" -> "velo_split",
    "JOIN" -> "velo_join",
    "TRIM" -> "velo_trim",
    "LTRIM" -> "velo_ltrim",
    "RTRIM" -> "velo_rtrim")

  /** Rewrite one clause's token span to Spark SQL:
    *  - function renames (see `renames`)
    *  - COUNT_DISTINCT(e) → COUNT(DISTINCT e)
    *  - TIMESTAMP() / NOW() → current_timestamp()
    *  - TUMBLE_START/END(ts, dur) → epoch-aligned bucket bigint
    *  - HEADER ops → map ops over the `_headers` column
    *  - OVER (ROWS WINDOW BUFFER n ROWS …) → standard window spec with a
    *    ROWS BETWEEN n-1 PRECEDING AND CURRENT ROW frame
    */
  /** `aggWrap`: the span sits in the SELECT/HAVING of a time-windowed
    * aggregation — group-constant per-row rewrites (TUMBLE_START/END)
    * must be wrapped in an aggregate to satisfy GROUP BY analysis. */
  /** Pop the trailing PRIMARY operand from the already-rewritten output
    * buffer (for infix-to-call rewrites like `~`): a literal/number, a
    * possibly-qualified identifier chain (a.b.c), a call with balanced
    * parens (f(x), a.f(x)), or a parenthesized group. Returns the
    * removed tokens in order; empty when the tail is not a primary. */
  private def popPrimaryOperand(out: ArrayBuffer[Tok]): Vector[Tok] = {
    if (out.isEmpty) return Vector.empty
    var start = out.length
    def prev = if (start > 0) Some(out(start - 1)) else None
    prev match {
      case Some(t) if t.text == ")" && t.kind == TSymbol =>
        var depth = 0
        var scanning = true
        while (scanning && start > 0) {
          start -= 1
          val c = out(start)
          if (c.kind == TSymbol && c.text == ")") depth += 1
          else if (c.kind == TSymbol && c.text == "(") { depth -= 1; if (depth == 0) scanning = false }
        }
        if (depth != 0) return Vector.empty // unbalanced — not a primary
        // include a function name (and its qualifier chain) before '('
        if (start > 0 && out(start - 1).kind == TIdent) {
          start -= 1
          while (start >= 2 && out(start - 1).text == "." && out(start - 2).kind == TIdent)
            start -= 2
        }
      case Some(t) if t.kind == TIdent || t.kind == TString || t.kind == TNumber =>
        start -= 1
        while (start >= 2 && out(start - 1).text == "." && out(start - 2).kind == TIdent)
          start -= 2
      case _ => return Vector.empty
    }
    val popped = out.slice(start, out.length).toVector
    out.remove(start, out.length - start)
    popped
  }

  /** Forward twin of [[popPrimaryOperand]]: the PRIMARY operand span
    * starting at `j` in the RAW token stream, and the index after it. */
  private def primaryOperandSpan(toks: Vector[Tok], j: Int): (Vector[Tok], Int) = {
    if (j >= toks.length) return (Vector.empty, j)
    var end = j
    def balanced(): Boolean = {
      var depth = 0
      var ok = false
      while (end < toks.length && !ok) {
        val c = toks(end)
        if (c.kind == TSymbol && c.text == "(") depth += 1
        else if (c.kind == TSymbol && c.text == ")") { depth -= 1; if (depth == 0) ok = true }
        end += 1
      }
      ok
    }
    toks(j) match {
      case t if t.kind == TString || t.kind == TNumber => end = j + 1
      case t if t.kind == TSymbol && t.text == "(" => if (!balanced()) return (Vector.empty, j)
      case t if t.kind == TIdent =>
        end = j + 1
        var chaining = true
        while (chaining) {
          if (end + 1 < toks.length && toks(end).text == "." && toks(end + 1).kind == TIdent)
            end += 2
          else if (end < toks.length && toks(end).kind == TSymbol && toks(end).text == "(") {
            if (!balanced()) return (Vector.empty, j)
            chaining = false
          } else chaining = false
        }
      case _ => return (Vector.empty, j)
    }
    (toks.slice(j, end), end)
  }

  def rewriteTokens(span: Vector[Tok], defaultTimeCol: String, aggWrap: Boolean = false): Vector[Tok] = {
    val out = ArrayBuffer[Tok]()
    var i = 0
    def sym(s: String) = Tok(TSymbol, s)
    def id(s: String) = Tok(TIdent, s)
    // coalesce(_headers, map()): a headerless record carries a NULL map,
    // and map_filter/map_concat/map_contains_key all return NULL on it —
    // the first SET_HEADER stamp would silently vanish and HAS_HEADER
    // would go three-valued (same normalization as VeloFunctions.orEmpty)
    def emitHeadersOrEmpty(buf: ArrayBuffer[Tok]): Unit = {
      buf += id("coalesce") += sym("(") += id("_headers") += sym(",")
      buf += id("map") += sym("(") += sym(")") += sym(")")
    }
    // Window-SIZE args must reject calendar units BEFORE the general
    // fixedIntervalRewrite runs (r17 review): the rewrite converts
    // INTERVAL '1' MONTH to 30 DAY for ordinary interval arithmetic
    // (the reference's fixed-month rule for ADDition), but the
    // reference's WINDOW duration parser accepts only ns/us/ms/s/m/h/
    // d/w — GROUP BY TUMBLE(ts, INTERVAL '1' MONTH) must error like
    // WINDOW TUMBLING(INTERVAL '1' MONTH) does, not silently run with
    // 30-day windows.
    // arity gate for the header rewrite arms (r17 review: the
    // TIMESTAMP arm's own rule — 'silently dropping a second argument
    // would…' — was never applied here, so SET_HEADER('k','v','x')
    // dropped 'x' silently and HEADER() died as an opaque wrapped
    // NoSuchElementException instead of a targeted message)
    def arity(fn: String, args: Vector[Vector[Tok]], lo: Int, hi: Int): Unit =
      if (args.length < lo || args.length > hi) {
        val want = if (lo == hi) s"$lo" else s"$lo to $hi"
        throw new ParseException(s"$fn expects $want argument(s), got ${args.length}")
      }
    def rejectCalendarWindow(rawArgs: Vector[Vector[Tok]], fn: String): Unit =
      rawArgs.foreach { a =>
        if (a.nonEmpty && (a.head.kind == TNumber || a.head.isKw("INTERVAL")) &&
            a.exists(tk => tk.kind == TIdent &&
              Set("MONTH", "MONTHS", "YEAR", "YEARS").contains(tk.upper)))
          throw new ParseException(
            s"$fn window size '${a.map(_.text).mkString(" ")}' — MONTH/YEAR are " +
              "not fixed-length window sizes (use e.g. INTERVAL '30' DAY)")
      }
    // ORDER-BY span → `percentile(value, p | (1-(p)))`, shared by the
    // buffered-window and generic OVER percentile arms (two hand-kept
    // copies of the strip-tail + DESC-inversion logic had already
    // drifted; r16 review). Strips a trailing NULLS FIRST/LAST too —
    // percentile ignores nulls, and leaving the tail inside the value
    // expression was a downstream parse error on `ORDER BY v DESC
    // NULLS LAST`. DESC inverts the quantile: PERCENTILE_CONT(p) over
    // a DESC ordering is the value p of the way down from the TOP,
    // i.e. the (1-p) quantile ascending — dropping the DESC without
    // inverting silently returned the wrong percentile.
    def emitPercentileCall(ord: Vector[Tok], p: Vector[Tok]): Unit = {
      var v = ord
      if (v.length >= 2 && (v.last.isKw("FIRST") || v.last.isKw("LAST"))
          && v(v.length - 2).isKw("NULLS")) v = v.dropRight(2)
      val desc = v.nonEmpty && v.last.isKw("DESC")
      val value = if (v.nonEmpty && (v.last.isKw("ASC") || desc)) v.dropRight(1) else v
      out += id("percentile") += sym("(")
      out ++= rewriteTokens(value, defaultTimeCol)
      out += sym(",")
      if (desc) {
        out += sym("(") += Tok(TNumber, "1") += Tok(TSymbol, "-") += sym("(")
        out ++= p
        out += sym(")") += sym(")")
      } else out ++= p
      out += sym(")")
    }
    def isCall(o: Int) = span.lift(o + 1).exists(t => t.kind == TSymbol && t.text == "(")
    // span of a balanced (...) starting at `open` (index of '('); returns index after ')'
    def closeParen(open: Int): Int = {
      var d = 0; var j = open
      while (j < span.length) {
        if (span(j).text == "(") d += 1
        else if (span(j).text == ")") { d -= 1; if (d == 0) return j + 1 }
        j += 1
      }
      throw new ParseException("unbalanced parens")
    }
    // splice a Spark-SQL text template: __ARG1__/__ARG2__/… markers are
    // replaced by already-rewritten token spans. Keeps multi-function
    // lowerings (DATEDIFF calendar units, JSON_EXISTS) readable instead
    // of 30 lines of token pushes each.
    def emitTpl(template: String, argSpans: Vector[Tok]*): Unit =
      VeloSqlParser.tokenize(template).foreach {
        case tk @ Tok(TIdent, s) if s.startsWith("__ARG") && s.endsWith("__") =>
          out ++= argSpans(s.stripPrefix("__ARG").stripSuffix("__").toInt - 1)
        case tk => out += tk
      }
    // literal JSON paths get the reference dot-segment language
    // translated to Spark JSONPath — ALL readings of it: walk_json_path
    // (functions.rs:1192) decides digit segments per node at runtime
    // (array index vs numeric object key), so a literal path expands to
    // one candidate per static reading and the call site COALESCEs.
    // Non-literal paths pass through as a single dynamic candidate.
    def pathCandidateToks(arg: Vector[Tok]): Vector[Vector[Tok]] =
      if (arg.length == 1 && arg.head.kind == TString) {
        graft.functions.VeloFunctions.jsonPathCandidates(
          unquoteString(arg.head.text)).toVector
          .map(p => Vector(Tok(TString, quoteString(p))))
      } else Vector(rewriteTokens(arg, defaultTimeCol))
    // split top-level comma args of the call whose '(' is at `open`.
    // One-slot memo: several rewrite branches scan the SAME call twice —
    // once in the pattern guard, again in the body (DATEDIFF,
    // DATE_FORMAT, UNIX_TIMESTAMP, the PERCENTILE_* guards) — and the
    // balanced-paren walk is O(call length) each time (r14 review).
    // callArgsScan is pure over `span`, so caching by `open` is safe.
    var callArgsMemo: (Int, (Vector[Vector[Tok]], Int)) = (-1, null)
    def callArgs(open: Int): (Vector[Vector[Tok]], Int) = {
      if (callArgsMemo._1 != open) callArgsMemo = (open, callArgsScan(open))
      callArgsMemo._2
    }
    def callArgsScan(open: Int): (Vector[Vector[Tok]], Int) = {
      val end = closeParen(open)
      val inner = span.slice(open + 1, end - 1)
      val args = ArrayBuffer[Vector[Tok]]()
      var cur = ArrayBuffer[Tok]()
      var d = 0
      inner.foreach { t =>
        if (t.text == "(") { d += 1; cur += t }
        else if (t.text == ")") { d -= 1; cur += t }
        else if (t.text == "," && d == 0) { args += cur.toVector; cur = ArrayBuffer[Tok]() }
        else cur += t
      }
      if (cur.nonEmpty || args.nonEmpty) args += cur.toVector
      (args.toVector, end)
    }

    while (i < span.length) {
      val t = span(i)
      val up = t.upper
      // Quantified comparisons (reference docs/sql/subquery-support.md):
      // Catalyst has no ALL/ANY/SOME — rewrite to scalar MIN/MAX
      // subqueries (or IN / NOT IN for the equality forms), preserving
      // SQL empty-set semantics via ±Infinity coalesce (numeric columns,
      // as the reference's threshold semantics assume).
      if (t.kind == TSymbol && Set(">", ">=", "<", "<=", "=", "!=", "<>").contains(t.text)
          && span.lift(i + 1).exists(x => x.isKw("ALL") || x.isKw("ANY") || x.isKw("SOME"))
          && span.lift(i + 2).exists(_.text == "(")) {
        val quant = if (span(i + 1).isKw("ALL")) "ALL" else "ANY"
        val end = closeParen(i + 2)
        val inner = rewriteTokens(span.slice(i + 3, end - 1), defaultTimeCol)
        (t.text, quant) match {
          case ("=", "ANY") =>
            out += id("IN") += sym("(")
            out ++= inner
            out += sym(")")
          case ("!=" | "<>", "ALL") =>
            out += id("NOT") += id("IN") += sym("(")
            out ++= inner
            out += sym(")")
          case (op, q) if Set(">", ">=", "<", "<=").contains(op) =>
            if (!inner.headOption.exists(_.isKw("SELECT")))
              throw new ParseException(s"$op $q expects a subquery")
            val fromIx = {
              var d = 0; var j = 0; var f = -1
              while (j < inner.length && f < 0) {
                if (inner(j).text == "(") d += 1
                if (inner(j).text == ")") d -= 1
                if (d == 0 && inner(j).isKw("FROM")) f = j
                j += 1
              }
              if (f < 0) throw new ParseException(s"$op $q subquery needs FROM"); f
            }
            val sel = inner.slice(1, fromIx)
            val rest = inner.drop(fromIx)
            // ALL keeps the extreme the comparison must clear; empty set
            // coalesces to the identity that makes ALL true / ANY false.
            val (agg, inf) = (op.take(1), q) match {
              case (">", "ALL") => ("MAX", "-Infinity")
              case ("<", "ALL") => ("MIN", "Infinity")
              case (">", "ANY") => ("MIN", "Infinity")
              case ("<", "ANY") => ("MAX", "-Infinity")
              case _ => throw new ParseException(s"unsupported quantified comparison $op $q")
            }
            // ALL: NULLs in the subquery column null-poison the target
            // (CASE WHEN count(*) > count(col) THEN NULL …). Aggregates
            // silently SKIP nulls, so the bare MAX rewrite returned TRUE
            // where standard SQL yields UNKNOWN and filters the row —
            // wrong RESULTS. With the poison every null-bearing ALL case
            // compares UNKNOWN, identical to the standard in WHERE
            // position (the residual x<=max-with-nulls divergence —
            // standard FALSE vs UNKNOWN here — is invisible there).
            // ANY must NOT poison: its TRUE case (x beats some non-null
            // element) is TRUE under the standard regardless of NULLs,
            // and the bare MIN/MAX rewrite is already standard-correct in
            // WHERE (only FALSE-vs-UNKNOWN differs, both filtered).
            //
            // The aggregate runs over a WRAPPED subquery: splicing
            // MAX/MIN into the original select list hoists it ABOVE
            // LIMIT/OFFSET, so a row-bounding LIMIT silently became a
            // no-op on the single aggregate row — the wrap keeps every
            // row-set-shaping clause (LIMIT, OFFSET, DISTINCT) bounding
            // the compared set. The null-detector counts the wrapped
            // column: count(*) = rows of the bounded set (a NULL
            // survives DISTINCT as its own row), count(__graft_qc) =
            // its non-nulls.
            val qc = id("__graft_qc")
            // strip a trailing `AS alias` so the wrapper's alias is the
            // select item's only one
            val selCore =
              if (sel.length >= 2 && sel(sel.length - 2).isKw("AS") && sel.last.kind == TIdent)
                sel.dropRight(2)
              else sel
            out += t += sym("(") += id("SELECT")
            if (q == "ALL") {
              out += id("CASE") += id("WHEN") += id("count") += sym("(") += sym("*") += sym(")")
              out += sym(">") += id("count") += sym("(") += qc += sym(")")
              out += id("THEN") += id("CAST") += sym("(") += id("NULL")
              out += id("AS") += id("DOUBLE") += sym(")")
              out += id("ELSE")
            }
            out += id("coalesce") += sym("(") += id(agg) += sym("(") += qc
            out += sym(")") += sym(",") += id("CAST") += sym("(") += Tok(TString, s"'$inf'")
            out += id("AS") += id("DOUBLE") += sym(")") += sym(")")
            if (q == "ALL") out += id("END")
            out += id("FROM") += sym("(") += id("SELECT")
            out ++= selCore
            out += id("AS") += qc
            out ++= rest
            out += sym(")") += id("__graft_qcsub")
            out += sym(")")
          case (op, q) => throw new ParseException(s"unsupported quantified comparison $op $q")
        }
        i = end
      }
      // OVER (ROWS WINDOW …) must win over the generic call branch:
      // OVER is also an identifier followed by '('.
      else if (t.isKw("OVER") && span.lift(i + 1).exists(_.text == "(")
          && span.lift(i + 2).exists(_.isKw("ROWS")) && span.lift(i + 3).exists(_.isKw("WINDOW"))) {
        val end = closeParen(i + 1)
        // Offset/ranking functions reject explicit frames in Spark (their
        // result is order-based); the buffer frame applies to aggregates.
        val noFrameFns = Set("LAG", "LEAD", "ROW_NUMBER", "RANK", "DENSE_RANK",
          "NTILE", "PERCENT_RANK", "CUME_DIST")
        val precedingFn = {
          var j = out.length - 1
          if (j >= 0 && out(j).text == ")") {
            var d = 0
            while (j >= 0 && !(out(j).text == "(" && d == 1)) {
              if (out(j).text == ")") d += 1
              if (out(j).text == "(") d -= 1
              j -= 1
            }
            if (j > 0) Some(out(j - 1).upper) else None
          } else None
        }
        val withFrame = !precedingFn.exists(noFrameFns.contains)
        out ++= rewriteRowsWindow(span.slice(i + 2, end - 1), defaultTimeCol, withFrame)
        i = end
      }
      // Value-context INTERVAL literals: the reference evaluator
      // collapses EVERY interval to fixed milliseconds before doing
      // timestamp arithmetic (types.rs:1402 interval_to_millis) —
      // MONTH is exactly 30 days and YEAR exactly 365, NOT calendar
      // units, and NANOSECOND/MICROSECOND truncate to whole millis by
      // integer division. Spark's own MONTH/YEAR intervals are
      // calendar-aware (ts + INTERVAL 1 MONTH lands on the same
      // day-of-month) and it has no NANOSECOND unit at all, so these
      // four lower to the equivalent fixed DAY/MILLISECOND literal.
      // Second-and-below units (DAY..MILLISECOND, WEEK) are already
      // fixed-duration in both engines and pass through untouched.
      // interval ± interval (which the reference evaluates to an
      // INTEGER of millis, types.rs:1110) is left to Spark's interval
      // algebra: a plan column can't be millis-int on one row shape
      // and interval on another under static typing, and no reference
      // test exercises the form.
      else if (t.isKw("INTERVAL")
          && span.lift(i + 1).exists(x => x.kind == TNumber || x.kind == TString)
          && span.lift(i + 2).exists(x => fixedIntervalRewrite.contains(x.upper))) {
        val numTok = span(i + 1)
        val raw =
          if (numTok.kind == TString) numTok.text.substring(1, numTok.text.length - 1).trim
          else numTok.text
        raw.toLongOption match {
          case Some(n) =>
            val (toFixed, unit) = fixedIntervalRewrite(span(i + 2).upper)
            out += id("INTERVAL") += Tok(TString, s"'${toFixed(n)}'") += id(unit)
            i += 3
          case None =>
            // non-i64 quantity: the reference parser only admits i64
            // interval values — pass through and let Spark's own
            // interval parsing accept or reject it
            out += t; i += 1
        }
      } else if (t.kind == TIdent && isCall(i)) {
        up match {
          case "GROUP_CONCAT" | "STRING_AGG" | "LISTAGG" | "COLLECT" =>
            // ONE aggregate behind four names (aggregation/functions.rs:46
            // routes all of them to compute_string_agg_aggregate) — so
            // COLLECT returns a JOINED STRING, not an array. The
            // separator defaults to ',' (Spark's one-arg listagg joins
            // with the EMPTY string), and a NON-LITERAL separator also
            // falls back to ',' (the reference reads the literal out of
            // the AST — aggregation/functions.rs:272 — and defaults
            // otherwise). Values stringify through the reference
            // rendering (accumulator.rs:294 field_value_to_string →
            // velo_str; NULLs are skipped, which listagg does natively).
            val (args, end) = callArgs(i + 1)
            if (args.isEmpty || args.head.isEmpty)
              throw new ParseException(s"$up expects (value[, separator])")
            out += id("listagg") += sym("(")
            val v0 = args(0)
            val (distinctKw, vExpr) =
              if (v0.nonEmpty && v0.head.isKw("DISTINCT")) (true, v0.tail) else (false, v0)
            if (distinctKw) out += id("DISTINCT")
            out += id("velo_str") += sym("(")
            out ++= rewriteTokens(vExpr, defaultTimeCol)
            out += sym(")") += sym(",")
            out += (if (args.length >= 2 && args(1).length == 1 && args(1).head.kind == TString)
              args(1).head else Tok(TString, "','"))
            out += sym(")")
            i = end
          case "COUNT_DISTINCT" =>
            val (args, end) = callArgs(i + 1)
            out += id("count") += sym("(") += id("DISTINCT")
            args.map(rewriteTokens(_, defaultTimeCol)).zipWithIndex.foreach { case (a, ix) =>
              if (ix > 0) out += sym(",")
              out ++= a
            }
            out += sym(")")
            i = end
          case "TIMESTAMP" | "NOW" =>
            val (args, end) = callArgs(i + 1)
            if (args.isEmpty) {
              // zero-arg TIMESTAMP()/NOW() = wall clock (reference
              // functions.rs). TIMESTAMP(col) is a CONVERSION — rewriting
              // it to current_timestamp() would silently replace every
              // row's event time with the query wall clock.
              out += id("current_timestamp") += sym("(") += sym(")")
            } else {
              // no format form: silently dropping a second argument
              // would cast with the DEFAULT format and NULL out every
              // string the user's format was there to parse
              if (args.length > 1)
                throw new ParseException(
                  s"$up(expr) takes one argument; format variants are not supported")
              out += id("cast") += sym("(")
              out ++= rewriteTokens(args.head, defaultTimeCol)
              out += id("AS") += id("timestamp") += sym(")")
            }
            i = end
          case "DELTA" =>
            // DELTA(col): max-min spread aggregate
            // (reference functions.rs:1807)
            val (args, end) = callArgs(i + 1)
            if (args.length != 1) throw new ParseException("DELTA expects one argument")
            val a = rewriteTokens(args.head, defaultTimeCol)
            out += sym("(") += id("max") += sym("(")
            out ++= a
            out += sym(")") += sym("-") += id("min") += sym("(")
            out ++= a
            out += sym(")") += sym(")")
            i = end
          case "JSON_EXTRACT" | "JSON_VALUE" =>
            // both are the SAME evaluator function in the reference
            // (functions.rs:1073 json_value_function calls
            // extract_json_value too). Literal paths get the reference's
            // dot-segment language translated (`$.arr.0.b` → `$.arr[0].b`,
            // bare `k` → `$.k` — functions.rs:1215 parse_json_path);
            // non-literal paths pass through untouched.
            val (args, end) = callArgs(i + 1)
            if (args.length != 2) throw new ParseException(s"$up expects (json, path)")
            val j = rewriteTokens(args(0), defaultTimeCol)
            val cands = pathCandidateToks(args(1))
            def gjo(p: Vector[Tok]): Unit = {
              out += id("get_json_object") += sym("(")
              out ++= j
              out += sym(",")
              out ++= p
              out += sym(")")
            }
            if (cands.length == 1) gjo(cands.head)
            else {
              out += id("coalesce") += sym("(")
              cands.zipWithIndex.foreach { case (p, k) =>
                if (k > 0) out += sym(",")
                gjo(p)
              }
              out += sym(")")
            }
            i = end
          case "JSON_EXISTS" =>
            // reference semantics (functions.rs:1099): NULL json or path
            // → NULL; unparseable JSON → false; a key holding JSON null
            // EXISTS (the path walk returns Some(Null)). get_json_object
            // cannot tell JSON null from a missing key — variant can:
            // try_variant_get yields a non-NULL variant for JSON null
            // and SQL NULL only for a missing path.
            val (args, end) = callArgs(i + 1)
            if (args.length != 2) throw new ParseException("JSON_EXISTS expects (json, path)")
            val j = rewriteTokens(args(0), defaultTimeCol)
            val cands = pathCandidateToks(args(1))
            if (cands.forall(p => p.length == 1 && p.head.kind == TString)) {
              // any static reading of the path hitting = the node exists
              val probes = cands.indices.map(k =>
                s"try_variant_get(try_parse_json(__ARG1__), __ARG${k + 2}__) IS NOT NULL")
                .mkString(" OR ")
              emitTpl(
                s"""(CASE WHEN __ARG1__ IS NULL THEN CAST(NULL AS BOOLEAN)
                   WHEN try_parse_json(__ARG1__) IS NULL THEN false
                   ELSE ($probes) END)""",
                (j +: cands): _*)
            } else {
              // dynamic path: variant_get demands a LITERAL path, so the
              // value probe via get_json_object is the fallback — but
              // the reference NULL rules still apply where expressible:
              // NULL json → NULL and NULL path → NULL (a bare IS NOT
              // NULL probe read both as false, r12 review). The one
              // corner get_json_object cannot express remains: a key
              // holding JSON null reads false here, true in the
              // reference (the static-path variant probe gets it right).
              emitTpl(
                """(CASE WHEN __ARG1__ IS NULL OR __ARG2__ IS NULL THEN CAST(NULL AS BOOLEAN)
                   ELSE get_json_object(__ARG1__, __ARG2__) IS NOT NULL END)""",
                j, cands.head)
            }
            i = end
          case "JSON_QUERY" =>
            // JSON_QUERY(json, path) → nested objects/arrays as JSON
            // text; scalars → NULL (reference functions.rs:1138,1184)
            val (args, end) = callArgs(i + 1)
            if (args.length != 2) throw new ParseException("JSON_QUERY expects (json, path)")
            val jq = rewriteTokens(args(0), defaultTimeCol)
            val jqCands = pathCandidateToks(args(1))
            def extract(): Unit = {
              if (jqCands.length > 1) out += id("coalesce") += sym("(")
              jqCands.zipWithIndex.foreach { case (p, k) =>
                if (k > 0) out += sym(",")
                out += id("get_json_object") += sym("(")
                out ++= jq
                out += sym(",")
                out ++= p
                out += sym(")")
              }
              if (jqCands.length > 1) out += sym(")")
            }
            out += id("CASE") += id("WHEN")
            extract()
            out += id("RLIKE") += Tok(TString, "'^\\\\s*[\\\\[{]'") += id("THEN")
            extract()
            out += id("END")
            i = end
          case "TUMBLE" =>
            // Flink-style grouping form (watermarks-time-semantics.md):
            // GROUP BY …, TUMBLE(ts, INTERVAL '5' MINUTE) → Spark's
            // native window() grouping expression
            val (args0, end) = callArgs(i + 1)
            rejectCalendarWindow(args0, "TUMBLE")
            val args = args0.map(rewriteTokens(_, defaultTimeCol))
            val (tsArg, dur) = args match {
              case Vector(a, b) => parseDuration(b).map(d => (a, Option(d)))
                .getOrElse((b, parseDuration(a)))
              case _ => throw new ParseException("TUMBLE expects (ts, duration)")
            }
            val s = dur.getOrElse(throw new ParseException("TUMBLE needs a duration"))
            out += id("window") += sym("(")
            out ++= tsArg
            out += sym(",") += Tok(TString, s"'$s seconds'") += sym(")")
            i = end
          case "HOP" =>
            // Flink-style GROUP BY HOP(ts, slide, size) → Spark's native
            // sliding window(ts, size, slide); without this case the
            // aggWrap check accepts the statement but hop() reaches
            // Catalyst as an undefined function
            val (args0, end) = callArgs(i + 1)
            rejectCalendarWindow(args0, "HOP")
            val args = args0.map(rewriteTokens(_, defaultTimeCol))
            args match {
              case Vector(a, b, c) =>
                val slide = parseDuration(b).getOrElse(
                  throw new ParseException("HOP expects (ts, slide, size) durations"))
                val size = parseDuration(c).getOrElse(
                  throw new ParseException("HOP expects (ts, slide, size) durations"))
                out += id("window") += sym("(")
                out ++= a
                out += sym(",") += Tok(TString, s"'$size seconds'")
                out += sym(",") += Tok(TString, s"'$slide seconds'") += sym(")")
              case _ => throw new ParseException("HOP expects (ts, slide, size)")
            }
            i = end
          case "SESSION" =>
            // Flink-style GROUP BY SESSION(ts, gap) → session_window()
            // (the enclosing isCall guard ensures this is a call form)
            val (args0, end) = callArgs(i + 1)
            rejectCalendarWindow(args0, "SESSION")
            val args = args0.map(rewriteTokens(_, defaultTimeCol))
            val (tsArg, gap) = args match {
              case Vector(a, b) => parseDuration(b).map(d => (a, Option(d)))
                .getOrElse((b, parseDuration(a)))
              case _ => throw new ParseException("SESSION expects (ts, gap)")
            }
            val g = gap.getOrElse(throw new ParseException("SESSION needs a gap duration"))
            out += id("session_window") += sym("(")
            out ++= tsArg
            out += sym(",") += Tok(TString, s"'$g seconds'") += sym(")")
            i = end
          case "UNIX_TIMESTAMP" if span.lift(i + 1).exists(_.text == "(") &&
              callArgs(i + 1)._1.nonEmpty =>
            // one-arg form: CAST-to-BIGINT (floorDiv on micros), not
            // Spark's unix_timestamp — the reference goes through
            // chrono's timestamp(), a euclidean FLOOR (functions.rs:
            // 2470), so a pre-1970 fractional timestamp must read one
            // second LOWER than toward-zero truncation would give.
            // Zero-arg UNIX_TIMESTAMP() (current time) passes through:
            // "now" is positive, truncate == floor.
            val (args, end) = callArgs(i + 1)
            if (args.length != 1)
              throw new ParseException("UNIX_TIMESTAMP expects () or (timestamp)")
            out += id("CAST") += sym("(") += id("CAST") += sym("(")
            out ++= rewriteTokens(args(0), defaultTimeCol)
            out += id("AS") += id("TIMESTAMP") += sym(")")
            out += id("AS") += id("BIGINT") += sym(")")
            i = end
          case "TUMBLE_START" | "TUMBLE_END" =>
            val (args0, end) = callArgs(i + 1)
            rejectCalendarWindow(args0, up)
            val args = args0.map(rewriteTokens(_, defaultTimeCol))
            val (tsArg, dur) = args match {
              case Vector(a) => (Vector(id(defaultTimeCol)), parseDuration(a))
              case Vector(a, b) => parseDuration(b).map(d => (a, Option(d)))
                .getOrElse((b, parseDuration(a)))
              case _ => throw new ParseException(s"$up expects (ts, duration)")
            }
            val s = dur.getOrElse(throw new ParseException(s"$up needs a duration"))
            // (floor(CAST(CAST(ts AS TIMESTAMP) AS BIGINT) / S) * S)
            // [+ S]; group-constant inside a windowed aggregation →
            // MIN-wrapped there. CAST-to-BIGINT floors the epoch
            // (floorDiv on micros) where unix_timestamp truncates
            // toward zero — a pre-1970 fractional-second event would
            // bucket one window late and disagree with BOTH the DuckDB
            // oracle and TimeWindows.epochBucket (same rule, one fix).
            // The inner TIMESTAMP cast keeps string-typed ts columns
            // working, which unix_timestamp used to parse implicitly.
            if (aggWrap) { out += id("MIN") += sym("(") }
            out += sym("(") += id("CAST") += sym("(") += id("floor") += sym("(")
            out += id("CAST") += sym("(") += id("CAST") += sym("(")
            out ++= tsArg
            out += id("AS") += id("TIMESTAMP") += sym(")")
            out += id("AS") += id("BIGINT") += sym(")")
            out += Tok(TSymbol, "/") += Tok(TNumber, s.toString) += sym(")")
            out += sym("*") += Tok(TNumber, s.toString)
            if (up == "TUMBLE_END") { out += sym("+") += Tok(TNumber, s.toString) }
            out += id("AS") += id("BIGINT") += sym(")") += sym(")")
            if (aggWrap) { out += sym(")") }
            i = end
          // header ARG spans recurse through rewriteTokens: a dialect
          // form nested in the key/value (LEN(k), TIMESTAMP()) must not
          // reach Catalyst verbatim — same rule as the VALUES branch
          case "HEADER" =>
            val (args, end) = callArgs(i + 1)
            arity("HEADER", args, 1, 1)
            out += id("element_at") += sym("(") += id("_headers") += sym(",")
            out ++= rewriteTokens(args.head, defaultTimeCol)
            out += sym(")")
            i = end
          case "HAS_HEADER" =>
            val (args, end) = callArgs(i + 1)
            arity("HAS_HEADER", args, 1, 1)
            out += id("map_contains_key") += sym("(")
            emitHeadersOrEmpty(out)
            out += sym(",")
            out ++= rewriteTokens(args.head, defaultTimeCol)
            out += sym(")")
            i = end
          case "HEADER_KEYS" =>
            // a comma-joined STRING, not an array — functions.rs:375
            // `keys.join(",")` (headers_test.rs asserts the joined
            // form). The reference iterates a HashMap (arbitrary
            // order); map insertion order here is deterministic.
            val (hkArgs, end) = callArgs(i + 1)
            arity("HEADER_KEYS", hkArgs, 0, 0)
            out += id("array_join") += sym("(") += id("map_keys") += sym("(")
            emitHeadersOrEmpty(out)
            out += sym(")") += sym(",") += Tok(TString, "','") += sym(")")
            i = end
          case "SET_HEADER" =>
            val (args, end) = callArgs(i + 1)
            arity("SET_HEADER", args, 2, 2)
            // UPSERT: drop the existing key before the concat — bare
            // map_concat(_headers, map(k, v)) throws DUPLICATE_MAP_KEY on
            // the normal re-stamp case (Spark's default
            // mapKeyDedupPolicy=EXCEPTION); same form as
            // VeloFunctions.setHeader
            val k0 = rewriteTokens(args(0), defaultTimeCol)
            val v0 = rewriteTokens(args(1), defaultTimeCol)
            out += id("map_concat") += sym("(")
            out += id("map_filter") += sym("(")
            emitHeadersOrEmpty(out)
            out += sym(",") += sym("(")
            out += id("__hk") += sym(",") += id("__hv") += sym(")") += Tok(TSymbol, "->")
            out += id("__hk") += sym("!=")
            out ++= k0
            out += sym(")") += sym(",") += id("map") += sym("(")
            out ++= k0
            // header VALUES are strings: the reference stringifies the
            // value (functions.rs:2613 — Rust rendering, NULL → "null")
            out += sym(",") += id("coalesce") += sym("(") += id("velo_str") += sym("(")
            out ++= v0
            out += sym(")") += sym(",") += Tok(TString, "'null'") += sym(")")
            out += sym(")") += sym(")")
            i = end
          case "REMOVE_HEADER" =>
            val (args, end) = callArgs(i + 1)
            arity("REMOVE_HEADER", args, 1, 1)
            // map_filter(coalesce(_headers, map()), (__hk, __hv) -> __hk != <key>)
            out += id("map_filter") += sym("(")
            emitHeadersOrEmpty(out)
            out += sym(",") += sym("(")
            out += id("__hk") += sym(",") += id("__hv") += sym(")") += Tok(TSymbol, "->")
            out += id("__hk") += sym("!=")
            out ++= rewriteTokens(args.head, defaultTimeCol)
            out += sym(")")
            i = end
          case "PERCENTILE_CONT" | "PERCENTILE_DISC"
            if {
              val (_, e) = callArgs(i + 1)
              span.lift(e).exists(_.isKw("OVER")) && span.lift(e + 1).exists(_.text == "(")
            } =>
            // Spark's windowed percentile is CONTINUOUS: silently mapping
            // PERCENTILE_DISC here would interpolate where the user asked
            // for an actual row value — honest rejection beats a wrong
            // number
            if (up == "PERCENTILE_DISC")
              throw new ParseException(
                "PERCENTILE_DISC(p) OVER (...) is not supported (Spark's windowed " +
                  "percentile is continuous); use PERCENTILE_CONT(p) OVER (...) or the " +
                  "aggregate form PERCENTILE_DISC(expr, p)")
            // Window inverse-distribution form (reference
            // docs/sql/functions/advanced.md): PERCENTILE_CONT(p) OVER
            // (PARTITION BY k ORDER BY v [frame]) → Spark's windowed
            // percentile aggregate: percentile(v, p) OVER (PARTITION BY k
            // [ORDER BY v frame]). Without an explicit frame the
            // percentile is over the whole partition (the reference's
            // full-buffer semantics); with a ROWS frame it is a moving
            // percentile, so order+frame are kept.
            val (args, endCall) = callArgs(i + 1)
            val p = args.head
            val overEnd = closeParen(endCall + 1)
            val overInner = span.slice(endCall + 2, overEnd - 1)
            // buffered-window form: PERCENTILE_CONT(p) OVER (ROWS WINDOW
            // BUFFER n ROWS ... ORDER BY v). The generic frame scan below
            // would swallow the whole spec from its leading ROWS keyword
            // and die on "needs ORDER BY" — the dialect's PRIMARY
            // buffered-window OVER form could never carry a percentile.
            // Extract the buffer's ORDER BY value and reuse
            // rewriteRowsWindow for the OVER clause itself.
            if (overInner.headOption.exists(_.isKw("ROWS"))
                && overInner.lift(1).exists(_.isKw("WINDOW"))) {
              val stops2 = Set("PARTITION", "ORDER", "ROWS", "RANGE", "EMIT", "EXPIRE")
              var k = 0
              var ord = Vector.empty[Tok]
              while (k < overInner.length && ord.isEmpty) {
                if (overInner(k).isKw("ORDER") && overInner.lift(k + 1).exists(_.isKw("BY"))) {
                  val (s, nk) = spanUntilKw(overInner, k + 2, stops2)
                  ord = s; k = nk
                } else k += 1
              }
              if (ord.isEmpty)
                throw new ParseException(s"$up OVER (ROWS WINDOW ...) needs ORDER BY <value>")
              emitPercentileCall(ord, p)
              out ++= rewriteRowsWindow(overInner, defaultTimeCol, withFrame = true)
              i = overEnd
            } else {
            var j = 0
            def atj(kw: String, o: Int = 0) = overInner.lift(j + o).exists(_.isKw(kw))
            var partition = Vector.empty[Tok]; var order = Vector.empty[Tok]; var frame = Vector.empty[Tok]
            def spanUntil2(stops: Set[String]): Vector[Tok] = {
              val (s, nj) = spanUntilKw(overInner, j, stops); j = nj; s
            }
            while (j < overInner.length) {
              if (atj("PARTITION") && atj("BY", 1)) { j += 2; partition = spanUntil2(Set("ORDER", "ROWS", "RANGE")) }
              else if (atj("ORDER") && atj("BY", 1)) { j += 2; order = spanUntil2(Set("ROWS", "RANGE")) }
              // the frame span starts WITH the ROWS/RANGE keyword — no
              // stop on it, or the scan makes no progress
              else if (atj("ROWS") || atj("RANGE")) { frame = spanUntil2(Set.empty) }
              else j += 1
            }
            if (order.isEmpty) throw new ParseException(s"$up OVER (...) needs ORDER BY <value>")
            emitPercentileCall(order, p)
            out += id("OVER") += sym("(")
            // rewrite the PARTITION BY / ORDER BY expression spans —
            // same raw-emission bug as rewriteRowsWindow (r14 review)
            if (partition.nonEmpty) {
              out += id("PARTITION") += id("BY")
              out ++= rewriteTokens(partition, defaultTimeCol)
            }
            if (frame.nonEmpty) {
              out += id("ORDER") += id("BY")
              out ++= rewriteTokens(order, defaultTimeCol)
              out ++= frame
            }
            out += sym(")")
            i = overEnd
            }
          case "PERCENTILE_CONT" | "PERCENTILE_DISC"
            if {
              val (_, e) = callArgs(i + 1)
              span.lift(e).exists(_.isKw("WITHIN"))
            } =>
            // standard inverse-distribution form PERCENTILE_CONT(p)
            // WITHIN GROUP (ORDER BY v) — Spark executes it natively;
            // stream the tokens through unchanged
            out += t
            i += 1
          case "PERCENTILE_DISC" =>
            // aggregate form: PERCENTILE_DISC(e, p) → WITHIN GROUP syntax
            val (args, end) = callArgs(i + 1)
            if (args.length != 2) throw new ParseException("PERCENTILE_DISC(expr, p) expects two arguments")
            out += id("percentile_disc") += sym("(")
            out ++= args(1)
            out += sym(")") += id("WITHIN") += id("GROUP") += sym("(") += id("ORDER") += id("BY")
            out ++= rewriteTokens(args(0), defaultTimeCol)
            out += sym(")")
            i = end
          case "PERCENTILE_CONT" =>
            val (args, end) = callArgs(i + 1)
            if (args.length != 2) throw new ParseException("PERCENTILE_CONT(expr, p) expects two arguments")
            out += id("percentile") += sym("(")
            out ++= rewriteTokens(args(0), defaultTimeCol)
            out += sym(",")
            out ++= args(1)
            out += sym(")")
            i = end
          case "DATEDIFF" if {
            val (a, _) = callArgs(i + 1); a.length == 3 && a.head.length == 1 && a.head.head.kind == TString
          } =>
            // three-arg unit form: DATEDIFF('days', a, b). Reference
            // EVALUATOR semantics (functions.rs:1977-2005) are calendar-
            // COMPONENT diffs, not elapsed periods: years is
            // year(b)-year(a) (Dec 31 → Jan 1 reads 1, where Spark's
            // timestampdiff(YEAR,…) reads 0); months/quarters likewise
            // ignore day-of-month; weeks is 52·Δ(ISO week-year)+Δ(ISO
            // week); days compares calendar DATES ignoring time-of-day
            // (timestampdiff(DAY,…) counts full 24 h periods); hours
            // divides raw elapsed millis truncating toward zero. Docs
            // and demos also use minutes/seconds/milliseconds (the
            // evaluator rejects them — catalog drift): lowered as the
            // natural extension of the hours arm.
            val (args, end) = callArgs(i + 1)
            val rawUnit = args.head.head.text.stripPrefix("'").stripSuffix("'")
              .toLowerCase(java.util.Locale.ROOT)
            val a = rewriteTokens(args(1), defaultTimeCol)
            val b = rewriteTokens(args(2), defaultTimeCol)
            // ISO week-based year = year of the Thursday in the row's
            // ISO week; weekday() is Monday=0, so Thursday is +(3-wd).
            def iwy(arg: String) =
              s"year(date_add(CAST($arg AS DATE), 3 - weekday(CAST($arg AS DATE))))"
            def millisDiv(d: Long) =
              s"CAST((unix_millis(CAST(__ARG2__ AS TIMESTAMP)) - unix_millis(CAST(__ARG1__ AS TIMESTAMP))) div $d AS BIGINT)"
            // 'ms' before the plural strip; a bare 'm' (month/minute by
            // convention elsewhere) errors like the reference evaluator
            val tpl = (if (rawUnit == "ms") "millisecond"
                       else rawUnit.stripSuffix("s")) match {
              case "year" => "CAST(year(__ARG2__) - year(__ARG1__) AS BIGINT)"
              case "month" =>
                "CAST((year(__ARG2__) - year(__ARG1__)) * 12 + (month(__ARG2__) - month(__ARG1__)) AS BIGINT)"
              case "quarter" =>
                "CAST((year(__ARG2__) - year(__ARG1__)) * 4 + (quarter(__ARG2__) - quarter(__ARG1__)) AS BIGINT)"
              case "week" =>
                s"CAST((${iwy("__ARG2__")} - ${iwy("__ARG1__")}) * 52 + (weekofyear(__ARG2__) - weekofyear(__ARG1__)) AS BIGINT)"
              case "day" => "CAST(datediff(__ARG2__, __ARG1__) AS BIGINT)"
              case "hour" => millisDiv(3600000L)
              case "minute" => millisDiv(60000L)
              case "second" => millisDiv(1000L)
              case "millisecond" | "milli" => millisDiv(1L)
              case "u" | "micro" | "microsecond" =>
                "CAST(unix_micros(CAST(__ARG2__ AS TIMESTAMP)) - unix_micros(CAST(__ARG1__ AS TIMESTAMP)) AS BIGINT)"
              case other => throw new ParseException(s"unsupported DATEDIFF unit: $rawUnit")
            }
            emitTpl(tpl, a, b)
            i = end
          case "DATE_FORMAT" if {
            val (a, _) = callArgs(i + 1)
            a.length == 2 && a(1).length == 1 && a(1).head.kind == TString &&
              a(1).head.text.contains("%")
          } =>
            // the reference formats through chrono strftime
            // (functions.rs:2403 `dt.format(&format)`) — every demo/doc
            // query writes '%Y-%m-%d'-style patterns, which Java's
            // DateTimeFormatter would render as garbage ('Y'/'d' are
            // pattern letters, '%' a literal). Translate the literal at
            // plan time; non-% patterns pass through as Spark patterns.
            val (args, end) = callArgs(i + 1)
            val fmt = unquoteString(args(1).head.text)
            val sparkFmt = graft.functions.VeloFunctions.strftimeToSpark(fmt)
            val eDay = graft.functions.VeloFunctions.EDaySentinel.toString
            // %e (chrono: SPACE-padded day) has no Java pattern letter —
            // strftimeToSpark emits a sentinel, post-replaced here with
            // lpad(day, 2, ' ') so 'Jan  5' renders like the reference
            if (sparkFmt.contains(eDay)) {
              out += id("regexp_replace") += sym("(")
              out += id("date_format") += sym("(")
              out ++= rewriteTokens(args(0), defaultTimeCol)
              out += sym(",") += Tok(TString, quoteString(sparkFmt)) += sym(")")
              out += sym(",") += Tok(TString, "'" + eDay + "'")
              out += sym(",") += id("lpad") += sym("(")
              out += id("cast") += sym("(") += id("day") += sym("(")
              out ++= rewriteTokens(args(0), defaultTimeCol)
              out += sym(")") += id("AS") += id("string") += sym(")")
              out += sym(",") += Tok(TNumber, "2") += sym(",") += Tok(TString, "' '")
              out += sym(")") += sym(")")
            } else {
              out += id("date_format") += sym("(")
              out ++= rewriteTokens(args(0), defaultTimeCol)
              out += sym(",") += Tok(TString, quoteString(sparkFmt)) += sym(")")
            }
            i = end
          case "POSITION" =>
            // byte-based with an optional byte start offset
            // (functions.rs:2489) — Spark's builtin counts chars. Both
            // the call form POSITION(sub, str[, start]) and the SQL
            // standard POSITION(sub IN str) lower to velo_position.
            val (args0, end) = callArgs(i + 1)
            val args: Vector[Vector[Tok]] =
              if (args0.length == 1) {
                val a = args0.head
                val inIx = {
                  var d = 0; var f = -1
                  a.zipWithIndex.foreach { case (x, ix) =>
                    if (x.text == "(") d += 1
                    if (x.text == ")") d -= 1
                    if (d == 0 && x.isKw("IN") && f < 0) f = ix
                  }
                  f
                }
                if (inIx < 0) throw new ParseException("POSITION expects (sub, str[, start]) or (sub IN str)")
                Vector(a.take(inIx), a.drop(inIx + 1))
              } else args0
            out += id("velo_position") += sym("(")
            args.zipWithIndex.foreach { case (arg, ix) =>
              if (ix > 0) out += sym(",")
              out ++= rewriteTokens(arg, defaultTimeCol)
            }
            out += sym(")")
            i = end
          case "CONCAT" =>
            // CONCAT skips NULL arguments and stringifies non-strings
            // (functions.rs:1419 `FieldValue::Null => {}`) — Spark's
            // concat NULLs the whole result on any NULL argument. The
            // stringification is the reference rendering (velo_str):
            // floats as Rust Display — "100", not cast's "100.0".
            val (args, end) = callArgs(i + 1)
            out += id("concat_ws") += sym("(") += Tok(TString, "''")
            args.foreach { arg =>
              out += sym(",") += id("velo_str") += sym("(")
              out ++= rewriteTokens(arg, defaultTimeCol)
              out += sym(")")
            }
            out += sym(")")
            i = end
          case "FROM_UNIXTIME" =>
            // the reference returns a TIMESTAMP value (functions.rs:2413
            // — chrono from_timestamp; a float argument keeps its
            // sub-second precision); Spark's builtin returns a FORMATTED
            // STRING. timestamp_seconds has exactly the reference shape
            // for both integer and fractional inputs.
            val (args, end) = callArgs(i + 1)
            if (args.length != 1)
              throw new ParseException("FROM_UNIXTIME expects exactly one argument")
            out += id("timestamp_seconds") += sym("(")
            out ++= rewriteTokens(args.head, defaultTimeCol)
            out += sym(")")
            i = end
          case "REGEXP_REPLACE" =>
            // the reference replaces only the FIRST match unless the 'g'
            // flag is passed, and 'i' is case-insensitive
            // (functions.rs:850-868 — Rust Regex::replace vs
            // replace_all). Spark's builtin replaces every match and has
            // no flags argument, so this routes to the parity kernel;
            // a NULL flags argument reads as no-flags (functions.rs:840).
            val (args, end) = callArgs(i + 1)
            if (args.length < 3 || args.length > 4)
              throw new ParseException(
                "REGEXP_REPLACE expects (string, pattern, replacement[, flags])")
            out += id("velo_regexp_replace") += sym("(")
            args.take(3).zipWithIndex.foreach { case (a, ix) =>
              if (ix > 0) out += sym(",")
              out ++= rewriteTokens(a, defaultTimeCol)
            }
            out += sym(",")
            if (args.length == 4) {
              out += id("coalesce") += sym("(")
              out ++= rewriteTokens(args(3), defaultTimeCol)
              out += sym(",") += Tok(TString, "''") += sym(")")
            } else out += Tok(TString, "''")
            out += sym(")")
            i = end
          case "STRUCT" =>
            // reference STRUCT (functions.rs:1316): an EVEN argument
            // count is name/value pairs, an ODD count is positional
            // field0..fieldN — both lower to named_struct. Even-count
            // calls whose name positions are not string literals carry
            // PER-RECORD field names in the reference (struct values are
            // HashMaps there) — unrepresentable in a fixed relational
            // schema, so those fall back to Spark's positional struct()
            // (documented divergence, FuncParity ledger).
            val (args, end) = callArgs(i + 1)
            val namedPairs = args.nonEmpty && args.length % 2 == 0 &&
              args.grouped(2).forall(p => p.head.length == 1 && p.head.head.kind == TString)
            if (namedPairs) {
              // duplicate names: the reference's HashMap keeps ONE field
              // per name, last insert wins (first position kept here for
              // a deterministic schema — the reference has no field
              // order at all); un-deduped named_struct would emit
              // struct<a:…,a:…> and make every later `.a` access an
              // ambiguous-reference error
              val deduped = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Tok]]
              args.grouped(2).foreach { p =>
                deduped(p.head.head.text) = p(1)
              }
              out += id("named_struct") += sym("(")
              var first = true
              deduped.foreach { case (name, value) =>
                if (!first) out += sym(",")
                first = false
                out += Tok(TString, name) += sym(",")
                out ++= rewriteTokens(value, defaultTimeCol)
              }
              out += sym(")")
            } else if (args.length % 2 == 1) {
              out += id("named_struct") += sym("(")
              args.zipWithIndex.foreach { case (a, ix) =>
                if (ix > 0) out += sym(",")
                out += Tok(TString, s"'field$ix'") += sym(",")
                out ++= rewriteTokens(a, defaultTimeCol)
              }
              out += sym(")")
            } else {
              out += id("struct") += sym("(")
              args.zipWithIndex.foreach { case (a, ix) =>
                if (ix > 0) out += sym(",")
                out ++= rewriteTokens(a, defaultTimeCol)
              }
              out += sym(")")
            }
            i = end
          case "MAP" =>
            // reference MAP keys must be STRINGS or INTEGERS, and
            // integer keys are STRINGIFIED (functions.rs:1352-1383) —
            // every reference map is string-keyed. Keys route through
            // velo_map_key, which stringifies integers (MAP(1,'x') =
            // {"1":"x"}) and rejects any other key type at analysis
            // (the reference rejects them per record at run time).
            // Expression position only: the dialect's CAST grammar
            // takes a single-identifier type, so MAP here is always the
            // constructor call.
            val (args, end) = callArgs(i + 1)
            out += id("map") += sym("(")
            args.zipWithIndex.foreach { case (a, ix) =>
              if (ix > 0) out += sym(",")
              if (ix % 2 == 0) {
                out += id("velo_map_key") += sym("(")
                out ++= rewriteTokens(a, defaultTimeCol)
                out += sym(")")
              } else out ++= rewriteTokens(a, defaultTimeCol)
            }
            out += sym(")")
            i = end
          case "EXTRACT" =>
            // Three reference forms (FUNCTION_CATALOG.md, parser tests):
            //  EXTRACT(FIELD FROM x)      — standard; DOW/EPOCH need mapping
            //  EXTRACT('FIELD', x)        — legacy two-arg
            //  EXTRACT(EPOCH FROM (a-b))  — epoch-seconds of a difference
            val (args, end) = callArgs(i + 1)
            // Option, not an empty-string sentinel: EXTRACT('', x) made
            // the two-arg branch produce field = "" WITHOUT running the
            // unknown-shape passthrough — neither arm emitted a token or
            // advanced i, and the rewrite loop spun forever (one
            // malformed statement hung the server thread; r16 review).
            val parsedForm: Option[(String, Vector[Tok])] =
              if (args.length == 2 && args(0).length == 1 && args(0).head.kind == TString)
                Some((args(0).head.text.stripPrefix("'").stripSuffix("'")
                  .toUpperCase(java.util.Locale.ROOT),
                  rewriteTokens(args(1), defaultTimeCol)))
              else if (args.length == 1 && args.head.length >= 3 && args.head(1).isKw("FROM"))
                Some((args.head.head.upper, rewriteTokens(args.head.drop(2), defaultTimeCol)))
              else None // unknown shape — pass through untouched
            val (field, valueToks) = parsedForm.filter(_._1.nonEmpty)
              .getOrElse { out += t; i += 1; ("", Vector.empty) }
            if (field.nonEmpty) {
              field match {
                case "EPOCH" =>
                  // strip one outer paren pair, then split on a top-level '-'
                  val inner0 = valueToks
                  val inner = if (inner0.headOption.exists(_.text == "(")) {
                    var d = 0; var closeIx = -1
                    inner0.zipWithIndex.foreach { case (x, ix) =>
                      if (x.text == "(") d += 1
                      else if (x.text == ")") { d -= 1; if (d == 0 && closeIx < 0) closeIx = ix }
                    }
                    if (closeIx == inner0.length - 1) inner0.slice(1, inner0.length - 1) else inner0
                  } else inner0
                  val minusIx = {
                    var d = 0; var f = -1
                    inner.zipWithIndex.foreach { case (x, ix) =>
                      if (x.text == "(") d += 1
                      if (x.text == ")") d -= 1
                      if (d == 0 && x.text == "-" && ix > 0 && f < 0) f = ix
                    }
                    f
                  }
                  // `ts - INTERVAL …` is a TIMESTAMP, not a timestamp
                  // difference: splitting it would emit
                  // unix_timestamp(INTERVAL …) — an analysis error
                  val rhsIsInterval =
                    minusIx > 0 && inner.lift(minusIx + 1).exists(_.isKw("INTERVAL"))
                  // CAST, not unix_timestamp: the reference's EPOCH is
                  // chrono timestamp() — a euclidean FLOOR (functions.rs
                  // :1919) — and cast-to-long floors micros where
                  // unix_timestamp truncates toward zero (pre-1970
                  // fractional seconds read one second apart). The inner
                  // TIMESTAMP cast keeps string-typed ts columns working
                  // (the UNIX_TIMESTAMP arm's rationale): without it a
                  // string column casts '2024-…' straight to BIGINT —
                  // NULL on every row, silently.
                  def castLong(ts: Iterable[Tok]): Unit = {
                    out += id("CAST") += sym("(") += id("CAST") += sym("(")
                    out ++= ts
                    out += id("AS") += id("TIMESTAMP") += sym(")")
                    out += id("AS") += id("BIGINT") += sym(")")
                  }
                  if (minusIx > 0 && !rhsIsInterval) {
                    // epoch of a timestamp difference, in seconds
                    out += sym("(")
                    castLong(inner.take(minusIx))
                    out += Tok(TSymbol, "-")
                    castLong(inner.drop(minusIx + 1))
                    out += sym(")")
                  } else {
                    castLong(inner)
                  }
                case "DOW" =>
                  // 0=Sunday (postgres/duckdb convention, VeloFunctions.veloExtract)
                  out += sym("(") += id("dayofweek") += sym("(")
                  out ++= valueToks
                  out += sym(")") += Tok(TSymbol, "-") += Tok(TNumber, "1") += sym(")")
                case "MILLISECOND" | "MICROSECOND" | "NANOSECOND" =>
                  // sub-second components (reference functions.rs:1921-1923
                  // timestamp_subsec_*: the 0-bounded fraction, NOT the
                  // postgres seconds-inclusive reading) — Spark's own
                  // extract() has no such fields, so passing them through
                  // would AnalysisException on a reference-valid query.
                  // pmod keeps the fraction non-negative pre-1970, like
                  // chrono's accessors.
                  val (unit, modulus, scale) = field match {
                    case "MILLISECOND" => ("unix_millis", "1000", "")
                    case "MICROSECOND" => ("unix_micros", "1000000", "")
                    case _             => ("unix_micros", "1000000", " * 1000")
                  }
                  // the EPOCH arm's TIMESTAMP hop, here too: unix_millis/
                  // unix_micros take no implicit string/date cast, so a
                  // string time column failed analysis on exactly these
                  // three fields (r16 review; VeloFunctions.veloExtract
                  // shared the gap)
                  out += sym("(") += id("pmod") += sym("(") += id(unit) += sym("(")
                  out += id("CAST") += sym("(")
                  out ++= valueToks
                  out += id("AS") += id("TIMESTAMP") += sym(")")
                  out += sym(")") += sym(",") += Tok(TNumber, modulus) += sym(")")
                  if (scale.nonEmpty)
                    out += Tok(TSymbol, "*") += Tok(TNumber, "1000")
                  out += sym(")")
                case f =>
                  out += id("extract") += sym("(") += id(f) += id("FROM")
                  out ++= valueToks
                  out += sym(")")
              }
              i = end
            }
          case _ if renames.contains(up) =>
            out += id(renames(up))
            i += 1
          case _ =>
            out += t
            i += 1
        }
      } else if (t.kind == TSymbol && t.text == "~") {
        // postgres-style regex-match operator — routed through the SAME
        // Rust-parity kernel as the REGEXP function (r17 review: the
        // old RLIKE lowering compiled Java-default classes — ASCII
        // \w/\s, no (?P< spelling — so the two spellings of one
        // reference operator gave different answers on the same data).
        // `<primary> ~ <primary>` rewrites to velo_regexp(lhs, rhs) by
        // popping the just-emitted primary operand and capturing the
        // next; both sides are PRIMARY operands (ident chains, calls,
        // literals, parenthesized groups) — patterns are in practice
        // string literals.
        val lhs = popPrimaryOperand(out)
        val (rhsRaw, after) = primaryOperandSpan(span, i + 1)
        if (lhs.isEmpty || rhsRaw.isEmpty)
          throw new ParseException("'~' needs expressions on both sides")
        out += id("velo_regexp") += sym("(")
        out ++= lhs
        out += sym(",")
        out ++= rewriteTokens(rhsRaw, defaultTimeCol)
        out += sym(")")
        i = after
      } else {
        out += t
        i += 1
      }
    }
    out.toVector
  }

  /** `ROWS WINDOW BUFFER n ROWS [PARTITION BY …] [ORDER BY …]
    * [ROWS|RANGE BETWEEN …] [EMIT …]` (the OVER-parens content) →
    * standard `OVER (PARTITION BY … ORDER BY … ROWS BETWEEN
    * min(n-1, frame) PRECEDING AND CURRENT ROW)`. The batch analog of
    * the reference's bounded row buffer is the trailing-n frame; the
    * continuous EMIT mode is the streaming runner's concern
    * (StreamOps.rowsBufferAgg). A missing ORDER BY (arrival order in the
    * reference) becomes ORDER BY the default time column. */
  /** Scan `toks` from `start` until a top-level identifier in `stops`
    * (paren depth tracked); returns (span, index after span). The ONE
    * scanner behind every OVER / ROWS-WINDOW clause splitter — three
    * hand-rolled copies of this loop had divergent stop sets to keep in
    * sync (r14 review). Stop-set DIFFERENCES between call sites are
    * semantic (EMIT/EXPIRE exist only inside ROWS WINDOW specs) and stay
    * at the call sites.
    */
  private def spanUntilKw(toks: Vector[Tok], start: Int,
                          stops: Set[String]): (Vector[Tok], Int) = {
    val out = ArrayBuffer[Tok]()
    var j = start
    var d = 0
    while (j < toks.length &&
           !(d == 0 && toks(j).kind == TIdent && stops.contains(toks(j).upper))) {
      if (toks(j).text == "(") d += 1
      if (toks(j).text == ")") d -= 1
      out += toks(j); j += 1
    }
    (out.toVector, j)
  }

  private def rewriteRowsWindow(inner: Vector[Tok], defaultTimeCol: String,
                                withFrame: Boolean = true): Vector[Tok] = {
    var i = 0
    def at(kw: String, o: Int = 0) = inner.lift(i + o).exists(_.isKw(kw))
    if (!(at("ROWS") && at("WINDOW", 1) && at("BUFFER", 2))) throw new ParseException("malformed ROWS WINDOW")
    i += 3
    val n = inner.lift(i).map(_.text).flatMap(_.toLongOption)
      .getOrElse(throw new ParseException("BUFFER expects a row count"))
    // n = 0 would render "ROWS BETWEEN -1 PRECEDING" — an analysis
    // error far from the query text; reject at parse time
    if (n < 1) throw new ParseException(s"BUFFER must be >= 1 ROWS, got $n")
    i += 1
    if (!at("ROWS")) throw new ParseException("expected ROWS after BUFFER n")
    i += 1
    def spanUntil(stops: Set[String]): Vector[Tok] = {
      val (s, nj) = spanUntilKw(inner, i, stops); i = nj; s
    }
    var partition = Vector.empty[Tok]
    var order = Vector.empty[Tok]
    var frame = Vector.empty[Tok]
    val stops = Set("PARTITION", "ORDER", "ROWS", "RANGE", "EMIT", "EXPIRE")
    while (i < inner.length) {
      if (at("PARTITION") && at("BY", 1)) { i += 2; partition = spanUntil(stops) }
      else if (at("ORDER") && at("BY", 1)) { i += 2; order = spanUntil(stops) }
      else if (at("ROWS") || at("RANGE")) { frame = spanUntil(Set("EMIT", "EXPIRE")) }
      else if (at("EMIT")) {
        // RowsEmitMode (ast.rs:567): CHANGES|FINAL, EVERY RECORD
        // (default per-record emission), ON BUFFER FULL / ON
        // BUFFER_FULL (batch-like). Emission cadence is the streaming
        // runner's concern; the batch trailing-frame rewrite is
        // identical for all of them.
        i += 1
        if (at("CHANGES") || at("FINAL")) i += 1
        else if (at("EVERY") && at("RECORD", 1)) i += 2
        else if (at("ON") && at("BUFFER_FULL", 1)) i += 2
        else if (at("ON") && at("BUFFER", 1) && at("FULL", 2)) i += 3
        else throw new ParseException("malformed EMIT mode in ROWS WINDOW")
      }
      else if (at("EXPIRE") && at("AFTER", 1)) {
        // RowExpirationMode (ast.rs:580): EXPIRE AFTER NEVER |
        // EXPIRE AFTER INTERVAL 'n' unit INACTIVITY. Buffer eviction
        // on inactivity gaps is stream-state housekeeping; the batch
        // rewrite sees the full partition, so it is a no-op here.
        i += 2
        if (at("NEVER")) i += 1
        else {
          if (at("INTERVAL")) i += 1
          if (i < inner.length && (inner(i).kind == TString || inner(i).kind == TNumber)) i += 1
          else throw new ParseException("expected interval literal in EXPIRE AFTER")
          if (i < inner.length && inner(i).kind == TIdent) i += 1 // unit
          if (at("INACTIVITY")) i += 1
          else throw new ParseException("expected INACTIVITY after EXPIRE AFTER interval")
        }
      }
      else throw new ParseException(s"unexpected token in ROWS WINDOW: ${inner(i).text}")
    }
    val out = ArrayBuffer[Tok]()
    def id(s: String) = Tok(TIdent, s)
    out += id("OVER") += Tok(TSymbol, "(")
    // PARTITION BY / ORDER BY spans are EXPRESSIONS — they must pass
    // through the dialect function rewrites like every other expression
    // position (raw emission left LEN un-renamed — silently
    // char-counting via Spark's native len — and dialect-only forms
    // like JSON_VALUE dying as undefined functions; r14 review, the
    // same bug class the r12 namedWindows fix addressed)
    if (partition.nonEmpty) {
      out += id("PARTITION") += id("BY")
      out ++= rewriteTokens(partition, defaultTimeCol)
    }
    out += id("ORDER") += id("BY")
    if (order.nonEmpty) out ++= rewriteTokens(order, defaultTimeCol)
    else out += id(defaultTimeCol)
    if (withFrame) {
      if (frame.nonEmpty) out ++= capFrameAtBuffer(frame, n)
      else {
        out += id("ROWS") += id("BETWEEN") += Tok(TNumber, (n - 1).toString) += id("PRECEDING")
        out += id("AND") += id("CURRENT") += id("ROW")
      }
    }
    out += Tok(TSymbol, ")")
    out.toVector
  }

  /** Cap an explicit ROWS frame's PRECEDING reach at the buffer size:
    * the reference's ring holds only `n` rows, so `100 PRECEDING` over
    * a BUFFER 10 ROWS window can see at most 9 back — passing the
    * frame through verbatim would silently aggregate rows the
    * reference's buffer never held. UNBOUNDED PRECEDING likewise pins
    * to n-1. RANGE frames are value-based and pass through (a row cap
    * is not expressible on them). */
  private def capFrameAtBuffer(frame: Vector[Tok], n: Long): Vector[Tok] =
    if (!frame.headOption.exists(_.isKw("ROWS"))) frame
    else {
      // the reference's ring is a TRAILING buffer — it never holds
      // future rows, so a FOLLOWING end bound would aggregate rows the
      // buffer never saw (the exact divergence this cap exists to
      // prevent); reject instead of passing it through
      if (frame.exists(_.isKw("FOLLOWING")))
        throw new ParseException(
          "a ROWS WINDOW BUFFER frame cannot reach FOLLOWING rows (the buffer is trailing)")
      frame.zipWithIndex.map { case (t, ix) =>
        if (frame.lift(ix + 1).exists(_.isKw("PRECEDING"))) {
          if (t.kind == TNumber) Tok(TNumber, math.min(t.text.toLong, n - 1).toString)
          else if (t.isKw("UNBOUNDED")) Tok(TNumber, (n - 1).toString)
          else t
        } else t
      }
    }

  // ==================== Spark SQL emission ====================

  /** Emit Spark SQL for a parsed SELECT. A time-window spec becomes a
    * native `window()` / `session_window()` GROUP BY item with
    * `window_start` / `window_end` epoch-second output columns —
    * Catalyst's own streaming-ready windowing, not a custom operator.
    *
    * `timeColOf`: each stream's registered event-time column by view
    * name (VeloContext.streamTimeCol) — the WITHIN band must reference
    * the WATERMARKED columns, not the context default, or the band
    * lands on the wrong column whenever the names diverge. */
  def toSparkSql(s: SelectStmt, defaultTimeCol: String = "ts",
                 timeColOf: String => Option[String] = _ => None): String = {
    val sb = new StringBuilder(if (s.distinct) "SELECT DISTINCT " else "SELECT ")
    // direct CAST (floorDiv on micros), not unix_timestamp(…): tumbling
    // boundaries are integral seconds either way, but SESSION boundaries
    // are raw event timestamps — a pre-1970 fractional session start
    // would surface one second apart under truncation (r11 oracle audit)
    val winCols: Seq[String] = s.window match {
      case Some(_: Session) => Seq(
        "CAST(session_window.start AS BIGINT) AS window_start",
        "CAST(session_window.end AS BIGINT) AS window_end")
      case Some(_) => Seq(
        "CAST(window.start AS BIGINT) AS window_start",
        "CAST(window.end AS BIGINT) AS window_end")
      case None => Nil
    }
    sb.append((s.fields.map(render) ++ winCols).mkString(", "))
    if (s.from.nonEmpty) {
      sb.append(" FROM ").append(s.from)
      s.fromAlias.foreach(a => sb.append(" AS ").append(a))
    }
    s.joins.foreach { j =>
      val band = j.withinSeconds.map { sec =>
        // time-proximity band on the two streams' REGISTERED event-time
        // columns (falling back to the context default). Rendered as
        // direct interval bounds, NOT abs(unix_timestamp(l) -
        // unix_timestamp(r)) <= N: Spark's StreamingJoinHelper can only
        // derive a state-eviction watermark from plain +/- interval
        // arithmetic on the watermarked columns — the abs()/
        // unix_timestamp() form kept BOTH sides' join state forever (a
        // continuous job grows state with total input and OOMs), and
        // unix_timestamp's second-truncation admitted pairs just
        // outside the band.
        val tc = defaultTimeCol.split('.').last
        val lq = s.fromAlias.getOrElse(s.from)
        val rq = j.alias.getOrElse(j.table)
        // an unaliased DERIVED table has no name the band can qualify:
        // the fallback would render "( SELECT … ).ts" — a Catalyst parse
        // error far from the dialect input. Require the alias with a
        // clear message instead (r14 review).
        if (lq.trim.startsWith("("))
          throw new ParseException(
            "WITHIN needs an alias on the derived left table: FROM (SELECT …) AS name")
        if (rq.trim.startsWith("("))
          throw new ParseException(
            "WITHIN needs an alias on the derived join table: JOIN (SELECT …) AS name")
        val ltc = timeColOf(s.from).getOrElse(tc)
        val rtc = timeColOf(j.table).getOrElse(tc)
        s"$rq.$rtc >= $lq.$ltc - INTERVAL $sec SECOND AND " +
          s"$rq.$rtc <= $lq.$ltc + INTERVAL $sec SECOND"
      }
      // a band with no ON clause (CROSS JOIN … WITHIN — the pure
      // time-proximity join) becomes the join's ON predicate; CROSS
      // takes no ON in Spark SQL, so it renders as the equivalent
      // INNER JOIN ON band ('AND' with no 'ON' would be invalid SQL)
      val jt = if (j.on.isEmpty && band.isDefined && j.joinType == "CROSS") "INNER" else j.joinType
      sb.append(' ').append(jt).append(" JOIN ").append(j.table)
      j.alias.foreach(a => sb.append(" AS ").append(a))
      (j.on.nonEmpty, band) match {
        // the ON clause is PARENTHESIZED before ANDing the band: AND
        // binds tighter than OR, so `ON a = b OR c = d WITHIN 5m`
        // rendered bare would let the OR's left disjunct escape the
        // time constraint entirely
        case (true, Some(b)) =>
          sb.append(" ON (").append(render(j.on)).append(") AND (").append(b).append(')')
        case (true, None) => sb.append(" ON ").append(render(j.on))
        case (false, Some(b)) => sb.append(" ON ").append(b)
        case (false, None) => ()
      }
    }
    s.where.foreach(w => sb.append(" WHERE ").append(render(w)))
    val winGroup: Option[String] = s.window.map { w =>
      val ts = w.timeCol.getOrElse(defaultTimeCol)
      val fn = w match {
        case Tumbling(sz, _, _) => s"window($ts, '$sz seconds')"
        case Sliding(sz, adv, _, _) => s"window($ts, '$sz seconds', '$adv seconds')"
        case Session(gap, _, _) => s"session_window($ts, '$gap seconds')"
      }
      // trailing partition-key window args become grouping keys ahead
      // of the window item (a duplicate with an explicit GROUP BY key
      // is harmless — SQL tolerates repeated grouping expressions)
      (w.partitionCols :+ fn).mkString(", ")
    }
    (s.groupBy, winGroup) match {
      case (Some(g), Some(w)) => sb.append(" GROUP BY ").append(render(g)).append(", ").append(w)
      case (Some(g), None) => sb.append(" GROUP BY ").append(render(g))
      case (None, Some(w)) => sb.append(" GROUP BY ").append(w)
      case (None, None) =>
    }
    s.having.foreach(h => sb.append(" HAVING ").append(render(h)))
    s.namedWindows.foreach(w => sb.append(" WINDOW ").append(render(w)))
    s.orderBy.foreach(o => sb.append(" ORDER BY ").append(render(o)))
    s.limit.foreach(l => sb.append(" LIMIT ").append(l))
    sb.toString
  }
}
