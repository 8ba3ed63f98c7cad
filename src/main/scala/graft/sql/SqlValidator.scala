package graft.sql

import scala.util.control.NonFatal

import VeloSqlParser._

/** Pre-deployment SQL validation — the reference's StreamJobServer
  * validation surface (src/velostream/sql/validator.rs
  * `validate_sql_content`, validation/result_types.rs) re-expressed on
  * Catalyst: each statement is parsed by the dialect parser, then its
  * query core is run through Spark's ANALYZER ONLY (building the
  * DataFrame resolves relations, columns, and types without executing
  * anything) — so unresolved tables, misspelled columns, and type
  * errors surface before a job is deployed, with zero data touched.
  */
object SqlValidator {

  final case class QueryValidation(index: Int, statement: String, isValid: Boolean,
                                   errors: Vector[String] = Vector.empty,
                                   warnings: Vector[String] = Vector.empty)

  final case class AppValidation(applicationName: Option[String], totalQueries: Int,
                                 validQueries: Int, queries: Vector[QueryValidation],
                                 missingConfigurations: Vector[String], isValid: Boolean)

  /** Analyze (not execute) one dialect statement against the context's
    * catalog. DDL/DML bodies are validated through their inner SELECT;
    * lifecycle statements validate their job body and registry refs. */
  def validateStatement(ctx: VeloContext, sqlText: String, index: Int = 0): QueryValidation =
    try validateParsed(ctx, ctx.parseStatement(sqlText), sqlText, index)
    catch {
      // NonFatal, not just ParseException: malformed numerics and empty
      // arg lists surface as NumberFormat/IllegalArgument/NoSuchElement
      // from deep in the parser — one bad statement must yield one
      // invalid entry, never crash the whole app's validation report
      case NonFatal(e) =>
        QueryValidation(index, sqlText.trim.take(120), isValid = false,
          Vector(s"parse error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName)}"))
    }

  /** Validate an already-parsed statement (the hook JobManager uses to
    * reject a deployment before launching it). */
  def validateParsed(ctx: VeloContext, parsed: VeloStatement,
                     sqlText: String = "", index: Int = 0): QueryValidation = {
    var errors = Vector.empty[String]
    var warnings = Vector.empty[String]

    def analyze(text: String): Unit =
      // building the DataFrame runs parser+analyzer eagerly; no action
      ctx.spark.sql(text).queryExecution.analyzed

    def checkTable(name: String): Unit =
      if (!ctx.spark.catalog.tableExists(name))
        errors :+= s"unknown table or stream: $name"

    def validateBody(stmt: VeloStatement): Unit = stmt match {
      case Select(s) =>
        analyze(toSparkSql(s, ctx.defaultTimeCol))
        s.into.foreach { sink =>
          if (!ctx.declaredSources.contains(sink))
            warnings :+= s"INTO sink '$sink' has no CREATE SINK declaration"
        }
      // render the WHOLE union: branch-by-branch validation misses
      // column-count/type mismatches BETWEEN branches
      case u: Union => analyze(ctx.renderSql(u))
      case w: WithCtes =>
        // render the whole CTE chain — the analyzer resolves CTE refs
        analyze(ctx.renderSql(w))
      case CreateTableAs(_, s, _, cols) =>
        validateBody(Select(s)); checkDeclaredArity(s, cols)
      case CreateStreamAs(_, s, _, cols) =>
        validateBody(Select(s)); checkDeclaredArity(s, cols)
      case InsertInto(table, _, sel, _) =>
        checkTable(table)
        sel.foreach(s => validateBody(Select(s)))
      case Update(table, _, _) => checkTable(table)
      case Delete(table, _) => checkTable(table)
      case CreateSourceDecl(_, _, props, _) =>
        if (props.isEmpty) warnings :+= "source/sink declaration has no properties"
      case StartJob(_, body, _) => validateBody(body)
      case DeployJob(_, _, body, _, strategy) =>
        strategy match {
          case Canary(p) if p < 1 || p > 100 =>
            errors :+= s"CANARY percentage $p outside [1,100]"
          case _ =>
        }
        validateBody(body)
      case StopJob(name, _) => warnIfUnknownJob(name)
      case PauseJob(name) => warnIfUnknownJob(name)
      case ResumeJob(name) => warnIfUnknownJob(name)
      case RollbackJob(name, _) => warnIfUnknownJob(name)
      case Show(_, _) | Describe(_) => ()
    }

    // a declared column list binds positionally — an arity mismatch is a
    // guaranteed execution failure the pre-deploy gate must catch. The
    // rule is the executor's own (VeloContext.declaredArityError): a
    // WINDOW spec's synthetic window_start/window_end tail is
    // pass-through, so a list covering only the select items is valid.
    def checkDeclaredArity(s: VeloSqlParser.SelectStmt, cols: Vector[(String, String)]): Unit =
      if (cols.nonEmpty) {
        val out = ctx.spark.sql(toSparkSql(s, ctx.defaultTimeCol))
          .queryExecution.analyzed.output.map(_.name)
        VeloContext.declaredArityError(out, cols.length).foreach(e => errors :+= e)
      }

    def warnIfUnknownJob(name: String): Unit =
      if (!ctx.jobManager.hasJob(name))
        warnings :+= s"job '$name' is not currently registered"

    try validateBody(parsed)
    catch {
      case e: ParseException => errors :+= s"parse error: ${e.getMessage}"
      case NonFatal(e) =>
        errors :+= s"analysis error: ${Option(e.getMessage).getOrElse(e.getClass.getSimpleName).linesIterator.take(2).mkString(" ").take(300)}"
    }
    QueryValidation(index, sqlText.trim.take(120), errors.isEmpty, errors, warnings)
  }

  /** Validate a whole application text (the StreamJobServer's
    * pre-deploy gate): every statement analyzed, INTO sinks checked
    * against declarations, application name extracted from the header. */
  def validateContent(ctx: VeloContext, content: String): AppValidation = {
    val appName = content.linesIterator.map(_.trim)
      .collectFirst { case l if l.startsWith("-- SQL Application:") =>
        l.substring("-- SQL Application:".length).trim }
    val statements = VeloContext.splitStatements(content)
    val results = statements.zipWithIndex.map { case (s, i) => validateStatement(ctx, s, i) }
    val missing = results.flatMap(_.warnings).filter(_.contains("no CREATE SINK")).toVector
    AppValidation(appName, statements.length, results.count(_.isValid),
      results.toVector, missing, results.forall(_.isValid))
  }
}
