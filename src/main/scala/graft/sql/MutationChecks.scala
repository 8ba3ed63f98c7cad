package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import VeloSqlParser._

/** INSERT/UPDATE/DELETE semantics — ONE implementation shared by the
  * executor (VeloSql.execStatement) and the pre-deployment gate
  * (SqlValidator), so validator/executor drift is structurally
  * impossible (r13 post-seal finding: the two had already drifted —
  * the executor special-cased the `stdout` debug sink while the
  * validator rejected it, and UPDATE/DELETE validation checked only
  * table existence while the executor enforced SET-column membership,
  * duplicate targets, and WHERE resolution).
  *
  * The executor materializes the frames these helpers build; the
  * validator merely ANALYZES them (`queryExecution.analyzed`) — same
  * checks, same error messages, zero data touched at validation time.
  * Reference behavior: the StreamJobServer validates pre-deployment
  * against the same semantics it executes (sql/validator.rs).
  */
object MutationChecks {

  /** Parser identifiers keep their backtick quoting (the tokenizer
    * emits quoted identifiers in Spark backtick form so expression
    * spans render verbatim) — but HERE names bind against bare schema
    * field names, so the quoting must come off or `INSERT INTO t
    * (`amount`) …` / `UPDATE t SET `amount` = …` falsely reject a
    * column that exists (r14 review; SqlApp.ctasOf strips for the same
    * reason). Interior doubled backticks unescape. */
  private[sql] def bare(name: String): String =
    if (name.length >= 2 && name.startsWith("`") && name.endsWith("`"))
      name.substring(1, name.length - 1).replace("``", "`")
    else name

  /** The reference's stdout debug sink (datasource/stdout_writer.rs:10;
    * the server also falls back to it when a job declares no sink,
    * server/processors/common.rs:1748): `stdout` addresses the
    * pseudo-table unless a REAL table of that name exists — never
    * shadow user data with a debug sink. */
  def isStdoutSink(spark: SparkSession, table: String): Boolean =
    table.equalsIgnoreCase("stdout") && !spark.catalog.tableExists(table)

  /** Build INSERT's incoming relation: a SELECT body (rendered by the
    * caller's dialect renderer — it owns the time-column defaults) or a
    * VALUES list lowered to the same `SELECT * FROM VALUES …` text the
    * executor runs, so row-arity mismatches and unresolvable VALUES
    * expressions surface identically in both paths. */
  def incomingFrame(spark: SparkSession, selOpt: Option[SelectStmt],
                    values: Vector[Vector[Vector[Tok]]], cols: Vector[String],
                    toSql: SelectStmt => String): DataFrame = selOpt match {
    case Some(s) => spark.sql(toSql(s))
    case None =>
      val rowsSql = values.map(r => r.map(render).mkString("(", ", ", ")")).mkString(", ")
      val colList = if (cols.nonEmpty) cols.mkString("(", ", ", ")") else ""
      spark.sql(s"SELECT * FROM VALUES $rowsSql AS t$colList")
  }

  /** Align `incoming` to the table's schema under INSERT semantics.
    *
    * An explicit column list BINDS the incoming columns by the listed
    * names — `INSERT INTO t (b, a) VALUES (1, 2)` must write b=1, a=2;
    * a blind positional rename to the table's order would silently swap
    * values into the wrong columns. Names bind case-INSENSITIVELY (as
    * Spark's own resolution does) and unknown or duplicate names REJECT
    * — a typo'd column would otherwise silently null-fill and drop the
    * inserted value. Unlisted table columns null-fill, per SQL.
    *
    * No column list binds positionally at EXACT width. Both paths cast
    * through the table's declared types: without the cast, unionByName's
    * set-operation widening (INT + BIGINT literal → BIGINT) would
    * silently rewrite the rebuilt view's column types. */
  def alignInsert(table: String, existing: DataFrame, cols: Vector[String],
                  incoming: DataFrame): DataFrame =
    if (cols.nonEmpty) {
      if (cols.length != incoming.columns.length)
        throw new ParseException(
          s"INSERT column list has ${cols.length} names but the source produces ${incoming.columns.length}")
      val byLower = existing.schema.fields.map(f => f.name.toLowerCase -> f.name).toMap
      val unknown = cols.filterNot(c => byLower.contains(bare(c).toLowerCase))
      if (unknown.nonEmpty)
        throw new ParseException(
          s"INSERT column(s) not in $table: ${unknown.mkString(", ")}")
      val canonical = cols.map(c => byLower(bare(c).toLowerCase))
      if (canonical.distinct.length != canonical.length)
        throw new ParseException(
          s"INSERT column list names a column twice: ${cols.mkString(", ")}")
      val named = incoming.toDF(canonical.toIndexedSeq: _*)
      named.select(existing.schema.fields.toIndexedSeq.map { f =>
        if (canonical.contains(f.name)) named(f.name).cast(f.dataType).as(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }: _*)
    } else {
      if (incoming.columns.length != existing.columns.length)
        throw new ParseException(
          s"INSERT source produces ${incoming.columns.length} columns but $table has ${existing.columns.length}")
      val named = incoming.toDF(existing.columns.toIndexedSeq: _*)
      named.select(existing.schema.fields.toIndexedSeq.map(f =>
        named(f.name).cast(f.dataType).as(f.name)): _*)
    }

  /** UPDATE's projection over the registered relation (the reference
    * mutates its materialized Table the same way: processors/update.rs).
    * All SET right-hand sides evaluate against the OLD row (standard
    * UPDATE semantics) → one projection, not a sequential fold. Targets
    * bind case-INSENSITIVELY; unknown targets REJECT (a case mismatch or
    * typo would otherwise make the whole assignment silently vanish —
    * statement succeeds, zero rows changed); duplicate targets REJECT
    * like INSERT's column list does (toMap's silent last-wins would make
    * `SET x = 1, x = 2` — a typo for `x = 1, y = 2` — succeed having
    * half-applied the statement). Each assignment casts back to the
    * column's DECLARED type: when/otherwise coercion (INT column,
    * `x / 2` → DOUBLE) would otherwise silently change the rebuilt
    * view's schema for ALL rows. */
  def updateFrame(table: String, existing: DataFrame,
                  sets: Vector[(String, Vector[Tok])],
                  where: Option[Vector[Tok]]): DataFrame = {
    val cond = where.map(w => expr(render(w))).getOrElse(lit(true))
    val known = existing.columns.map(_.toLowerCase).toSet
    val unknownSet = sets.map(_._1).filterNot(k => known.contains(bare(k).toLowerCase))
    if (unknownSet.nonEmpty)
      throw new ParseException(
        s"UPDATE SET column(s) not in $table: ${unknownSet.mkString(", ")}")
    val loweredTargets = sets.map(s => bare(s._1).toLowerCase)
    if (loweredTargets.distinct.length != loweredTargets.length)
      throw new ParseException(
        s"UPDATE SET names a column twice: ${sets.map(_._1).mkString(", ")}")
    val setMap = sets.map { case (k, e) => bare(k).toLowerCase -> e }.toMap
    // the WHERE predicate is materialized ONCE (deleteFrame's rule): a
    // non-deterministic predicate evaluated independently per SET
    // column could judge a row "update" for x and "keep" for y —
    // tearing a multi-column assignment (r14 review). when(null-pred)
    // falls to otherwise, same as the direct form.
    val pcol = "__graft_update_pred"
    require(!existing.columns.exists(_.equalsIgnoreCase(pcol)),
      s"UPDATE target must not carry the reserved working column $pcol")
    existing.withColumn(pcol, cond).select(existing.schema.fields.toIndexedSeq.map { f =>
      setMap.get(f.name.toLowerCase) match {
        case Some(e) => when(col(pcol), expr(render(e))).otherwise(col(f.name))
          .cast(f.dataType).as(f.name)
        case None => col(f.name)
      }
    }: _*)
  }

  /** DELETE's remaining-rows frame (processors/delete.rs analog). The
    * predicate is computed ONCE per row in a projection and the filter
    * references the resulting attribute: `!p || p.isNull` with two
    * independent expression trees would evaluate a non-deterministic
    * predicate twice, and a row could be judged "delete" by one copy
    * yet kept by the other. No WHERE deletes every row. */
  def deleteFrame(existing: DataFrame, where: Option[Vector[Tok]]): DataFrame = {
    val pcol = "__graft_delete_pred"
    // withColumn REPLACES a same-named user column and the trailing
    // drop would delete the user's data silently (the sibling
    // operators' reserved-working-column rule; r14 review)
    require(!existing.columns.exists(_.equalsIgnoreCase(pcol)),
      s"DELETE target must not carry the reserved working column $pcol")
    where.map { w =>
      existing.withColumn(pcol, expr(render(w)))
        .where(!col(pcol) || col(pcol).isNull).drop(pcol)
    }.getOrElse(existing.limit(0))
  }
}
