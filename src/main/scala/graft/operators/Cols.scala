package graft.operators

import org.apache.spark.sql.DataFrame

/** Column-name matching under the SESSION'S resolution rule — the one
  * helper behind every reserved/working-column guard.
  *
  * `withColumn` and `drop` resolve names case-insensitively unless
  * `spark.sql.caseSensitive` is true, so a guard written with the
  * case-sensitive `columns.contains` lets a differently-cased name
  * (`Window_End`, `__GRAFT_SESSION_ID`) slip past and be silently
  * REPLACED by the operator's own column — the exact corruption the
  * guards exist to prevent. Matching must follow the same resolver the
  * replacement will use.
  */
private[graft] object Cols {

  private def caseSensitive(df: DataFrame): Boolean =
    df.sparkSession.conf.get("spark.sql.caseSensitive", "false").toBoolean

  /** Would two NAMES collide under the session's resolution rule?
    * For guards comparing a caller-supplied name against a reserved
    * literal (no DataFrame column to resolve yet). */
  def sameName(df: DataFrame, a: String, b: String): Boolean =
    if (caseSensitive(df)) a == b else a.equalsIgnoreCase(b)

  /** Does `df` carry a column that `withColumn(name, …)`/`drop(name)`
    * would resolve? */
  def has(df: DataFrame, name: String): Boolean =
    if (caseSensitive(df)) df.columns.contains(name)
    else df.columns.exists(_.equalsIgnoreCase(name))

  /** How many of `df`'s columns resolve to `name` — >1 after an
    * aggregation means a key/aggregate alias collided with an
    * operator-generated column. */
  def countMatching(df: DataFrame, name: String): Int =
    if (caseSensitive(df)) df.columns.count(_ == name)
    else df.columns.count(_.equalsIgnoreCase(name))

  /** The schema field `name` resolves to under the session's rule — the
    * resolver-aware twin of `df.schema(name)`, whose exact
    * always-case-sensitive lookup throws for names col() resolves fine
    * (r14 review). First match wins on case-variant duplicates (type
    * checks only need A resolved field; the operator's own col()
    * reference surfaces genuine ambiguity). */
  def fieldOf(df: DataFrame, name: String): org.apache.spark.sql.types.StructField =
    df.schema.fields.find(f => sameName(df, f.name, name)).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not found in [${df.columns.mkString(", ")}]"))

  /** Reject inputs that carry an operator's reserved working columns —
    * the ONE copy of the guard loop asOf/saltedJoin/streamTableDegraded
    * each hand-rolled with drifting wording (r15 review). Resolver-aware
    * via `has`, like every check in this object. */
  def requireAbsent(op: String, sides: Seq[(String, DataFrame)],
                    names: Seq[String]): Unit =
    for ((side, d) <- sides; c <- names)
      require(!has(d, c),
        s"$op: $side side must not carry the reserved working column $c")

  /** Can xxhash64/hash digest this type? The ONE copy of the rule
    * (r17 review: Joins.asOf and SqlApp.sampleHashCols kept verbatim
    * twins — a future fix to what the hash supports must not land in
    * one and miss the other). Maps are unhashable (hash over MapType
    * is rejected at analysis); structs/arrays recurse. */
  def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    dt match {
      case _: MapType => false
      case s: StructType => s.fields.forall(f => hashable(f.dataType))
      case a: ArrayType => hashable(a.elementType)
      case _ => true
    }
  }

  /** Is this a machine-integral id type (safe for pmod salting and the
    * decimal(38,0)-negation tie-break without rounding or overflow)?
    * The ONE copy of the rule, like `hashable` (r17 review:
    * Dedup.exactKeepBest and Sampling.packIntoShards kept verbatim
    * four-type twins — a future widening, e.g. scale-0 decimals for
    * shard salting, must not land in one and miss the other). */
  def isIntegralId(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }
}
