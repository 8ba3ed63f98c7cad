package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing: pre-partition fact tables on their join key
  * so repeated fact-fact joins and aggregations run WITHOUT a shuffle —
  * the 100 TB answer to "this join shuffles every run". The reference
  * engine keeps materialized tables hash-indexed by key
  * (CTAS + table_model config); Spark's durable analog is a bucketed
  * table: hash(key) → fixed bucket files, so a join of two tables
  * bucketed on the same key by the same count is map-side.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted managed table (replacing
    * any previous incarnation, including an orphaned location). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // Clear an orphaned managed location (crashed previous writer):
    // resolve the path the way the CATALOG will — defaultTablePath
    // handles db-qualified names, identifier case folding, and any
    // filesystem scheme (hdfs/s3a/file), where a java.io.File against
    // the warehouse dir would silently no-op on everything non-local
    // and saveAsTable would then fail on "location already exists".
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val ident = classic.sessionState.sqlParser.parseTableIdentifier(table)
    val loc = new org.apache.hadoop.fs.Path(
      classic.sessionState.catalog.defaultTablePath(ident))
    val fs = loc.getFileSystem(classic.sessionState.newHadoopConf())
    // the delete RESULT matters: proceeding after a failed delete ends
    // in saveAsTable's opaque "location already exists" — fail fast
    // naming the path and the failed cleanup instead
    if (fs.exists(loc))
      require(fs.delete(loc, true),
        s"could not clear orphaned managed-table location $loc before overwrite")
    df.write
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two tables bucketed on the same key: no Exchange on either
    * side when bucket counts match (verify with
    * `df.queryExecution.executedPlan`). */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String, joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
