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
    val warehouse = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:"), table)
    if (warehouse.exists()) {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(warehouse)
    }
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
