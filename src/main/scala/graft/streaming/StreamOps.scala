package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

/** Structured-Streaming realization of the reference's streaming jobs:
  * continuous queries over an unbounded source with watermarks, time
  * windows, and EMIT semantics
  * (reference: src/velostream/sql/execution/{engine.rs,watermarks.rs};
  * EMIT CHANGES|FINAL in docs/sql/PARSER_GRAMMAR.md).
  *
  * Mapping:
  *  - EMIT CHANGES → `outputMode(Update)` — every trigger emits changed
  *    aggregates (the reference's per-record continuous emission,
  *    batched by trigger).
  *  - EMIT FINAL → `outputMode(Append)` + watermark — a window emits
  *    once, when the watermark passes window end (reference's
  *    window-close emission with grace period).
  *  - Kafka topic → any streaming source; tests drive files/memory.
  *    On a cluster: `readStream.format("kafka")` with the same plan.
  */
object StreamOps {

  /** Tumbling-window aggregation with watermark; append mode = EMIT FINAL. */
  def tumblingAgg(events: DataFrame, tsCol: String, size: String, grace: String,
                  keys: Seq[String], aggExprs: Seq[(String, String)]): DataFrame = {
    val aggs = aggExprs.map { case (e, alias) => expr(e).as(alias) }
    events
      .withWatermark(tsCol, grace)
      .groupBy(window(col(tsCol), size) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start", col("window.start"))
      .withColumn("window_end", col("window.end"))
      .drop("window")
  }

  /** Session-window aggregation (state-store backed merging sessions). */
  def sessionAgg(events: DataFrame, tsCol: String, gap: String, grace: String,
                 keys: Seq[String], aggExprs: Seq[(String, String)]): DataFrame = {
    val aggs = aggExprs.map { case (e, alias) => expr(e).as(alias) }
    events
      .withWatermark(tsCol, grace)
      .groupBy(session_window(col(tsCol), gap) +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("session_start", col("session_window.start"))
      .withColumn("session_end", col("session_window.end"))
      .drop("session_window")
  }

  /** Run a streaming DataFrame to a named in-memory sink until all
    * currently-available input is processed (test/verify harness; the
    * production path writes to Kafka/parquet with the same plan).
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery = {
    df.sparkSession.catalog.dropTempView(name)
    val q = df.writeStream
      .outputMode(mode)
      .format("memory")
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q
  }
}
