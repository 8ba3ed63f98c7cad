package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Serialization + source/sink surface of the reference
  * (src/velostream/serialization/, src/velostream/kafka/; `file://`
  * URIs in WITH configs): payloads arrive as bytes/strings on a
  * transport (Kafka value, file line) and are decoded to columns —
  * re-expressed with Spark's native, codegen'd serde expressions.
  *
  *  - JSON    → `from_json` / `to_json` (schema_of_json for inference)
  *  - CSV     → `from_csv` / `to_csv`
  *  - Avro/Protobuf: the connector jars (`spark-avro`, `spark-protobuf`)
  *    are not in this environment; the call sites are the same shape
  *    (`from_avro(col, schema)`) and slot into `decode` when present.
  *
  * The Kafka record shape (key/value/headers/partition/offset) is the
  * canonical envelope; `fromKafkaEnvelope` turns a raw envelope frame
  * into typed columns + system columns, matching
  * docs/sql/system-columns.md.
  */
object Serde {

  /** Decode a JSON-string payload column into a struct and splat it. */
  def decodeJson(df: DataFrame, payloadCol: String, schema: StructType): DataFrame =
    df.withColumn("_decoded", from_json(col(payloadCol), schema))
      .select(col("*"), col("_decoded.*")).drop("_decoded", payloadCol)

  /** Encode selected columns into one JSON-string payload column. */
  def encodeJson(df: DataFrame, cols: Seq[String], payloadCol: String = "value"): DataFrame =
    df.withColumn(payloadCol, to_json(struct(cols.map(col): _*)))

  def decodeCsv(df: DataFrame, payloadCol: String, schema: StructType,
                options: Map[String, String] = Map.empty): DataFrame =
    df.withColumn("_decoded", from_csv(col(payloadCol), schema, options))
      .select(col("*"), col("_decoded.*")).drop("_decoded", payloadCol)

  def encodeCsv(df: DataFrame, cols: Seq[String], payloadCol: String = "value"): DataFrame =
    df.withColumn(payloadCol, to_csv(struct(cols.map(col): _*)))

  /** Typed view of a Kafka-envelope frame (the columns Spark's kafka
    * source emits): value decoded by `schema`, headers as a
    * map<string,string>, system columns surfaced with the reference's
    * names (_timestamp/_offset/_partition, docs/sql/system-columns.md). */
  def fromKafkaEnvelope(frames: DataFrame, schema: StructType): DataFrame =
    frames
      .withColumn("_decoded", from_json(col("value").cast("string"), schema))
      .withColumn("_headers",
        map_from_entries(transform(col("headers"),
          h => struct(h.getField("key"), h.getField("value").cast("string")))))
      .withColumn("_timestamp", col("timestamp"))
      .withColumn("_offset", col("offset"))
      .withColumn("_partition", col("partition"))
      .select(col("_decoded.*"), col("_headers"), col("_timestamp"), col("_offset"), col("_partition"))

  /** Kafka topic → typed streaming DataFrame: the reference's
    * `FROM kafka://topic` (src/velostream/kafka/). Composes Spark's
    * kafka source with the envelope decoder; same plan shape the test
    * suite drives through MemoryStream + `fromKafkaEnvelope` (no broker
    * in this environment — the source format string is the only
    * untestable piece). */
  def kafkaStream(spark: SparkSession, brokers: String, topic: String,
                  schema: StructType, startingOffsets: String = "latest"): DataFrame =
    fromKafkaEnvelope(
      spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", startingOffsets)
        .option("includeHeaders", "true")
        .load(),
      schema)

  /** `file://` source analog: read newline-delimited JSON / CSV /
    * parquet by extension, one call for batch or streaming. */
  def readFileUri(spark: SparkSession, uri: String, schema: Option[StructType] = None,
                  streaming: Boolean = false): DataFrame = {
    val path = uri.stripPrefix("file://")
    val fmt =
      if (path.endsWith(".json") || path.endsWith(".jsonl")) "json"
      else if (path.endsWith(".csv")) "csv"
      else "parquet"
    if (streaming) {
      val sch = schema.getOrElse(spark.read.format(fmt).load(path).schema)
      spark.readStream.format(fmt).schema(sch).load(path)
    } else {
      val r = spark.read.format(fmt)
      schema.foreach(r.schema)
      (if (fmt == "csv") r.option("header", "true") else r).load(path)
    }
  }

  /** `file://` sink analog (executor-parallel write, no driver data). */
  def writeFileUri(df: DataFrame, uri: String): Unit = {
    val path = uri.stripPrefix("file://")
    val fmt =
      if (path.endsWith(".json") || path.endsWith(".jsonl")) "json"
      else if (path.endsWith(".csv")) "csv"
      else "parquet"
    val w = df.write.mode("overwrite")
    (if (fmt == "csv") w.option("header", "true") else w).format(fmt).save(path)
  }
}
