package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns plus typed metadata, processed batch-at-a-time per partition.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `decodeStub` produces deterministic fake features from
  * the bytes. Everything around it — schema, batching, partition
  * sizing, null handling — is the real 100 TB-shape pipeline:
  * narrow mapPartitions (no shuffle), output schema declared up front,
  * rows processed streaming-wise (never materializing a partition).
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(DoubleType), nullable = true)))

  /** Deterministic fake "decode + feature extract": dim doubles derived
    * from byte statistics (double accumulation keeps the formula exactly
    * replayable by the DuckDB oracle). Replace with a real codec
    * (JNI/lib) in production — the signature is the contract.
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    if (payload != null && payload.nonEmpty) {
      var i = 0
      while (i < payload.length) { out(i % dim) += (payload(i) & 0xFF) / 255.0d; i += 1 }
    }
    out
  }

  /** Synthesize a media table from the documents table (payload = utf8
    * bytes of text): stands in for reading real image blobs; the plan
    * shape (projection → binary column → partition-parallel decode) is
    * identical.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"),
      (col("n_chars") % 1024).cast("int").as("width"),
      (col("n_chars") % 768).cast("int").as("height"))

  /** The decode/feature-extract stage: batch-per-partition map, no
    * shuffle, output schema = `featureSchema`. At 100 TB: size input
    * partitions via files.maxPartitionBytes so payload batches fit in
    * executor memory; decode cost dominates → scale executors linearly.
    */
  def extractFeatures(media: DataFrame, dim: Int = 8): DataFrame = {
    val enc = ExpressionEncoder(featureSchema)
    media.select(col("media_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val n = if (payload == null) 0 else payload.length
          Row(r.getLong(0), r.getString(1), n,
            decodeStub(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Resize stage analog: deterministic payload downsampling (every
    * `factor`-th byte) with the width/height metadata updated to match —
    * the shape of an image-resize pass (decode → scale → re-encode). The
    * real codec slots into the same per-partition map; the plumbing
    * (narrow map, binary in/out, metadata contract) is what the engine
    * owns. */
  def resize(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, "factor must be >= 1")
    val enc = ExpressionEncoder(mediaSchema)
    media.select(col("media_id"), col("media_type"), col("payload"), col("width"), col("height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val small: Array[Byte] =
            if (payload == null) null
            else {
              val out = new Array[Byte]((payload.length + factor - 1) / factor)
              var i = 0
              while (i < out.length) { out(i) = payload(i * factor); i += 1 }
              out
            }
          def scaled(field: String): Integer = {
            val v = r.getAs[Integer](field)
            if (v == null) null else Integer.valueOf(math.max(1, v / factor))
          }
          Row(r.getLong(0), r.getString(1), small, scaled("width"), scaled("height"))
        }
      }(enc)
  }

  /** Deterministic frame-sampling analog: pick every `stride`-th chunk
    * of the payload (a video's frames / an audio's windows), emitting
    * one row per sampled chunk — the explode-shaped stage of a real
    * multimodal pipeline.
    */
  def sampleChunks(media: DataFrame, chunkBytes: Int = 64, stride: Int = 4): DataFrame = {
    media
      .withColumn("n_chunks", (length(col("payload")) / chunkBytes).cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), greatest(col("n_chunks") - 1, lit(0)), lit(stride))))
      .withColumn("chunk", expr(s"substring(payload, chunk_idx * $chunkBytes + 1, $chunkBytes)"))
      .select(col("media_id"), col("media_type"), col("chunk_idx"), col("chunk"))
  }
}
