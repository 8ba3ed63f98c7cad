package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Serialization round-trips and the file-URI source/sink analogs. */
class SerdeSpec extends AnyFunSuite with SparkTestSession {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("JSON round-trip: encode → decode preserves rows") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    val encoded = Serde.encodeJson(df, Seq("id", "name", "score")).select("value")
    val decoded = Serde.decodeJson(encoded, "value", schema)
    assert(decoded.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
      == Seq((1L, "a", 0.5), (2L, "b", 1.5)))
  }

  test("CSV round-trip: encode → decode preserves rows") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    val encoded = Serde.encodeCsv(df, Seq("id", "name", "score")).select("value")
    val decoded = Serde.decodeCsv(encoded, "value", schema)
    assert(decoded.count() == 2)
  }

  test("kafka envelope → typed columns + reference system columns") {
    import spark.implicits._
    val frames = Seq(
      ("""{"id":7,"name":"x","score":2.0}""", 0, 42L, 1700000000000L, Seq(("src", "unit")))
    ).toDF("v", "partition", "offset", "tsms", "hdrs")
      .select(
        col("v").cast("binary").as("value"),
        col("partition"), col("offset"),
        timestamp_millis(col("tsms")).as("timestamp"),
        transform(col("hdrs"), h =>
          struct(h.getField("_1").as("key"), h.getField("_2").cast("binary").as("value"))).as("headers"))
    val typed = Serde.fromKafkaEnvelope(frames, schema)
    val r = typed.collect().head
    assert(r.getAs[Long]("id") == 7L)
    assert(r.getAs[Map[String, String]]("_headers") == Map("src" -> "unit"))
    assert(r.getAs[Long]("_offset") == 42L && r.getAs[Int]("_partition") == 0)
  }

  test("file:// source/sink analogs round-trip json and csv") {
    import spark.implicits._
    val df = Seq((1L, "a", 0.5), (2L, "b", 1.5)).toDF("id", "name", "score")
    val dir = java.nio.file.Files.createTempDirectory("serde").toString
    Serde.writeFileUri(df, s"file://$dir/out.jsonl")
    val back = Serde.readFileUri(spark, s"file://$dir/out.jsonl")
    assert(back.count() == 2)
    Serde.writeFileUri(df, s"file://$dir/out.csv")
    val csv = Serde.readFileUri(spark, s"file://$dir/out.csv", Some(schema))
    assert(csv.agg(sum("id")).collect().head.getLong(0) == 3L)
  }
}
