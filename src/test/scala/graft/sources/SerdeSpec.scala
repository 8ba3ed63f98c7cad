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
    // VALUES, not just the row count: a decoder null-padding every field
    // (wrong delimiter, swapped columns) still returns 2 rows
    val rows = decoded.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("score")))
    assert(rows.toSeq == Seq((1L, "a", 0.5), (2L, "b", 1.5)))
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

  test("duplicate Kafka header keys resolve last-wins instead of DUPLICATE_MAP_KEY") {
    import spark.implicits._
    val frames = Seq(
      ("""{"id":7,"name":"x","score":2.0}""", 0, 1L, 1700000000000L,
        Seq(("trace", "t1"), ("src", "unit"), ("trace", "t2"))) // repeated key: legal in Kafka
    ).toDF("v", "partition", "offset", "tsms", "hdrs")
      .select(
        col("v").cast("binary").as("value"),
        col("partition"), col("offset"),
        timestamp_millis(col("tsms")).as("timestamp"),
        transform(col("hdrs"), h =>
          struct(h.getField("_1").as("key"), h.getField("_2").cast("binary").as("value"))).as("headers"))
    val r = Serde.fromKafkaEnvelope(frames, schema).collect().head
    assert(r.getAs[Map[String, String]]("_headers") == Map("trace" -> "t2", "src" -> "unit"))
  }

  test("decoding keeps a payload-named field; the raw payload column goes away") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // the decoded schema itself has a field named like the payload column
    val clashSchema = StructType(Seq(
      StructField("id", LongType), StructField("value", StringType)))
    val df = Seq((1L, """{"id":9,"value":"inner"}""")).toDF("k", "value")
    val out = Serde.decodeJson(df, "value", clashSchema).collect().head
    assert(out.getAs[String]("value") == "inner") // decoded field survives
    assert(out.getAs[Long]("id") == 9L)
  }

  test("Avro round-trip: binary encode → decode preserves values, nulls, and bytes") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"Order","fields":[
           {"name":"order_id","type":"long"},
           {"name":"symbol","type":"string"},
           {"name":"price","type":"double"},
           {"name":"note","type":["null","string"],"default":null},
           {"name":"payload","type":"bytes"}]}"""
    val df = Seq(
      (1L, "AAPL", 101.5, Some("vip"), Array[Byte](1, 2, 3)),
      (2L, "MSFT", 55.25, None, Array[Byte]()),
      (3L, "Ω→é", -0.5, Some(""), Array[Byte](-1))
    ).toDF("order_id", "symbol", "price", "note", "payload")

    // Spark-side schema derived from the Avro writer schema
    val sparkSchema = Serde.avroSchemaToSpark(schemaJson)
    assert(sparkSchema.fieldNames.toSeq ==
      Seq("order_id", "symbol", "price", "note", "payload"))
    assert(sparkSchema("note").nullable && !sparkSchema("order_id").nullable)

    val encoded = Serde.encodeAvro(df, schemaJson, "value")
      .select("order_id", "value")
    assert(encoded.schema("value").dataType.typeName == "binary")

    val decoded = Serde.decodeAvro(encoded.withColumnRenamed("order_id", "oid"), "value", schemaJson)
    val back = decoded.orderBy("order_id").collect().map(r =>
      (r.getAs[Long]("order_id"), r.getAs[String]("symbol"), r.getAs[Double]("price"),
        Option(r.getAs[String]("note")), r.getAs[Array[Byte]]("payload").toSeq))
    assert(back.toSeq == Seq(
      (1L, "AAPL", 101.5, Some("vip"), Seq[Byte](1, 2, 3)),
      (2L, "MSFT", 55.25, None, Seq[Byte]()),
      (3L, "Ω→é", -0.5, Some(""), Seq[Byte](-1))))
    // passthrough column retained next to splatted fields
    assert(decoded.columns.contains("oid"))
  }

  test("decoded-field / frame-column clash fails fast on every decode path") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // a decoded field shadowing a frame column would materialize a
    // duplicate name that only explodes (AMBIGUOUS_REFERENCE) on the
    // next select-by-name — all decode paths share the guard
    val frames = Seq((7L, "{\"doc_id\": 1}")).toDF("doc_id", "value")
    val sch = StructType(Seq(StructField("doc_id", LongType)))
    val ej = intercept[IllegalArgumentException](Serde.decodeJson(frames, "value", sch))
    assert(ej.getMessage.contains("collide") && ej.getMessage.contains("doc_id"))
    val ec = intercept[IllegalArgumentException](Serde.decodeCsv(frames, "value", sch))
    assert(ec.getMessage.contains("collide"))
    val bin = Seq((7L, Array[Byte]())).toDF("doc_id", "value")
    val ea = intercept[IllegalArgumentException](Serde.decodeAvro(bin, "value",
      """{"type":"record","name":"T","fields":[{"name":"doc_id","type":"long"}]}"""))
    assert(ea.getMessage.contains("collide") && ea.getMessage.contains("doc_id"))
  }

  test("r17 review: a mis-framed avro payload (trailing bytes) decodes to nulls, not fabricated values") {
    import spark.implicits._
    // a Confluent wire-format record = 5-byte magic/schema-id header +
    // avro body: the header alone parses as (zigzag 0, empty string), so
    // reader.read returned id=0/name="" with the REAL payload unread —
    // plausible garbage on every row, zero errors (r17 review)
    val schemaJson =
      """{"type":"record","name":"R","fields":[
           {"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
    val good = Serde.encodeAvro(Seq((7L, "real")).toDF("id", "name"), schemaJson, "value")
      .select("value").collect().head.getAs[Array[Byte]](0)
    val confluentFramed = Array[Byte](0, 0, 0, 0, 1) ++ good
    val rows = Serde.decodeAvro(
      Seq(Tuple1(confluentFramed)).toDF("value"), "value", schemaJson).collect()
    assert(rows.length == 1 && rows.head.isNullAt(rows.head.fieldIndex("id"))
      && rows.head.isNullAt(rows.head.fieldIndex("name")),
      s"mis-framed payload must land all-null, got ${rows.head}")
    // a correctly framed payload still decodes
    val ok = Serde.decodeAvro(Seq(Tuple1(good)).toDF("value"), "value", schemaJson)
      .collect().head
    assert(ok.getAs[Long]("id") == 7L && ok.getAs[String]("name") == "real")
  }

  test("clash/payload matching follows the session resolver: differently-cased names collide too (r13 review)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    // decoded field 'Doc_Id' vs frame column 'doc_id': under default
    // case-insensitive resolution these collide — the exact-name
    // intersect let it slip to a deferred AMBIGUOUS_REFERENCE
    val frames = Seq((7L, "{\"Doc_Id\": 1}")).toDF("doc_id", "value")
    val sch = StructType(Seq(StructField("Doc_Id", LongType)))
    val ej = intercept[IllegalArgumentException](Serde.decodeJson(frames, "value", sch))
    assert(ej.getMessage.contains("collide"), ej.getMessage)
    // encode: a frame column 'Value' IS payload 'value' — replaced in
    // place, never appended as a duplicate
    val schemaJson =
      """{"type":"record","name":"T","fields":[{"name":"n","type":"long"}]}"""
    val df = Seq((5L, "old")).toDF("n", "Value")
    val out = Serde.encodeAvro(df, schemaJson, "value")
    assert(out.columns.count(_.equalsIgnoreCase("value")) == 1, out.columns.toSeq)
    // envelope: schema field '_Headers' collides with generated _headers
    val e2 = intercept[IllegalArgumentException](Serde.fromKafkaEnvelope(
      Seq((Array[Byte](), Array[Byte](), 0L, 0L, new java.sql.Timestamp(0), "t",
        Array.empty[Byte]))
        .toDF("key", "value", "offset", "partition", "timestamp", "topic", "headers"),
      StructType(Seq(StructField("_Headers", StringType)))))
    assert(e2.getMessage.contains("collide"), e2.getMessage)
  }

  test("avro null-field diagnostic names only NON-NULLABLE fields (r13 review)") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"T","fields":[
         {"name":"a","type":"long"},
         {"name":"b","type":["null","string"],"default":null}]}"""
    val df = Seq((Option.empty[Long], Option.empty[String])).toDF("a", "b")
      .selectExpr("CAST(a AS LONG) AS a", "CAST(b AS STRING) AS b")
    val e = intercept[Exception](Serde.encodeAvro(df, schemaJson).collect())
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).mkString(" | ")
    val m = msgs(e)
    assert(m.contains("non-nullable field(s): a"), m)
    assert(!m.contains("a, b"), s"nullable field b must not be blamed: $m")
  }

  test("r15 review: case-variant payload/field names resolve like the session resolver") {
    import spark.implicits._
    // default case-INSENSITIVE session: SQL resolves 'Value' for
    // "value", so the binary codecs must too — the exact
    // df.schema(name) lookups threw a raw 'Field does not exist' for
    // names every other path in the module accepts
    val schemaJson =
      """{"type":"record","name":"R","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val df = Seq((1L, "a")).toDF("Id", "Name") // case-variant columns
    // encodeAvro: schema field 'id' binds the frame's 'Id'
    val enc = Serde.encodeAvro(df, schemaJson, "value")
    // decode through a case-variant payload name
    val renamed = enc.withColumnRenamed("value", "Value")
      .drop("Id", "Name")
    val dec = Serde.decodeAvro(renamed, "value", schemaJson)
    assert(dec.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a")))
    // protobuf twin: encode binds case-variant columns, decode resolves
    // a case-variant payload
    val encP = ProtoWire.encodeProtobuf(df, "message M { int64 id = 1; string name = 2; }", "value")
    val decP = ProtoWire.decodeProtobuf(
      encP.withColumnRenamed("value", "VALUE").drop("Id", "Name"),
      "value", "message M { int64 id = 1; string name = 2; }")
    assert(decP.select("id", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      == Seq((1L, "a")))
  }

  test("encodeAvro replaces an existing payload column and validates on the driver") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"T","fields":[{"name":"n","type":"long"}]}"""
    // a frame that already HAS a `value` column (raw Kafka re-encode):
    // the payload column is replaced (encodeJson semantics), not
    // duplicated into an ambiguous pair
    val df = Seq((5L, "old")).toDF("n", "value")
    val out = Serde.encodeAvro(df, schemaJson, "value")
    assert(out.columns.count(_ == "value") == 1)
    val round = Serde.decodeAvro(out.drop("n"), "value", schemaJson).collect().head
    assert(round.getAs[Long]("n") == 5L)
    // driver-side validation: missing column and type mismatch are
    // named errors BEFORE any task launches, not per-row executor casts
    val missing = intercept[IllegalArgumentException](
      Serde.encodeAvro(Seq(1).toDF("other"), schemaJson))
    assert(missing.getMessage.contains("n") && missing.getMessage.contains("missing"))
    val mistyped = intercept[IllegalArgumentException](
      Serde.encodeAvro(Seq(1).toDF("n"), schemaJson))
    assert(mistyped.getMessage.contains("cast the column"))
  }

  test("serde guard rails: payload position, binary check, working col, sys clash, null field name") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val schemaJson =
      """{"type":"record","name":"T","fields":[{"name":"n","type":"long"}]}"""
    // in-place payload replace: a mid-frame `value` keeps its POSITION
    // (positional consumers must see one layout whichever encoder ran)
    val mid = Seq((1L, "old", "z")).toDF("n", "value", "tail")
    assert(Serde.encodeAvro(mid, schemaJson, "value").columns.toSeq == Seq("n", "value", "tail"))
    // a STRING payload column fails fast on the driver, not per-row CCE
    val strPayload = Seq((1L, "notbytes")).toDF("other_id", "value")
    val e = intercept[IllegalArgumentException](Serde.decodeAvro(strPayload, "value", schemaJson))
    assert(e.getMessage.contains("BINARY"))
    // a pre-existing __graft_decoded column is rejected, not silently dropped
    val wk = Seq(("""{"a":1}""", "keep")).toDF("payload", "__graft_decoded")
    intercept[IllegalArgumentException](Serde.decodeJson(wk, "payload",
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("a", org.apache.spark.sql.types.LongType)))))
    // json envelope: payload fields named like system columns reject
    val sysSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("_timestamp", org.apache.spark.sql.types.LongType)))
    val frames = Seq((Array[Byte](1), "k")).toDF("value", "key")
      .withColumn("headers", lit(null).cast("array<struct<key:string,value:binary>>"))
      .withColumn("timestamp", current_timestamp())
      .withColumn("offset", lit(0L)).withColumn("partition", lit(0))
    val c = intercept[IllegalArgumentException](Serde.fromKafkaEnvelope(frames, sysSchema))
    assert(c.getMessage.contains("_timestamp"))
    // a NULL in a non-nullable avro field NAMES the field in the error
    val withNullVal = Seq(Tuple1[java.lang.Long](null)).toDF("n")
    val err = intercept[Exception] {
      Serde.encodeAvro(withNullVal, schemaJson).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(err).exists(t => Option(t.getMessage).exists(_.contains("non-nullable field"))),
      s"expected a named-null-field error, got: ${err.getMessage}")
  }

  test("Avro tombstone (null payload) decodes to null columns, not an NPE") {
    import org.apache.spark.sql.types._
    val schemaJson =
      """{"type":"record","name":"T","fields":[{"name":"x","type":"long"}]}"""
    val frameSchema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("value", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(1L, null))
    val out = Serde.decodeAvro(spark.createDataFrame(rows, frameSchema), "value", schemaJson)
      .collect().head
    assert(out.getAs[Long]("k") == 1L && out.isNullAt(out.fieldIndex("x")))
  }

  test("malformed Avro payload decodes PERMISSIVE to null columns — one poison message must not kill the stream") {
    import org.apache.spark.sql.types._
    val schemaJson =
      """{"type":"record","name":"T","fields":[{"name":"x","type":"long"},{"name":"s","type":"string"}]}"""
    val frameSchema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("value", BinaryType, nullable = true)))
    import spark.implicits._
    val goodBytes = Serde.encodeAvro(Seq((7L, "ok")).toDF("x", "s"), schemaJson, "value")
      .select("value").collect().head.getAs[Array[Byte]]("value")
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, goodBytes),
      org.apache.spark.sql.Row(2L, "not avro at all".getBytes),
      org.apache.spark.sql.Row(3L, goodBytes.take(2)), // truncated mid-record
      // a good record AFTER the corrupt ones — in partition order, so a
      // decoder left poisoned by a failed read would null-decode it
      org.apache.spark.sql.Row(4L, goodBytes))
    val out = Serde.decodeAvro(
      spark.createDataFrame(rows, frameSchema).coalesce(1), "value", schemaJson)
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out.size == 4) // nothing thrown, nothing dropped
    Seq(1L, 4L).foreach { k =>
      assert(out(k).getAs[Long]("x") == 7L && out(k).getAs[String]("s") == "ok",
        s"record $k should decode (reused decoder must reinitialize per record)")
    }
    Seq(2L, 3L).foreach { k =>
      assert(out(k).isNullAt(out(k).fieldIndex("x")), s"record $k should be null-decoded")
    }
  }

  test("Avro and JSON Kafka envelopes agree on column order (decoded fields first)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schemaJson =
      """{"type":"record","name":"Ev","fields":[{"name":"user","type":"string"}]}"""
    val typed = Seq(Tuple1("alice")).toDF("user")
    val valueBytes = Serde.encodeAvro(typed, schemaJson, "value")
      .select("value").collect().map(_.getAs[Array[Byte]]("value"))
    val frames = valueBytes.map { v =>
      (v, Seq(("source", "t".getBytes)), new java.sql.Timestamp(1000L), 0L, 0)
    }.toSeq.toDF("value", "headers", "timestamp", "offset", "partition")
      .withColumn("headers", col("headers").cast("array<struct<key:string,value:binary>>"))
    val avroCols = Serde.fromKafkaEnvelopeAvro(frames, schemaJson).columns.toSeq
    val jsonCols = Serde.fromKafkaEnvelope(
      frames.withColumn("value", lit("""{"user":"alice"}""").cast("binary")),
      StructType(Seq(StructField("user", StringType)))).columns.toSeq
    assert(avroCols == jsonCols, s"avro=$avroCols json=$jsonCols")
    assert(avroCols.head == "user" && avroCols.last == "_partition")
  }

  test("schemaless CSV read-back recovers column types (round-trip parity)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString
    val df = Seq((1L, 2.5, "x"), (2L, 3.5, "y")).toDF("id", "v", "s")
    Serde.writeFileUri(df, s"file://$dir/t.csv")
    val back = Serde.readFileUri(spark, s"file://$dir/t.csv")
    // without inferSchema every column came back string — sums/compares
    // over the job's sinkDf would then misbehave
    assert(back.schema("id").dataType.typeName == "long" ||
      back.schema("id").dataType.typeName == "integer")
    assert(back.schema("v").dataType.typeName == "double")
    assert(back.agg(org.apache.spark.sql.functions.sum("v")).collect().head.getDouble(0) == 6.0)
  }

  test("schema registry: versioning, backward-compat gate, reader-schema evolution") {
    import spark.implicits._
    val reg = new SchemaRegistry(java.nio.file.Files.createTempDirectory("graft_registry"))
    val v1 =
      """{"type":"record","name":"Ev","fields":[
           {"name":"id","type":"int"},
           {"name":"name","type":"string"}]}"""
    // evolution: id promoted int→long, score added WITH default
    val v2 =
      """{"type":"record","name":"Ev","fields":[
           {"name":"id","type":"long"},
           {"name":"name","type":"string"},
           {"name":"score","type":"double","default":0.5}]}"""
    assert(reg.register("events-value", v1) == 1)
    assert(reg.register("events-value", v1) == 1)            // idempotent
    assert(reg.register("events-value", v2) == 2)            // legal evolution
    assert(reg.versions("events-value") == Vector(1, 2))
    assert(reg.latest("events-value").map(_._1).contains(2))

    // adding a field WITHOUT a default cannot read old data → rejected
    val breaking =
      """{"type":"record","name":"Ev","fields":[
           {"name":"id","type":"long"},
           {"name":"name","type":"string"},
           {"name":"must_have","type":"string"}]}"""
    val e = intercept[IllegalArgumentException](reg.register("events-value", breaking))
    assert(e.getMessage.contains("not backward-compatible"))
    assert(reg.versions("events-value") == Vector(1, 2))     // registry unchanged

    // payloads written with v1 decode under the v2 reader: id promoted,
    // score filled from the default — Avro resolution end-to-end
    val df = Seq((7, "a"), (8, "b")).toDF("id", "name")
    val encoded = Serde.encodeAvro(df, reg.get("events-value", 1).get, "value").select("value")
    val decoded = Serde.decodeAvro(encoded, "value",
      reg.get("events-value", 1).get, readerSchemaJson = Some(reg.latest("events-value").get._2))
    assert(decoded.schema("id").dataType.typeName == "long")
    val rows = decoded.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("score")))
    assert(rows.toSeq == Seq((7L, "a", 0.5), (8L, "b", 0.5)))

    // stray files in a subject dir (editor backups, .DS_Store, a
    // non-numeric .avsc) must be ignored, not crash version listing
    val subjectDir = reg.root_forTest.resolve("events-value")
    java.nio.file.Files.writeString(subjectDir.resolve("draft.avsc"), "{}")
    java.nio.file.Files.writeString(subjectDir.resolve(".DS_Store"), "")
    assert(reg.versions("events-value") == Vector(1, 2))
  }

  test("schema registry: path-traversal subjects rejected; version collisions never clobber") {
    val root = java.nio.file.Files.createTempDirectory("graft_reg_safe")
    val reg = new SchemaRegistry(root)
    val schema = """{"type":"record","name":"T","fields":[{"name":"a","type":"int"}]}"""
    // "." and ".." satisfy the [A-Za-z0-9._-]+ class but resolve outside
    // the registry root — must be rejected by name, never written
    Seq(".", "..").foreach { s =>
      val e = intercept[IllegalArgumentException](reg.register(s, schema))
      assert(e.getMessage.contains("invalid subject name"))
    }
    // "." would write INTO root itself, ".." into its parent — check the
    // "."-escape target we own (a parent-dir check could false-fail on a
    // stray /tmp file and misses the root-level leak anyway)
    assert(!java.nio.file.Files.exists(root.resolve("1.avsc")))
    assert(reg.subjects().isEmpty)

    // cross-process race shape: another driver committed version 2
    // between our listing and our write. CREATE_NEW must skip past the
    // collision, never truncate-overwrite the committed file.
    assert(reg.register("race", schema) == 1)
    val foreign = """{"type":"record","name":"T","fields":[
        {"name":"a","type":"int"},{"name":"b","type":"int","default":0}]}"""
    java.nio.file.Files.writeString(root.resolve("race").resolve("2.avsc"), foreign)
    val evolved = """{"type":"record","name":"T","fields":[
        {"name":"a","type":"int"},{"name":"c","type":"int","default":1}]}"""
    // a register over the subject with the foreign file appends AFTER
    // it and the foreign content survives verbatim (truncate-write
    // would have clobbered it; CREATE_NEW guards the narrower window
    // between listing and write the same way)
    assert(reg.register("race", evolved) == 3)
    assert(reg.get("race", 2).get == foreign)
  }

  test("schema registry: CREATE_NEW collision re-runs the compat gate against the rival's schema") {
    val root = java.nio.file.Files.createTempDirectory("graft_reg_race")
    val reg = new SchemaRegistry(root)
    val v1 = """{"type":"record","name":"T","fields":[{"name":"x","type":"string"}]}"""
    assert(reg.register("s", v1) == 1)

    // rival process commits version 2 INSIDE the window between our
    // listing/compat check and our CREATE_NEW write: x retyped to int
    val rival = """{"type":"record","name":"T","fields":[{"name":"x","type":"int"}]}"""
    var planted = false
    reg.onBeforeWrite_forTest = () => if (!planted) {
      planted = true
      java.nio.file.Files.writeString(root.resolve("s").resolve("2.avsc"), rival)
    }
    // ours reads v1's data fine (added field has a default) but CANNOT
    // read the rival's int x — the collision retry must re-validate
    // against the rival's now-latest schema and reject, not bump the
    // version number and admit an incompatible schema
    val ours = """{"type":"record","name":"T","fields":[
        {"name":"x","type":"string"},{"name":"note","type":"string","default":""}]}"""
    val e = intercept[IllegalArgumentException](reg.register("s", ours))
    assert(e.getMessage.contains("not backward-compatible with version 2"))
    assert(reg.versions("s") == Vector(1, 2)) // nothing admitted past the rival

    // benign collision: the rival committed OUR schema → the retry's
    // identity check returns the rival's version (idempotent), no new file
    val reg2 = new SchemaRegistry(java.nio.file.Files.createTempDirectory("graft_reg_race2"))
    assert(reg2.register("s", v1) == 1)
    var planted2 = false
    reg2.onBeforeWrite_forTest = () => if (!planted2) {
      planted2 = true
      val same = new org.apache.avro.Schema.Parser().parse(ours).toString(true)
      java.nio.file.Files.writeString(reg2.root_forTest.resolve("s").resolve("2.avsc"), same)
    }
    assert(reg2.register("s", ours) == 2)
    assert(reg2.versions("s") == Vector(1, 2))
  }

  test("kafka envelope with Avro value → typed columns + system columns") {
    import spark.implicits._
    val schemaJson =
      """{"type":"record","name":"Ev","fields":[
           {"name":"user","type":"string"},{"name":"amount","type":"double"}]}"""
    val typed = Seq(("alice", 10.0), ("bob", 20.5)).toDF("user", "amount")
    val valueBytes = Serde.encodeAvro(typed, schemaJson, "value")
      .select("value").collect().map(_.getAs[Array[Byte]]("value"))
    val frames = valueBytes.zipWithIndex.map { case (v, i) =>
      (v, Seq(("source", "t".getBytes)), new java.sql.Timestamp(1000L * i), i.toLong, i % 2)
    }.toSeq.toDF("value", "headers", "timestamp", "offset", "partition")
      .withColumn("headers", expr("transform(headers, h -> named_struct('key', h._1, 'value', h._2))"))
    val out = Serde.fromKafkaEnvelopeAvro(frames, schemaJson).orderBy("_offset").collect()
    assert(out.map(r => (r.getAs[String]("user"), r.getAs[Double]("amount"))).toSeq ==
      Seq(("alice", 10.0), ("bob", 20.5)))
    assert(out.head.getAs[Map[String, String]]("_headers") == Map("source" -> "t"))
    assert(out.map(_.getAs[Int]("_partition")).toSeq == Seq(0, 1))
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
