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
  *  - Avro    → binary Avro against a writer-schema JSON via the Apache
  *    Avro runtime (`decodeAvro`/`encodeAvro`, GenericDatumReader/Writer
  *    in a narrow mapPartitions — a codec is not an `Expression`; this
  *    is the same per-partition-batched shape `spark-avro`'s
  *    `from_avro` lowers to). Schema-registry resolution is config
  *    plumbing on top of the same calls.
  *  - Protobuf: the `spark-protobuf` connector jar is not in this
  *    environment; the call site is the same shape
  *    (`from_protobuf(col, messageName, descFile)`).
  *
  * The Kafka record shape (key/value/headers/partition/offset) is the
  * canonical envelope; `fromKafkaEnvelope` turns a raw envelope frame
  * into typed columns + system columns, matching
  * docs/sql/system-columns.md.
  */
object Serde {

  /** Fail FAST when decoded fields would shadow frame columns: the
    * splat would materialize duplicate column names that only explode
    * (AMBIGUOUS_REFERENCE) on the next select-by-name, far from the
    * decode call. All four decode paths (json/csv/avro/proto) share
    * this guard so they cannot drift on the semantics. */
  private[sources] def requireNoClash(df: DataFrame, payloadCol: String,
                                      valueSchema: StructType, what: String): Unit = {
    // SESSION-resolver matching (Cols.sameName): under default
    // case-insensitive resolution a decoded field 'amount' collides
    // with frame column 'Amount' exactly as an exact match does — the
    // old exact-name intersect let it through to the deferred
    // AMBIGUOUS_REFERENCE this guard exists to prevent (r13 review)
    val frameCols = df.schema.fieldNames
      .filterNot(graft.operators.Cols.sameName(df, _, payloadCol))
    val clash = valueSchema.fieldNames
      .filter(v => frameCols.exists(graft.operators.Cols.sameName(df, _, v)))
    require(clash.isEmpty,
      s"decoded $what fields collide with frame columns: ${clash.mkString(", ")} " +
        s"(rename or drop the frame columns before decoding)")
  }

  /** Shared decode scaffolding for the byte-payload codecs (avro,
    * proto): clash guard, passthrough/output schema, tombstone
    * null-payload handling, and the per-partition mapPartitions shape —
    * `init` runs once per partition (codec setup) and returns the
    * per-row bytes→values function. One copy, so the tombstone guard /
    * clash check / column ordering cannot drift between codecs (they
    * already had: proto gained the clash guard and avro did not). */
  private[sources] def decodeWithPayload(df: DataFrame, payloadCol: String,
      valueSchema: StructType, what: String)(
      init: () => Array[Byte] => Array[Any]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    requireNoClash(df, payloadCol, valueSchema, what)
    // SESSION-resolver payload lookup (Cols.fieldOf): requireNoClash
    // and the JSON/CSV decode twins already resolve case-insensitively
    // under the default session, so an exact df.schema(payloadCol) here
    // threw a raw 'Field does not exist' for a case-variant name the
    // rest of the module accepts (r15 review)
    val payloadField = graft.operators.Cols.fieldOf(df, payloadCol)
    // fail fast on the DRIVER: a non-binary payload (e.g. a string
    // column) would otherwise ClassCastException per-row inside
    // executor tasks with an opaque stack trace
    require(payloadField.dataType == org.apache.spark.sql.types.BinaryType,
      s"payload column '$payloadCol' must be BINARY for $what decode, " +
        s"is ${payloadField.dataType}")
    val passthrough = df.schema.fields.filterNot(_.name == payloadField.name)
    // decoded fields are nullable regardless of the codec schema: a
    // tombstone (null payload) nulls ALL of them
    val outSchema = StructType(passthrough ++ valueSchema.fields.map(_.copy(nullable = true)))
    val payloadIdx = df.schema.fieldIndex(payloadField.name)
    // hoisted ONCE: wrapping the index array per ROW re-allocated an
    // identical IndexedSeq for every record of a high-throughput decode
    val passIdx = passthrough.map(f => df.schema.fieldIndex(f.name)).toIndexedSeq
    val nFields = valueSchema.fields.length
    val res = df.mapPartitions { it =>
      val rowFn = init()
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        // Kafka tombstone / null payload → all-null decoded columns
        // (decoding null would NPE and kill the stream on one
        // compacted-topic delete marker)
        val decoded = if (bytes == null) new Array[Any](nFields) else rowFn(bytes)
        Row.fromSeq(passIdx.map(row.get) ++ decoded)
      }
    }(Encoders.row(outSchema))
    res.toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /** Decode a JSON-string payload column into a struct and splat it.
    * The payload column drops BEFORE the splat: a decoded field that
    * shares its name (e.g. a payload column `value` whose schema also
    * has a `value` field) must survive — a post-splat drop removes BOTH
    * same-named columns. The temp column name is graft-prefixed so a
    * user column cannot collide with it. */
  def decodeJson(df: DataFrame, payloadCol: String, schema: StructType): DataFrame = {
    requireNoClash(df, payloadCol, schema, "json")
    requireNoWorkingCol(df)
    requireNoWorkingField(schema)
    df.withColumn("__graft_decoded", from_json(col(payloadCol), schema))
      .drop(payloadCol)
      .select(col("*"), col("__graft_decoded.*")).drop("__graft_decoded")
  }

  // the packIntoShards/sessionize convention: withColumn REPLACES a
  // same-named input column and the trailing drop would delete the
  // user's data silently
  private def requireNoWorkingCol(df: DataFrame): Unit =
    require(!graft.operators.Cols.has(df, "__graft_decoded"),
      "input must not carry the __graft_decoded working column")

  // the SCHEMA side of the same guard: the trailing drop removes ALL
  // columns named __graft_decoded, so a decoded field of that name
  // would splat out and be silently deleted (r11 review)
  private def requireNoWorkingField(schema: org.apache.spark.sql.types.StructType): Unit =
    require(!schema.fieldNames.exists(_.equalsIgnoreCase("__graft_decoded")),
      "decoded schema must not declare the __graft_decoded working column")

  /** Encode selected columns into one JSON-string payload column. */
  def encodeJson(df: DataFrame, cols: Seq[String], payloadCol: String = "value"): DataFrame =
    df.withColumn(payloadCol, to_json(struct(cols.map(col): _*)))

  def decodeCsv(df: DataFrame, payloadCol: String, schema: StructType,
                options: Map[String, String] = Map.empty): DataFrame = {
    requireNoClash(df, payloadCol, schema, "csv")
    requireNoWorkingCol(df)
    requireNoWorkingField(schema)
    df.withColumn("__graft_decoded", from_csv(col(payloadCol), schema, options))
      .drop(payloadCol)
      .select(col("*"), col("__graft_decoded.*")).drop("__graft_decoded")
  }

  def encodeCsv(df: DataFrame, cols: Seq[String], payloadCol: String = "value"): DataFrame =
    df.withColumn(payloadCol, to_csv(struct(cols.map(col): _*)))

  // ---------------- Avro (binary, writer-schema JSON) ----------------

  /** Spark StructType for a (record-typed) Avro schema JSON. Supports
    * the flat primitive surface the reference's serializers cover
    * (serialization/avro.rs): boolean/int/long/float/double/string/
    * bytes, with `["null", T]` unions → nullable columns. */
  def avroSchemaToSpark(schemaJson: String): StructType = {
    import org.apache.avro.Schema
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val schema = new Schema.Parser().parse(schemaJson)
    def dt(s: Schema): (DataType, Boolean) = s.getType match {
      case Schema.Type.BOOLEAN => (BooleanType, false)
      case Schema.Type.INT => (IntegerType, false)
      case Schema.Type.LONG => (LongType, false)
      case Schema.Type.FLOAT => (FloatType, false)
      case Schema.Type.DOUBLE => (DoubleType, false)
      case Schema.Type.STRING => (StringType, false)
      case Schema.Type.BYTES => (BinaryType, false)
      case Schema.Type.UNION =>
        val branches = s.getTypes
        val nonNull = branches.asScala.filter(_.getType != Schema.Type.NULL)
        require(nonNull.size == 1, s"only [null, T] unions supported, got $s")
        (dt(nonNull.head)._1, true)
      case other => throw new IllegalArgumentException(s"unsupported avro type $other")
    }
    StructType(schema.getFields.asScala.toSeq.map { f =>
      val (t, nullable) = dt(f.schema())
      StructField(f.name(), t, nullable)
    })
  }
  /** Decode a binary-Avro payload column (written with `schemaJson`)
    * into typed columns, splatted next to the frame's other columns.
    * Per-partition: one parsed schema + one reused decoder for the whole
    * partition — the batched shape that scales (no per-row setup). */
  def decodeAvro(df: DataFrame, payloadCol: String, schemaJson: String): DataFrame =
    decodeAvro(df, payloadCol, schemaJson, None)

  /** Binary-Avro decode with optional schema EVOLUTION: when
    * `readerSchemaJson` is set, payloads written with `schemaJson` are
    * resolved against the reader schema by Avro's standard resolution
    * rules (added fields filled from defaults, removed fields skipped,
    * legal type promotions applied) — the registry-driven upgrade path
    * (reference: src/velostream/schema/). Output columns follow the
    * READER schema. */
  def decodeAvro(df: DataFrame, payloadCol: String, schemaJson: String,
                 readerSchemaJson: Option[String]): DataFrame = {
    // DRIVER-side resolution check (the encodeAvro/encodeProtobuf
    // pattern): the per-row decode below is deliberately permissive
    // (one poison message → all-null row, not a dead stream), which
    // means a SYSTEMATICALLY incompatible reader schema — an added
    // field with no default — would silently decode the ENTIRE corpus
    // to all-null columns with zero errors. Incompatibility is a
    // configuration fact knowable before any task runs: fail here.
    readerSchemaJson.foreach { readerJson =>
      import org.apache.avro.{Schema, SchemaCompatibility}
      val writer = new Schema.Parser().parse(schemaJson)
      val reader = new Schema.Parser().parse(readerJson)
      val res = SchemaCompatibility.checkReaderWriterCompatibility(reader, writer).getResult
      require(res.getCompatibility == SchemaCompatibility.SchemaCompatibilityType.COMPATIBLE, {
        import scala.jdk.CollectionConverters._
        "reader schema cannot resolve payloads written with the writer schema: " +
          res.getIncompatibilities.asScala.map(i => s"${i.getType} at ${i.getLocation}")
            .mkString("; ")
      })
    }
    val effectiveJson = readerSchemaJson.getOrElse(schemaJson)
    val valueSchema = avroSchemaToSpark(effectiveJson)
    decodeWithPayload(df, payloadCol, valueSchema, "avro") { () =>
      import scala.jdk.CollectionConverters._
      import org.apache.avro.Schema
      import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
      import org.apache.avro.io.DecoderFactory
      val writerSchema = new Schema.Parser().parse(schemaJson)
      val schema = readerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(writerSchema)
      val reader = new GenericDatumReader[GenericRecord](writerSchema, schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      val fields = schema.getFields.asScala.toArray
      (bytes: Array[Byte]) =>
        // PERMISSIVE on malformed payloads (the from_json contract):
        // a truncated / non-Avro record decodes to all-null columns
        // instead of throwing EOFException from deep inside the task
        // — one poison message must not kill the stream, exactly the
        // failure the tombstone guard in decodeWithPayload prevents.
        // binaryDecoder(bytes, decoder) fully reinitializes per
        // record, so a failed read cannot corrupt the next one.
        try {
          decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
          val rec = reader.read(null, decoder)
          // leftover bytes = a MIS-FRAMED payload that happened to parse
          // as a prefix (a Confluent wire-format record's 5-byte
          // magic/schema-id header decodes as zigzag 0 + empty string and
          // read() returns fabricated values with no error) — route it to
          // the same all-null landing as a throwing decode instead of
          // emitting plausible garbage rows (r17 review)
          if (!decoder.isEnd)
            throw new java.io.IOException("avro payload has trailing bytes (mis-framed)")
          fields.map { f =>
            rec.get(f.pos()) match {
              case null => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case bb: java.nio.ByteBuffer =>
                val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
              case v => v
            }
          }
        } catch {
          case scala.util.control.NonFatal(_) =>
            Array.fill[Any](fields.length)(null)
        }
    }
  }

  /** Encode the avro SCHEMA's fields (taken from `schemaJson` — there
    * is deliberately no `cols` parameter like encodeJson/encodeCsv
    * have: the avro record defines its own field set, and every schema
    * field must exist in the frame or the encode fails loudly) into one
    * binary-Avro payload column. Field order = schema order. Narrow
    * map, executor-side only. */
  def encodeAvro(df: DataFrame, schemaJson: String, payloadCol: String = "value"): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    // validate on the DRIVER (the encodeProtobuf pattern): schema parse,
    // field presence, and column types — a mismatch would otherwise burn
    // a job's worth of task retries to report a per-row
    // ClassCastException from inside mapPartitions
    // SESSION-resolver field lookups (Cols.has/fieldOf): exact-case
    // checks rejected case-variant columns SQL itself resolves, and
    // reported them as a raw 'Field does not exist' instead of the
    // friendly messages below (r15 review; encodeWithPayload was
    // already resolver-aware, so the module's two halves disagreed)
    avroSchemaToSpark(schemaJson).fields.foreach { f =>
      require(graft.operators.Cols.has(df, f.name),
        s"column '${f.name}' required by the avro schema is missing from the frame")
      val actual = graft.operators.Cols.fieldOf(df, f.name).dataType
      require(actual == f.dataType,
        s"column '${f.name}' is $actual but the avro schema expects ${f.dataType} " +
          s"(cast the column before encoding)")
    }
    // resolved on the DRIVER (the init closure runs on executors, where
    // neither df nor the session resolver exists): schema-field name →
    // frame ordinal under the session rule
    val schemaIdxs = {
      import scala.jdk.CollectionConverters._
      new org.apache.avro.Schema.Parser().parse(schemaJson).getFields.asScala
        .map(f => inSchema.fieldIndex(graft.operators.Cols.fieldOf(df, f.name()).name))
        .toArray
    }
    encodeWithPayload(df, payloadCol, () => {
      import scala.jdk.CollectionConverters._
      import org.apache.avro.Schema
      import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
      import org.apache.avro.io.EncoderFactory
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new java.io.ByteArrayOutputStream()
      var encoder: org.apache.avro.io.BinaryEncoder = null
      val fields = schema.getFields.asScala.toArray
      val idxs = schemaIdxs
      row => {
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < fields.length) {
          val v = row.get(idxs(i)) match {
            case a: Array[Byte] => java.nio.ByteBuffer.wrap(a)
            case x => x
          }
          rec.put(fields(i).pos(), v)
          i += 1
        }
        bos.reset()
        encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
        // the driver-side check validates TYPES, not values: a NULL in a
        // column bound to a non-nullable avro field dies here — name the
        // field instead of burning task retries on an opaque NPE
        try writer.write(rec, encoder)
        catch {
          case e @ (_: NullPointerException | _: org.apache.avro.AvroTypeException
                    | _: org.apache.avro.AvroRuntimeException) =>
            // only NON-NULLABLE fields are culpable: a nullable-union
            // field legitimately holds null, and naming it misdirects
            // the user away from the real offender (r13 review)
            val nullFields = fields.filter(f =>
              rec.get(f.pos()) == null && !f.schema().isNullable).map(_.name())
            throw new IllegalArgumentException(
              s"avro encode failed${if (nullFields.nonEmpty)
                s" (NULL in non-nullable field(s): ${nullFields.mkString(", ")})"
              else ""}: ${e.getMessage}", e)
        }
        encoder.flush()
        bos.toByteArray
      }
    })
  }

  /** The encode twin of `decodeWithPayload` — replace-in-place (or
    * append) binary payload scaffolding shared by `encodeAvro` and
    * `ProtoWire.encodeProtobuf`, so the replace-in-place semantics,
    * nullable flag, and column ordering cannot drift between codecs
    * (the decode side was centralized for exactly that reason; the
    * encode twins had already started to duplicate — r11 review).
    *
    * An existing payload column is REPLACED IN PLACE (encodeJson's
    * withColumn semantics — the normal re-encode of a raw Kafka frame
    * rewriting its `value`); moving it to the end would give positional
    * consumers a different layout depending on which encoder ran, and
    * appending would materialize a duplicate name. `init` builds the
    * per-partition encoder closure (codec state like stream buffers
    * lives there, one per task). */
  private[sources] def encodeWithPayload(df: DataFrame, payloadCol: String,
      init: () => org.apache.spark.sql.Row => Array[Byte]): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types._
    val inSchema = df.schema
    // session-resolver matching: a frame column 'Value' IS the payload
    // column 'value' under default resolution — the exact-name check
    // appended a duplicate instead of replacing in place (r13 review)
    def isPayload(name: String): Boolean =
      graft.operators.Cols.sameName(df, name, payloadCol)
    val hasPayload = inSchema.fieldNames.exists(isPayload)
    val outFields =
      if (hasPayload) inSchema.fields.map(f =>
        if (isPayload(f.name)) StructField(payloadCol, BinaryType, nullable = false) else f)
      else inSchema.fields :+ StructField(payloadCol, BinaryType, nullable = false)
    val outSchema = StructType(outFields)
    // -1 marks the payload slot; every other slot copies its input index
    val srcIdx = outFields.map(f =>
      if (f.name == payloadCol) -1 else inSchema.fieldIndex(f.name)).toIndexedSeq
    val res = df.mapPartitions { it =>
      val enc = init()
      it.map { row =>
        val payload = enc(row)
        Row.fromSeq(srcIdx.map(i => if (i < 0) payload else row.get(i)))
      }
    }(Encoders.row(outSchema))
    res.toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /** Kafka headers array → map<string,string>, LAST value wins per key.
    * Kafka explicitly allows repeated header keys (retry/tracing
    * interceptors append); a bare map_from_entries throws
    * DUPLICATE_MAP_KEY under Spark's default dedup policy the moment
    * one such record arrives. The fold is over the handful of headers a
    * record carries — not a data-sized structure. */
  private def headersToMap(headers: Column): Column =
    aggregate(headers,
      map_from_entries(array().cast("array<struct<key:string,value:string>>")),
      (acc, h) => map_concat(
        map_filter(acc, (k, _) => k =!= h.getField("key")),
        map_from_entries(array(struct(h.getField("key").as("key"),
          h.getField("value").cast("string").as("value"))))))

  /** Kafka envelope whose `value` is binary Avro: decode + surface the
    * reference's system columns (the Avro twin of `fromKafkaEnvelope`). */
  def fromKafkaEnvelopeAvro(frames: DataFrame, schemaJson: String): DataFrame = {
    val withSys = frames
      .withColumn("_headers", headersToMap(col("headers")))
      .withColumn("_timestamp", col("timestamp"))
      .withColumn("_offset", col("offset"))
      .withColumn("_partition", col("partition"))
      .select(col("value"), col("_headers"), col("_timestamp"), col("_offset"), col("_partition"))
    val decoded = decodeAvro(withSys, "value", schemaJson)
    // decoded fields FIRST, system columns after — column-order parity
    // with the JSON twin (`fromKafkaEnvelope`); positional consumers
    // must see the same layout whichever serde the topic uses
    val sys = Seq("_headers", "_timestamp", "_offset", "_partition")
    decoded.select((decoded.columns.filterNot(sys.contains) ++ sys).map(col).toIndexedSeq: _*)
  }

  /** Typed view of a Kafka-envelope frame (the columns Spark's kafka
    * source emits): value decoded by `schema`, headers as a
    * map<string,string>, system columns surfaced with the reference's
    * names (_timestamp/_offset/_partition, docs/sql/system-columns.md). */
  def fromKafkaEnvelope(frames: DataFrame, schema: StructType): DataFrame = {
    // same clash guard as the Avro twin (there decodeAvro's
    // requireNoClash covers it): a payload field named like a system
    // column would splat a duplicate that only explodes on the next
    // select-by-name
    val sys = Seq("_headers", "_timestamp", "_offset", "_partition")
    // resolver matching: a schema field '_Headers' collides with the
    // generated '_headers' under default resolution (r13 review)
    val clash = schema.fieldNames
      .filter(f => sys.exists(graft.operators.Cols.sameName(frames, f, _)))
    require(clash.isEmpty,
      s"decoded json fields collide with system columns: ${clash.mkString(", ")}")
    frames
      .withColumn("_decoded", from_json(col("value").cast("string"), schema))
      .withColumn("_headers", headersToMap(col("headers")))
      .withColumn("_timestamp", col("timestamp"))
      .withColumn("_offset", col("offset"))
      .withColumn("_partition", col("partition"))
      .select(col("_decoded.*"), col("_headers"), col("_timestamp"), col("_offset"), col("_partition"))
  }

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

  /** One extension→format mapping + its per-format options for read AND
    * write — the two sides must agree or a file the sink wrote parses
    * differently when read back (the exact drift this replaces: the
    * streaming read path lacked the CSV header option the writer set,
    * so the header line came back as a data row). */
  private[graft] def fileFormat(path: String): (String, Map[String, String]) =
    if (path.endsWith(".json") || path.endsWith(".jsonl")) ("json", Map.empty)
    // inferSchema: a schemaless CSV read-back must recover long/double
    // columns, not return every column as string (round-trip type
    // parity); the option is ignored on the write side
    else if (path.endsWith(".csv")) ("csv", Map("header" -> "true", "inferSchema" -> "true"))
    else ("parquet", Map.empty)

  /** `file://` source analog: read newline-delimited JSON / CSV /
    * parquet by extension, one call for batch or streaming. */
  def readFileUri(spark: SparkSession, uri: String, schema: Option[StructType] = None,
                  streaming: Boolean = false): DataFrame = {
    val path = uri.stripPrefix("file://")
    val (fmt, opts) = fileFormat(path)
    if (streaming) {
      val sch = schema.getOrElse(spark.read.format(fmt).options(opts).load(path).schema)
      spark.readStream.format(fmt).options(opts).schema(sch).load(path)
    } else {
      val r = spark.read.format(fmt).options(opts)
      schema.foreach(r.schema)
      r.load(path)
    }
  }

  /** `file://` sink analog (executor-parallel write, no driver data). */
  def writeFileUri(df: DataFrame, uri: String): Unit = {
    val path = uri.stripPrefix("file://")
    val (fmt, opts) = fileFormat(path)
    df.write.mode("overwrite").options(opts).format(fmt).save(path)
  }
}
