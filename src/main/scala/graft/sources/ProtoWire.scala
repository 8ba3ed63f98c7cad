package graft.sources

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types._

/** Protobuf BINARY serde for flat messages — implemented directly
  * against the public protobuf wire format (no runtime jar exists in
  * this environment, and the format is tiny: tag = (field << 3) |
  * wireType; varints; zigzag for sint*; length-delimited strings/bytes;
  * little-endian fixed32/64). Covers the flat primitive surface the
  * reference's serializer handles (src/velostream/serialization/) —
  * nested messages/repeated fields are out of scope here.
  *
  * Schemas come from a minimal `message` block parser
  * (`ProtoSchema.parse`) or a programmatic field list. Decode/encode
  * run as per-partition batches (mapPartitions) like the Avro path.
  */
object ProtoWire {

  sealed trait PType { def dataType: DataType }
  case object PInt32 extends PType { val dataType: DataType = IntegerType }
  case object PInt64 extends PType { val dataType: DataType = LongType }
  case object PSInt32 extends PType { val dataType: DataType = IntegerType }
  case object PSInt64 extends PType { val dataType: DataType = LongType }
  case object PBool extends PType { val dataType: DataType = BooleanType }
  case object PDouble extends PType { val dataType: DataType = DoubleType }
  case object PFloat extends PType { val dataType: DataType = FloatType }
  case object PString extends PType { val dataType: DataType = StringType }
  case object PBytes extends PType { val dataType: DataType = BinaryType }

  final case class Field(number: Int, name: String, ptype: PType)

  /** Parse one flat `message Name { int64 id = 1; … }` block. */
  object ProtoSchema {
    private val typeMap: Map[String, PType] = Map(
      "int32" -> PInt32, "int64" -> PInt64, "uint32" -> PInt32, "uint64" -> PInt64,
      "sint32" -> PSInt32, "sint64" -> PSInt64, "bool" -> PBool,
      "double" -> PDouble, "float" -> PFloat, "string" -> PString, "bytes" -> PBytes)

    def parse(proto: String): Seq[Field] = {
      val open = proto.indexOf('{')
      val close = proto.lastIndexOf('}')
      if (open < 0 || close < open)
        throw new IllegalArgumentException("proto schema must contain a `message Name { ... }` block")
      // drop // line comments before splitting field declarations on ';'
      val body = proto.substring(open + 1, close).linesIterator
        .map(l => l.indexOf("//") match { case -1 => l; case i => l.substring(0, i) })
        .mkString("\n")
      body.split(';').map(_.trim).filter(_.nonEmpty).map { line =>
        // [optional] <type> <name> = <number>
        val toks = line.replace("=", " = ").split("\\s+").filterNot(_ == "optional").toList
        toks match {
          case t :: _ if t == "repeated" || t == "map" || t.startsWith("map<") =>
            throw new IllegalArgumentException(
              s"unsupported proto field (repeated/map fields are out of scope): $line")
          case t :: name :: "=" :: num :: Nil if num.forall(_.isDigit) && num.nonEmpty =>
            Field(num.toInt, name,
              typeMap.getOrElse(t, throw new IllegalArgumentException(s"unsupported proto type $t")))
          case _ =>
            throw new IllegalArgumentException(
              s"malformed proto field (expected `<type> <name> = <number>`): $line")
        }
      }.toSeq
    }
  }

  def sparkSchema(fields: Seq[Field]): StructType =
    StructType(fields.map(f => StructField(f.name, f.ptype.dataType, nullable = true)))

  // ---- wire primitives (public protobuf encoding spec) ----

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
    out.write(v.toInt)
  }
  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def wireType(t: PType): Int = t match {
    case PDouble => 1
    case PFloat => 5
    case PString | PBytes => 2
    case _ => 0
  }

  /** Encode one row (values aligned with `fields`) to message bytes.
    * Null values are simply omitted (proto3 absent-field semantics). */
  def encodeRow(values: Seq[Any], fields: Seq[Field]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    fields.zip(values).foreach { case (f, v) =>
      if (v != null) {
        writeVarint(out, ((f.number.toLong << 3) | wireType(f.ptype)))
        f.ptype match {
          case PInt32 => writeVarint(out, v.asInstanceOf[Int].toLong)
          case PInt64 => writeVarint(out, v.asInstanceOf[Long])
          case PSInt32 => writeVarint(out, zigzag(v.asInstanceOf[Int].toLong))
          case PSInt64 => writeVarint(out, zigzag(v.asInstanceOf[Long]))
          case PBool => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
          case PDouble =>
            val bits = java.lang.Double.doubleToLongBits(v.asInstanceOf[Double])
            (0 until 8).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
          case PFloat =>
            val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
            (0 until 4).foreach(i => out.write(((bits >>> (8 * i)) & 0xFF).toInt))
          case PString =>
            val b = v.asInstanceOf[String].getBytes("UTF-8")
            writeVarint(out, b.length.toLong); out.write(b)
          case PBytes =>
            val b = v.asInstanceOf[Array[Byte]]
            writeVarint(out, b.length.toLong); out.write(b)
        }
      }
    }
    out.toByteArray
  }

  /** Field-number → output-slot lookup as a flat array, built ONCE per
    * call site (per partition in `decodeProtobuf`) so the per-row decode
    * loop does no map construction or boxing. */
  private[sources] final class FieldIndex(fields: Seq[Field]) extends Serializable {
    val farr: Array[Field] = fields.toArray
    private val maxNum: Int = farr.foldLeft(0)((m, f) => math.max(m, f.number))
    // flat array only while it stays small: proto field numbers are
    // valid up to 2^29-1 (high numbers are conventional for extensions),
    // and sizing an array by the LARGEST number would allocate hundreds
    // of MB per partition for a one-field message. Past 64k, a map.
    private val dense = maxNum <= (1 << 16)
    private val slot: Array[Int] =
      if (!dense) null
      else {
        val a = Array.fill(maxNum + 1)(-1)
        farr.zipWithIndex.foreach { case (f, i) => a(f.number) = i }
        a
      }
    private val slotMap: Map[Int, Int] =
      if (dense) null else farr.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
    def lookup(num: Int): Int =
      if (dense) { if (num >= 0 && num <= maxNum) slot(num) else -1 }
      else slotMap.getOrElse(num, -1)
  }

  /** The wire type a field's declared scalar type is encoded with —
    * a record whose ACTUAL wire type differs (schema evolution the
    * local schema hasn't caught up with) must be SKIPPED by its real
    * wire type, per spec, not decoded by the stale local type (which
    * desynchronizes the byte walk and garbles every later field). */
  private def expectedWireType(t: PType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PBool => 0
    case PDouble => 1
    case PString | PBytes => 2
    case PFloat => 5
  }

  /** Decode message bytes to values aligned with `fields` (null for
    * absent fields; unknown field numbers are skipped, per spec).
    * Convenience overload — builds the lookup per call; the DataFrame
    * path uses the `FieldIndex` overload built once per partition. */
  def decodeRow(bytes: Array[Byte], fields: Seq[Field]): Array[Any] =
    decodeRow(bytes, new FieldIndex(fields))

  private[sources] def decodeRow(bytes: Array[Byte], fidx: FieldIndex): Array[Any] = {
    val out = new Array[Any](fidx.farr.length)
    var p = 0
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while ({ val b = bytes(p); p += 1; acc |= (b & 0x7FL) << shift; shift += 7; (b & 0x80) != 0 }) ()
      acc
    }
    while (p < bytes.length) {
      val tag = varint()
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      val i = fidx.lookup(num)
      if (i >= 0 && wt == expectedWireType(fidx.farr(i).ptype)) {
          val f = fidx.farr(i)
          f.ptype match {
            case PInt32 => out(i) = varint().toInt
            case PInt64 => out(i) = varint()
            case PSInt32 => out(i) = unzigzag(varint()).toInt
            case PSInt64 => out(i) = unzigzag(varint())
            case PBool => out(i) = varint() != 0L
            case PDouble =>
              var bits = 0L
              (0 until 8).foreach(k => { bits |= (bytes(p).toLong & 0xFF) << (8 * k); p += 1 })
              out(i) = java.lang.Double.longBitsToDouble(bits)
            case PFloat =>
              var bits = 0
              (0 until 4).foreach(k => { bits |= (bytes(p).toInt & 0xFF) << (8 * k); p += 1 })
              out(i) = java.lang.Float.intBitsToFloat(bits)
            case PString =>
              val n = varint().toInt
              out(i) = new String(bytes, p, n, "UTF-8"); p += n
            case PBytes =>
              val n = varint().toInt
              out(i) = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n
          }
      } else { // unknown field OR wire-type mismatch: skip by wire type
          wt match {
            case 0 => varint()
            case 1 => p += 8
            case 2 => val n = varint().toInt; p += n
            case 5 => p += 4
            case other => throw new IllegalArgumentException(s"unsupported wire type $other")
          }
      }
    }
    out
  }

  // ---- DataFrame surface (mirrors Serde.decodeAvro/encodeAvro) ----

  /** Decode a binary-protobuf payload column into typed columns next to
    * the frame's other columns. */
  def decodeProtobuf(df: DataFrame, payloadCol: String, proto: String): DataFrame = {
    val fields = ProtoSchema.parse(proto)
    val valueSchema = sparkSchema(fields)
    val passthrough = df.schema.fields.filterNot(_.name == payloadCol)
    val outSchema = StructType(passthrough ++ valueSchema.fields)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    val passIdx = passthrough.map(f => df.schema.fieldIndex(f.name))
    val fidx = new FieldIndex(fields) // built once, shipped to executors; no per-row setup
    val res = df.mapPartitions { it =>
      it.map { row =>
        val bytes = row.getAs[Array[Byte]](payloadIdx)
        // null payload (tombstone / outer-join null) → all-null columns,
        // which the schema already declares nullable — not an NPE
        val decoded =
          if (bytes == null) new Array[Any](fidx.farr.length)
          else decodeRow(bytes, fidx)
        Row.fromSeq(passIdx.toIndexedSeq.map(row.get) ++ decoded)
      }
    }(Encoders.row(outSchema))
    res.toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }

  /** Encode the schema's fields from each row into one binary-protobuf
    * payload column. */
  def encodeProtobuf(df: DataFrame, proto: String, payloadCol: String = "value"): DataFrame = {
    val fields = ProtoSchema.parse(proto)
    val inSchema = df.schema
    val idxs = fields.map(f => inSchema.fieldIndex(f.name))
    val outSchema = StructType(inSchema.fields :+ StructField(payloadCol, BinaryType, nullable = false))
    val res = df.mapPartitions { it =>
      it.map { row =>
        Row.fromSeq(row.toSeq :+ encodeRow(idxs.map(row.get), fields))
      }
    }(Encoders.row(outSchema))
    res.toDF(outSchema.fieldNames.toIndexedSeq: _*)
  }
}
