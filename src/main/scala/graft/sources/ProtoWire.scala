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

  /** Protobuf's spec maximum field number, 2^29 - 1 (the tag packs the
    * number into the bits above the 3-bit wire type of a 32-bit tag). */
  private val MaxFieldNumber = 536870911L

  sealed trait PType { def dataType: DataType }
  case object PInt32 extends PType { val dataType: DataType = IntegerType }
  case object PInt64 extends PType { val dataType: DataType = LongType }
  /** uint32 surfaces as LongType: its value range (0..2³²−1) does not
    * fit a signed Int, and narrowing would silently decode e.g.
    * 3,000,000,000 as a negative number. (uint64 keeps LongType with
    * sign reinterpretation above 2⁶³−1 — the standard Java convention.) */
  case object PUInt32 extends PType { val dataType: DataType = LongType }
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
      "int32" -> PInt32, "int64" -> PInt64, "uint32" -> PUInt32, "uint64" -> PInt64,
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
            // the spec's field-number range is [1, 2^29-1]; 0 and larger
            // numbers encode to tags every standard protobuf consumer
            // rejects as corrupt — fail at schema parse, not on the
            // topic. toLong first: a >Int.MaxValue literal must hit THIS
            // message, not a bare NumberFormatException.
            val n = if (num.length <= 18) num.toLong else Long.MaxValue
            if (n < 1 || n > MaxFieldNumber)
              throw new IllegalArgumentException(
                s"proto field number must be in [1, $MaxFieldNumber]: $line")
            // protoc also rejects the reserved range — a schema that
            // parses here but cannot compile for standard consumers
            // would strand the data it wrote (same fail-at-parse intent
            // as the range check above)
            if (n >= 19000 && n <= 19999)
              throw new IllegalArgumentException(
                s"proto field numbers 19000-19999 are reserved: $line")
            // protoc's identifier rule — a name like 'foo-bar' or '0bad'
            // parses here but cannot compile for standard consumers,
            // stranding the data it wrote (the same fail-at-parse intent
            // as the number checks above; r17 review)
            if (!name.matches("[A-Za-z_][A-Za-z0-9_]*"))
              throw new IllegalArgumentException(
                s"proto field name must be an identifier ([A-Za-z_][A-Za-z0-9_]*): $line")
            Field(n.toInt, name,
              typeMap.getOrElse(t, throw new IllegalArgumentException(s"unsupported proto type $t")))
          case _ =>
            throw new IllegalArgumentException(
              s"malformed proto field (expected `<type> <name> = <number>`): $line")
        }
      }.toSeq match {
        case fs =>
          // duplicate numbers/names fail at parse (protoc's "field
          // number N already used"): FieldIndex keeps one slot per
          // number, so a duplicate would silently route every value to
          // the LAST field and leave the earlier column forever null;
          // duplicate names would emit a duplicate-column Spark schema
          val dupNum = fs.groupBy(_.number).collect { case (n, g) if g.size > 1 => n }
          require(dupNum.isEmpty,
            s"proto field number(s) used more than once: ${dupNum.mkString(", ")}")
          val dupName = fs.groupBy(_.name).collect { case (n, g) if g.size > 1 => n }
          require(dupName.isEmpty,
            s"proto field name(s) declared more than once: ${dupName.mkString(", ")}")
          fs
      }
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

  // the ONE type→wire-type mapping, used by BOTH encode (tag emission)
  // and decode (mismatch-skip classification): two hand-maintained
  // copies could drift, making the decoder silently skip every value
  // the encoder writes — all-null columns with no error anywhere
  private def wireType(t: PType): Int = expectedWireType(t)

  /** Encode one row (values aligned with `fields`) to message bytes.
    * Null values are simply omitted (proto3 absent-field semantics). */
  def encodeRow(values: Seq[Any], fields: Seq[Field]): Array[Byte] = {
    // zip would silently TRUNCATE a short values seq — trailing fields
    // vanish from the wire and decode as all-NULL columns with no
    // error anywhere (r13 review; the module's contract is fail-loud)
    require(values.length == fields.length,
      s"encodeRow got ${values.length} values for ${fields.length} fields")
    val out = new java.io.ByteArrayOutputStream()
    encodeInto(out, values.toIndexedSeq, fields.toIndexedSeq)
    out.toByteArray
  }

  /** The encode loop against a caller-owned buffer — the DataFrame
    * path reuses ONE reset() buffer and value array per partition
    * (the encodeAvro hoist pattern) instead of allocating a stream,
    * an index seq, and zip tuples per record (r13 review). */
  private[sources] def encodeInto(out: java.io.ByteArrayOutputStream,
                                  values: IndexedSeq[Any],
                                  fields: IndexedSeq[Field]): Unit = {
    var j = 0
    while (j < fields.length) {
      val f = fields(j)
      val v = values(j)
      if (v != null) {
        writeVarint(out, ((f.number.toLong << 3) | wireType(f.ptype)))
        f.ptype match {
          case PInt32 => writeVarint(out, v.asInstanceOf[Int].toLong)
          case PInt64 => writeVarint(out, v.asInstanceOf[Long])
          // range-checked, not silently masked: a Long outside
          // [0, 2^32) truncated by & would put a DIFFERENT number on
          // the wire with no error anywhere (the module's fail-loud
          // contract). In range, the mask also keeps the varint at ≤5
          // bytes instead of a 10-byte sign extension.
          case PUInt32 =>
            val u = v.asInstanceOf[Long]
            if (u < 0L || u > 0xFFFFFFFFL)
              throw new IllegalArgumentException(
                s"uint32 field '${f.name}' value $u is outside [0, 4294967295]")
            writeVarint(out, u & 0xFFFFFFFFL)
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
      j += 1
    }
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
    case PInt32 | PInt64 | PUInt32 | PSInt32 | PSInt64 | PBool => 0
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

  /** Decode failure on corrupt input. Truncated or malformed bytes must
    * FAIL, not decode silently wrong: `Arrays.copyOfRange` zero-pads past
    * the end, `bytes(p)` past-the-end garbles, and an overlong varint
    * wraps its shift — each would fabricate plausible values from a
    * corrupt Kafka message. */
  final class ProtoDecodeException(msg: String) extends IllegalArgumentException(msg)

  private[sources] def decodeRow(bytes: Array[Byte], fidx: FieldIndex): Array[Any] = {
    val out = new Array[Any](fidx.farr.length)
    var p = 0
    // ONE strict UTF-8 decoder per row, created only if a string field
    // occurs (r15 review: a fresh CharsetDecoder per string FIELD put
    // millions of short-lived allocations in the hot path this module
    // elsewhere hoists — the passIdx/encode-buffer pattern). reset()
    // before reuse; CharsetDecoder is single-thread like `out`/`p`.
    var utf8: java.nio.charset.CharsetDecoder = null
    def utf8Decoder(): java.nio.charset.CharsetDecoder = {
      if (utf8 == null)
        utf8 = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
      else utf8.reset()
      utf8
    }
    def fail(what: String): Nothing =
      throw new ProtoDecodeException(s"$what at byte $p of ${bytes.length}")
    def varint(): Long = {
      var shift = 0; var acc = 0L
      while ({
        if (p >= bytes.length) fail("truncated varint")
        if (shift > 63) fail("malformed varint (more than 10 bytes)")
        val b = bytes(p); p += 1; acc |= (b & 0x7FL) << shift; shift += 7; (b & 0x80) != 0
      }) ()
      acc
    }
    // length-delimited payload length: non-negative and inside the buffer.
    // Compare as `n > remaining`, NOT `p + n > length`: a crafted 9-byte
    // varint can carry Long.MaxValue, and p + n would overflow NEGATIVE,
    // slipping past both checks — n.toInt = -1 then throws raw
    // StringIndexOutOfBounds (escaping permissive mode's
    // ProtoDecodeException catch, one poison message crash-looping the
    // stream) or walks the skip cursor BACKWARDS (r11 review)
    def lenPrefix(): Int = {
      val n = varint()
      if (n < 0 || n > bytes.length - p) fail(s"length-delimited field of $n bytes overruns buffer")
      n.toInt
    }
    def needFixed(n: Int): Unit = if (p + n > bytes.length) fail(s"truncated fixed$n field")
    while (p < bytes.length) {
      val tag = varint()
      val num0 = tag >>> 3
      // field numbers are spec-capped at 2^29-1 (and 0 is reserved), so
      // a larger value can only be corruption — and truncating it with
      // .toInt would ALIAS it onto a declared field (e.g. (2^32+1)<<3 →
      // field 1) and fabricate a value, the exact silent-wrong-decode
      // this module's contract forbids
      if (num0 < 1 || num0 > MaxFieldNumber) fail(s"invalid field number $num0")
      val num = num0.toInt
      val wt = (tag & 7).toInt
      val i = fidx.lookup(num)
      if (i >= 0 && wt == expectedWireType(fidx.farr(i).ptype)) {
          val f = fidx.farr(i)
          f.ptype match {
            case PInt32 =>
              // TWO conformant encodings exist for a negative int32:
              // the 64-bit sign extension (spec canonical; varint()
              // reads it back as the negative Long) and the
              // non-sign-extended 32-bit form in [2^31, 2^32) that
              // lenient encoders emit and canonical parsers (prost,
              // protobuf-java) accept by truncating to 32 bits — r15's
              // range check rejected the latter as corruption (r15
              // advice). Accept both; fail only OUTSIDE both forms,
              // where .toInt would alias onto a DIFFERENT in-range
              // number (silently evolved int64 / corruption).
              val v = varint()
              if ((v >= Int.MinValue && v <= Int.MaxValue) ||
                  (v >= 0x80000000L && v <= 0xFFFFFFFFL))
                out(i) = v.toInt
              else fail(s"int32 field '${f.name}' varint $v outside both 32-bit forms")
            case PInt64 => out(i) = varint()
            case PUInt32 =>
              // fail, don't mask: a varint past 2^32 silently aliased
              // onto a DIFFERENT in-range number — the exact class the
              // encoder's own range check and the field-number gate
              // reject (r13 review; protobuf-java truncates here, but
              // this module's strict contract is fail-on-corrupt)
              val u = varint()
              if (u < 0L || u > 0xFFFFFFFFL)
                fail(s"uint32 field '${fidx.farr(i).name}' varint $u outside [0, 4294967295]")
              out(i) = u
            case PSInt32 =>
              // same aliasing class as int32 — but UNLIKE int32, no
              // second conformant form exists: zigzag32(n) ==
              // zigzag64(n) for every int32 n (both give 2|n|-1 / 2n
              // < 2^32), so a raw varint ≥ 2^32 here is sint64 data or
              // corruption under every conformant encoder, lenient
              // included (r15 advice adjudication)
              val z = unzigzag(varint())
              if (z < Int.MinValue || z > Int.MaxValue)
                fail(s"sint32 field '${f.name}' decodes to $z outside Int range")
              out(i) = z.toInt
            case PSInt64 => out(i) = unzigzag(varint())
            case PBool => out(i) = varint() != 0L
            case PDouble =>
              needFixed(8)
              var bits = 0L
              (0 until 8).foreach(k => { bits |= (bytes(p).toLong & 0xFF) << (8 * k); p += 1 })
              out(i) = java.lang.Double.longBitsToDouble(bits)
            case PFloat =>
              needFixed(4)
              var bits = 0
              (0 until 4).foreach(k => { bits |= (bytes(p).toInt & 0xFF) << (8 * k); p += 1 })
              out(i) = java.lang.Float.intBitsToFloat(bits)
            case PString =>
              // proto3 requires string fields to be VALID UTF-8
              // (protobuf-java throws InvalidProtocolBufferException);
              // the replacement-char decode fabricated U+FFFD text from
              // corrupt bytes in the mode documented to fail loudly
              // (r13 review). Permissive mode catches the
              // ProtoDecodeException upstream → null row, as for every
              // other corruption class.
              val n = lenPrefix()
              out(i) =
                try utf8Decoder().decode(java.nio.ByteBuffer.wrap(bytes, p, n)).toString
                catch { case _: java.nio.charset.CharacterCodingException =>
                  fail(s"string field '${fidx.farr(i).name}' carries invalid UTF-8") }
              p += n
            case PBytes =>
              val n = lenPrefix()
              out(i) = java.util.Arrays.copyOfRange(bytes, p, p + n); p += n
          }
      } else { // unknown field OR wire-type mismatch: skip by wire type
          wt match {
            case 0 => varint()
            case 1 => needFixed(8); p += 8
            // two statements, NOT `p += lenPrefix()`: the += reads OLD p
            // before lenPrefix() advances it past the length varint
            case 2 => val n = lenPrefix(); p += n
            case 5 => needFixed(4); p += 4
            case other => throw new ProtoDecodeException(s"unsupported wire type $other at byte $p")
          }
      }
    }
    out
  }

  // ---- DataFrame surface (mirrors Serde.decodeAvro/encodeAvro) ----

  /** Decode a binary-protobuf payload column into typed columns next to
    * the frame's other columns (clash guard / tombstone handling /
    * column ordering shared with the Avro path via
    * `Serde.decodeWithPayload`).
    *
    * `permissive = false` (default) keeps the batch fail-on-corrupt
    * contract: one garbled record fails the job rather than decoding
    * silently wrong. `permissive = true` is the STREAMING mode — a
    * corrupt payload decodes to all-null columns (decodeAvro's
    * standing behavior), because a strict decode on a stream turns one
    * poison Kafka message into a checkpoint-pinned crash loop: the
    * failed task re-reads the same offset forever.
    *
    * PROTO3 INTEROP NOTE: absent fields surface as NULL. Standard
    * proto3 encoders OMIT default-valued scalars (0 / "" / false) from
    * the wire, so data written by protoc-generated code decodes those
    * values as NULL here, not as the default — `WHERE count = 0` will
    * not match them (use `coalesce(count, 0)` when consuming external
    * proto3 data). Round-trips through this module's own encodeRow are
    * unaffected: it writes explicit values for every field. NULL is
    * kept deliberately — it preserves the absent-vs-default distinction
    * SQL can express and proto3 cannot. */
  def decodeProtobuf(df: DataFrame, payloadCol: String, proto: String,
                     permissive: Boolean = false): DataFrame = {
    val fields = ProtoSchema.parse(proto)
    val fidx = new FieldIndex(fields) // built once, shipped to executors; no per-row setup
    val n = fields.length
    Serde.decodeWithPayload(df, payloadCol, sparkSchema(fields), "proto") { () =>
      (bytes: Array[Byte]) =>
        if (!permissive) decodeRow(bytes, fidx)
        else try decodeRow(bytes, fidx)
        catch { case _: ProtoDecodeException => new Array[Any](n) }
    }
  }

  /** Encode the schema's fields from each row into one binary-protobuf
    * payload column. */
  def encodeProtobuf(df: DataFrame, proto: String, payloadCol: String = "value"): DataFrame = {
    val fields = ProtoSchema.parse(proto)
    val inSchema = df.schema
    // validate types on the DRIVER: a mismatch would otherwise surface
    // as a per-row ClassCastException inside mapPartitions, mid-job.
    // SESSION-resolver lookups (Cols.fieldOf): an exact inSchema(name)
    // threw a raw 'Field does not exist' for a case-variant column the
    // session resolves — while the encodeWithPayload scaffolding this
    // feeds is deliberately resolver-aware (r15 review)
    fields.foreach { f =>
      val actual = graft.operators.Cols.fieldOf(df, f.name).dataType
      require(actual == f.ptype.dataType,
        s"column '${f.name}' is $actual but proto field expects ${f.ptype.dataType} " +
          s"(cast the column before encoding)")
    }
    val idxs = fields.map(f =>
      inSchema.fieldIndex(graft.operators.Cols.fieldOf(df, f.name).name))
    // replace-in-place / append semantics live in the ONE shared
    // scaffolding (Serde.encodeWithPayload, the encode twin of
    // decodeWithPayload) — this copy and encodeAvro's had already
    // started to diverge (r11 review)
    // per-PARTITION buffer + value array, reset per row (the encodeAvro
    // hoist pattern): the old per-row encodeRow(idxs.map(...)) paid a
    // fresh stream, an index seq, and zip tuples per record (r13 review)
    Serde.encodeWithPayload(df, payloadCol, () => {
      val farr = fields.toIndexedSeq
      val iarr = idxs.toArray
      val out = new java.io.ByteArrayOutputStream()
      val vals = new Array[Any](iarr.length)
      // one wrapper for the partition's lifetime — it views the SAME
      // mutable array the row loop refills
      val valsSeq = scala.collection.immutable.ArraySeq.unsafeWrapArray(vals)
      row => {
        out.reset()
        var j = 0
        while (j < iarr.length) { vals(j) = row.get(iarr(j)); j += 1 }
        encodeInto(out, valsSeq, farr)
        out.toByteArray
      }
    })
  }
}
