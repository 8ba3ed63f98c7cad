package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession
import ProtoWire._

/** Wire-format compatibility (the canonical fixtures from the public
  * protobuf encoding spec) + DataFrame round-trips. */
class ProtoWireSpec extends AnyFunSuite with SparkTestSession {

  test("canonical wire fixtures: varint 150, length-delimited string, zigzag") {
    // protobuf docs: message Test1 { int32 a = 1; } with a = 150 → 08 96 01
    val f1 = Seq(Field(1, "a", PInt32))
    assert(encodeRow(Seq(150), f1).map(_ & 0xFF).toSeq == Seq(0x08, 0x96, 0x01))
    assert(decodeRow(Array(0x08, 0x96.toByte, 0x01), f1).toSeq == Seq(150))

    // message Test2 { string b = 2; } with b = "testing" → 12 07 "testing"
    val f2 = Seq(Field(2, "b", PString))
    val enc2 = encodeRow(Seq("testing"), f2)
    assert(enc2.take(2).map(_ & 0xFF).toSeq == Seq(0x12, 0x07))
    assert(new String(enc2.drop(2), "UTF-8") == "testing")

    // zigzag: sint encodes -1 → varint 1, -2 → 3 (spec table)
    val fz = Seq(Field(1, "z", PSInt64))
    assert(encodeRow(Seq(-1L), fz).map(_ & 0xFF).toSeq == Seq(0x08, 0x01))
    assert(encodeRow(Seq(-2L), fz).map(_ & 0xFF).toSeq == Seq(0x08, 0x03))
    assert(decodeRow(encodeRow(Seq(-123456789L), fz), fz).toSeq == Seq(-123456789L))
  }

  test("unknown fields are skipped; absent fields decode as null") {
    val writerFields = Seq(Field(1, "a", PInt64), Field(2, "s", PString), Field(3, "d", PDouble))
    val bytes = encodeRow(Seq(42L, "x", 2.5), writerFields)
    // reader only knows fields 1 and 3 → field 2 skipped by wire type
    val readerFields = Seq(Field(1, "a", PInt64), Field(3, "d", PDouble), Field(9, "missing", PString))
    assert(decodeRow(bytes, readerFields).toSeq == Seq(42L, 2.5, null))
  }

  test("wire-type mismatch skips by the RECORD's wire type; null payload decodes to nulls") {
    // writer evolved field 2 to string; reader still declares int64 —
    // decoding the string as a varint would desynchronize the byte walk
    // and garble field 3. Spec behavior: skip the mismatched field.
    val writerFields = Seq(Field(1, "a", PInt64), Field(2, "s", PString), Field(3, "d", PDouble))
    val bytes = encodeRow(Seq(42L, "hello world", 2.5), writerFields)
    val staleReader = Seq(Field(1, "a", PInt64), Field(2, "s", PInt64), Field(3, "d", PDouble))
    assert(decodeRow(bytes, staleReader).toSeq == Seq(42L, null, 2.5))
    // null payload column → all-null decoded columns, not an NPE
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType, nullable = false),
      StructField("value", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, bytes), org.apache.spark.sql.Row(2L, null))
    val df = spark.createDataFrame(rows, schema)
    val out = ProtoWire.decodeProtobuf(df, "value",
      "message M { int64 a = 1; string s = 2; double d = 3; }")
      .collect().map(r => r.getAs[Long]("k") -> r).toMap
    assert(out(1L).getAs[Long]("a") == 42L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("a")))
  }

  test("minimal .proto message parser") {
    val fields = ProtoSchema.parse(
      """message Order {
           int64 order_id = 1;
           string symbol = 2;
           double price = 3;
           optional bool filled = 4;
           sint64 delta = 5;
           bytes payload = 6;
         }""")
    assert(fields.map(f => (f.number, f.name)) ==
      Seq((1, "order_id"), (2, "symbol"), (3, "price"), (4, "filled"), (5, "delta"), (6, "payload")))
    assert(sparkSchema(fields).fieldNames.toSeq ==
      Seq("order_id", "symbol", "price", "filled", "delta", "payload"))
  }

  test("schema parser: comments tolerated; malformed / repeated / map fields rejected descriptively") {
    // // comments and blank declarations are fine
    val fields = ProtoSchema.parse(
      """message C {
           int64 id = 1; // primary key
           // a full-line comment
           string s = 2;
         }""")
    assert(fields.map(_.name) == Seq("id", "s"))

    val noEq = intercept[IllegalArgumentException](
      ProtoSchema.parse("message M { int64 id 1; }"))
    assert(noEq.getMessage.contains("int64 id 1"))

    val rep = intercept[IllegalArgumentException](
      ProtoSchema.parse("message M { repeated int64 ids = 1; }"))
    assert(rep.getMessage.contains("repeated"))

    val mp = intercept[IllegalArgumentException](
      ProtoSchema.parse("message M { map<string, int32> kv = 1; }"))
    assert(mp.getMessage.toLowerCase.contains("map"))

    val noBlock = intercept[IllegalArgumentException](ProtoSchema.parse("int64 id = 1;"))
    assert(noBlock.getMessage.contains("message"))

    // protoc rejects 19000-19999 (reserved) — a schema that parses here
    // but can't compile for standard consumers would strand its data
    val reserved = intercept[IllegalArgumentException](
      ProtoSchema.parse("message M { int64 id = 19000; }"))
    assert(reserved.getMessage.contains("reserved"))
    assert(ProtoSchema.parse("message M { int64 id = 20000; }").head.number == 20000)

    // protoc's identifier rule (r17 review): 'foo-bar'/'0bad' parsed
    // here but cannot compile for standard consumers — the same
    // stranded-data outcome the reserved-range gate exists to prevent
    for (bad <- Seq("foo-bar", "0bad", "café")) {
      val e = intercept[IllegalArgumentException](
        ProtoSchema.parse(s"message M { int32 $bad = 1; }"))
      assert(e.getMessage.contains("identifier"), s"$bad: ${e.getMessage}")
    }
    assert(ProtoSchema.parse("message M { int32 _ok2 = 1; }").head.name == "_ok2")
  }

  test("round-trip property: random rows over every type survive encode→decode (ScalaCheck)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val fields = Seq(
      Field(1, "i32", PInt32), Field(2, "i64", PInt64),
      Field(3, "s32", PSInt32), Field(4, "s64", PSInt64),
      Field(5, "b", PBool), Field(6, "d", PDouble), Field(7, "f", PFloat),
      Field(8, "s", PString), Field(9, "raw", PBytes))
    val rowGen: Gen[Seq[Any]] = for {
      i32 <- Gen.oneOf(Gen.choose(Int.MinValue, Int.MaxValue), Gen.oneOf(0, -1, 1, Int.MaxValue, Int.MinValue))
      i64 <- Gen.oneOf(Gen.choose(Long.MinValue + 1, Long.MaxValue), Gen.oneOf(0L, -1L, Long.MaxValue))
      s32 <- Gen.choose(Int.MinValue, Int.MaxValue)
      s64 <- Gen.choose(Long.MinValue + 1, Long.MaxValue)
      b <- Gen.oneOf(true, false)
      d <- Gen.oneOf(Gen.choose(-1e300, 1e300), Gen.oneOf(0.0, -0.0, Double.MinPositiveValue, 1e-300))
      f <- Gen.choose(-1e30f, 1e30f)
      s <- Gen.oneOf(Gen.asciiPrintableStr, Gen.const("Ωé中🙂"), Gen.const(""))
      raw <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray)
      nulls <- Gen.listOfN(9, Gen.prob(0.15))
    } yield Seq[Any](i32, i64, s32, s64, b, d, f, s, raw)
      .zip(nulls).map { case (v, isNull) => if (isNull) null else v }
    (0 until 200).foreach { n =>
      val row = rowGen(Gen.Parameters.default, Seed(777L + n)).get
      val back = decodeRow(encodeRow(row, fields), fields)
      row.zip(back).zipWithIndex.foreach { case ((expect, got), idx) =>
        (expect, got) match {
          case (a: Array[Byte], b: Array[Byte]) => assert(a.sameElements(b), s"field $idx seed $n")
          case (a, b) => assert(a == b, s"field $idx seed $n: $a != $b")
        }
      }
    }
  }

  test("uint32 surfaces as LONG: values above Int.MaxValue decode unharmed") {
    val fields = ProtoSchema.parse("message U { uint32 n = 1; uint64 m = 2; }")
    assert(fields.head.ptype == PUInt32 && fields.head.ptype.dataType.typeName == "long")
    // 3,000,000,000 does not fit a signed Int — the old PInt32 mapping
    // silently decoded it negative
    val big = 3000000000L
    val back = decodeRow(encodeRow(Seq(big, 42L), fields), fields)
    assert(back(0) == big && back(1) == 42L)
  }

  test("corrupt input FAILS decode instead of fabricating values") {
    val fields = ProtoSchema.parse("message C { bytes b = 1; double d = 2; int64 i = 3; }")
    val good = encodeRow(Seq(Array[Byte](1, 2, 3, 4, 5), 1.5, 7L), fields)
    // truncation mid length-delimited payload: zero-padding would have
    // fabricated a plausible 5-byte value
    val truncated = java.util.Arrays.copyOfRange(good, 0, 4)
    val e1 = intercept[ProtoWire.ProtoDecodeException](decodeRow(truncated, fields))
    assert(e1.getMessage.contains("overruns") || e1.getMessage.contains("truncated"))
    // truncated fixed64
    val donly = encodeRow(Seq(null, 1.5, null), fields)
    val dTrunc = java.util.Arrays.copyOfRange(donly, 0, donly.length - 3)
    intercept[ProtoWire.ProtoDecodeException](decodeRow(dTrunc, fields))
    // malformed varint: 11 continuation bytes
    val badVarint = Array.fill[Byte](12)(0x80.toByte)
    badVarint(0) = ((3 << 3) | 0).toByte // field 3, wiretype 0
    intercept[ProtoWire.ProtoDecodeException](decodeRow(badVarint, fields))
    // corrupt tag whose field number exceeds 2^29-1: truncating it to
    // Int would ALIAS (2^32+1)<<3 onto declared field 1 and fabricate a
    // value of 99 — must fail as corruption instead
    val aliasTag = new java.io.ByteArrayOutputStream()
    def vint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { aliasTag.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      aliasTag.write(v.toInt)
    }
    vint(((1L << 32) + 1L) << 3); vint(99L)
    val e2 = intercept[ProtoWire.ProtoDecodeException](decodeRow(aliasTag.toByteArray, fields))
    assert(e2.getMessage.contains("invalid field number"))
    // field number 0 is reserved — also corruption
    intercept[ProtoWire.ProtoDecodeException](decodeRow(Array[Byte](0, 1), fields))
  }

  test("strict decode rejects invalid UTF-8 strings and out-of-range uint32 varints (r13 review)") {
    def vint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    // string field with invalid UTF-8 bytes: proto3 requires valid
    // UTF-8; replacement-char decode would fabricate U+FFFD text
    val sFields = ProtoSchema.parse("message S { string s = 1; }")
    val bad = new java.io.ByteArrayOutputStream()
    vint(bad, (1L << 3) | 2); vint(bad, 2L); bad.write(0xFF); bad.write(0xFE)
    val e1 = intercept[ProtoWire.ProtoDecodeException](decodeRow(bad.toByteArray, sFields))
    assert(e1.getMessage.contains("invalid UTF-8"), e1.getMessage)
    // uint32 varint past 2^32: masking would alias 2^32+5 onto 5
    val uFields = ProtoSchema.parse("message U { uint32 u = 1; }")
    val over = new java.io.ByteArrayOutputStream()
    vint(over, (1L << 3) | 0); vint(over, (1L << 32) + 5L)
    val e2 = intercept[ProtoWire.ProtoDecodeException](decodeRow(over.toByteArray, uFields))
    assert(e2.getMessage.contains("4294967295"), e2.getMessage)
    // and permissive mode nulls the row for both, never fabricates
    // (covered structurally: both throw ProtoDecodeException, the type
    // the permissive catch handles)
  }

  test("r15 review: int32/sint32 varints outside Int range fail instead of aliasing via .toInt") {
    def vint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7FL) != 0) { out.write(((v & 0x7F) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    // int32 varint 2^32+5 (an evolved int64 or a bit flip): .toInt
    // silently decoded it as 5 — the aliasing class the uint32 gate
    // already rejects
    val iFields = ProtoSchema.parse("message I { int32 x = 1; }")
    val over = new java.io.ByteArrayOutputStream()
    vint(over, (1L << 3) | 0); vint(over, (1L << 32) + 5L)
    val e1 = intercept[ProtoWire.ProtoDecodeException](decodeRow(over.toByteArray, iFields))
    assert(e1.getMessage.contains("int32"), e1.getMessage)
    // sint32 whose zigzag decode exceeds Int range
    val sFields = ProtoSchema.parse("message S { sint32 x = 1; }")
    val zover = new java.io.ByteArrayOutputStream()
    vint(zover, (1L << 3) | 0); vint(zover, (1L << 33) + 2L) // unzigzags to 2^32+1
    val e2 = intercept[ProtoWire.ProtoDecodeException](decodeRow(zover.toByteArray, sFields))
    assert(e2.getMessage.contains("sint32"), e2.getMessage)
    // conformant encodings stay legal: a negative int32 arrives as its
    // 64-bit sign extension and must decode exactly
    val neg = new java.io.ByteArrayOutputStream()
    vint(neg, (1L << 3) | 0); vint(neg, -7L)
    assert(decodeRow(neg.toByteArray, iFields).head == -7)
    val zneg = new java.io.ByteArrayOutputStream()
    vint(zneg, (1L << 3) | 0); vint(zneg, 13L) // zigzag(-7) = 13
    assert(decodeRow(zneg.toByteArray, sFields).head == -7)
    // r16 advice: the SECOND conformant int32 form — a lenient encoder's
    // non-sign-extended negative in [2^31, 2^32) (prost/protobuf-java
    // accept it by truncating to 32 bits) — must decode to the
    // two's-complement negative, not reject as corruption
    val trunc = new java.io.ByteArrayOutputStream()
    vint(trunc, (1L << 3) | 0); vint(trunc, 0xFFFFFFFBL) // 2^32-5 = trunc32(-5)
    assert(decodeRow(trunc.toByteArray, iFields).head == -5)
    val minT = new java.io.ByteArrayOutputStream()
    vint(minT, (1L << 3) | 0); vint(minT, 0x80000000L) // trunc32(Int.MinValue)
    assert(decodeRow(minT.toByteArray, iFields).head == Int.MinValue)
  }

  test("encodeRow rejects a values/fields length mismatch instead of truncating the wire (r13 review)") {
    val fields = ProtoSchema.parse("message M { int64 a = 1; string b = 2; int32 c = 3; }")
    val e = intercept[IllegalArgumentException](encodeRow(Seq(1L, "x"), fields))
    assert(e.getMessage.contains("2 values for 3 fields"))
  }

  test("schema parser rejects out-of-range field numbers (0, >2^29-1, >Long digits)") {
    // wire-illegal numbers must fail at schema parse, not produce bytes
    // every standard protobuf consumer rejects
    for (bad <- Seq("0", "536870912", "4294967296", "999999999999999999999")) {
      val e = intercept[IllegalArgumentException](
        ProtoSchema.parse(s"message M { int64 x = $bad; }"))
      assert(e.getMessage.contains("field number"), s"num=$bad got: ${e.getMessage}")
    }
    // boundary values stay legal
    assert(ProtoSchema.parse("message M { int64 x = 1; int64 y = 536870911; }").map(_.number)
      == Seq(1, 536870911))
  }

  test("duplicate field numbers/names reject; uint32 range-checks; payload replaces in place") {
    import spark.implicits._
    // protoc rejects a reused number; silently keeping the last slot
    // would leave the earlier column permanently null
    val dupNum = intercept[IllegalArgumentException](
      ProtoWire.ProtoSchema.parse("message M { int32 a = 1; int64 b = 1; }"))
    assert(dupNum.getMessage.contains("more than once"))
    intercept[IllegalArgumentException](
      ProtoWire.ProtoSchema.parse("message M { int32 a = 1; int64 a = 2; }"))
    // uint32 out of [0, 2^32): masked silently = a DIFFERENT number on the wire
    val proto = "message M { uint32 u = 1; }"
    val bad = Seq(Tuple1(4294967296L)).toDF("u")
    val e = intercept[Exception](ProtoWire.encodeProtobuf(bad, proto).collect())
    def chain(t: Throwable): Seq[Throwable] = if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(t => Option(t.getMessage).exists(_.contains("outside"))))
    // re-encoding a frame that already carries `value` keeps ONE value
    // column at its original POSITION
    val re = Seq((7L, Array[Byte](1, 2), "tail")).toDF("n", "value", "z")
      .withColumnRenamed("n", "u")
    val out = ProtoWire.encodeProtobuf(
      re.select(org.apache.spark.sql.functions.col("u").cast("long").as("u"),
        org.apache.spark.sql.functions.col("value"),
        org.apache.spark.sql.functions.col("z")), proto)
    assert(out.columns.toSeq == Seq("u", "value", "z"))
    assert(out.columns.count(_ == "value") == 1)
  }

  test("permissive decode nulls corrupt payloads instead of failing the stream") {
    import spark.implicits._
    val proto = "message M { int64 n = 1; string s = 2; }"
    val fields = ProtoSchema.parse(proto)
    val good = encodeRow(Seq(5L, "ok"), fields)
    val corrupt = Array.fill[Byte](12)(0x80.toByte) // unterminated varint
    val frames = Seq((1L, good), (2L, corrupt)).toDF("k", "value")
    // strict default: the poison record fails the job
    intercept[org.apache.spark.SparkException](
      ProtoWire.decodeProtobuf(frames, "value", proto).collect())
    // permissive: poison record → all-null columns, stream survives
    val rows = ProtoWire.decodeProtobuf(frames, "value", proto, permissive = true)
      .orderBy("k").collect()
    assert(rows(0).getAs[Long]("n") == 5L && rows(0).getAs[String]("s") == "ok")
    assert(rows(1).isNullAt(rows(1).fieldIndex("n")) && rows(1).isNullAt(rows(1).fieldIndex("s")))

    // a length prefix of Long.MaxValue (9-byte varint) used to overflow
    // the `p + n` bounds check NEGATIVE and escape permissive mode as a
    // raw StringIndexOutOfBoundsException — it must be ordinary
    // corruption: nulls in permissive mode, ProtoDecodeException strict
    val hugeLen = Array[Byte](0x12, // field 2 (s), wire type 2
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte,
      0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F)
    val frames2 = Seq((1L, good), (2L, hugeLen)).toDF("k", "value")
    val rows2 = ProtoWire.decodeProtobuf(frames2, "value", proto, permissive = true)
      .orderBy("k").collect()
    assert(rows2(1).isNullAt(rows2(1).fieldIndex("s")),
      "huge length prefix must null out in permissive mode, not throw past the catch")
    intercept[org.apache.spark.SparkException](
      ProtoWire.decodeProtobuf(frames2, "value", proto).collect())
  }

  test("driver-side validation: encode type mismatch and decode name collision fail before launch") {
    import spark.implicits._
    // IntegerType column vs int64 proto field → named driver error, not
    // a mid-job executor ClassCastException
    val df = Seq((1, "x")).toDF("n", "s")
    val e = intercept[IllegalArgumentException](
      ProtoWire.encodeProtobuf(df, "message M { int64 n = 1; string s = 2; }"))
    assert(e.getMessage.contains("n") && e.getMessage.contains("cast the column"))
    // decoded field shadowing a passthrough column → named error at
    // decode time, not an ambiguous-column blowup downstream
    val frames = Seq((7L, Array[Byte]())).toDF("doc_id", "value")
    val c = intercept[IllegalArgumentException](
      ProtoWire.decodeProtobuf(frames, "value", "message M { int64 doc_id = 1; }"))
    assert(c.getMessage.contains("collide") && c.getMessage.contains("doc_id"))
  }

  test("DataFrame round-trip: encode → decode preserves values, nulls, negatives, unicode") {
    import spark.implicits._
    val proto =
      """message Ev {
           int64 id = 1;
           string name = 2;
           double v = 3;
           sint64 delta = 4;
           bool ok = 5;
         }"""
    val df = Seq(
      (1L, "alice", 1.5, -10L, true),
      (2L, "Ωmega", -0.25, 0L, false),
      (3L, "", 1e18, Long.MinValue + 1, true)
    ).toDF("id", "name", "v", "delta", "ok")
    val encoded = ProtoWire.encodeProtobuf(df, proto, "value").select("id", "value")
    val decoded = ProtoWire.decodeProtobuf(encoded.withColumnRenamed("id", "oid"), "value", proto)
    val back = decoded.orderBy("id").collect().map(r =>
      (r.getAs[Long]("id"), r.getAs[String]("name"), r.getAs[Double]("v"),
        r.getAs[Long]("delta"), r.getAs[Boolean]("ok")))
    assert(back.toSeq == Seq(
      (1L, "alice", 1.5, -10L, true),
      (2L, "Ωmega", -0.25, 0L, false),
      (3L, "", 1e18, Long.MinValue + 1, true)))
    assert(decoded.columns.contains("oid")) // passthrough retained
  }
}
