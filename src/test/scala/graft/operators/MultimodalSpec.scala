package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Multimodal plumbing: schema contract, deterministic stub features,
  * null payloads, and the chunk-sampling stage. */
class MultimodalSpec extends AnyFunSuite with SparkTestSession {

  private lazy val media = {
    import spark.implicits._
    Seq(
      (1L, "image", "hello world payload"),
      (2L, "audio", ""),
      (3L, "video", "abcdefgh" * 40)
    ).toDF("media_id", "media_type", "s")
      .withColumn("payload", encode(col("s"), "UTF-8"))
      .drop("s")
  }

  test("extractFeatures: schema contract, byte counts, stub formula") {
    val out = Multimodal.extractFeatures(media, dim = 4)
    assert(out.schema == Multimodal.featureSchema)
    val rows = out.collect().map(r => r.getAs[Long]("media_id") ->
      (r.getAs[Int]("n_bytes"), r.getAs[scala.collection.Seq[Double]]("feature").toSeq)).toMap
    assert(rows(1L)._1 == "hello world payload".length)
    assert(rows(2L)._1 == 0)
    // replay the stub on the driver — must match exactly
    val expected = Multimodal.decodeStub("hello world payload".getBytes("UTF-8"), 4).toSeq
    assert(rows(1L)._2 == expected)
    assert(rows(2L)._2 == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("null payloads flow through as empty features, not failures") {
    val withNull = media.withColumn("payload",
      when(col("media_id") === 2L, lit(null).cast("binary")).otherwise(col("payload")))
    val out = Multimodal.extractFeatures(withNull, dim = 4).collect()
    val r2 = out.find(_.getAs[Long]("media_id") == 2L).get
    assert(r2.getAs[Int]("n_bytes") == 0)
    assert(r2.getAs[scala.collection.Seq[Double]]("feature").toSeq == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("resize downsamples payload and metadata together") {
    import org.apache.spark.sql.types._
    val withDims = media
      .withColumn("width", (length(col("payload")) * 2).cast(IntegerType))
      .withColumn("height", length(col("payload")).cast(IntegerType))
      .select("media_id", "media_type", "payload", "width", "height")
    val out = Multimodal.resize(withDims, factor = 4).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    val r3 = out(3L)
    assert(r3.getAs[Array[Byte]]("payload").length == (320 + 3) / 4)
    assert(r3.getAs[Int]("width") == 160 && r3.getAs[Int]("height") == 80)
    // empty payload survives; a DEGENERATE source dimension (0) stays
    // 0 — the min-1 clamp is for real dims shrinking below a pixel,
    // not for promoting degenerate media to plausible-looking 1px
    // (r13 review)
    assert(out(2L).getAs[Array[Byte]]("payload").length == 0)
    assert(out(2L).getAs[Int]("height") == 0)
    assert(out(2L).getAs[Int]("width") == 0)
  }

  test("sampleChunks emits every stride-th fixed-size chunk") {
    val out = Multimodal.sampleChunks(media.where(col("media_id") === 3L),
      chunkBytes = 64, stride = 2)
    val idx = out.collect().map(_.getAs[Int]("chunk_idx")).sorted
    // 320 bytes → 5 chunks of 64 → sampled indices 0, 2, 4
    assert(idx.toSeq == Seq(0, 2, 4))
    assert(out.collect().forall(_.getAs[Array[Byte]]("chunk").length == 64))
  }

  test("sampleChunks: trailing partial chunk kept, empty/null payloads emit no rows") {
    import spark.implicits._
    val m = Seq(
      (1L, "audio", Array.fill[Byte](100)(1)),   // 64 + 36-byte tail
      (2L, "audio", Array.empty[Byte]),          // no rows
      (3L, "audio", null.asInstanceOf[Array[Byte]])) // no rows
      .toDF("media_id", "media_type", "payload")
    val out = Multimodal.sampleChunks(m, chunkBytes = 64, stride = 1).collect()
    assert(out.map(_.getAs[Long]("media_id")).distinct.toSeq == Seq(1L))
    val chunks = out.sortBy(_.getAs[Int]("chunk_idx"))
      .map(r => r.getAs[Int]("chunk_idx") -> r.getAs[Array[Byte]]("chunk").length)
    // the 36-byte tail is a real chunk — not dropped because the payload
    // happens to exceed chunkBytes
    assert(chunks.toSeq == Seq(0 -> 64, 1 -> 36))
  }

  test("real PNG round-trip: encode on executors, decode recovers exact pixels") {
    import spark.implicits._
    val docs = Seq((0L, 100L), (5L, 999L), (12L, 256L), (77L, 3L))
      .toDF("doc_id", "n_chars")
    val media = Multimodal.pngMediaFromDocuments(docs)
    // payloads are genuine PNGs: spec-fixed 8-byte signature
    val sig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    media.collect().foreach { r =>
      assert(r.getAs[Array[Byte]]("payload").take(8).sameElements(sig))
    }
    val feats = Multimodal.decodeImageFeatures(media)
    assert(feats.schema == Multimodal.imageFeatureSchema)
    val byId = feats.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    Seq((0L, 100L), (5L, 999L), (12L, 256L), (77L, 3L)).foreach { case (id, len) =>
      val r = byId(id)
      val w = (id % 13 + 4).toInt; val h = (id % 7 + 4).toInt
      // byte-derived (IHDR) and pixel-derived dims agree with the contract
      assert(r.getAs[Int]("header_w") == w && r.getAs[Int]("width_px") == w)
      assert(r.getAs[Int]("header_h") == h && r.getAs[Int]("height_px") == h)
      // channel means are exact: red ramps 0..w-1 per row, green/blue solid
      assert(r.getAs[Double]("mean_r") == (w - 1) / 2.0)
      assert(r.getAs[Double]("mean_g") == (id % 256).toDouble)
      assert(r.getAs[Double]("mean_b") == (len % 256).toDouble)
    }
  }

  test("null n_chars degrades to a zero-length synth payload in every encoder (nullable documents schema)") {
    // documents.n_chars is nullable; getLong on a null row NPEs through
    // all task retries — each encoder must degrade instead
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_chars",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, null), org.apache.spark.sql.Row(2L, 50L))
    val docs = spark.createDataFrame(rows, schema)
    assert(Multimodal.pngMediaFromDocuments(docs).count() == 2)
    assert(Multimodal.wavMediaFromDocuments(docs).count() == 2)
    assert(Multimodal.videoMediaFromDocuments(docs).count() == 2)
  }

  test("real WAV round-trip: encode on executors, decode recovers exact PCM stats") {
    import spark.implicits._
    val docs = Seq((0L, 100L), (7L, 999L), (13L, 1L), (106L, 42L))
      .toDF("doc_id", "n_chars")
    val media = Multimodal.wavMediaFromDocuments(docs)
    media.collect().foreach { r =>
      val b = r.getAs[Array[Byte]]("payload")
      assert(new String(b.take(4), "US-ASCII") == "RIFF")
      assert(new String(b.slice(8, 12), "US-ASCII") == "WAVE")
    }
    val feats = Multimodal.decodeAudioFeatures(media)
    assert(feats.schema == Multimodal.audioFeatureSchema)
    val byId = feats.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    Seq((0L, 100L), (7L, 999L), (13L, 1L), (106L, 42L)).foreach { case (id, len) =>
      val r = byId(id)
      val rate = (8000 + (id % 8) * 1000).toInt
      val amp = ((len % 100 + 1) * 50).toInt
      assert(r.getAs[Int]("header_rate") == rate && r.getAs[Int]("rate_hz") == rate)
      assert(r.getAs[Long]("n_frames") == id % 100 + 50)
      assert(r.getAs[Int]("peak") == amp)
      assert(r.getAs[Double]("mean_abs") == amp.toDouble)
    }
  }

  test("video container demux + frame sampling decode only sampled frames, exactly") {
    import spark.implicits._
    val docs = Seq((0L, 100L), (3L, 999L), (9L, 7L)).toDF("doc_id", "n_chars")
    val media = Multimodal.videoMediaFromDocuments(docs)
    val feats = Multimodal.sampleAndDecodeFrames(media, stride = 2)
    assert(feats.schema == Multimodal.videoFrameFeatureSchema)
    val rows = feats.collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("frame_idx")) -> r).toMap
    // nFrames = id%5+3: id 0 → 3 frames (sample 0,2), id 3 → 6 (0,2,4), id 9 → 7 (0,2,4,6)
    assert(rows.keySet == Set((0L, 0), (0L, 2), (3L, 0), (3L, 2), (3L, 4),
      (9L, 0), (9L, 2), (9L, 4), (9L, 6)))
    Seq((0L, 100L), (3L, 999L), (9L, 7L)).foreach { case (id, len) =>
      rows.keys.filter(_._1 == id).foreach { case (_, fi) =>
        val r = rows((id, fi))
        val w = ((id + fi) % 13 + 4).toInt
        assert(r.getAs[Int]("width_px") == w)
        assert(r.getAs[Int]("height_px") == ((id + fi) % 7 + 4).toInt)
        assert(r.getAs[Double]("mean_r") == (w - 1) / 2.0)
        assert(r.getAs[Double]("mean_g") == ((id + fi) % 256).toDouble)
        assert(r.getAs[Double]("mean_b") == (len % 256).toDouble)
      }
    }
  }

  test("negative seeds synthesize valid payloads; non-PNG decodables get null header dims") {
    import org.apache.spark.sql.types._
    // floorMod guards: a negative id must not derive a negative
    // width/frame-count (BufferedImage / new Array would throw)
    assert(Multimodal.synthPng(-12L, 50L).nonEmpty)
    assert(Multimodal.synthWav(-60L, -5L).nonEmpty)
    assert(Multimodal.synthVideo(-7L, 20L).nonEmpty)
    // a decodable NON-PNG (BMP) payload: pixel stats real, but the IHDR
    // offsets are meaningless — header dims must be null, not garbage
    val img = new java.awt.image.BufferedImage(4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(1L, bos.toByteArray))
    val out = Multimodal.decodeImageFeatures(spark.createDataFrame(rows, schema)).collect().head
    assert(out.getAs[Int]("width_px") == 4 && out.getAs[Int]("height_px") == 3)
    assert(out.isNullAt(out.fieldIndex("header_w")) && out.isNullAt(out.fieldIndex("header_h")))
  }

  test("hostile WAV headers: oversized frame size and degenerate fmt chunk yield null rows, never a hang") {
    import spark.implicits._
    // a fmt chunk declaring 65535 channels gives a frame size far past
    // any read buffer — AudioInputStream.read returns 0 forever and
    // readAllBytes would SPIN; the decoder must emit a null-feature row
    def wavWithFmt(channels: Int, fmtSize: Int): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = (0 until 4).foreach(i => bos.write((v >> (8 * i)) & 0xFF))
      def le16(v: Int): Unit = (0 until 2).foreach(i => bos.write((v >> (8 * i)) & 0xFF))
      bos.write("RIFF".getBytes); le32(100); bos.write("WAVE".getBytes)
      bos.write("fmt ".getBytes); le32(fmtSize)
      if (fmtSize >= 16) {
        le16(1); le16(channels); le32(8000); le32(8000 * channels * 2)
        le16(channels * 2); le16(16)
      } else if (fmtSize >= 8) {
        // partial fmt body that still COVERS the sample-rate field
        // (bytes 4..7 of the body)
        le16(1); le16(channels); le32(8000)
        (8 until fmtSize).foreach(_ => bos.write(0))
      }
      // payload must clear the 44-byte canonical-header gate in
      // decodeAudioFeatures, or the chunk walk under test never runs
      bos.write("data".getBytes); le32(16); (0 until 16).foreach(_ => bos.write(0))
      bos.toByteArray
    }
    assert(wavWithFmt(channels = 1, fmtSize = 0).length >= 44,
      "fixture must reach the chunk walk, not die at the header-length gate")
    val rows = Seq(
      (1L, wavWithFmt(channels = 65535, fmtSize = 16)), // monster frame size
      (2L, wavWithFmt(channels = 1, fmtSize = 0)),      // degenerate fmt chunk
      (3L, wavWithFmt(channels = 1, fmtSize = 8)),      // minimal body covering the rate
      // 2500 ch: ACCEPTED by the JDK reader (65535 is rejected at
      // getAudioInputStream, so row 1 exercises the ais==null path, not
      // the guard) with frameSize 5000 > 4096 — the row that actually
      // reaches the hostile-frame-size guard (r17 review)
      (4L, wavWithFmt(channels = 2500, fmtSize = 16))
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeAudioFeatures(rows).collect()
    assert(out.length == 4)
    val monster = out.find(_.getLong(0) == 1L).get
    assert(monster.isNullAt(monster.fieldIndex("peak")),
      "oversized-frame WAV must yield null stats, not decode (or hang)")
    // r17 review: the hostile-frame guard nulls only the SAMPLE stats —
    // rate_hz/n_frames are decoder/header-derived and already computed,
    // and the unsupported-encoding branch emits them, so this branch
    // must too (two records with equally-readable headers must get
    // consistent coverage in downstream rate/frame aggregates)
    val guarded = out.find(_.getLong(0) == 4L).get
    assert(guarded.isNullAt(guarded.fieldIndex("peak")),
      "guard row must yield null stats, not decode (or hang)")
    assert(guarded.getAs[Int]("rate_hz") == 8000,
      "decoder-readable rate must survive the hostile-frame guard")
    assert(guarded.getAs[Long]("n_frames") == 0L,
      "header-derived frame count must survive the hostile-frame guard")
    // degenerate fmt chunk: header_rate must be null, not the next
    // chunk's bytes read as a sample rate
    val degen = out.find(_.getLong(0) == 2L).get
    assert(degen.isNullAt(degen.fieldIndex("header_rate")))
    // a size-8 body DOES cover the rate field — the cover check must
    // not over-reject by demanding the full 16-byte canonical body
    val minimal = out.find(_.getLong(0) == 3L).get
    assert(minimal.getAs[Int]("header_rate") == 8000)
  }

  test("resize: a factor larger than the payload emits one byte, not a silent empty array") {
    import spark.implicits._
    val media = Seq((1L, "image", Array[Byte](42, 43, 44), 3, 1))
      .toDF("media_id", "media_type", "payload", "width", "height")
    val out = Multimodal.resize(media, Int.MaxValue).collect().head
    assert(out.getAs[Array[Byte]]("payload").toSeq == Seq(42.toByte))
  }

  test("decompression-bomb PNG (huge declared dims, tiny file) yields a null row, not an OOM") {
    import org.apache.spark.sql.types._
    // take a real synthesized PNG and rewrite its IHDR to declare
    // 60000x60000 (a ~14 GB ARGB raster), recomputing the IHDR CRC so
    // the reader trusts the header: without the pre-decode dimension
    // gate, ImageIO.read attempts the allocation and the task dies with
    // a FATAL OutOfMemoryError that no NonFatal catch can see
    val bomb = Multimodal.synthPng(1L, 50L).clone()
    def be32(v: Int, off: Int): Unit = {
      bomb(off) = (v >>> 24).toByte; bomb(off + 1) = (v >>> 16).toByte
      bomb(off + 2) = (v >>> 8).toByte; bomb(off + 3) = v.toByte
    }
    be32(60000, 16); be32(60000, 20) // IHDR width/height
    val crc = new java.util.zip.CRC32()
    crc.update(bomb, 12, 17) // chunk type "IHDR" + 13 data bytes
    be32(crc.getValue.toInt, 29)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val media = spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, bomb)), schema)
    val r = Multimodal.decodeImageFeatures(media).collect().head
    assert(r.getAs[Long]("media_id") == 9L)
    assert(r.isNullAt(r.fieldIndex("width_px")), "bomb must decode to a null-feature row")

    // hostile RIFF container: a chunk size near Int.MaxValue must not
    // wrap the chunk-walk offset into an uncaught AIOOBE
    val riff = new java.io.ByteArrayOutputStream()
    riff.write("RIFF".getBytes); riff.write(Array[Byte](36, 0, 0, 0))
    riff.write("WAVE".getBytes); riff.write("JUNK".getBytes)
    riff.write(Array[Byte](-16, -1, -1, 127)) // le32 = 0x7FFFFFF0
    riff.write(new Array[Byte](64))
    val audio = Multimodal.decodeAudioFeatures(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(8L, riff.toByteArray)), schema))
      .collect().head
    assert(audio.isNullAt(audio.fieldIndex("rate_hz")))
  }

  test("AU payload with unknown data size yields null n_frames, not -1 (r13 review)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    // AU header: ".snd", hdr size 24, data size 0xFFFFFFFF (= length
    // unknown, legal), encoding 2 (8-bit linear PCM), 8 kHz, mono —
    // javax.sound reports getFrameLength == NOT_SPECIFIED (-1) for it
    val o = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(o)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(0xFFFFFFFF)
    d.writeInt(2); d.writeInt(8000); d.writeInt(1)
    d.write(new Array[Byte](40))
    val r = Multimodal.decodeAudioFeatures(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(9L, o.toByteArray)), schema))
      .collect().head
    assert(r.getAs[Int]("rate_hz") == 8000)
    assert(r.isNullAt(r.fieldIndex("n_frames")),
      "NOT_SPECIFIED frame length must surface as null, not -1")
    // the PCM stats still compute from the samples actually read
    assert(!r.isNullAt(r.fieldIndex("peak")))
  }

  test("r15 review: short AU decodes, degenerate rate is null, huge chunkBytes doesn't overflow") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    // (1) a 28-byte AU (24-byte .snd header + 4 samples of 8-bit PCM):
    // the WAV-specific 44-byte floor silently nulled it even though the
    // decoder handles it
    val o = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(o)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(4)
    d.writeInt(2); d.writeInt(8000); d.writeInt(1)
    d.write(Array[Byte](10, -10, 20, -20))
    assert(o.size() == 28, o.size().toString)
    val r = Multimodal.decodeAudioFeatures(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(1L, o.toByteArray)), schema))
      .collect().head
    assert(r.getAs[Int]("rate_hz") == 8000, r.toString)
    assert(!r.isNullAt(r.fieldIndex("peak")), r.toString)
    // (2) a declared sample rate of 0 must surface as null, not a 0
    // that poisons downstream min/avg rate aggregates (the n_frames
    // NOT_SPECIFIED rule, applied symmetrically)
    val z = new java.io.ByteArrayOutputStream()
    val dz = new java.io.DataOutputStream(z)
    dz.writeBytes(".snd"); dz.writeInt(24); dz.writeInt(4)
    dz.writeInt(2); dz.writeInt(0); dz.writeInt(1)
    dz.write(Array[Byte](1, 2, 3, 4))
    val rz = Multimodal.decodeAudioFeatures(spark.createDataFrame(
      java.util.Arrays.asList(org.apache.spark.sql.Row(2L, z.toByteArray)), schema))
      .collect().head
    assert(rz.isNullAt(rz.fieldIndex("rate_hz")),
      s"rate 0 must emit null, not a poisoned sentinel: $rz")
    // (3) chunkBytes near Int.MaxValue: the Int ceil wrapped negative
    // and sequence() threw 'Illegal sequence boundaries'
    import spark.implicits._
    val chunkDocs = Seq((1L, "alpha beta", 10L), (2L, "gamma", 5L))
      .toDF("doc_id", "text", "n_chars")
    val media = Multimodal.mediaFromDocuments(chunkDocs)
    val chunks = Multimodal.sampleChunks(media, chunkBytes = Int.MaxValue)
    assert(chunks.groupBy("media_id").count().collect().forall(_.getLong(1) == 1L),
      "a payload shorter than one huge chunk is exactly one chunk")
  }

  test("real codecs survive null and corrupt payloads (one bad record must not kill the stage)") {
    import spark.implicits._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val good = Multimodal.synthPng(3L, 50L)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, good),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, "definitely not a png".getBytes),
      org.apache.spark.sql.Row(4L, good.take(30))) // truncated mid-IHDR
    val media = spark.createDataFrame(rows, schema)
    val img = Multimodal.decodeImageFeatures(media).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(img.size == 4) // every record yields a row — nothing dropped, nothing thrown
    assert(img(1L).getAs[Integer]("width_px") == (3 % 13 + 4))
    Seq(2L, 3L, 4L).foreach(id => assert(img(id).isNullAt(img(id).fieldIndex("width_px"))))

    val wav = Multimodal.synthWav(5L, 70L)
    val audioRows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, wav),
      org.apache.spark.sql.Row(2L, null),
      org.apache.spark.sql.Row(3L, good)) // a PNG is not audio
    val audio = Multimodal.decodeAudioFeatures(spark.createDataFrame(audioRows, schema))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(audio(1L).getAs[Long]("n_frames") == (5 % 100 + 50))
    Seq(2L, 3L).foreach(id => assert(audio(id).isNullAt(audio(id).fieldIndex("n_frames"))))

    // corrupt container: a frame length past the payload end stops the
    // demux at the damage point, keeping the frames before it
    val video = Multimodal.synthVideo(2L, 40L)
    val cut = video.take(video.length - 10) // truncate inside the last frame
    val videoRows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, cut),
      org.apache.spark.sql.Row(2L, null))
    val frames = Multimodal.sampleAndDecodeFrames(spark.createDataFrame(videoRows, schema), stride = 1)
      .collect()
    val n = (2 % 5 + 3) // 5 frames synthesized; the last is truncated
    assert(frames.forall(_.getAs[Long]("media_id") == 1L)) // null payload → no rows
    assert(frames.length == n - 1) // all intact frames decoded, walk stopped at damage
    assert(frames.forall(r => !r.isNullAt(r.fieldIndex("width_px"))))
  }

  test("WAV decode honors the container format: 8-bit unsigned and 16-bit stereo") {
    import org.apache.spark.sql.types._
    import javax.sound.sampled._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    def wavOf(fmt: AudioFormat, pcm: Array[Byte], frames: Long): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames),
        AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    // 8-bit UNSIGNED mono: stored bytes 128/228/28 = centered 0/+100/-100,
    // scaled ×256 into the 16-bit stat range
    val wav8 = wavOf(new AudioFormat(8000f, 8, 1, false, false),
      Array(128, 228, 28).map(_.toByte), 3L)
    // 16-bit SIGNED stereo LE: frames = 2, samples = 4 — the mean must
    // divide by SAMPLES (the old code divided the 4-sample sum by the
    // 2-frame header count, doubling it)
    def le16(s: Int): Array[Byte] = Array((s & 0xFF).toByte, ((s >> 8) & 0xFF).toByte)
    val wav16st = wavOf(new AudioFormat(8000f, 16, 2, true, false),
      (le16(1000) ++ le16(-1000) ++ le16(3000) ++ le16(-3000)), 2L)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, wav8), org.apache.spark.sql.Row(2L, wav16st))
    val byId = Multimodal.decodeAudioFeatures(spark.createDataFrame(rows, schema))
      .collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    val r8 = byId(1L)
    assert(r8.getAs[Int]("peak") == 100 * 256)
    assert(r8.getAs[Double]("mean_abs") == (0 + 100 * 256 + 100 * 256) / 3.0)
    val r16 = byId(2L)
    assert(r16.getAs[Long]("n_frames") == 2L)
    assert(r16.getAs[Int]("peak") == 3000)
    assert(r16.getAs[Double]("mean_abs") == (1000 + 1000 + 3000 + 3000) / 4.0)
  }

  test("WAV header rate survives a non-canonical chunk order (fmt after LIST)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    def le(n: Int): Array[Byte] =
      Array((n & 0xFF).toByte, ((n >> 8) & 0xFF).toByte, ((n >> 16) & 0xFF).toByte, ((n >> 24) & 0xFF).toByte)
    val wav = Multimodal.synthWav(7L, 30L)
    // splice a LIST/INFO chunk between the RIFF header and the fmt
    // chunk (spec-legal; real encoders emit this) and patch the RIFF size
    val list = "LIST".getBytes ++ le(4) ++ "INFO".getBytes
    val riffSize = (wav(4) & 0xFF) | ((wav(5) & 0xFF) << 8) | ((wav(6) & 0xFF) << 16) | ((wav(7) & 0xFF) << 24)
    val spliced = wav.take(4) ++ le(riffSize + list.length) ++ wav.slice(8, 12) ++ list ++ wav.drop(12)
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(1L, spliced))
    val feats = Multimodal.decodeAudioFeatures(spark.createDataFrame(rows, schema)).collect().head
    val expectedRate = (8000 + (7 % 8) * 1000)
    // the chunk walk finds fmt wherever it sits; a fixed offset-24 read
    // would report the LIST chunk's bytes as the rate
    assert(!feats.isNullAt(feats.fieldIndex("header_rate")),
      "JDK decoder rejected the LIST-first WAV — row is null, chunk walk unexercised")
    assert(feats.getAs[Int]("header_rate") == expectedRate)
    assert(feats.getAs[Int]("rate_hz") == expectedRate)
  }
}
