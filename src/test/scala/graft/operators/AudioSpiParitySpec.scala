package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Pins Multimodal.AudioSpi (the JVM-cached javax.sound SPI path — the
  * r17 optimization that removes AudioSystem's per-call synchronized
  * provider re-scan) to AudioSystem's own behavior: same accepted
  * payloads, same decoded formats/bytes, same rejections, and
  * byte-identical WAVE encoding. The cache reorders providers
  * (WAVE-first, MIDI last), which is sound only because the JDK
  * readers' acceptance classes are disjoint — this spec is the check
  * that stays true on a future JDK.
  */
class AudioSpiParitySpec extends AnyFunSuite {

  private def viaSystem(bytes: Array[Byte]): javax.sound.sampled.AudioInputStream =
    try javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    catch { case _: javax.sound.sampled.UnsupportedAudioFileException => null }

  private def decodeSig(ais: javax.sound.sampled.AudioInputStream): Option[(String, Float, Int, Long, Seq[Byte])] =
    Option(ais).map { a =>
      val f = a.getFormat
      val pcm = a.readAllBytes()
      a.close()
      (f.getEncoding.toString, f.getSampleRate, f.getSampleSizeInBits, a.getFrameLength,
        pcm.take(64).toSeq)
    }

  private def synthAu(nSamples: Int): Array[Byte] = {
    // minimal .snd/AU header (24 bytes) + 8-bit linear PCM body
    val bos = new java.io.ByteArrayOutputStream()
    val d = new java.io.DataOutputStream(bos)
    d.writeBytes(".snd"); d.writeInt(24); d.writeInt(nSamples)
    d.writeInt(2 /* 8-bit linear PCM */); d.writeInt(8000); d.writeInt(1)
    (0 until nSamples).foreach(i => d.writeByte(if (i % 2 == 0) 40 else -40))
    bos.toByteArray
  }

  private def synthFloatWav(n: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_FLOAT, 8000f, 32, 1, 4, 8000f, false)
    val body = new Array[Byte](n * 4)
    val bb = java.nio.ByteBuffer.wrap(body).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until n).foreach(i => bb.putFloat(if (i % 2 == 0) 0.25f else -0.25f))
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(body), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("AudioSpi.open == AudioSystem.getAudioInputStream across payload classes") {
    val payloads: Seq[(String, Array[Byte])] = Seq(
      "pcm wav" -> Multimodal.synthWav(42L, 500L),
      "pcm wav other rate" -> Multimodal.synthWav(7L, 3L),
      "au 8-bit" -> synthAu(60),
      "float wav" -> synthFloatWav(50),
      "garbage" -> Array.tabulate[Byte](64)(i => (i * 7).toByte),
      "riff-but-truncated" -> Multimodal.synthWav(42L, 500L).take(30),
      "empty" -> Array.emptyByteArray)
    payloads.foreach { case (tag, bytes) =>
      val want = decodeSig(viaSystem(bytes))
      val got = decodeSig(
        try Multimodal.AudioSpi.open(bytes)
        catch { case _: java.io.IOException => null }) // AudioSystem path maps these to null above too
      assert(got == want, s"payload '$tag': AudioSpi ${got.isDefined} vs AudioSystem ${want.isDefined}")
    }
  }

  test("AudioSpi.writeWave == AudioSystem.write, byte for byte") {
    val pcm = Array.tabulate[Byte](200)(i => (i * 3).toByte)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    def ais() = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 100L)
    val a = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais(), javax.sound.sampled.AudioFileFormat.Type.WAVE, a)
    val b = new java.io.ByteArrayOutputStream()
    Multimodal.AudioSpi.writeWave(ais(), b)
    assert(java.util.Arrays.equals(a.toByteArray, b.toByteArray))
  }

  test("decodeAudioFeatures output is unchanged by the SPI cache (q72 shape)") {
    // end-to-end: the q72 pipeline's per-row features depend only on
    // (seed, len) arithmetic — synthWav + decode must reproduce the
    // documented statistics regardless of which lookup path found the
    // reader. Spot formula: rate = 8000 + (seed%8)*1000, n = seed%100+50,
    // amp = (len%100+1)*50; Nyquist square wave → peak = mean_abs = amp.
    for ((seed, len) <- Seq((42L, 500L), (7L, 3L), (0L, 0L), (99L, 99L))) {
      val wav = Multimodal.synthWav(seed, len)
      val ais = Multimodal.AudioSpi.open(wav)
      assert(ais != null)
      val f = ais.getFormat
      assert(f.getSampleRate.toInt == 8000 + (seed % 8).toInt * 1000)
      assert(ais.getFrameLength == (seed % 100) + 50)
      ais.close()
    }
  }
}
