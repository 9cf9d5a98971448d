package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AudioCodec

/** operators/AudioCodec pinned on container ground truth: RIFF/WAVE
  * magic in the encoded bytes, bit-exact PCM round trip (WAV PCM is
  * lossless), header metadata (sample rate / channels) surviving the
  * trip, and the rejection paths (odd payload, truncated container,
  * non-PCM input).
  */
class AudioCodecSpec extends AnyFunSuite {

  private val pcm: Array[Byte] =
    (0 until 480).flatMap { i =>
      val v = (math.sin(i * 0.05) * 12000).toInt
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    }.toArray

  test("encode produces a RIFF/WAVE container") {
    val wav = AudioCodec.encodeWav(pcm, 16000, 1)
    assert(new String(wav.slice(0, 4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    assert(wav.length > pcm.length) // header + chunks around the data
  }

  test("decode(encode) is bit-exact and preserves header metadata") {
    for ((rate, ch) <- Seq((16000, 1), (44100, 1), (8000, 2))) {
      val a = AudioCodec.decodeWav(AudioCodec.encodeWav(pcm, rate, ch))
      assert(a.pcm.toSeq == pcm.toSeq, s"payload mangled at $rate/$ch")
      assert(a.sampleRate == rate && a.channels == ch)
    }
  }

  test("odd-length / torn-frame payloads are rejected at encode") {
    intercept[IllegalArgumentException] {
      AudioCodec.encodeWav(pcm.take(3), 16000, 1)
    }
    intercept[IllegalArgumentException] {
      // stereo frames are 4 bytes; 6 bytes is not a whole frame count
      AudioCodec.encodeWav(pcm.take(6), 16000, 2)
    }
  }

  test("truncated WAV data (header declares more than the stream holds) is rejected") {
    val wav = AudioCodec.encodeWav(pcm, 16000, 1)
    val torn = wav.take(wav.length - 100)
    intercept[Exception] { AudioCodec.decodeWav(torn) }
  }

  test("non-WAV bytes are rejected, not misparsed") {
    intercept[Exception] { AudioCodec.decodeWav("not audio at all".getBytes) }
  }

  test("property: decode(encode(pcm)) == pcm for seeded random payloads") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      nFrames <- Gen.choose(0, 2048)
      ch <- Gen.oneOf(1, 2)
      rate <- Gen.oneOf(8000, 16000, 22050, 44100)
      bytes <- Gen.listOfN(nFrames * 2 * ch, Gen.choose(-128, 127).map(_.toByte))
    } yield (bytes.toArray, rate, ch)
    // deterministic seeds — a CI failure must reproduce
    (0 until 12).foreach { i =>
      val (pcm, rate, ch) =
        gen.apply(Gen.Parameters.default, Seed(0xA0D10L + i)).get
      val a = AudioCodec.decodeWav(AudioCodec.encodeWav(pcm, rate, ch))
      assert(a.pcm.toSeq == pcm.toSeq && a.sampleRate == rate && a.channels == ch,
        s"case $i (${pcm.length} bytes, $rate Hz, $ch ch) mangled")
    }
  }
}
