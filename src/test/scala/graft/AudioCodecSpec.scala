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
}
