package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

/** REAL audio-container codec via the JDK's `javax.sound.sampled` —
  * the audio twin of [[ImageCodec]]'s PNG seam (reference: the
  * multimodal stub surface; q317 already does the raw PCM16 DSP, this
  * closes the CONTAINER leg): encode raw little-endian PCM16 frames
  * into an actual RIFF/WAVE byte stream and parse real WAV bytes back
  * into the PCM payload plus its header metadata (sample rate,
  * channels). WAV PCM is a lossless container — the samples inside
  * the RIFF chunks are the input bytes verbatim — so a decode(encode)
  * round trip is bit-exact and can be judged against a binary-free
  * oracle exactly like q323's PNG leg.
  *
  * No audio HARDWARE is touched: `AudioSystem.write` /
  * `getAudioInputStream` are pure byte-stream format converters and
  * run headless. The video leg of the trio is [[VideoCodec]]'s
  * hand-rolled RIFF/AVI parser (same RIFF chunk grammar as WAV).
  */
object AudioCodec {

  /** Decoded WAV: the raw PCM16 payload plus header metadata. */
  final case class WavAudio(pcm: Array[Byte], sampleRate: Int, channels: Int)

  /** Wrap raw LE PCM16 frames in a RIFF/WAVE container. */
  def encodeWav(pcm: Array[Byte], sampleRate: Int = 16000,
      channels: Int = 1): Array[Byte] = {
    require(channels > 0 && sampleRate > 0,
      s"need positive rate/channels, got $sampleRate/$channels")
    val frameSize = 2 * channels
    require(pcm.length % frameSize == 0,
      s"PCM16 payload must be a whole number of $frameSize-byte frames, " +
        s"got ${pcm.length} bytes")
    val fmt = new AudioFormat(sampleRate.toFloat, 16, channels,
      /* signed = */ true, /* bigEndian = */ false)
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      pcm.length / frameSize)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Parse WAV bytes back to LE PCM16 + header metadata. Rejects
    * non-PCM16 encodings rather than resampling — a curation pipeline
    * wants the mismatch surfaced, not silently transcoded.
    */
  def decodeWav(payload: Array[Byte]): WavAudio = {
    val ais = AudioSystem.getAudioInputStream(new ByteArrayInputStream(payload))
    val fmt = ais.getFormat
    require(fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED &&
      fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
      s"expected LE PCM16, got $fmt")
    // Header-declared length is data-controlled: long math before any
    // Int sizing (the ImageCodec/resizeNearest guard at this seam).
    val frames = ais.getFrameLength
    require(frames >= 0 && frames * fmt.getFrameSize.toLong <= Int.MaxValue,
      s"$frames frames of ${fmt.getFrameSize} bytes exceeds a JVM array")
    val pcm = ais.readAllBytes()
    require(pcm.length == frames * fmt.getFrameSize,
      s"truncated WAV data: header declares ${frames * fmt.getFrameSize} " +
        s"bytes, stream held ${pcm.length}")
    WavAudio(pcm, fmt.getSampleRate.toInt, fmt.getChannels)
  }
}
