package graft.img

import java.nio.{ByteBuffer, ByteOrder}

/** Synthetic audio table + feature kernels (multimodal pipeline: audio
  * rows are opaque binary columns with typed metadata; feature extraction
  * is a partition-parallel map).
  *
  * The container is a REAL canonical WAV file (RIFF ‖ fmt PCM16 mono ‖
  * data), written and parsed byte-level here — no external codec exists in
  * this environment, and none is needed for PCM. Sample values are pure
  * integer hash derivations, so the features computed from the PARSED
  * bytes (sample count, sum of absolute amplitudes, strict zero
  * crossings) are exactly mirrorable in oracle SQL: if the WAV encode or
  * parse mangled a single byte, the features diverge and the q53 hash
  * gate fails.
  */
final case class AudioRow(audio_id: String, bytes: Array[Byte], sample_rate: Int,
                          n_samples: Int, caption: String)

object Audio {
  val RATE = 8000

  /** Sample count from the SAME multiplicative-hash expression the oracle
    * evaluates (512..1535 samples). */
  def sampleCount(idx: Long): Int = (512L + ((idx * 2654435761L) % 4294967296L) % 1024L).toInt

  /** i-th PCM16 sample of clip `idx` — pure integer, SQL-mirrorable. */
  def sample(idx: Long, i: Int): Int =
    (((idx * 2654435761L + i * 40503L) % 65536L).toInt) - 32768

  /** Canonical 44-byte-header WAV: RIFF ‖ WAVE ‖ fmt(16, PCM, mono, rate,
    * byterate, align, 16 bit) ‖ data. Little-endian throughout. */
  def encodeWav(samples: Array[Int], rate: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    bb.put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
    bb.putShort(1).putShort(1) // PCM, mono
    bb.putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(s => bb.putShort(s.toShort))
    bb.array()
  }

  /** Parse a canonical PCM16 mono WAV back to samples; malformed input is
    * rejected like every other bad container. */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Int]) = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(): String = { val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII") }
    if (bytes.length < 44 || tag() != "RIFF")
      throw graft.core.GeoqException("bad audio container: missing RIFF magic")
    bb.getInt()
    if (tag() != "WAVE" || tag() != "fmt ")
      throw graft.core.GeoqException("bad audio container: missing WAVE/fmt chunks")
    val fmtLen = bb.getInt()
    val codec = bb.getShort(); val channels = bb.getShort()
    val rate = bb.getInt(); bb.getInt(); bb.getShort()
    val bits = bb.getShort()
    if (fmtLen != 16 || codec != 1 || channels != 1 || bits != 16)
      throw graft.core.GeoqException("bad audio container: expected PCM16 mono")
    if (tag() != "data")
      throw graft.core.GeoqException("bad audio container: missing data chunk")
    val dataLen = bb.getInt()
    // reject, never under-read or underflow: negative/odd lengths and
    // truncated payloads are malformed, not zero-sample clips
    if (dataLen < 0 || dataLen % 2 != 0 || bb.remaining() < dataLen)
      throw graft.core.GeoqException(
        s"bad audio container: data length $dataLen vs ${bb.remaining()} bytes remaining")
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = bb.getShort().toInt; i += 1 }
    (rate, out)
  }

  def generate(idx: Long): AudioRow = {
    val n = sampleCount(idx)
    val samples = Array.tabulate(n)(i => sample(idx, i))
    AudioRow(f"aud$idx%09d", encodeWav(samples, RATE), RATE, n,
      Images.caption(idx + 900000))
  }

  /** Features over DECODED samples: (n, Σ|s|, strict zero crossings). */
  def features(samples: Array[Int]): (Long, Long, Long) = {
    var sumAbs = 0L
    var zc = 0L
    var i = 0
    while (i < samples.length) {
      sumAbs += math.abs(samples(i))
      if (i > 0 && samples(i).toLong * samples(i - 1) < 0) zc += 1
      i += 1
    }
    (samples.length.toLong, sumAbs, zc)
  }
}
