package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Real WAV (RIFF/PCM16) encode + decode, pure JDK — the one modality whose
  * decode needs no external codec, upgrading the multimodal path from
  * "stubbed decode" for audio: proper RIFF chunk walk (fmt /data, unknown
  * chunks skipped with odd-size padding), PCM16 little-endian samples, and
  * integer feature extraction (sum of squares, peak) that is exact and
  * order-independent — so a SQL oracle can recompute it bit-for-bit.
  *
  * [[synthesize]] builds deterministic fixtures from an integer-only
  * closed-form waveform (an LCG-style noise: v_i = ((1103515245·i +
  * 12345·seed) mod 65536) − 32768). No floats anywhere, so the DuckDB
  * oracle reproduces every decoded sample exactly — if the writer or the
  * parser mangles a byte, the sum-of-squares hash mismatches.
  */
object WavCodec {

  final case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Short]) {
    def nSamples: Long = samples.length.toLong / math.max(channels, 1)
    def durationMs: Long =
      if (sampleRate == 0) 0L else nSamples * 1000L / sampleRate
    /** Exact integer sum of squares over all samples (order-independent). */
    def sumSquares: Long = {
      var acc = 0L; var i = 0
      while (i < samples.length) { acc += samples(i).toLong * samples(i); i += 1 }
      acc
    }
    def peak: Int = {
      var p = 0; var i = 0
      while (i < samples.length) {
        val a = math.abs(samples(i).toInt); if (a > p) p = a; i += 1
      }
      p
    }
    /** Per-frame RMS energy (frameLen samples/frame; tail frame included) —
      * the classic audio feature for silence trimming / segmentation.
      */
    def rmsFrames(frameLen: Int): Array[Double] = {
      require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
      samples.grouped(frameLen).map { fr =>
        math.sqrt(fr.map(v => v.toDouble * v).sum / fr.length)
      }.toArray
    }
  }

  /** Deterministic PCM16 mono fixture: integer closed-form waveform. */
  def synthesize(seed: Long, ms: Int, sampleRate: Int = 8000): Array[Byte] = {
    val n = sampleRate * ms / 1000
    val data = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      // floorMod: a negative seed would make `%` negative and silently
      // wrap below Short.MinValue, breaking the closed-form equivalence
      // the SQL oracle replays — floorMod keeps the formula total
      val v = (Math.floorMod(1103515245L * i + 12345L * seed, 65536L) - 32768L).toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val bb = ByteBuffer.allocate(44 + data.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + data.length)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2) // byte rate = sr * block align
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(data.length)
      .put(data)
    bb.array()
  }

  /** Parse a RIFF/WAVE byte payload; None for anything malformed or
    * non-PCM16 (the skip-on-error contract every doc source follows).
    */
  def decode(bytes: Array[Byte]): Option[WavInfo] =
    try {
      val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
      }
      if (tag() != "RIFF") return None
      bb.getInt // declared RIFF size (unchecked: truncated files fail below)
      if (tag() != "WAVE") return None
      var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
      var data: Option[Array[Byte]] = None
      while (bb.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
        val id = tag()
        val size = bb.getInt
        if (size < 0 || size > bb.remaining()) return None
        val next = bb.position() + size + (size & 1) // chunks pad to even
        id match {
          case "fmt " =>
            val audioFormat = bb.getShort()
            val channels = bb.getShort().toInt
            val rate = bb.getInt()
            bb.getInt(); bb.getShort() // byte rate, block align
            val bits = bb.getShort().toInt
            if (audioFormat != 1 || bits != 16 || channels < 1) return None
            fmt = Some((channels, rate, bits))
          case "data" =>
            val a = new Array[Byte](size); bb.get(a); data = Some(a)
          case _ => () // skip unknown chunks (LIST, fact, cue ...)
        }
        if (next > bb.limit()) return None
        bb.position(math.min(next, bb.limit()))
      }
      for ((channels, rate, bits) <- fmt; d <- data) yield {
        val sb = ByteBuffer.wrap(d).order(ByteOrder.LITTLE_ENDIAN)
        val samples = new Array[Short](d.length / 2)
        var i = 0
        while (i < samples.length) { samples(i) = sb.getShort(); i += 1 }
        WavInfo(rate, channels, bits, samples)
      }
    } catch { case _: Exception => None }
}
