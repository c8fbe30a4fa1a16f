package graft.sources

import java.nio.ByteBuffer

/** Real MP4 (ISO-BMFF) container parsing, pure JDK — the video analogue of
  * [[WavCodec]]/[[PngCodec]]: frame DECODE needs an H.264 codec the build
  * doesn't have (that step stays stubbed), but the metadata a pipeline
  * actually extracts per video — duration, timescale, track count,
  * dimensions, frame count, bitrate, keyframe density — lives in the box
  * STRUCTURE (ftyp/moov/mvhd/trak/tkhd + the stbl sample tables), which
  * is plain big-endian structural parsing. This is what ffprobe does for
  * `-show_format`/`-count_frames`-without-decoding.
  *
  * Box grammar: size(4 BE) type(4) payload; size==1 → 64-bit largesize
  * follows; size==0 → box extends to end of file. moov, trak, mdia, minf,
  * stbl are pure containers. mvhd v0 carries (timescale, duration); tkhd
  * v0 carries track_id and 16.16 fixed-point width/height. In stbl:
  * stts (time-to-sample run-length pairs) gives the duration-weighted
  * tick total, stsz (sample sizes, fixed or per-sample) gives frame count
  * and payload bytes, stss (sync samples) gives keyframes — per the spec,
  * a track with NO stss is all-keyframes.
  */
object Mp4Boxes {

  final case class Mp4Meta(
      brand: String, timescale: Long, duration: Long,
      nTracks: Int, maxWidth: Int, maxHeight: Int,
      nFrames: Long, sampleBytes: Long, sampleTicks: Long,
      nKeyframes: Long) {
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
    /** Duration-weighted average bitrate over the sample tables: payload
      * bits / (sample ticks / movie timescale), where each trak's stts
      * ticks were normalized from its mdhd media timescale to movie ticks
      * at parse time (stts deltas are MEDIA-timescale units per spec).
      * Integer arithmetic so a SQL oracle reproduces it exactly.
      */
    def bitrateBps: Long =
      if (sampleTicks == 0) 0L else sampleBytes * 8L * timescale / sampleTicks
  }

  /** Synthesize a real, spec-valid box tree:
    * ftyp + moov(mvhd + trak(tkhd + mdia(minf(stbl(stts stsz stss))))*).
    * All values derive from the seed with integer arithmetic, so a SQL
    * oracle reproduces every field:
    *   nf_i    = 24 + ((seed+i) % 5)·12      frames per track
    *   delta_i = 33 + (seed+i) % 10          ticks per frame (stts)
    *   kg_i    = 8 + (seed+i) % 5            keyframe stride (stss)
    *   sz_ij   = 800 + (seed + 31·i + 7·j) % 512   bytes per frame (stsz)
    */
  def synthesize(seed: Long, nTracks: Int, durationMs: Long,
      timescale: Long = 1000L): Array[Byte] = {
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp",
      ByteBuffer.allocate(16).put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
        .array())
    val duration = durationMs * timescale / 1000L
    val mvhd = {
      val bb = ByteBuffer.allocate(100) // v0 mvhd payload
      bb.putInt(0) // version+flags
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(timescale.toInt).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      bb.position(bb.position() + 10) // reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(nTracks + 1) // next_track_ID
      box("mvhd", bb.array())
    }
    val traks = (0 until nTracks).map { i =>
      // floorMod, not %: a negative seed would otherwise allocate a
      // negative stsz buffer (crash) or write negative widths into tkhd
      // (same hazard WavCodec.synthesize guards; identical to % for the
      // non-negative ids the catalog feeds, so oracles are unaffected)
      def fm(x: Long, m: Long): Long = Math.floorMod(x, m)
      val w = (320 + fm(seed + i, 8) * 160).toInt
      val h = (240 + fm(seed + i, 5) * 120).toInt
      val bb = ByteBuffer.allocate(84) // v0 tkhd payload
      bb.putInt(0x000007) // version 0, flags: enabled|in-movie|in-preview
        .putInt(0).putInt(0) // ctime, mtime
        .putInt(i + 1) // track_ID
        .putInt(0) // reserved
        .putInt(duration.toInt)
      bb.position(bb.position() + 8) // reserved
      bb.putShort(0).putShort(0).putShort(0).putShort(0) // layer, group, volume, reserved
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
      val nf = (24 + fm(seed + i, 5) * 12).toInt
      val delta = (33 + fm(seed + i, 10)).toInt
      val kg = (8 + fm(seed + i, 5)).toInt
      val stts = { // one run: nf samples of delta ticks each
        val b = ByteBuffer.allocate(16)
        b.putInt(0).putInt(1).putInt(nf).putInt(delta)
        box("stts", b.array())
      }
      val stsz = { // varying sizes: fixed=0, then one u32 per sample
        val b = ByteBuffer.allocate(12 + 4 * nf)
        b.putInt(0).putInt(0).putInt(nf)
        (0 until nf).foreach(j =>
          b.putInt((800 + fm(seed + 31 * i + 7 * j, 512)).toInt))
        box("stsz", b.array())
      }
      val nk = (nf + kg - 1) / kg
      val stss = { // 1-based sync sample numbers, every kg-th frame
        val b = ByteBuffer.allocate(8 + 4 * nk)
        b.putInt(0).putInt(nk)
        (0 until nk).foreach(j => b.putInt(j * kg + 1))
        box("stss", b.array())
      }
      val mdia = box("mdia", box("minf", box("stbl", stts ++ stsz ++ stss)))
      box("trak", box("tkhd", bb.array()) ++ mdia)
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov
  }

  /** Synthesize a single-track MP4 whose mdat carries REAL uncompressed
    * gray8 frames, addressed by real sample tables — the codec-free video
    * format (QuickTime/MP4 carry raw video legitimately; only COMPRESSED
    * frame decode needs H.264). Layout: ftyp + moov(mvhd + trak(tkhd +
    * mdia(minf(stbl(stts stsz stsc stco))))) + mdat. stsz uses the FIXED
    * sample-size form (every frame is w·h bytes), stsc one run (all
    * samples in one chunk), stco one absolute file offset — so a parser
    * must resolve real offsets to find the pixels. Closed forms:
    *   w = 16 + seed%16, h = 12 + seed%12, nf = 8 + seed%8
    *   pixel(x, y, f) = (7x + 13y + 31f + seed) mod 256
    */
  def synthesizeFrames(seed: Long, timescale: Long = 1000L): Array[Byte] = {
    def box(tag: String, payload: Array[Byte]): Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tag.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    // floorMod for the same negative-seed totality as synthesize above
    val w = (16 + Math.floorMod(seed, 16)).toInt
    val h = (12 + Math.floorMod(seed, 12)).toInt
    val nf = (8 + Math.floorMod(seed, 8)).toInt
    val delta = 40 // 25 fps at timescale 1000
    val ftyp = box("ftyp",
      ByteBuffer.allocate(16).put("isom".getBytes("US-ASCII")).putInt(512)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
        .array())
    val duration = nf.toLong * delta
    val mvhd = {
      val bb = ByteBuffer.allocate(100)
      bb.putInt(0).putInt(0).putInt(0)
        .putInt(timescale.toInt).putInt(duration.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort)
      bb.position(bb.position() + 10)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.position(bb.position() + 24)
      bb.putInt(2)
      box("mvhd", bb.array())
    }
    val tkhd = {
      val bb = ByteBuffer.allocate(84)
      bb.putInt(0x000007).putInt(0).putInt(0).putInt(1).putInt(0)
        .putInt(duration.toInt)
      bb.position(bb.position() + 8)
      bb.putShort(0).putShort(0).putShort(0).putShort(0)
      Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(bb.putInt)
      bb.putInt(w << 16).putInt(h << 16)
      box("tkhd", bb.array())
    }
    val stts = {
      val b = ByteBuffer.allocate(16)
      b.putInt(0).putInt(1).putInt(nf).putInt(delta)
      box("stts", b.array())
    }
    val stsz = { // fixed-size form: sample_size = w*h, per-sample list omitted
      val b = ByteBuffer.allocate(12)
      b.putInt(0).putInt(w * h).putInt(nf)
      box("stsz", b.array())
    }
    val stsc = { // one run: chunk 1 carries all nf samples
      val b = ByteBuffer.allocate(20)
      b.putInt(0).putInt(1).putInt(1).putInt(nf).putInt(1)
      box("stsc", b.array())
    }
    // stco holds an ABSOLUTE file offset; everything before the mdat
    // payload has a fixed size once the boxes above are laid out
    val stcoPayloadLen = 12
    val stblLen = 8 + stts.length + stsz.length + stsc.length + (8 + stcoPayloadLen)
    val moovLen = 8 + mvhd.length + (8 + tkhd.length + 8 + 8 + stblLen)
    val mdatPayloadOff = ftyp.length + moovLen + 8
    val stco = {
      val b = ByteBuffer.allocate(stcoPayloadLen)
      b.putInt(0).putInt(1).putInt(mdatPayloadOff)
      box("stco", b.array())
    }
    val stbl = box("stbl", stts ++ stsz ++ stsc ++ stco)
    val moov = box("moov", mvhd ++ box("trak", tkhd ++ box("mdia", box("minf", stbl))))
    require(moov.length == moovLen, s"moov layout drifted: ${moov.length} != $moovLen")
    val frames = new Array[Byte](nf * w * h)
    var f = 0
    while (f < nf) {
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          frames(f * w * h + y * w + x) =
            Math.floorMod(7 * x + 13 * y + 31 * f + seed, 256).toByte
          x += 1
        }
        y += 1
      }
      f += 1
    }
    ftyp ++ moov ++ box("mdat", frames)
  }

  /** A raw-video track's frames located through the real sample tables:
    * width/height from tkhd, sizes from stsz (fixed form), file offsets
    * resolved chunk-by-chunk from stsc runs + stco entries. Returns the
    * per-frame byte slices; None when the table shapes don't describe
    * addressable raw frames (compressed tracks, truncated mdat, ...).
    */
  final case class RawFrames(width: Int, height: Int, frames: Vector[Array[Byte]])

  def rawFrames(bytes: Array[Byte]): Option[RawFrames] =
    try {
      var w = 0; var h = 0
      var fixedSize = 0; var nSamples = 0
      var stscRuns = Vector.empty[(Int, Int)] // (first_chunk, samples_per_chunk)
      var chunkOffs = Vector.empty[Long]

      def walk(start: Int, end: Int, depth: Int): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val bb = ByteBuffer.wrap(bytes, off, end - off)
          var size = bb.getInt.toLong & 0xffffffffL
          val tag = {
            val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
          }
          var hdr = 8
          if (size == 1) { size = bb.getLong; hdr = 16 }
          else if (size == 0) size = (end - off).toLong
          if (size < hdr || off + size > end) return false
          val pStart = off + hdr
          val pEnd = (off + size).toInt
          tag match {
            case "moov" | "trak" | "mdia" | "minf" | "stbl" =>
              if (depth > 8 || !walk(pStart, pEnd, depth + 1)) return false
            case "tkhd" if pEnd - pStart >= 84 =>
              val tb = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              if (tb.getInt >>> 24 == 0) {
                tb.position(tb.position() + 72)
                w = tb.getInt >>> 16
                h = tb.getInt >>> 16
              }
            case "stsz" if pEnd - pStart >= 12 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt
              fixedSize = b.getInt
              nSamples = b.getInt
            case "stsc" if pEnd - pStart >= 8 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt
              val n = b.getInt
              if (pEnd - pStart < 8 + 12L * n) return false
              var k = 0
              while (k < n) {
                val first = b.getInt; val per = b.getInt; b.getInt // desc idx
                stscRuns :+= ((first, per))
                k += 1
              }
            case "stco" if pEnd - pStart >= 8 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt
              val n = b.getInt
              if (pEnd - pStart < 8 + 4L * n) return false
              var k = 0
              while (k < n) { chunkOffs :+= (b.getInt.toLong & 0xffffffffL); k += 1 }
            case _ => ()
          }
          off = pEnd
        }
        true
      }

      if (!walk(0, bytes.length, 0)) None
      else if (w <= 0 || h <= 0 || fixedSize != w * h || nSamples <= 0 ||
        chunkOffs.isEmpty || stscRuns.isEmpty) None
      else {
        // expand stsc runs to samples-per-chunk for each stco chunk
        val perChunk = chunkOffs.indices.map { ci =>
          val chunkNo = ci + 1 // 1-based
          stscRuns.takeWhile(_._1 <= chunkNo).lastOption.fold(0)(_._2)
        }
        val out = Vector.newBuilder[Array[Byte]]
        var produced = 0
        var ci = 0
        while (ci < chunkOffs.length && produced < nSamples) {
          var s = 0
          while (s < perChunk(ci) && produced < nSamples) {
            val off = chunkOffs(ci) + s.toLong * fixedSize
            if (off < 0 || off + fixedSize > bytes.length) return None
            out += java.util.Arrays.copyOfRange(
              bytes, off.toInt, off.toInt + fixedSize)
            produced += 1
            s += 1
          }
          ci += 1
        }
        if (produced != nSamples) None
        else Some(RawFrames(w, h, out.result()))
      }
    } catch { case _: Exception => None }

  /** Parse the box tree; None for malformed bytes or a missing moov/mvhd. */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      var brand = ""
      var timescale = 0L; var duration = 0L
      var nTracks = 0; var maxW = 0; var maxH = 0
      var sawMvhd = false
      var nFrames = 0L; var sampleBytes = 0L; var sampleTicks = 0L
      var nKeyframes = 0L
      var trakFrames = 0L; var trakSawStss = false // per-trak stss rule
      // stts deltas are in the TRACK's media timescale (mdhd), not the
      // movie timescale — a real 90 kHz video track against a 1000-tick
      // movie would otherwise understate bitrate ~90×. Ticks accumulate
      // per trak with that trak's mdhd timescale and normalize to movie
      // ticks at the end (mdhd may legally precede or follow mvhd in the
      // file, so the conversion cannot happen inline).
      var trakTicks = 0L; var trakMdhdTs = 0L
      var tickRuns = Vector.empty[(Long, Long)]

      def walk(start: Int, end: Int, depth: Int): Boolean = {
        var off = start
        while (off + 8 <= end) {
          val bb = ByteBuffer.wrap(bytes, off, end - off)
          var size = bb.getInt.toLong & 0xffffffffL
          val tag = {
            val a = new Array[Byte](4); bb.get(a); new String(a, "US-ASCII")
          }
          var hdr = 8
          if (size == 1) { size = bb.getLong; hdr = 16 } // largesize
          else if (size == 0) size = (end - off).toLong  // to end of scope
          if (size < hdr || off + size > end) return false
          val pStart = off + hdr
          val pEnd = (off + size).toInt
          tag match {
            case "ftyp" if pEnd - pStart >= 4 =>
              brand = new String(bytes, pStart, 4, "US-ASCII")
            case "moov" | "mdia" | "minf" | "stbl" =>
              if (depth > 8 || !walk(pStart, pEnd, depth + 1)) return false
            case "trak" =>
              // spec: a track with no stss box is ALL sync samples
              val before = nFrames
              trakSawStss = false
              trakTicks = 0L; trakMdhdTs = 0L
              if (depth > 8 || !walk(pStart, pEnd, depth + 1)) return false
              if (!trakSawStss) nKeyframes += nFrames - before
              tickRuns :+= ((trakTicks, trakMdhdTs))
            case "mvhd" if pEnd - pStart >= 100 =>
              val mb = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              val version = mb.getInt >>> 24
              if (version == 0) {
                mb.getInt; mb.getInt // ctime, mtime
                timescale = mb.getInt.toLong & 0xffffffffL
                duration = mb.getInt.toLong & 0xffffffffL
                sawMvhd = true
              }
            case "tkhd" if pEnd - pStart >= 84 =>
              val tb = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              val version = tb.getInt >>> 24
              if (version == 0) {
                nTracks += 1
                tb.position(tb.position() + 72) // through the matrix
                val w = tb.getInt >>> 16 // 16.16 fixed → integer part
                val h = tb.getInt >>> 16
                if (w > maxW) maxW = w
                if (h > maxH) maxH = h
              }
            case "stts" if pEnd - pStart >= 8 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt // version + flags
              val n = b.getInt
              if (pEnd - pStart < 8 + 8L * n) return false
              var k = 0
              while (k < n) {
                val cnt = b.getInt.toLong & 0xffffffffL
                val delta = b.getInt.toLong & 0xffffffffL
                trakTicks += cnt * delta
                k += 1
              }
            case "stsz" if pEnd - pStart >= 12 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt // version + flags
              val fixed = b.getInt.toLong & 0xffffffffL
              val n = b.getInt
              nFrames += n
              if (fixed != 0) sampleBytes += fixed * n
              else {
                if (pEnd - pStart < 12 + 4L * n) return false
                var k = 0
                while (k < n) {
                  sampleBytes += b.getInt.toLong & 0xffffffffL; k += 1
                }
              }
            case "mdhd" if pEnd - pStart >= 20 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              if (b.getInt >>> 24 == 0) { // v0: ctime(4) mtime(4) ts(4)
                b.getInt; b.getInt
                trakMdhdTs = b.getInt.toLong & 0xffffffffL
              }
            case "stss" if pEnd - pStart >= 8 =>
              val b = ByteBuffer.wrap(bytes, pStart, pEnd - pStart)
              b.getInt // version + flags
              nKeyframes += b.getInt
              trakSawStss = true
            case _ => () // udta, free ... skipped (not needed)
          }
          off = pEnd
        }
        true
      }

      if (!walk(0, bytes.length, 0) || !sawMvhd) None
      else {
        // normalize each trak's ticks from its media timescale to MOVIE
        // ticks (integer arithmetic, one division per trak); a trak with
        // no/zero mdhd (the synthesized fixtures) is taken as already in
        // movie ticks, so fixture-derived oracles are unchanged
        sampleTicks = tickRuns.map { case (t, mts) =>
          if (mts > 0 && timescale > 0 && mts != timescale)
            t * timescale / mts
          else t
        }.sum
        Some(Mp4Meta(brand, timescale, duration, nTracks, maxW, maxH,
          nFrames, sampleBytes, sampleTicks, nKeyframes))
      }
    } catch { case _: Exception => None }
}
