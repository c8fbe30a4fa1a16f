package graft.sources

import java.nio.ByteBuffer

/** Real MP4 (ISO-BMFF) container parsing, pure JDK — the video analogue of
  * [[WavCodec]]/[[PngCodec]]: frame DECODE needs an H.264 codec the build
  * doesn't have (that step stays stubbed), but the metadata a pipeline
  * actually extracts per video — duration, timescale, track count and
  * dimensions — lives in the box STRUCTURE (ftyp/moov/mvhd/trak/tkhd),
  * which is plain big-endian structural parsing. This is what ffprobe
  * does for `-show_format`.
  *
  * Box grammar: size(4 BE) type(4) payload; size==1 → 64-bit largesize
  * follows; size==0 → box extends to end of file. moov and trak are pure
  * containers. mvhd v0 carries (timescale, duration); tkhd v0 carries
  * track_id and 16.16 fixed-point width/height.
  */
object Mp4Boxes {

  final case class Mp4Meta(
      brand: String, timescale: Long, duration: Long,
      nTracks: Int, maxWidth: Int, maxHeight: Int) {
    def durationMs: Long =
      if (timescale == 0) 0L else duration * 1000L / timescale
  }

  /** Synthesize a real, spec-valid box tree: ftyp + moov(mvhd + trak(tkhd)*).
    * All values derive from the seed with integer arithmetic, so a SQL
    * oracle reproduces every field.
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
      val w = (320 + ((seed + i) % 8) * 160).toInt
      val h = (240 + ((seed + i) % 5) * 120).toInt
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
      box("trak", box("tkhd", bb.array()))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov
  }

  /** Parse the box tree; None for malformed bytes or a missing moov/mvhd. */
  def parse(bytes: Array[Byte]): Option[Mp4Meta] =
    try {
      var brand = ""
      var timescale = 0L; var duration = 0L
      var nTracks = 0; var maxW = 0; var maxH = 0
      var sawMvhd = false

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
            case "moov" | "trak" =>
              if (depth > 8 || !walk(pStart, pEnd, depth + 1)) return false
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
            case _ => () // mdia, udta, free ... skipped (not needed)
          }
          off = pEnd
        }
        true
      }

      if (!walk(0, bytes.length, 0) || !sawMvhd) None
      else Some(Mp4Meta(brand, timescale, duration, nTracks, maxW, maxH))
    } catch { case _: Exception => None }
}
