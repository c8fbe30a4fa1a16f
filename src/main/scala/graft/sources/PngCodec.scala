package graft.sources

import java.util.zip.{CRC32, Deflater, Inflater}

/** Real PNG encode + decode for 8-bit grayscale, pure JDK — zlib lives in
  * `java.util.zip`, so like WAV (and the PDF FlateDecode path) the image
  * modality needs no external codec for this profile: chunk walk with CRC
  * validation, multi-IDAT concatenation, zlib inflate, and ALL FIVE PNG
  * scanline filters (None/Sub/Up/Average/Paeth) unfiltered per the spec.
  * Non-grayscale / non-8-bit / interlaced files return None (decode what
  * the profile covers, skip the rest — the doc-source contract).
  *
  * Feature extraction is exact integer arithmetic (pixel sum, min, max) so
  * a SQL oracle recomputes it bit-for-bit from the synthesis closed form.
  */
object PngCodec {

  final case class PngImage(width: Int, height: Int, pixels: Array[Byte]) {
    def nPixels: Long = width.toLong * height
    def pixelSum: Long = {
      var acc = 0L; var i = 0
      while (i < pixels.length) { acc += pixels(i) & 0xff; i += 1 }
      acc
    }
    def pixelMin: Int = {
      var m = 255; var i = 0
      while (i < pixels.length) { val v = pixels(i) & 0xff; if (v < m) m = v; i += 1 }
      if (pixels.isEmpty) 0 else m
    }
    def pixelMax: Int = {
      var m = 0; var i = 0
      while (i < pixels.length) { val v = pixels(i) & 0xff; if (v > m) m = v; i += 1 }
      m
    }
    /** Nearest-neighbor resize — the integer-exact multimodal resize op. */
    def resize(w2: Int, h2: Int): PngImage = {
      require(w2 >= 1 && h2 >= 1, s"resize target must be >= 1x1, got ${w2}x$h2")
      val out = new Array[Byte](w2 * h2)
      var y = 0
      while (y < h2) {
        val sy = (y.toLong * height / h2).toInt
        var x = 0
        while (x < w2) {
          out(y * w2 + x) = pixels(sy * width + (x.toLong * width / w2).toInt)
          x += 1
        }
        y += 1
      }
      PngImage(w2, h2, out)
    }
  }

  private val Signature =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(12 + data.length) // big-endian
    out.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
    val crc = new CRC32
    crc.update(tag.getBytes("US-ASCII")); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** Encode 8-bit grayscale pixels (row-major) as a real PNG. `filterType`
    * selects the scanline filter (0–4) applied to every row — type 0 for
    * fixtures; the others exist so round-trip tests exercise every
    * unfilter path with spec-correct filtered bytes.
    */
  def encode(img: PngImage, filterType: Int = 0): Array[Byte] = {
    require(filterType >= 0 && filterType <= 4,
      s"PNG filter type must be 0..4, got $filterType")
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(img.width).putInt(img.height)
      .put(8.toByte).put(0.toByte) // bit depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, adaptive, no interlace
      .array()
    val w = img.width
    val raw = new Array[Byte]((w + 1) * img.height)
    var y = 0
    while (y < img.height) {
      raw(y * (w + 1)) = filterType.toByte
      var x = 0
      while (x < w) {
        val orig = img.pixels(y * w + x) & 0xff
        val left = if (x > 0) img.pixels(y * w + x - 1) & 0xff else 0
        val up = if (y > 0) img.pixels((y - 1) * w + x) & 0xff else 0
        val ul = if (x > 0 && y > 0) img.pixels((y - 1) * w + x - 1) & 0xff else 0
        val filtered = filterType match {
          case 0 => orig
          case 1 => orig - left
          case 2 => orig - up
          case 3 => orig - (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - ul)
            orig - (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
        }
        raw(y * (w + 1) + 1 + x) = (filtered & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val zout = new java.io.ByteArrayOutputStream()
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    Signature ++ chunk("IHDR", ihdr) ++ chunk("IDAT", zout.toByteArray) ++
      chunk("IEND", Array.emptyByteArray)
  }

  /** Deterministic grayscale fixture: pixel(x,y) = (7x + 13y + seed) mod 256. */
  def synthesize(seed: Long, width: Int, height: Int): Array[Byte] = {
    val px = new Array[Byte](width * height)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        px(y * width + x) = ((7L * x + 13L * y + seed) % 256L).toByte
        x += 1
      }
      y += 1
    }
    encode(PngImage(width, height, px))
  }

  /** Decode an 8-bit grayscale PNG; None for malformed bytes, bad CRCs, or
    * profiles outside gray8 non-interlaced.
    */
  def decode(bytes: Array[Byte]): Option[PngImage] =
    try {
      if (bytes.length < 8 || !bytes.take(8).sameElements(Signature)) return None
      val bb = java.nio.ByteBuffer.wrap(bytes, 8, bytes.length - 8)
      var w, h = 0
      var ok = false
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done && bb.remaining() >= 12) {
        val len = bb.getInt
        if (len < 0 || len > bb.remaining() - 8) return None
        val tagB = new Array[Byte](4); bb.get(tagB)
        val tag = new String(tagB, "US-ASCII")
        val data = new Array[Byte](len); bb.get(data)
        val expect = bb.getInt
        val crc = new CRC32; crc.update(tagB); crc.update(data)
        if (crc.getValue.toInt != expect) return None
        tag match {
          case "IHDR" =>
            val ib = java.nio.ByteBuffer.wrap(data)
            w = ib.getInt; h = ib.getInt
            val depth = ib.get(); val color = ib.get()
            ib.get(); ib.get(); val interlace = ib.get()
            if (depth != 8 || color != 0 || interlace != 0) return None
            if (w <= 0 || h <= 0 || w.toLong * h > (1L << 28)) return None
            ok = true
          case "IDAT" => idat.write(data)
          case "IEND" => done = true
          case _ => () // ancillary chunks (tEXt, pHYs, ...) skip
        }
      }
      if (!ok) return None
      val inflater = new Inflater()
      inflater.setInput(idat.toByteArray)
      val raw = new Array[Byte]((w + 1) * h)
      var off = 0
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        if (n == 0 && inflater.needsInput()) return None // truncated stream
        off += n
      }
      inflater.end()
      if (off != raw.length) return None
      // unfilter (bpp = 1 for gray8): spec §9 — all five filter types
      val px = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        val ft = raw(y * (w + 1)) & 0xff
        var x = 0
        while (x < w) {
          val cur = raw(y * (w + 1) + 1 + x) & 0xff
          val left = if (x > 0) px(y * w + x - 1) & 0xff else 0
          val up = if (y > 0) px((y - 1) * w + x) & 0xff else 0
          val ul = if (x > 0 && y > 0) px((y - 1) * w + x - 1) & 0xff else 0
          val recon = ft match {
            case 0 => cur
            case 1 => cur + left
            case 2 => cur + up
            case 3 => cur + (left + up) / 2
            case 4 =>
              val p = left + up - ul
              val pa = math.abs(p - left); val pb = math.abs(p - up)
              val pc = math.abs(p - ul)
              cur + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul)
            case _ => return None
          }
          px(y * w + x) = (recon & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(PngImage(w, h, px))
    } catch { case _: Exception => None }
}
