package graft.sources

import java.util.zip.Inflater
import scala.collection.mutable

/** Real PDF text extraction — ref A8 (`api/ingest_docs.py:30-39`,
  * `etl/index_docs.py:15-22`: pypdf page iteration + `extract_text()` per
  * page). Pure-JDK, no external codec:
  *
  *   - object discovery is a byte scan for `N G obj` (resilient to broken
  *     or absent xref tables, and covers incremental updates because the
  *     later definition of an object number wins);
  *   - streams decode FlateDecode (java.util.zip) with PNG predictors,
  *     plus ASCIIHexDecode; compressed object streams (`/Type /ObjStm`,
  *     PDF 1.5+) are expanded so xref-stream PDFs work too;
  *   - pages come from walking the catalog's page tree (`/Root → /Pages →
  *     /Kids`), falling back to `/Type /Page` objects in number order;
  *   - text is recovered by replaying the content-stream text operators
  *     (`Tj`, `TJ`, `'`, `"`) with line breaks on `Td`/`TD` (when the
  *     y-displacement is non-zero), `T*` and `ET` — the same operator
  *     subset pypdf's plain-layout mode replays.
  *
  * Out of scope (like pypdf without a `/ToUnicode` CMap): custom font
  * encodings beyond PDFDocEncoding/UTF-16BE strings, LZW/DCT filters.
  * Any parse failure yields zero pages, mirroring the reference's
  * skip-on-error ingest behavior.
  */
object PdfText {

  sealed trait PObj
  final case class PNum(v: Double) extends PObj
  final case class PName(v: String) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int) extends PObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj
  final case class PBool(b: Boolean) extends PObj
  case object PNull extends PObj

  /** Extract per-page text; Nil when `bytes` is not parseable PDF. */
  def pages(bytes: Array[Byte]): Seq[String] =
    try {
      val objs = scanObjects(bytes)
      expandObjectStreams(objs)
      val pageDicts = orderedPages(objs)
      pageDicts.map { pd =>
        extractText(pageContent(pd, objs)).replaceAll("\n{3,}", "\n\n").strip
      }
    } catch { case _: Exception => Nil }

  // ---------------------------------------------------------------- lexer

  private def isWs(b: Byte): Boolean =
    b == 0 || b == 9 || b == 10 || b == 12 || b == 13 || b == 32
  private def isDelim(b: Byte): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Recursive-descent lexer/parser over raw PDF bytes. `contentMode`
    * additionally yields bare operator tokens (content streams have no
    * indirect references, body PDFs no operators).
    */
  private final class Lexer(data: Array[Byte], var pos: Int = 0) {
    def hasNext: Boolean = { skipWs(); pos < data.length }

    def skipWs(): Unit = {
      var going = true
      while (going && pos < data.length) {
        if (isWs(data(pos))) pos += 1
        else if (data(pos) == '%') { // comment to EOL
          while (pos < data.length && data(pos) != '\n' && data(pos) != '\r') pos += 1
        } else going = false
      }
    }

    /** Advance past the next occurrence of `kw` (raw byte search) — used
      * to jump over inline-image binary payloads, which don't tokenize.
      */
    def skipPast(kw: String): Unit = {
      val idx = indexOfKeyword(kw, pos)
      pos = if (idx < 0) data.length else idx + kw.length
    }

    def peekKeyword(kw: String): Boolean = {
      skipWs()
      val end = pos + kw.length
      end <= data.length &&
        (pos until end).forall(i => data(i) == kw.charAt(i - pos)) &&
        (end == data.length || isWs(data(end)) || isDelim(data(end)))
    }

    /** Either an operator keyword (Left) or an operand object (Right). */
    def nextToken(): Either[String, PObj] = {
      skipWs()
      val b = data(pos)
      if (b == '/' ) Right(PName(lexName()))
      else if (b == '(') Right(PStr(lexLiteralString()))
      else if (b == '[') Right(lexArray())
      else if (b == '<') {
        if (pos + 1 < data.length && data(pos + 1) == '<') Right(lexDict())
        else Right(PStr(lexHexString()))
      } else if (b == ']' || b == '>' || b == ')' || b == '{' || b == '}') {
        pos += 1; Right(PNull) // stray delimiter: swallow
      } else if ((b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.')
        Right(PNum(lexNumber()))
      else Left(lexBareword())
    }

    /** Parse one object in body mode, resolving `N G R` references and
      * `stream` payloads attached to a just-parsed dict.
      */
    def parseObj(): PObj = {
      skipWs()
      val b = data(pos)
      if (b >= '0' && b <= '9') {
        val save = pos
        val n1 = lexNumber()
        val save2 = pos
        skipWs()
        if (pos < data.length && data(pos) >= '0' && data(pos) <= '9') {
          lexNumber()
          if (peekKeyword("R")) { pos += 1; return PRef(n1.toInt) }
        }
        pos = save2 // not an `N G R` reference: plain number
        PNum(n1)
      } else if (b == '+' || b == '-' || b == '.') PNum(lexNumber())
      else if (b == '/') PName(lexName())
      else if (b == '(') PStr(lexLiteralString())
      else if (b == '[') { pos += 1; lexArrayBody() }
      else if (b == '<' && pos + 1 < data.length && data(pos + 1) == '<') {
        val d = lexDict()
        if (peekKeyword("stream")) attachStream(d.asInstanceOf[PDict]) else d
      } else if (b == '<') PStr(lexHexString())
      else if (peekKeyword("true")) { pos += 4; PBool(true) }
      else if (peekKeyword("false")) { pos += 5; PBool(false) }
      else if (peekKeyword("null")) { pos += 4; PNull }
      else { lexBareword(); PNull }
    }

    private def attachStream(d: PDict): PStream = {
      pos += "stream".length
      // spec: keyword followed by CRLF or LF (not lone CR); be lenient
      if (pos < data.length && data(pos) == '\r') pos += 1
      if (pos < data.length && data(pos) == '\n') pos += 1
      val start = pos
      val declared = d.m.get("Length") match {
        case Some(PNum(n)) => Some(n.toInt)
        case _             => None // indirect /Length: fall back to scan
      }
      val end = declared
        .filter { n =>
          val e = start + n
          e >= start && e <= data.length && {
            var p = e; while (p < data.length && isWs(data(p))) p += 1
            p + 9 <= data.length && new String(data, p, 9, "ISO-8859-1") == "endstream"
          }
        }
        .map(start + _)
        .getOrElse {
          val idx = indexOfKeyword("endstream", start)
          if (idx < 0) throw new IllegalStateException("unterminated stream")
          var e = idx
          if (e > start && data(e - 1) == '\n') e -= 1
          if (e > start && data(e - 1) == '\r') e -= 1
          e
        }
      val raw = java.util.Arrays.copyOfRange(data, start, end)
      pos = math.max(end, indexOfKeyword("endstream", end)) + "endstream".length
      PStream(d, raw)
    }

    private def indexOfKeyword(kw: String, from: Int): Int = {
      val k = kw.getBytes("ISO-8859-1")
      var i = from
      while (i + k.length <= data.length) {
        var j = 0
        while (j < k.length && data(i + j) == k(j)) j += 1
        if (j == k.length) return i
        i += 1
      }
      -1
    }

    private def lexNumber(): Double = {
      val sb = new StringBuilder
      while (pos < data.length &&
          ((data(pos) >= '0' && data(pos) <= '9') || data(pos) == '+' ||
            data(pos) == '-' || data(pos) == '.')) {
        sb.append(data(pos).toChar); pos += 1
      }
      val s = sb.result()
      if (s.isEmpty || s == "." || s == "-" || s == "+") 0.0 else s.toDouble
    }

    private def lexName(): String = {
      pos += 1 // '/'
      val sb = new StringBuilder
      while (pos < data.length && !isWs(data(pos)) && !isDelim(data(pos))) {
        if (data(pos) == '#' && pos + 2 < data.length) {
          sb.append(Integer.parseInt(
            new String(data, pos + 1, 2, "ISO-8859-1"), 16).toChar)
          pos += 3
        } else { sb.append(data(pos).toChar); pos += 1 }
      }
      sb.result()
    }

    private def lexBareword(): String = {
      val sb = new StringBuilder
      while (pos < data.length && !isWs(data(pos)) && !isDelim(data(pos))) {
        sb.append(data(pos).toChar); pos += 1
      }
      if (sb.isEmpty) { pos += 1; "?" } else sb.result()
    }

    private def lexLiteralString(): Array[Byte] = {
      pos += 1 // '('
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0 && pos < data.length) {
        val c = data(pos)
        if (c == '\\' && pos + 1 < data.length) {
          pos += 1
          data(pos) match {
            case 'n' => out.write(10); pos += 1
            case 'r' => out.write(13); pos += 1
            case 't' => out.write(9); pos += 1
            case 'b' => out.write(8); pos += 1
            case 'f' => out.write(12); pos += 1
            case '(' => out.write('('); pos += 1
            case ')' => out.write(')'); pos += 1
            case '\\' => out.write('\\'); pos += 1
            case '\r' => pos += 1; if (pos < data.length && data(pos) == '\n') pos += 1
            case '\n' => pos += 1 // line continuation
            case d if d >= '0' && d <= '7' =>
              var v = 0; var k = 0
              while (k < 3 && pos < data.length &&
                  data(pos) >= '0' && data(pos) <= '7') {
                v = v * 8 + (data(pos) - '0'); pos += 1; k += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); pos += 1
          }
        } else if (c == '(') { depth += 1; out.write(c); pos += 1 }
        else if (c == ')') { depth -= 1; if (depth > 0) out.write(c); pos += 1 }
        else { out.write(c); pos += 1 }
      }
      out.toByteArray
    }

    private def lexHexString(): Array[Byte] = {
      pos += 1 // '<'
      val hex = new StringBuilder
      while (pos < data.length && data(pos) != '>') {
        val c = data(pos).toChar
        if (Character.digit(c, 16) >= 0) hex.append(c)
        pos += 1
      }
      pos += 1 // '>'
      if (hex.length % 2 == 1) hex.append('0')
      val out = new Array[Byte](hex.length / 2)
      var i = 0
      while (i < out.length) {
        out(i) = Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte
        i += 1
      }
      out
    }

    private def lexArray(): PArr = { pos += 1; lexArrayBody() }

    private def lexArrayBody(): PArr = {
      val items = Vector.newBuilder[PObj]
      skipWs()
      while (pos < data.length && data(pos) != ']') {
        items += parseObj()
        skipWs()
      }
      pos += 1 // ']'
      PArr(items.result())
    }

    private def lexDict(): PObj = {
      pos += 2 // '<<'
      val m = Map.newBuilder[String, PObj]
      skipWs()
      while (pos < data.length && data(pos) != '>') {
        if (data(pos) == '/') {
          val k = lexName()
          skipWs()
          m += k -> parseObj()
        } else pos += 1 // malformed key: skip a byte
        skipWs()
      }
      pos += 2 // '>>'
      PDict(m.result())
    }
  }

  // ------------------------------------------------------- document model

  /** Scan for `N G obj` headers; later definitions override earlier ones
    * (incremental updates append, so file order is update order).
    */
  private def scanObjects(bytes: Array[Byte]): mutable.Map[Int, PObj] = {
    val s = new String(bytes, "ISO-8859-1")
    val m = mutable.Map.empty[Int, PObj]
    val pat = java.util.regex.Pattern.compile("""(?<![0-9])(\d{1,9})\s+(\d{1,9})\s+obj\b""")
    val mt = pat.matcher(s)
    while (mt.find()) {
      val num = mt.group(1).toInt
      val lx = new Lexer(bytes, mt.end())
      // accept only if `endobj` follows — rejects false `obj` matches
      // that happen to occur inside compressed stream payloads
      try {
        val o = lx.parseObj()
        if (lx.peekKeyword("endobj")) m(num) = o
      } catch { case _: Exception => () } // tolerate broken objects
    }
    if (m.isEmpty) throw new IllegalStateException("no PDF objects")
    m
  }

  /** PDF 1.5 compressed object streams: decode `/Type /ObjStm`, parse the
    * `(objnum offset)*` header, and lift each contained object into the
    * map (direct definitions win — they are what an appended update uses).
    */
  private def expandObjectStreams(objs: mutable.Map[Int, PObj]): Unit = {
    val streams = objs.values.collect {
      case ps @ PStream(PDict(m), _)
          if m.get("Type").contains(PName("ObjStm")) => ps
    }.toVector
    streams.foreach { ps =>
      try {
        val data = decodeStream(ps)
        val n = num(ps.dict.m("N")).toInt
        val first = num(ps.dict.m("First")).toInt
        val head = new Lexer(data)
        val pairs = (0 until n).map { _ =>
          val a = head.nextToken(); val b = head.nextToken()
          (numOf(a).toInt, numOf(b).toInt)
        }
        pairs.foreach { case (onum, off) =>
          if (!objs.contains(onum)) {
            val lx = new Lexer(data, first + off)
            try objs(onum) = lx.parseObj()
            catch { case _: Exception => () }
          }
        }
      } catch { case _: Exception => () }
    }
  }

  private def numOf(t: Either[String, PObj]): Double = t match {
    case Right(PNum(v)) => v
    case _              => throw new IllegalStateException("number expected")
  }
  private def num(o: PObj): Double = o match {
    case PNum(v) => v
    case _       => throw new IllegalStateException("number expected")
  }

  private def resolve(o: PObj, objs: mutable.Map[Int, PObj], depth: Int = 0): PObj =
    o match {
      case PRef(n) if depth < 32 => resolve(objs.getOrElse(n, PNull), objs, depth + 1)
      case PRef(_)               => PNull
      case x                     => x
    }

  /** Page dicts in reading order: catalog → /Pages tree → /Kids walk; if
    * the tree is absent/broken, every `/Type /Page` in object-number order.
    */
  private def orderedPages(objs: mutable.Map[Int, PObj]): Seq[PDict] = {
    def dictOf(o: PObj): Option[PDict] = resolve(o, objs) match {
      case d: PDict          => Some(d)
      case PStream(d, _)     => Some(d)
      case _                 => None
    }
    val catalog = objs.values.flatMap(dictOf).find(
      _.m.get("Type").contains(PName("Catalog")))
    val visited = mutable.Set.empty[PDict]
    def walk(node: PDict): Vector[PDict] =
      if (!visited.add(node)) Vector.empty
      else node.m.get("Type") match {
        case Some(PName("Page")) => Vector(node)
        case Some(PName("Pages")) =>
          resolve(node.m.getOrElse("Kids", PNull), objs) match {
            case PArr(kids) => kids.toVector.flatMap(k => dictOf(k).toVector.flatMap(walk))
            case _          => Vector.empty
          }
        case _ => Vector.empty
      }
    val fromTree = for {
      cat   <- catalog
      pages <- dictOf(cat.m.getOrElse("Pages", PNull))
    } yield walk(pages)
    fromTree.filter(_.nonEmpty).getOrElse {
      objs.toSeq.sortBy(_._1).flatMap(kv => dictOf(kv._2))
        .filter(_.m.get("Type").contains(PName("Page")))
    }
  }

  private def pageContent(page: PDict, objs: mutable.Map[Int, PObj]): Array[Byte] = {
    val streams = resolve(page.m.getOrElse("Contents", PNull), objs) match {
      case ps: PStream => Vector(ps)
      case PArr(items) =>
        items.toVector.map(resolve(_, objs)).collect { case ps: PStream => ps }
      case _ => Vector.empty
    }
    // multiple content streams form ONE logical stream, whitespace-joined
    streams.map(decodeStream).foldLeft(Array.emptyByteArray) { (acc, b) =>
      if (acc.isEmpty) b else acc ++ Array[Byte]('\n') ++ b
    }
  }

  // ------------------------------------------------------- stream filters

  private def decodeStream(ps: PStream): Array[Byte] = {
    val filters = ps.dict.m.get("Filter") match {
      case Some(PName(f))   => Vector(f)
      case Some(PArr(fs))   => fs.toVector.collect { case PName(f) => f }
      case _                => Vector.empty
    }
    val parms: Vector[Option[PDict]] = ps.dict.m.get("DecodeParms") match {
      case Some(d: PDict)  => Vector(Some(d))
      case Some(PArr(ds))  => ds.toVector.map { case d: PDict => Some(d); case _ => None }
      case _               => Vector.empty
    }
    filters.zipWithIndex.foldLeft(ps.raw) { case (data, (f, i)) =>
      val p = parms.lift(i).flatten
      f match {
        case "FlateDecode"    => unpredict(inflate(data), p)
        case "ASCIIHexDecode" => asciiHex(data)
        case _                => data // unsupported (LZW/DCT/...): pass through
      }
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return out.toByteArray // truncated
        out.write(buf, 0, n)
      }
      out.toByteArray
    } finally inf.end()
  }

  /** PNG row predictors (Predictor >= 10) — used by ObjStm/xref streams. */
  private def unpredict(data: Array[Byte], parms: Option[PDict]): Array[Byte] = {
    val pred = parms.flatMap(_.m.get("Predictor")).collect { case PNum(v) => v.toInt }
      .getOrElse(1)
    if (pred < 10) return data
    val cols = parms.flatMap(_.m.get("Columns")).collect { case PNum(v) => v.toInt }
      .getOrElse(1)
    val colors = parms.flatMap(_.m.get("Colors")).collect { case PNum(v) => v.toInt }
      .getOrElse(1)
    val bpc = parms.flatMap(_.m.get("BitsPerComponent")).collect { case PNum(v) => v.toInt }
      .getOrElse(8)
    val bpp = math.max(1, colors * bpc / 8)
    val rowLen = (cols * colors * bpc + 7) / 8
    val nRows = data.length / (rowLen + 1)
    val out = new Array[Byte](nRows * rowLen)
    var r = 0
    while (r < nRows) {
      val tag = data(r * (rowLen + 1)) & 0xff
      val src = r * (rowLen + 1) + 1
      val dst = r * rowLen
      var i = 0
      while (i < rowLen) {
        val raw = data(src + i) & 0xff
        val left = if (i >= bpp) out(dst + i - bpp) & 0xff else 0
        val up = if (r > 0) out(dst - rowLen + i) & 0xff else 0
        val upLeft = if (r > 0 && i >= bpp) out(dst - rowLen + i - bpp) & 0xff else 0
        val v = tag match {
          case 0 => raw
          case 1 => raw + left
          case 2 => raw + up
          case 3 => raw + (left + up) / 2
          case 4 => // Paeth
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up)
            val pc = math.abs(p - upLeft)
            raw + (if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft)
          case _ => raw
        }
        out(dst + i) = (v & 0xff).toByte
        i += 1
      }
      r += 1
    }
    out
  }

  private def asciiHex(data: Array[Byte]): Array[Byte] = {
    val hex = new StringBuilder
    var i = 0
    var done = false
    while (i < data.length && !done) {
      val c = data(i).toChar
      if (c == '>') done = true
      else if (Character.digit(c, 16) >= 0) hex.append(c)
      i += 1
    }
    if (hex.length % 2 == 1) hex.append('0')
    val out = new Array[Byte](hex.length / 2)
    var j = 0
    while (j < out.length) {
      out(j) = Integer.parseInt(hex.substring(2 * j, 2 * j + 2), 16).toByte
      j += 1
    }
    out
  }

  // ------------------------------------------------------ text extraction

  /** Replay text-showing operators of one page's content stream. */
  private def extractText(cs: Array[Byte]): String = {
    if (cs.isEmpty) return ""
    val lx = new Lexer(cs)
    val sb = new StringBuilder
    val operands = mutable.ArrayBuffer.empty[PObj]
    def newline(): Unit =
      if (sb.nonEmpty && !sb.endsWith("\n")) sb.append('\n')
    def show(o: PObj): Unit = o match {
      case PStr(b) => sb.append(decodeText(b))
      case _       => ()
    }
    while (lx.hasNext) {
      lx.nextToken() match {
        case Right(obj) => operands += obj
        case Left(op) =>
          op match {
            case "Tj" => operands.lastOption.foreach(show)
            case "TJ" =>
              operands.lastOption.foreach {
                case PArr(items) => items.foreach {
                  case s: PStr => show(s)
                  case _       => () // kerning adjustments: positional only
                }
                case _ => ()
              }
            case "'" => newline(); operands.lastOption.foreach(show)
            case "\"" => newline(); operands.lastOption.foreach(show)
            case "Td" | "TD" =>
              // operands = [tx, ty]; break only on real vertical movement
              val ty = operands.lastOption.collect { case PNum(v) => v }.getOrElse(0.0)
              if (ty != 0.0) newline()
            case "T*" => newline()
            case "ET" => newline()
            case "BI" => lx.skipPast("EI") // inline image: binary payload
            case _ => ()
          }
          operands.clear()
      }
    }
    sb.result()
  }

  /** PDF text strings: UTF-16BE when BOM'd, else PDFDocEncoding — which is
    * latin-1-compatible over the printable range fonts actually emit.
    */
  private def decodeText(b: Array[Byte]): String =
    if (b.length >= 2 && (b(0) & 0xff) == 0xfe && (b(1) & 0xff) == 0xff)
      new String(b, 2, b.length - 2, "UTF-16BE")
    else new String(b, "ISO-8859-1")
}
