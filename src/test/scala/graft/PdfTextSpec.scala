package graft

import graft.sources.{DocSources, PdfText}
import java.nio.file.Files
import scala.collection.mutable

/** A8 — real PDF extraction. The fixtures are genuinely valid PDFs built
  * byte-by-byte (classic xref table, FlateDecode content streams, and a
  * PDF-1.5 compressed object stream with PNG predictors), not captured
  * blobs, so the test pins the parser to the format spec.
  */
class PdfTextSpec extends SparkSpec {

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end(); out.toByteArray
  }

  /** Apply the PNG "Up" predictor (code 2 per row) the way a PDF writer
    * would before Flate, so the reader's unpredict path is exercised.
    */
  private def pngUpPredict(data: Array[Byte], cols: Int): Array[Byte] = {
    val pad = (cols - data.length % cols) % cols
    val rows = (data ++ Array.fill(pad)(0.toByte)).grouped(cols).toArray
    val out = new java.io.ByteArrayOutputStream()
    rows.zipWithIndex.foreach { case (row, r) =>
      out.write(2)
      row.indices.foreach { i =>
        val up = if (r == 0) 0 else rows(r - 1)(i) & 0xff
        out.write(((row(i) & 0xff) - up) & 0xff)
      }
    }
    out.toByteArray
  }

  /** Build a complete classic-xref PDF: catalog, page tree, one content
    * stream per page (optionally Flate-compressed), correct offsets.
    */
  private def buildPdf(pages: Seq[(Array[Byte], Boolean)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = mutable.Map.empty[Int, Int]
    def obj(n: Int)(body: => Unit): Unit = {
      offsets(n) = out.size(); w(s"$n 0 obj\n"); body; w("\nendobj\n")
    }
    w("%PDF-1.4\n%âãÏÓ\n")
    obj(1) { w("<< /Type /Catalog /Pages 2 0 R >>") }
    val kids = pages.indices.map(i => s"${3 + 2 * i} 0 R").mkString(" ")
    obj(2) { w(s"<< /Type /Pages /Kids [$kids] /Count ${pages.size} >>") }
    pages.zipWithIndex.foreach { case ((content, compress), i) =>
      val pn = 3 + 2 * i; val cn = 4 + 2 * i
      obj(pn) {
        w(s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 << /BaseFont /Helvetica >> >> >> " +
          s"/Contents $cn 0 R >>")
      }
      val data = if (compress) deflate(content) else content
      obj(cn) {
        w(s"<< /Length ${data.length}" +
          s"${if (compress) " /Filter /FlateDecode" else ""} >>\nstream\n")
        out.write(data)
        w("\nendstream")
      }
    }
    val xrefPos = out.size()
    val maxObj = 2 + 2 * pages.size
    w(s"xref\n0 ${maxObj + 1}\n0000000000 65535 f \n")
    (1 to maxObj).foreach(n => w(f"${offsets(n)}%010d 00000 n \n"))
    w(s"trailer\n<< /Size ${maxObj + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n")
    out.toByteArray
  }

  /** Build a PDF-1.5-style document whose catalog/page-tree objects live
    * inside a Flate+PNG-predictor compressed object stream (/ObjStm).
    */
  private def buildObjStmPdf(content: Array[Byte]): Array[Byte] = {
    val bodies = Seq(
      1 -> "<< /Type /Catalog /Pages 2 0 R >>",
      2 -> "<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
      3 -> "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>")
    val offs = bodies.map(_._2.length + 1).scanLeft(0)(_ + _)
    val header = bodies.zip(offs).map { case ((n, _), o) => s"$n $o" }
      .mkString("", " ", " ")
    val payload = (header + bodies.map(_._2).mkString(" ") + " ")
      .getBytes("ISO-8859-1")
    val cols = 8
    val stm = deflate(pngUpPredict(payload, cols))
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"4 0 obj\n<< /Length ${content.length} >>\nstream\n")
    out.write(content)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj\n<< /Type /ObjStm /N ${bodies.size} /First ${header.length}" +
      s" /Length ${stm.length} /Filter /FlateDecode" +
      s" /DecodeParms << /Predictor 12 /Columns $cols >> >>\nstream\n")
    out.write(stm)
    w("\nendstream\nendobj\n%%EOF\n")
    out.toByteArray
  }

  private val page1 = ("BT /F1 12 Tf 72 720 Td (Hello, ) Tj " +
    "[(PDF) -20 ( world)] TJ T* (line two) Tj ET").getBytes("ISO-8859-1")
  // escapes, hex strings, zero-vertical Td, UTF-16BE BOM string
  private val page2: Array[Byte] =
    ("BT 0 -14 Td (paren \\( test \\) octal \\101) Tj " +
      "( and hex ) Tj <484921> Tj 0 0 Td ( same line) Tj " +
      "T* (utf16: ) Tj (").getBytes("ISO-8859-1") ++
      Array[Byte](0xFE.toByte, 0xFF.toByte, 0, 'H', 0, 'i') ++
      ") Tj ET".getBytes("ISO-8859-1")

  test("pdf: flate + raw content streams, escapes, hex, TJ arrays, lines") {
    val pdf = buildPdf(Seq(page1 -> true, page2 -> false))
    val pages = PdfText.pages(pdf)
    assert(pages.length === 2)
    assert(pages(0) === "Hello, PDF world\nline two")
    assert(pages(1) ===
      "paren ( test ) octal A and hex HI! same line\nutf16: Hi")
  }

  test("pdf: compressed object streams (ObjStm) with PNG predictor decode") {
    val pdf = buildObjStmPdf("BT (from objstm) Tj ET".getBytes("ISO-8859-1"))
    assert(PdfText.pages(pdf) === Seq("from objstm"))
  }

  test("pdf: unparseable bytes yield zero pages (reference skip-on-error)") {
    assert(PdfText.pages("not a pdf at all".getBytes) === Nil)
    assert(PdfText.pages(Array.emptyByteArray) === Nil)
    // valid header, truncated body
    assert(PdfText.pages("%PDF-1.4\n1 0 obj\n<< /Ty".getBytes) === Nil)
  }

  test("pdf: DataFrame source explodes 1-based pages; ingest path consumes") {
    val dir = Files.createTempDirectory("graft_realpdf")
    Files.write(dir.resolve("doc.pdf"), buildPdf(Seq(page1 -> true, page2 -> false)))
    Files.write(dir.resolve("bad.pdf"), "binary junk".getBytes)
    val rows = DocSources.pdfPages(spark, dir.toString).orderBy("page").collect()
    assert(rows.length === 2) // bad.pdf contributes no pages
    assert(rows.map(_.getInt(1)).toSeq === Seq(1, 2))
    assert(rows.head.getString(2) === "Hello, PDF world\nline two")

    // q87 ingest path: pages → (doc_id, source, text) → chunk/embed/store
    import org.apache.spark.sql.functions._
    val docs = DocSources.pdfPages(spark, dir.toString)
      .select(
        xxhash64(col("source"), col("page")).as("doc_id"),
        concat_ws("#p", col("source"), col("page")).as("source"),
        col("text"))
    val store = graft.api.Rag.ingestCorpus(docs, graft.api.Rag.hashEmbedder)
    val out = store.collect()
    assert(out.length >= 2)
    assert(out.forall(_.getAs[Seq[Float]]("embedding").length === graft.api.Rag.Dim))
  }
}
