package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document corpus sources — refs A8–A10
  * (`/root/reference/api/ingest_docs.py:30-42`, `:104-110`,
  * `etl/index_docs.py:15-32`, `:68-72`): recursive directory iteration
  * filtered by extension, text extraction per file, page splitting.
  *
  * PDFs decode for real via [[PdfText]] (pure-JDK: Flate streams, page
  * tree, text-operator replay); [[pdfPagesStub]] remains as the
  * deterministic test fake behind the same (bytes → pages) signature.
  */
object DocSources {

  /** A10 — recursive glob over a directory as a binary-file scan; each row
    * (path, length, content). The scan distributes across executors and
    * prunes by the glob at file-listing time.
    */
  def binaryDir(spark: SparkSession, dir: String, glob: String): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)
      .select(col("path"), col("length"), col("content"))

  /** A9 — TXT/MD source: decode UTF-8, one row per file. */
  def textFiles(spark: SparkSession, dir: String): DataFrame =
    binaryDir(spark, dir, "*.{txt,md}")
      .select(
        col("path").as("source"),
        decode(col("content"), "UTF-8").as("text"))

  /** JSONL corpus source — one JSON object per line, the de-facto
    * training-data interchange format (extension beyond the reference's
    * TXT/MD/PDF/DOCX set). Spark's json reader is line-delimited by
    * default, so files of any size split per line across executors; the
    * EXPLICIT schema keeps the scan single-pass (no inference job reads
    * the data twice) and prunes unknown keys at parse time.
    */
  def jsonlDocs(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** A8 — PDF page source, REAL extraction: [[PdfText.pages]] decodes the
    * document (FlateDecode streams, page-tree walk, text-operator replay)
    * into one row per page, exactly the `(source, page, text)` records the
    * reference builds via pypdf (`api/ingest_docs.py:30-39`). Unparseable
    * files yield zero pages (the reference's skip-on-error).
    */
  def pdfPages(spark: SparkSession, dir: String): DataFrame = {
    val extract = udf((bytes: Array[Byte]) => PdfText.pages(bytes))
    binaryDir(spark, dir, "*.pdf")
      .select(col("path").as("source"), posexplode(extract(col("content"))))
      .withColumnRenamed("pos", "page")
      .withColumnRenamed("col", "text")
      .withColumn("page", col("page") + 1)
  }

  /** A8 (test fake) — PDF page source with the decode step stubbed: pages
    * = form-feed splits of the payload. Kept as the deterministic fixture
    * for specs that need page semantics without building a real PDF.
    */
  def pdfPagesStub(spark: SparkSession, dir: String): DataFrame =
    binaryDir(spark, dir, "*.pdf")
      .select(col("path").as("source"),
        posexplode(split(decode(col("content"), "UTF-8"), "\f")))
      .withColumnRenamed("pos", "page")
      .withColumnRenamed("col", "text")
      .withColumn("page", col("page") + 1)

  /** A9 — DOCX source, REAL extraction (no stub): a .docx is a ZIP whose
    * `word/document.xml` holds the text in `<w:t>` runs grouped by `<w:p>`
    * paragraphs — `java.util.zip` + the JDK's StAX parser cover it with no
    * external codec. Reference parity: `etl/index_docs.py:24-27`
    * (docx2txt) treats the whole document as one page, paragraphs joined
    * by newlines; unreadable files yield empty text (its `or ""`).
    */
  def docxFiles(spark: SparkSession, dir: String): DataFrame = {
    val extract = udf((bytes: Array[Byte]) => DocxText.extract(bytes))
    binaryDir(spark, dir, "*.docx")
      .select(col("path").as("source"),
        lit(1).as("page"),
        extract(col("content")).as("text"))
  }

  /** All reference-supported document types under one roof
    * (`etl/index_docs.py:69-73` globs pdf+docx+txt+md): (source, page,
    * text) rows ready for the chunk→embed→upsert pipeline.
    */
  def allDocs(spark: SparkSession, dir: String): DataFrame =
    textFiles(spark, dir).select(col("source"), lit(1).as("page"), col("text"))
      .unionByName(pdfPages(spark, dir))
      .unionByName(docxFiles(spark, dir))
}

/** DOCX text extraction: minimal OOXML reader. Understands `<w:t>` text
  * runs, `<w:tab/>` as tab, `<w:br/>`/`<w:cr/>` as newline, and paragraph
  * boundaries as blank lines (docx2txt's layout). Pure-JDK (zip + StAX),
  * safe to call per row inside an executor.
  */
object DocxText {
  def extract(bytes: Array[Byte]): String =
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(bytes))
      Iterator.continually(zin.getNextEntry)
        .takeWhile(_ != null)
        .find(_.getName == "word/document.xml")
        .map { _ => parseDocumentXml(zin) }
        .getOrElse("")
    } catch { case _: Exception => "" }

  private def parseDocumentXml(in: java.io.InputStream): String = {
    import javax.xml.stream.XMLStreamConstants._
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    val r = f.createXMLStreamReader(in, "UTF-8")
    val sb = new StringBuilder
    var inT = false
    while (r.hasNext) {
      r.next() match {
        case START_ELEMENT =>
          r.getLocalName match {
            case "t"  => inT = true
            case "tab" => sb.append('\t')
            case "br" | "cr" => sb.append('\n')
            case _ => ()
          }
        case CHARACTERS | CDATA if inT => sb.append(r.getText)
        case END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "p" => sb.append("\n\n")
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    sb.result().stripTrailing()
  }
}
