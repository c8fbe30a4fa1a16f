package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Document corpus sources — refs A8–A10
  * (`/root/reference/api/ingest_docs.py:30-42`, `:104-110`,
  * `etl/index_docs.py:15-32`, `:68-72`): recursive directory iteration
  * filtered by extension, text extraction per file, page splitting.
  *
  * PDFs: no PDF codec ships in this container — [[pdfPagesStub]] splits on
  * form-feed, the layout most text-extracted PDFs carry; a real deployment
  * swaps in a pdf library behind the same (bytes → pages) signature.
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

  /** A8 — PDF page source with the decode step STUBBED: pages = form-feed
    * splits of the payload (real impl: pdf text extraction per page).
    * Output (source, page, text) matches the reference's page records.
    */
  def pdfPagesStub(spark: SparkSession, dir: String): DataFrame =
    binaryDir(spark, dir, "*.pdf")
      .select(col("path").as("source"),
        posexplode(split(decode(col("content"), "UTF-8"), "\f")))
      .withColumnRenamed("pos", "page")
      .withColumnRenamed("col", "text")
      .withColumn("page", col("page") + 1)
}
