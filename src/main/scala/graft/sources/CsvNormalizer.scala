package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV ingestion + schema normalization — refs A1–A5 and §1.3
  * (`/root/reference/api/main.py:163-234`, `etl/run.py:11-18`):
  *
  *  - header scan with inference (A1), falling back to positional
  *    `col0..col6` when the expected headers are absent (A2)
  *  - normalizing projection with casts onto the stable 7-column contract
  *    (A3): date DATE, product TEXT, region TEXT, sales DOUBLE, age INT,
  *    gender TEXT, satisfaction DOUBLE
  *  - candidate-path resolution with env override (A4)
  *  - ETL-style column-name normalization: strip, spaces→underscores,
  *    lowercase (A5)
  *  - synonym resolution for logical→physical column binding (§1.3,
  *    `api/main.py:1004-1024`)
  *
  * Scale note: `inferSchema` samples the file — on a 100 TB ingest you pass
  * the explicit contract schema instead (both paths exist below); the
  * normalizing projection is a zero-shuffle map.
  */
object CsvNormalizer {

  /** The normalized sales contract (SURVEY §1.2). */
  val contract: StructType = StructType(Seq(
    StructField("date", DateType),
    StructField("product", StringType),
    StructField("region", StringType),
    StructField("sales", DoubleType),
    StructField("age", IntegerType),
    StructField("gender", StringType),
    StructField("satisfaction", DoubleType)))

  /** A4 — env override first, then candidate probing, else the override or
    * last candidate (`api/main.py:163-169`).
    */
  def resolvePath(envValue: Option[String], candidates: Seq[String]): String = {
    val all = envValue.map(_.trim).filter(_.nonEmpty).toSeq ++ candidates
    all.find(p => new java.io.File(p).exists())
      .orElse(envValue.filter(_.nonEmpty))
      .getOrElse(candidates.last)
  }

  /** A5 — ETL column-name normalization (`etl/run.py:13-14`). */
  def normalizeName(c: String): String =
    c.trim.replaceAll("\\s+", "_").toLowerCase

  /** §1.3 — synonym table (`api/main.py:1010-1017`). */
  private val synonyms: Map[String, Seq[String]] = Map(
    "date" -> Seq("date", "dt", "day", "order_date", "week", "week_start", "week_ending"),
    "region" -> Seq("region", "state", "area", "market"),
    "product" -> Seq("product", "product_name", "sku", "item"),
    "sales" -> Seq("sales", "revenue", "amount", "total_sales", "weekly_sales"),
    "satisfaction" -> Seq("satisfaction", "csat", "nps", "customer_satisfaction"),
    "age" -> Seq("age", "customer_age", "age_years"),
    "gender" -> Seq("gender", "customer_gender", "sex"))

  /** Resolve a logical column against available physical columns: exact
    * (case-insensitive) match first, then the synonym list
    * (`api/main.py:1004-1024`).
    */
  def resolveColumn(logical: String, physical: Seq[String]): Option[String] = {
    val lower = physical.map(c => c.toLowerCase -> c).toMap
    lower.get(logical.toLowerCase)
      .orElse(
        synonyms.getOrElse(logical.toLowerCase, Nil)
          .collectFirst { case s if lower.contains(s) => lower(s) })
  }

  /** A1+A2+A3 — load a sales CSV and normalize to the contract. Headers are
    * matched through the synonym resolver after ETL name normalization; if
    * any of the 7 logical columns fails to bind, falls back to the
    * positional headerless scan (`api/main.py:195-231`).
    */
  def load(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)
    val physical = raw.columns.map(normalizeName).toSeq
    val renamed = raw.toDF(physical: _*)
    val bindings = contract.fields.map(f =>
      f.name -> resolveColumn(f.name, physical))
    if (bindings.forall(_._2.isDefined)) {
      renamed.select(bindings.map { case (logical, Some(phys)) =>
        col(phys).cast(contract(logical).dataType).as(logical)
      }.toSeq: _*)
    } else {
      // A2 — headerless positional fallback
      val positional = StructType(
        (0 until 7).map(i => StructField(s"col$i", StringType)))
      // try_cast, not cast: a malformed typed field (above all, the header
      // line of a headered-but-unbindable file) must coerce to NULL — the
      // reference's pandas-coerce semantics — not throw under ANSI mode
      spark.read.schema(positional).csv(path)
        .select(
          expr("try_cast(col0 AS DATE)").as("date"),
          col("col1").as("product"),
          col("col2").as("region"),
          expr("try_cast(col3 AS DOUBLE)").as("sales"),
          expr("try_cast(col4 AS INT)").as("age"),
          col("col5").as("gender"),
          expr("try_cast(col6 AS DOUBLE)").as("satisfaction"))
        // a headered file whose names fail synonym binding also lands
        // here, and its header line would otherwise ingest as a garbage
        // row ("producto" as a product, null everywhere typed). A row
        // where EVERY typed field fails its cast carries no contract
        // signal — that is what a header row looks like positionally —
        // so drop exactly those
        .filter(
          col("date").isNotNull || col("sales").isNotNull ||
            col("age").isNotNull || col("satisfaction").isNotNull)
    }
  }

  /** A1 with an explicit schema — the 100 TB path (no inference sampling). */
  def loadWithContract(spark: SparkSession, path: String,
      header: Boolean): DataFrame =
    spark.read.option("header", header.toString).schema(contract).csv(path)
}
