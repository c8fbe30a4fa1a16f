package graft

import graft.sources.CsvNormalizer
import org.apache.spark.sql.functions.col

class CsvSpec extends SparkSpec {

  test("synonym resolution: exact beats synonym; synonyms bind in order") {
    val phys = Seq("week_start", "weekly_sales", "csat", "customer_age", "region")
    assert(CsvNormalizer.resolveColumn("date", phys) === Some("week_start"))
    assert(CsvNormalizer.resolveColumn("sales", phys) === Some("weekly_sales"))
    assert(CsvNormalizer.resolveColumn("satisfaction", phys) === Some("csat"))
    assert(CsvNormalizer.resolveColumn("age", phys) === Some("customer_age"))
    assert(CsvNormalizer.resolveColumn("region", phys) === Some("region"))
    assert(CsvNormalizer.resolveColumn("gender", phys) === None)
    // exact match wins over an earlier synonym
    assert(CsvNormalizer.resolveColumn("sales",
      Seq("revenue", "sales")) === Some("sales"))
  }

  test("ETL name normalization: strip, spaces to underscores, lowercase") {
    assert(CsvNormalizer.normalizeName("  Customer Age ") === "customer_age")
    assert(CsvNormalizer.normalizeName("Weekly Sales") === "weekly_sales")
    assert(CsvNormalizer.normalizeName("CSAT") === "csat")
  }

  test("path resolution: env override first, then candidates, then fallback") {
    val tmp = java.nio.file.Files.createTempFile("graft", ".csv").toString
    assert(CsvNormalizer.resolvePath(Some(tmp), Seq("/nope.csv")) === tmp)
    assert(CsvNormalizer.resolvePath(None, Seq("/nope.csv", tmp)) === tmp)
    assert(CsvNormalizer.resolvePath(Some("/envpath.csv"), Seq("/nope.csv"))
      === "/envpath.csv")
    assert(CsvNormalizer.resolvePath(None, Seq("/a.csv", "/b.csv")) === "/b.csv")
  }

  test("header CSV with synonym names loads onto the contract with casts") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq(("2024-01-05", "WidgetA", "North", "123.45", "29", "Male", "4.5"))
      .toDF("Order_Date", "SKU", "Market", "Revenue", "Age_Years", "Customer_Gender", "NPS")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val df = CsvNormalizer.load(spark, dir)
    assert(df.schema === CsvNormalizer.contract)
    val r = df.head()
    assert(r.getDate(0).toString === "2024-01-05")
    assert(r.getString(1) === "WidgetA" && r.getString(2) === "North")
    assert(r.getDouble(3) === 123.45 && r.getInt(4) === 29)
    assert(r.getString(5) === "Male" && r.getDouble(6) === 4.5)
  }

  test("headerless CSV falls back to positional col0..col6 without losing rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Seq(
      ("2024-01-05", "A", "North", "1.5", "30", "Male", "4.0"),
      ("2024-01-06", "B", "South", "2.5", "40", "Female", "3.0"))
      .toDF("a", "b", "c", "d", "e", "f", "g")
      .write.mode("overwrite").option("header", "false").csv(dir)
    val df = CsvNormalizer.load(spark, dir)
    assert(df.schema === CsvNormalizer.contract)
    assert(df.count() === 2) // first row must NOT be eaten as a header
  }

  test("headered CSV with unbindable names: header row is not ingested as data") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    // names no synonym binds (Spanish) → positional fallback; its header
    // line must not become a garbage row (product='producto', nulls typed)
    Seq(
      ("2024-01-05", "A", "North", "1.5", "30", "Male", "4.0"),
      ("2024-01-06", "B", "South", "2.5", "40", "Female", "3.0"))
      .toDF("fecha", "producto", "zona", "ventas", "edad", "genero", "nps_es")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val df = CsvNormalizer.load(spark, dir)
    assert(df.schema === CsvNormalizer.contract)
    assert(df.count() === 2)
    assert(df.filter(col("product") === "producto").count() === 0)
  }
}
