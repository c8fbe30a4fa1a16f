package graft

import graft.api.{HttpFacade, MiniJson}

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** End-to-end HTTP coverage of the facade: every reference endpoint
  * (`/root/reference/api/main.py:629-1505`) served by the engine and hit
  * through a real socket with the JDK HTTP client.
  */
class HttpFacadeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val facade = new HttpFacade(spark, sf).start()
  private lazy val client = HttpClient.newHttpClient()
  private def base = s"http://127.0.0.1:${facade.boundPort}"

  override def afterAll(): Unit = {
    try facade.stop()
    finally super.afterAll()
  }

  private def get(path: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), MiniJson.parse(r.body()))
  }

  private def post(path: String, body: String): (Int, Any) = {
    val r = client.send(
      HttpRequest.newBuilder(URI.create(s"$base$path"))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())
    (r.statusCode(), MiniJson.parse(r.body()))
  }

  private def asObj(v: Any): Map[String, Any] = v.asInstanceOf[Map[String, Any]]
  private def asArr(v: Any): List[Any] = v.asInstanceOf[List[Any]]

  test("health and json-ok respond") {
    val (c1, b1) = get("/health")
    assert(c1 === 200)
    assert(asObj(b1)("status") === "ok")
    val (c2, b2) = get("/debug/json-ok")
    assert(c2 === 200)
    assert(asObj(b2)("answer") === 42.0)
  }

  test("data/inspect reports the sales view shape") {
    val (c, b) = get("/data/inspect")
    assert(c === 200)
    val o = asObj(b)
    assert(o("row_count").asInstanceOf[Double] > 0)
    assert(asArr(o("columns")).contains("region"))
    assert(asArr(o("sample_rows")).length === 3)
  }

  test("analytics/kpi returns the four KPI fields") {
    val (c, b) = get("/analytics/kpi")
    assert(c === 200)
    val o = asObj(b)
    assert(o("total_sales").asInstanceOf[Double] > 0)
    assert(o("avg_satisfaction").asInstanceOf[Double] > 0)
    assert(o("top_region").asInstanceOf[String].nonEmpty)
    assert(o("top_product").asInstanceOf[String].nonEmpty)
  }

  test("bi endpoints return rows+columns payloads") {
    val (c1, b1) = get("/bi/region-divergence")
    assert(c1 === 200)
    assert(asArr(asObj(b1)("columns")) ===
      List("region", "slope_sales", "slope_sat", "n"))

    val (c2, b2) = get("/bi/top-products-under-30?limit=1")
    assert(c2 === 200)
    assert(asArr(asObj(b2)("rows")).length === 1)
    // reference payload parity: (product, total_sales, n)
    assert(asArr(asObj(b2)("columns")) === List("product", "total_sales", "n"))

    val (c3, b3) = get("/bi/region-trends?regions=North,South")
    assert(c3 === 200)
    val o3 = asObj(b3)
    assert(asArr(o3("regions")) === List("North", "South"))
    assert(asArr(o3("columns")) ===
      List("month", "region", "sales", "satisfaction"))
    assert(asArr(o3("rows")).nonEmpty)

    val (c4, b4) = get("/bi/region-trends?regions=")
    assert(c4 === 200)
    assert(asArr(asObj(b4)("rows")).isEmpty)
  }

  test("ts/sales-daily returns the full history with its count") {
    val (c, b) = get("/ts/sales-daily")
    assert(c === 200)
    val o = asObj(b)
    val rows = asArr(o("rows"))
    assert(rows.nonEmpty)
    assert(o("n") === rows.length.toDouble)
    // rows are [date, sales] with ISO dates
    val first = asArr(rows.head)
    assert(first.head.asInstanceOf[String].matches("\\d{4}-\\d{2}-\\d{2}"))
  }

  test("ts-forecast-v2 produces h forecast days continuing the history") {
    val (c, b) = get("/api/ts-forecast-v2?h=5&algo=drift&window=10")
    assert(c === 200)
    val o = asObj(b)
    assert(o("model") === "drift")
    val hist = asArr(o("history"))
    val fc = asArr(o("forecast"))
    assert(fc.length === 5)
    val lastHist = asArr(hist.last).head.asInstanceOf[String]
    val firstFc = asArr(fc.head).head.asInstanceOf[String]
    assert(firstFc > lastHist) // ISO dates compare lexicographically
    // legacy alias serves the same contract
    val (cl, bl) = get("/api/ts-forecast?h=3&algo=seasonal7")
    assert(cl === 200)
    assert(asArr(asObj(bl)("forecast")).length === 3)
    // out-of-range h is a 422 (see the FastAPI-parity test below)
    assert(get("/api/ts-forecast-v2?h=0")._1 === 422)
  }

  test("route decides data vs docs with a reason") {
    val (c1, b1) = get("/route?query=" + java.net.URLEncoder.encode(
      "average sales by region last quarter", "UTF-8"))
    assert(c1 === 200)
    assert(asObj(b1)("route") === "data")

    // NB not "summarize" — it CONTAINS tabular keyword "sum" (substring
    // match, reference parity) and would tie-break to data
    val (c2, b2) = post("/route", """{"query": "explain the whitepaper"}""")
    assert(c2 === 200)
    assert(asObj(b2)("route") === "docs")
    assert(asObj(b2)("route_reason").asInstanceOf[String].nonEmpty)
  }

  test("/router/route serves the same decision as /route, GET and POST") {
    val q = "average sales by region last quarter"
    val (c1, b1) = get("/router/route?query=" +
      java.net.URLEncoder.encode(q, "UTF-8"))
    assert(c1 === 200)
    assert(asObj(b1)("route") === "data")
    assert(asObj(b1)("source_used") === "data")

    val (c2, b2) = post("/router/route", """{"query": "explain the whitepaper"}""")
    assert(c2 === 200)
    assert(asObj(b2)("route") === "docs")

    // both mounts answer identically for the same query
    val (_, bare) = get("/route?query=" + java.net.URLEncoder.encode(q, "UTF-8"))
    assert(asObj(bare) === asObj(b1))
  }

  test("/debug/routes dumps every registered route with path and methods") {
    val (c, b) = get("/debug/routes")
    assert(c === 200)
    val routes = asArr(b).map(asObj)
    val paths = routes.map(_("path")).toSet
    // the reference surface: every endpoint the facade serves shows up
    for (p <- Seq("/health", "/data/inspect", "/analytics/kpi",
        "/bi/region-divergence", "/bi/top-products-under-30",
        "/bi/region-trends", "/ts/sales-daily", "/api/ts-forecast",
        "/api/ts-forecast-v2", "/route", "/router/route", "/rag/query",
        "/rag/stats", "/debug/routes"))
      assert(paths.contains(p), s"missing $p in /debug/routes dump")
    routes.foreach { r =>
      assert(r("name").asInstanceOf[String].nonEmpty)
      assert(asArr(r("methods")).nonEmpty)
    }
  }

  test("rag/query answers data questions from the sales engine") {
    val (c, b) = post("/rag/query",
      """{"query": "What are the top two products for customers under 30?"}""")
    assert(c === 200)
    val o = asObj(b)
    assert(o("source_used") === "sales_data")
    assert(o("stage") === "template")
    val table = asObj(o("table"))
    assert(asArr(table("rows")).nonEmpty)
    assert(o("answer").asInstanceOf[String].nonEmpty)
  }

  test("rag/query answers doc questions with citations") {
    val (c, b) = post("/rag/query",
      """{"query": "Summarize the key ideas from the whitepaper", "k": 2}""")
    assert(c === 200)
    val o = asObj(b)
    assert(o("source_used") === "docs")
    val cites = asArr(o("citations"))
    assert(cites.length === 2)
    assert(asObj(cites.head)("index") === 1.0)
    assert(o("answer").asInstanceOf[String].nonEmpty)
  }

  test("malformed JSON bodies are a 400, not a 500") {
    val (c, b) = post("/rag/query", """{"query": "unterminated""")
    assert(c === 400)
    assert(asObj(b)("detail").asInstanceOf[String].contains("malformed JSON"))
  }

  test("rag/query with an empty question asks for one") {
    val (c, b) = post("/rag/query", """{"query": ""}""")
    assert(c === 200)
    assert(asObj(b)("answer") === "Please provide a question.")
    assert(asObj(b)("source_used") === null)
  }

  test("rag/stats and unknown paths") {
    val (c, b) = get("/rag/stats")
    assert(c === 200)
    assert(asObj(b)("ok") === true)
    assert(asArr(asObj(b)("sample_ids")).nonEmpty)

    val (c404, b404) = get("/no/such/endpoint")
    assert(c404 === 404)
    assert(asObj(b404)("detail").asInstanceOf[String].contains("/no/such/endpoint"))
  }

  test("prefix near-misses of real routes are 404, not served (FastAPI parity)") {
    // com.sun.net.httpserver would route these to /health and
    // /analytics/kpi by longest-prefix without the exact-path check
    assert(get("/healthz")._1 === 404)
    assert(get("/analytics/kpi2")._1 === 404)
    assert(get("/analytics/kpi/extra")._1 === 404)
    assert(get("/analytics/kpi")._1 === 200) // the exact route still serves
  }

  test("out-of-range forecast params are a 422, not clamped (FastAPI parity)") {
    for (bad <- Seq("h=0", "h=366", "window=0", "window=61")) {
      val (c, b) = get(s"/api/ts-forecast-v2?$bad")
      assert(c === 422, s"$bad should 422")
      val detail = asArr(asObj(b)("detail"))
      assert(asObj(detail.head)("msg").asInstanceOf[String]
        .contains("between"), s"$bad detail: $b")
    }
    // boundary values still serve
    assert(get("/api/ts-forecast-v2?h=1&window=60")._1 === 200)
  }

  test("MiniJson rejects truncated input with IllegalArgumentException") {
    for (bad <- Seq("""{"a":1""", """[1,2""", """{"a""", """"abc""",
        """{"a":"x\""", "\"\\" + "u00")) { // a truncated "\u00 escape
      val e = intercept[Exception](MiniJson.parse(bad))
      assert(e.isInstanceOf[IllegalArgumentException],
        s"$bad threw ${e.getClass.getName}")
    }
  }

  test("MiniJson round-trips nested values") {
    val src = """{"a": [1, 2.5, "x\ny", true, null], "b": {"c": "é"}}"""
    val v = asObj(MiniJson.parse(src))
    assert(asArr(v("a")) === List(1.0, 2.5, "x\ny", true, null))
    assert(asObj(v("b"))("c") === "é")
    // writer escapes control chars and quotes
    assert(MiniJson.write("a\"b\n\u0001") === "\"a\\\"b\\n\\u0001\"")
  }
}
