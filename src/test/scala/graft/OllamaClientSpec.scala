package graft

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.api.{MiniJson, OllamaClient, OllamaConfig, Rag}
import org.scalatest.funsuite.AnyFunSuite

import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger

/** The real HTTP Ollama client driven against a local stub server — the
  * transport the reference exercises (`api/ollama_embedder.py:28-44`,
  * `api/main.py:1442-1481`) proven end-to-end through the existing
  * retry/backoff contract, with no model in the loop.
  */
class OllamaClientSpec extends AnyFunSuite {

  /** Stub Ollama: records request bodies; fails the first `failures`
    * calls per path with HTTP 500 (the transport error requests'
    * raise_for_status turns into an exception).
    */
  private def withStub(failures: Int)(
      f: (OllamaClient, () => List[(String, String)]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new java.util.concurrent.CopyOnWriteArrayList[(String, String)]()
    val failed = new AtomicInteger(0)
    def handler(path: String, respond: Map[String, Any] => String): Unit =
      server.createContext(path, (ex: HttpExchange) => {
        val body = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
        seen.add(path -> body)
        val (status, out) =
          if (failed.getAndIncrement() < failures) (500, """{"error":"boom"}""")
          else {
            val req = MiniJson.parse(body).asInstanceOf[Map[String, Any]]
            (200, respond(req))
          }
        val bytes = out.getBytes("UTF-8")
        ex.sendResponseHeaders(status, bytes.length.toLong)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    // embedding: a deterministic function of the prompt, so the test can
    // assert the vector round-trips through JSON
    handler("/api/embeddings", req => {
      val p = req("prompt").toString
      MiniJson.obj("embedding" -> Seq(p.length.toDouble, 0.5)).json
    })
    handler("/api/generate", req =>
      MiniJson.obj("response" -> s"  echo:${req("model")}  ").json)
    server.start()
    val cfg = OllamaConfig(
      baseUrl = s"http://127.0.0.1:${server.getAddress.getPort}")
    try f(new OllamaClient(cfg), () => {
      val it = seen.iterator(); val b = List.newBuilder[(String, String)]
      while (it.hasNext) b += it.next()
      b.result()
    })
    finally server.stop(0)
  }

  test("embed round-trips the Ollama JSON protocol") {
    withStub(failures = 0) { (client, seen) =>
      assert(client.embed("hello").toSeq === Seq(5.0f, 0.5f))
      val (path, body) = seen().head
      assert(path === "/api/embeddings")
      val req = MiniJson.parse(body).asInstanceOf[Map[String, Any]]
      assert(req("model") === "nomic-embed-text")
      assert(req("prompt") === "hello")
    }
  }

  test("chat sends the reference's generate payload and trims the response") {
    withStub(failures = 0) { (client, seen) =>
      assert(client.chat("summarize") === "echo:phi3:mini")
      val req = MiniJson.parse(seen().head._2).asInstanceOf[Map[String, Any]]
      assert(req("stream") === false)
      assert(req("prompt") === "summarize")
      val opts = req("options").asInstanceOf[Map[String, Any]]
      assert(opts("num_ctx") === 1536.0)
      assert(opts("num_predict") === 160.0)
      assert(opts("temperature") === 0.2)
      assert(opts("top_p") === 0.9)
    }
  }

  test("transient HTTP 500s ride the reference retry/backoff schedule") {
    withStub(failures = 2) { (client, seen) =>
      val sleeps = scala.collection.mutable.ArrayBuffer[Double]()
      val e = Rag.ResilientEmbedder(client.embed, sleep = sleeps.append(_))
      assert(e("hi").toSeq === Seq(2.0f, 0.5f))
      assert(seen().size === 3) // 2 failures + 1 success, all real HTTP
      assert(sleeps.toSeq === Seq(1.5, 3.0)) // BACKOFF * attempt
    }
  }

  test("a dead server exhausts retries with the terminal wrap") {
    withStub(failures = Int.MaxValue) { (client, _) =>
      val e = Rag.ResilientEmbedder(client.embed, sleep = _ => ())
      val ex = intercept[RuntimeException](e("x"))
      assert(ex.getMessage.startsWith("embedding failed after 4 retries"))
      assert(ex.getMessage.contains("HTTP 500"))
    }
  }

  test("fromEnv gates on OLLAMA_BASE_URL and honors the reference env knobs") {
    assert(OllamaConfig.fromEnv(Map.empty).isEmpty)
    val cfg = OllamaConfig.fromEnv(Map(
      "OLLAMA_BASE_URL" -> "http://host:11434/",
      "CHAT_MODEL" -> "m2",
      "OLLAMA_NUM_CTX" -> "2048")).get
    assert(cfg.baseUrl === "http://host:11434") // trailing slash stripped
    assert(cfg.chatModel === "m2")
    assert(cfg.numCtx === 2048)
    assert(cfg.embedModel === "nomic-embed-text")
  }
}
