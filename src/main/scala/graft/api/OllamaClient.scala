package graft.api

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Real HTTP implementations of the embedding/chat ports, speaking the
  * Ollama JSON protocol the reference uses
  * (`/root/reference/api/ollama_embedder.py:28-44` — POST /api/embeddings
  * `{"model","prompt"}` → `{"embedding":[...]}`;
  * `api/main.py:1442-1481` — POST /api/generate
  * `{"model","prompt","stream":false,"options":{...}}` → `{"response":...}`).
  *
  * Config-gated: the engine's defaults remain the deterministic fakes
  * ([[Rag.hashEmbedder]], [[LlmPorts.fakeChat]]); a client is constructed
  * only when [[OllamaConfig.fromEnv]] finds `OLLAMA_BASE_URL`, mirroring
  * the reference's env-driven wiring. Resilience stays OUTSIDE this class:
  * wrap [[embed]] in [[Rag.ResilientEmbedder]] to get the reference's
  * RETRIES=4 linear-backoff schedule — same layering as the reference,
  * where the session does the transport and the embedder loop retries.
  *
  * Pure JDK (`java.net.http.HttpClient`, `MiniJson`) — no dependencies.
  */
final case class OllamaConfig(
    baseUrl: String,
    embedModel: String = "nomic-embed-text",
    chatModel: String = "phi3:mini",
    connectTimeoutS: Int = 5,
    requestTimeoutS: Int = 45,
    numCtx: Int = 1536,
    numPredict: Int = 160,
    temperature: Double = 0.2,
    topP: Double = 0.9)

object OllamaConfig {
  /** Reference parity: every knob has the reference's env name and default
    * (`api/main.py:1449-1459`, `ollama_embedder.py`). Present only when the
    * base URL is configured — the engine never dials out by default.
    */
  def fromEnv(env: Map[String, String] = sys.env): Option[OllamaConfig] =
    env.get("OLLAMA_BASE_URL").map { url =>
      OllamaConfig(
        baseUrl = url.stripSuffix("/"),
        embedModel = env.getOrElse("EMBED_MODEL", "nomic-embed-text"),
        chatModel = env.getOrElse("CHAT_MODEL", "phi3:mini"),
        requestTimeoutS = env.getOrElse("API_GENERATE_TIMEOUT", "45").toInt,
        numCtx = env.getOrElse("OLLAMA_NUM_CTX", "1536").toInt,
        numPredict = env.getOrElse("RAG_NUM_PREDICT", "160").toInt,
        temperature = env.getOrElse("RAG_TEMPERATURE", "0.2").toDouble,
        topP = env.getOrElse("RAG_TOP_P", "0.9").toDouble)
    }
}

final class OllamaClient(cfg: OllamaConfig) {

  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(cfg.connectTimeoutS.toLong))
    .build()

  private def post(path: String, body: String): String = {
    val req = HttpRequest.newBuilder(URI.create(cfg.baseUrl + path))
      .timeout(Duration.ofSeconds(cfg.requestTimeoutS.toLong))
      .header("Content-Type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(body))
      .build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
    // requests.raise_for_status() parity: any non-2xx is an error the
    // caller's retry loop sees
    if (resp.statusCode() < 200 || resp.statusCode() >= 300)
      throw new RuntimeException(
        s"ollama $path HTTP ${resp.statusCode()}: ${resp.body().take(200)}")
    resp.body()
  }

  /** The embedding port: one text → one vector. Wrap in
    * [[Rag.ResilientEmbedder]] for the retry/backoff contract.
    */
  def embed(text: String): Array[Float] = {
    val body = MiniJson.obj(
      "model" -> cfg.embedModel, "prompt" -> text).json
    MiniJson.parse(post("/api/embeddings", body)) match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].get("embedding") match {
          case Some(xs: List[_]) =>
            xs.map { case d: Double => d.toFloat }.toArray
          case _ => throw new RuntimeException("ollama: no embedding field")
        }
      case _ => throw new RuntimeException("ollama: non-object response")
    }
  }

  /** The chat port: non-streaming generate with the reference's options. */
  def chat(prompt: String): String = {
    val body = MiniJson.obj(
      "model" -> cfg.chatModel,
      "prompt" -> prompt,
      "stream" -> false,
      "options" -> MiniJson.obj(
        "num_ctx" -> cfg.numCtx,
        "num_predict" -> cfg.numPredict,
        "temperature" -> cfg.temperature,
        "top_p" -> cfg.topP)).json
    MiniJson.parse(post("/api/generate", body)) match {
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]]
          .get("response").map(_.toString.trim).getOrElse("")
      case _ => throw new RuntimeException("ollama: non-object response")
    }
  }

  /** The two ports in library shape. */
  def embedFn: String => Array[Float] = embed
  def chatFn: LlmPorts.ChatFn = chat
}
