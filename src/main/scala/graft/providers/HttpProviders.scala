package graft.providers

/** HTTP-backed embedding / LLM providers with an injectable transport
  * (reference `/root/reference/src/embedders/providers.js:54-146`:
  * Ollama + OpenAI embedders, 3-backend LLM provider).
  *
  * The container is zero-egress, so the HTTP layer is a pluggable
  * `HttpTransport` function: production wires [[HttpTransport.jdk]]
  * (a pooled `java.net.http.HttpClient` per executor), tests inject a
  * fake. Everything else — request shapes, response parsing, the
  * per-JVM memo cache keyed by [[Embedder.cacheKey]], error messages —
  * is the real provider behavior and runs executor-side through
  * [[Embed.withEmbedding]]'s batched `mapPartitions` unchanged.
  */
object Http {

  /** One provider call: POST `url` with `headers` and JSON `body`. */
  final case class Request(url: String, headers: Map[String, String], body: String)

  /** Executes a request, returns the response body; throws on failure.
    * Serializable so providers close over it into executor tasks. */
  trait HttpTransport extends Serializable {
    def send(req: Request): String
  }

  object HttpTransport {
    /** Production transport on the JDK client — one lazily-built,
      * connection-pooled client per JVM (executor). */
    def jdk(timeoutMs: Long = 30000): HttpTransport = new HttpTransport {
      @transient private lazy val client = java.net.http.HttpClient.newHttpClient()
      def send(req: Request): String = {
        val b = java.net.http.HttpRequest.newBuilder(java.net.URI.create(req.url))
          .timeout(java.time.Duration.ofMillis(timeoutMs))
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(req.body))
        req.headers.foreach { case (k, v) => b.header(k, v) }
        val res = client.send(b.build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        if (res.statusCode() / 100 != 2)
          throw new java.io.IOException(s"HTTP ${res.statusCode()}")
        res.body()
      }
    }
  }

  private[providers] def jstr(s: String): String =
    graft.engine.FusionEngine.jstr(s)

  /** First `"key": "..."` string field of a JSON body (nested-safe for
    * the single-occurrence fields these APIs return). */
  private[providers] def strField(json: String, key: String): Option[String] =
    (s""""$key"\\s*:\\s*"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(json)
      .map(m => unescapeJson(m.group(1)))

  /** Single-pass JSON string unescape — sequential `.replace` chains
    * corrupt text containing literal backslashes (`\\n` of an escaped
    * backslash + 'n' is not a newline) and miss \t \r \uXXXX. */
  private[graft] def unescapeJson(s: String): String = {
    val b = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => b.append('\n'); i += 2
          case 't' => b.append('\t'); i += 2
          case 'r' => b.append('\r'); i += 2
          case 'b' => b.append('\b'); i += 2
          case 'f' => b.append('\f'); i += 2
          case '"' => b.append('"'); i += 2
          case '/' => b.append('/'); i += 2
          case '\\' => b.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            try { b.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6 }
            catch { case _: NumberFormatException => b.append(c); i += 1 }
          case _ => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  /** First `"key": [numbers...]` array of a JSON body. */
  private[providers] def vecField(json: String, key: String): Option[Array[Float]] =
    (s""""$key"\\s*:\\s*\\[([^\\]]*)\\]""").r.findFirstMatchIn(json)
      .map(_.group(1).split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.toFloat).toArray)
}

/** Shared plumbing of the HTTP embedders: per-JVM memo cache on
  * [[Embedder.cacheKey]] (the reference's `BaseEmbedder._cache`,
  * `providers.js:23-30`) in front of the transport. */
abstract class HttpEmbedderBase(transport: Http.HttpTransport) extends Embedder {
  @transient private lazy val memo =
    scala.collection.concurrent.TrieMap.empty[String, Array[Float]]

  protected def request(text: String): Http.Request
  protected def parseVector(body: String): Array[Float]

  final def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      memo.getOrElseUpdate(cacheKey(t), parseVector(transport.send(request(t))))
    }
}

/** Ollama embeddings API (`providers.js:54-68`). */
final class OllamaEmbedder(transport: Http.HttpTransport,
                           val model: String = "nomic-embed-text",
                           val dimensions: Int = 768,
                           baseUrl: String = "http://localhost:11434")
    extends HttpEmbedderBase(transport) {
  protected def request(text: String): Http.Request = Http.Request(
    s"$baseUrl/api/embeddings",
    Map("Content-Type" -> "application/json"),
    s"""{"model":${Http.jstr(model)},"prompt":${Http.jstr(text)}}""")
  protected def parseVector(body: String): Array[Float] =
    Http.vecField(body, "embedding").getOrElse(
      throw new IllegalStateException(
        s"Ollama embedding failed. Is Ollama running? Try: ollama pull $model"))
}

/** OpenAI embeddings API (`providers.js:70-88`). */
final class OpenAIEmbedder(transport: Http.HttpTransport, apiKey: String,
                           val model: String = "text-embedding-3-small",
                           val dimensions: Int = 1536,
                           baseUrl: String = "https://api.openai.com/v1")
    extends HttpEmbedderBase(transport) {
  require(apiKey != null && apiKey.nonEmpty,
    "OpenAI API key required. Set OPENAI_API_KEY or pass apiKey.")
  protected def request(text: String): Http.Request = Http.Request(
    s"$baseUrl/embeddings",
    Map("Content-Type" -> "application/json", "Authorization" -> s"Bearer $apiKey"),
    s"""{"model":${Http.jstr(model)},"input":${Http.jstr(text)}}""")
  protected def parseVector(body: String): Array[Float] =
    Http.vecField(body, "embedding").getOrElse(
      throw new IllegalStateException("OpenAI embedding failed"))
}

/** HTTP completion provider, 3 backends (`providers.js:107-146`). */
final class HttpLLMProvider(transport: Http.HttpTransport,
                            provider: String = "ollama",
                            modelOverride: Option[String] = None,
                            baseUrlOverride: Option[String] = None,
                            apiKey: Option[String] = None) extends LLMProvider {
  val name: String = provider
  val model: String = modelOverride.getOrElse(provider match {
    case "openai" => "gpt-4o-mini"
    case "anthropic" => "claude-sonnet-4-20250514"
    case _ => "llama3.2"
  })
  private val baseUrl: String = baseUrlOverride.getOrElse(provider match {
    case "openai" => "https://api.openai.com/v1"
    case "anthropic" => "https://api.anthropic.com"
    case _ => "http://localhost:11434"
  })

  def complete(prompt: String, maxTokens: Int, temperature: Double): String = provider match {
    case "ollama" =>
      val body = transport.send(Http.Request(s"$baseUrl/api/generate",
        Map("Content-Type" -> "application/json"),
        s"""{"model":${Http.jstr(model)},"prompt":${Http.jstr(prompt)},"stream":false,"options":{"num_predict":$maxTokens,"temperature":$temperature}}"""))
      Http.strField(body, "response").getOrElse(
        throw new IllegalStateException("Ollama failed"))
    case "openai" =>
      val body = transport.send(Http.Request(s"$baseUrl/chat/completions",
        Map("Content-Type" -> "application/json",
          "Authorization" -> s"Bearer ${apiKey.getOrElse(throw new IllegalStateException("OpenAI API key required"))}"),
        s"""{"model":${Http.jstr(model)},"messages":[{"role":"user","content":${Http.jstr(prompt)}}],"max_tokens":$maxTokens,"temperature":$temperature}"""))
      Http.strField(body, "content").getOrElse(
        throw new IllegalStateException("OpenAI failed"))
    case "anthropic" =>
      val body = transport.send(Http.Request(s"$baseUrl/v1/messages",
        Map("Content-Type" -> "application/json",
          "x-api-key" -> apiKey.getOrElse(throw new IllegalStateException("Anthropic API key required")),
          "anthropic-version" -> "2023-06-01"),
        s"""{"model":${Http.jstr(model)},"messages":[{"role":"user","content":${Http.jstr(prompt)}}],"max_tokens":$maxTokens,"temperature":$temperature}"""))
      Http.strField(body, "text").getOrElse(
        throw new IllegalStateException("Anthropic failed"))
    case other => throw new IllegalArgumentException(s"Unknown provider: $other")
  }
}
