package graft.integrations

import graft.server.EngineFacade

/** Framework-portable LLM tool definitions over the engine — the port
  * of the reference's AI-SDK integration
  * (`/root/reference/src/integrations/ai-tools.js:18-192`): six
  * JSON-Schema tool definitions plus name→execute dispatch, consumable
  * by any framework that speaks OpenAI function-calling / JSON-Schema
  * tools. Definitions carry the same names, descriptions, parameters
  * and defaults as the reference; execution dispatches into the shared
  * [[EngineFacade]] (the same data-plane ops the REST/MCP adapters
  * use — this module adds no operators).
  */
object AiTools {

  /** One JSON-Schema parameter. */
  final case class Param(name: String, tpe: String, description: String,
                         enumVals: Seq[String] = Nil)

  /** OpenAI-function-calling-shaped tool definition. */
  final case class ToolDef(name: String, description: String,
                           params: Seq[Param], required: Seq[String]) {
    /** The `{name, description, parameters}` JSON object. */
    def json: String = {
      val props = params.map { p =>
        val en = if (p.enumVals.nonEmpty)
          s""","enum":${p.enumVals.map(EngineFacadeJson.jstr).mkString("[", ",", "]")}"""
        else ""
        s"""${EngineFacadeJson.jstr(p.name)}:{"type":${EngineFacadeJson.jstr(p.tpe)},"description":${EngineFacadeJson.jstr(p.description)}$en}"""
      }.mkString("{", ",", "}")
      s"""{"name":${EngineFacadeJson.jstr(name)},"description":${EngineFacadeJson.jstr(description)},"parameters":{"type":"object","properties":$props,"required":${required.map(EngineFacadeJson.jstr).mkString("[", ",", "]")}}}"""
    }
  }

  /** A tool: definition + executable over string-keyed args (the
    * decoded function-call arguments). Returns the facade's JSON. */
  final case class Tool(name: String, definition: ToolDef,
                        execute: Map[String, String] => String)

  private def body(args: Map[String, String], defaults: (String, String)*): String =
    (defaults.toMap ++ args).map { case (k, v) =>
      s"${EngineFacadeJson.jstr(k)}:${EngineFacadeJson.jstr(v)}"
    }.mkString("{", ",", "}")

  /** The six reference tools (`ai-tools.js:44-173`), dispatching into
    * the facade ops. `agentId` defaults to `default-agent` exactly as
    * the reference's executes do (`ai-tools.js:59`). */
  def getTools(facade: EngineFacade): Seq[Tool] = Seq(
    Tool("fusionpact_remember",
      ToolDef("fusionpact_remember",
        "Store a memory about the current conversation, user preferences, or important events. Use this to remember things for later.",
        Seq(Param("content", "string", "What to remember"),
          Param("importance", "number", "How important (0-1). Use 0.8+ for critical info, 0.5 for general, 0.3 for minor.")),
        Seq("content")),
      args => facade.call("memory_remember",
        body(args, "agentId" -> "default-agent", "importance" -> "0.5"))),

    Tool("fusionpact_recall",
      ToolDef("fusionpact_recall",
        "Search your memory for relevant past conversations, facts, and knowledge. Use this before answering questions that might benefit from past context.",
        Seq(Param("query", "string", "What to search for in memory"),
          Param("topK", "number", "Max results (default 5)")),
        Seq("query")),
      args => facade.call("memory_recall",
        body(args, "agentId" -> "default-agent", "topK" -> "5"))),

    Tool("fusionpact_learn",
      ToolDef("fusionpact_learn",
        "Store a fact or piece of knowledge permanently. Use this when the user teaches you something or when you extract important facts from documents.",
        Seq(Param("content", "string", "The fact or knowledge to store"),
          Param("source", "string", "Where this knowledge came from"),
          Param("category", "string", "Category (e.g., regulations, preferences, technical)")),
        Seq("content")),
      args => facade.call("memory_learn",
        body(args, "agentId" -> "default-agent"))),

    Tool("fusionpact_search_documents",
      ToolDef("fusionpact_search_documents",
        "Search ingested documents using hybrid retrieval (vector similarity + reasoning + keyword matching). Returns the most relevant passages.",
        Seq(Param("query", "string", "Search query"),
          Param("topK", "number", "Max results (default 5)"),
          Param("collection", "string", "Collection to search (default: \"default\")")),
        Seq("query")),
      args => facade.call("hybrid_search",
        body(args, "collection" -> "default", "topK" -> "5"))),

    Tool("fusionpact_ingest_document",
      ToolDef("fusionpact_ingest_document",
        "Ingest a document into the knowledge base. Automatically chunks, embeds, and indexes the text for later retrieval.",
        Seq(Param("text", "string", "Document text to ingest"),
          Param("source", "string", "Source identifier (filename, URL, etc.)"),
          Param("title", "string", "Document title")),
        Seq("text")),
      args => facade.call("rag_ingest", body(args, "source" -> "doc"))),

    Tool("fusionpact_forget",
      ToolDef("fusionpact_forget",
        "Delete memories. Use when the user asks you to forget something or for GDPR data erasure.",
        Seq(Param("type", "string", "Which memory type to clear",
          enumVals = Seq("episodic", "semantic", "procedural", "all"))),
        Seq("type")),
      args => facade.call("memory_forget",
        body(args, "agentId" -> "default-agent", "type" -> "all"))))

  /** name → execute map for direct dispatch (`ai-tools.js:183-190`). */
  def getToolMap(facade: EngineFacade): Map[String, Map[String, String] => String] =
    getTools(facade).map(t => t.name -> t.execute).toMap
}

/** Local alias for the adapters' minimal JSON emitter. */
private object EngineFacadeJson {
  def jstr(s: String): String = graft.engine.FusionEngine.jstr(s)
}
