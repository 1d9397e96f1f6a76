package graft

import org.apache.spark.sql.SparkSession

import graft.engine.FusionEngine
import graft.learning.LearningEngine
import graft.memory.AgentMemory
import graft.orchestration.Orchestrator
import graft.providers.{Embedder, LLMProvider, MockEmbedderProvider}
import graft.rag.RagPipeline
import graft.retrieval.{CritiqueLoop, HybridRetriever}
import graft.server.{EngineFacade, McpServer, RestServer}
import graft.tree.TreeIndex

/** The composition root (reference `create()` factory,
  * `/root/reference/src/index.js`): one call wires engine + RAG +
  * memory + tree + retriever + learning + orchestrator + adapters over
  * a shared catalog root. Every subsystem remains usable standalone;
  * this is the all-batteries entry point.
  */
final class Graft private (
    val spark: SparkSession,
    val root: String,
    val embedder: Embedder,
    val llm: Option[LLMProvider]) {

  val engine = new FusionEngine(spark, root)
  val memory = new AgentMemory(engine, embedder)
  val rag = new RagPipeline(engine, embedder)
  val tree = new TreeIndex(spark, s"$root/_tree")
  val learning = new LearningEngine(memory, llm)
  val orchestrator = new Orchestrator(memory)

  def retriever(collection: String = rag.collection): HybridRetriever =
    new HybridRetriever(engine, embedder, collection, Some(tree))

  def critiqueLoop(collection: String = rag.collection): CritiqueLoop =
    new CritiqueLoop(retriever(collection), learning)

  private lazy val facade =
    new EngineFacade(engine, embedder, memory, rag, tree)

  /** REST adapter bound to this instance (call `.start()`). */
  def restServer(port: Int = 0): RestServer = new RestServer(facade, port)

  /** MCP adapter bound to this instance. */
  def mcpServer(): McpServer = new McpServer(facade)
}

object Graft {
  /** `create()` (reference `src/index.js`): mock embedder by default —
    * swap in any [[Embedder]]/[[LLMProvider]] implementation. */
  def create(spark: SparkSession, root: String,
             embedder: Embedder = new MockEmbedderProvider(64),
             llm: Option[LLMProvider] = None): Graft =
    new Graft(spark, root, embedder, llm)
}
