package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.events.EventBus
import graft.learning.LearningEngine
import graft.memory.AgentMemory
import graft.model.CollectionConfig
import graft.orchestration.Orchestrator
import graft.providers.MockEmbedderProvider
import graft.rag.RagPipeline
import graft.retrieval.HybridRetriever
import graft.tree.TreeIndex

/** Event hooks (§2.10's last row, implemented r17): every component
  * mirrors the reference's EventEmitter surface — driver-side,
  * post-action, control-plane only. Each test runs a real mini-flow
  * and asserts the emitted (name, key-payload) sequence against the
  * reference's emit sites (cited per event in the product code). */
class EventsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def tap(bus: EventBus): collection.mutable.Buffer[(String, Map[String, Any])] = {
    val seen = collection.mutable.Buffer.empty[(String, Map[String, Any])]
    bus.onAny((n, p) => seen += ((n, p)))
    seen
  }

  test("EventBus: registration order, onAny taps, no-listener no-op, throwing listener propagates") {
    val bus = new EventBus
    val order = collection.mutable.Buffer.empty[String]
    bus.emit("quiet", Map("x" -> 1)) // nobody listens — must be a no-op
    bus.on("e")(_ => order += "first").on("e")(_ => order += "second")
    bus.onAny((n, _) => order += s"any:$n")
    bus.emit("e")
    assert(order.toList === List("first", "second", "any:e"))
    // Node semantics: listenerCount counts NAMED listeners only — the
    // onAny tap registered above must not inflate either count
    assert(bus.listenerCount("e") === 2 && bus.listenerCount("quiet") === 0)
    bus.on("boom")(_ => throw new IllegalStateException("listener bug"))
    intercept[IllegalStateException](bus.emit("boom")) // Node emit semantics
  }

  test("FusionEngine: collection:created/deleted, vectors:inserted, vector:deleted") {
    val root = Files.createTempDirectory("graft_events_engine").toString
    val e = new FusionEngine(spark, root)
    val seen = tap(e.events)
    e.createCollection("c", CollectionConfig(dimensions = 2, shards = 2))
    e.insert("c", Seq(("a", Array(1f, 0f)), ("b", Array(0f, 1f)))
      .toDF("id", "vector"))
    e.deleteByIds("c", Seq("a"))
    e.deleteCollection("c")
    e.deleteCollection("c") // second delete: no event (reference: if existed)
    assert(seen.map(_._1).toList ===
      List("collection:created", "vectors:inserted", "vector:deleted", "collection:deleted"))
    assert(seen(0)._2("name") === "c")
    assert(seen(2)._2("deleted") === 1L && seen(2)._2("ids") === Seq("a"))
  }

  test("RagPipeline: ingest:start then ingest:complete with the indexed count") {
    val root = Files.createTempDirectory("graft_events_rag").toString
    val rag = new RagPipeline(new FusionEngine(spark, root),
      new MockEmbedderProvider(8), chunkSize = 16, chunkOverlap = 4)
    val seen = tap(rag.events)
    val n = rag.ingest(Seq(("d1", "alpha beta gamma delta epsilon zeta")).toDS())
    assert(seen.map(_._1).toList === List("ingest:start", "ingest:complete"))
    assert(seen(1)._2("indexed") === n && n > 0)
  }

  test("TreeIndex: index:start/complete and search:start/complete with counts") {
    val root = Files.createTempDirectory("graft_events_tree").toString
    val tree = new TreeIndex(spark, root)
    val seen = tap(tree.events)
    val nodes = tree.indexDocument("doc", "# T\n\nhello world\n\n## S\n\nmore text", "markdown")
    tree.reasoningSearch("doc", "hello",
      new graft.providers.MockLLMProvider(_ => "[]")) // keyword fallback path
    assert(seen.map(_._1).toList ===
      List("index:start", "index:complete", "search:start", "search:complete"))
    assert(seen(1)._2("nodeCount") === nodes)
    assert(seen(3)._2("query") === "hello")
  }

  test("AgentMemory: stored/learned/tool_registered/shared/recalled/forgotten/conversation") {
    val root = Files.createTempDirectory("graft_events_mem").toString
    val mem = new AgentMemory(new FusionEngine(spark, root), new MockEmbedderProvider(8))
    val seen = tap(mem.events)
    val id = mem.remember("a1", "note one")
    mem.learn("a1", "fact one")
    mem.registerTool("a1", "toolX", "does X")
    mem.share("a1", "shared note")
    mem.recall("a1", "note", trackAccess = false)
    mem.addMessage("a1", "t1", 0L, "user", "hi")
    val deleted = mem.forget("a1", "episodic")
    val names = seen.map(_._1).toList
    assert(names === List("memory:stored", "memory:learned", "memory:tool_registered",
      "memory:shared", "memory:recalled", "conversation:message", "memory:forgotten"))
    assert(seen(0)._2("id") === id && seen(0)._2("type") === "episodic")
    assert(seen(6)._2("deleted") === deleted && deleted >= 1L)
  }

  test("Orchestrator: registered/message:sent/unregistered + message:error isolation") {
    val root = Files.createTempDirectory("graft_events_orch").toString
    val mem = new AgentMemory(new FusionEngine(spark, root), new MockEmbedderProvider(8))
    val orch = new Orchestrator(mem)
    val seen = tap(orch.events)
    orch.register("a1", Seq("cap"))
    orch.register("a2", Seq("cap"))
    orch.send("a1", "a2", "task", "p1")
    orch.send("a1", "a2", "task", "p2")
    orch.send("a2", "a1", "status", "q1") // another agent's pending message
    // one poison message: the handler throws, processing continues
    val (ok, bad) = orch.processMessages("a2") { m =>
      if (m.getAs[String]("payload") == "p1") throw new RuntimeException("poison")
    }
    assert((ok, bad) === ((1L, 1L)))
    // consume-once (ADVICE r17 / AgentOrchestrator.js:191-193): the
    // handled messages — INCLUDING the poison one — are gone, so a
    // second call re-delivers nothing (no duplicate side effects, no
    // second message:error), while a1's untouched queue survives
    val (ok2, bad2) = orch.processMessages("a2")(_ => ())
    assert((ok2, bad2) === ((0L, 0L)))
    assert(orch.drain("a1").count() === 1L)
    assert(orch.unregister("a1") && !orch.unregister("a1"))
    assert(!orch.listAgents().contains("a1") && orch.listAgents().contains("a2"))
    assert(seen.map(_._1).toList === List("agent:registered", "agent:registered",
      "message:sent", "message:sent", "message:sent", "message:error",
      "agent:unregistered"))
    assert(seen(5)._2("error").toString.contains("poison"))
  }

  test("LearningEngine: consolidation/skill/knowledge/reflection events in flow order") {
    val root = Files.createTempDirectory("graft_events_learn").toString
    val mem = new AgentMemory(new FusionEngine(spark, root), new MockEmbedderProvider(8))
    val learn = new LearningEngine(mem)
    val seen = tap(learn.events)
    learn.learnSkill("a1", "s1", "skillOne", keywords = Seq("alpha"))
    learn.recordSkillOutcome("a1", "s1", success = true)
    learn.extractKnowledge("a1", "Spark is a distributed engine. Parquet is a columnar format.")
    mem.remember("a1", "note for consolidation")
    learn.consolidate("a1")
    learn.recordRetrievalFeedback("a1", "q", "hybrid", 0.8)
    learn.reflect("a1")
    val names = seen.map(_._1).toList
    assert(names === List("skill:learned", "skill:outcome", "knowledge:extracted",
      "consolidation:start", "consolidation:complete", "reflection:complete"))
    assert(seen(1)._2("success") === true)
    assert(seen(2)._2("count").asInstanceOf[Int] >= 1)
    assert(seen(4)._2("agentId") === "a1")
  }

  test("HybridRetriever: strategy:error from a failing branch, retrieve:complete always") {
    val root = Files.createTempDirectory("graft_events_ret").toString
    val engine = new FusionEngine(spark, root)
    val emb = new MockEmbedderProvider(8)
    engine.createCollection("docs", CollectionConfig(dimensions = 8))
    engine.insert("docs", Seq(("d1", emb.embed("hello world"), "hello world"))
      .toDF("id", "vector", "content"))
    // a tree index whose nodes parquet is CORRUPTED after indexing: the
    // branch plan builds fine but fails at execution (the
    // HybridRetrieverSpec corrupt-branch mode) and must degrade to an
    // ANNOUNCED empty branch
    val treeRoot = Files.createTempDirectory("graft_events_bt").toString
    val brokenTree = new TreeIndex(spark, treeRoot)
    brokenTree.indexDocument("doc", "# T\n\nsome text", "markdown")
    val nodesDir = java.nio.file.Paths.get(treeRoot, "_tree_nodes")
    java.nio.file.Files.list(nodesDir).filter(_.toString.endsWith(".parquet"))
      .forEach(q => java.nio.file.Files.write(q, "not a parquet file".getBytes))
    val ret = new HybridRetriever(engine, emb, "docs", treeIndex = Some(brokenTree))
    val seen = tap(ret.events)
    val out = ret.retrieve("hello", topK = 3)
    assert(out.count() >= 1) // vector + keyword branches still answer
    val names = seen.map(_._1).toList
    assert(names.contains("retrieve:complete"))
    assert(seen.filter(_._1 == "strategy:error").map(_._2("strategy")).toList === List("tree"))
  }
}
