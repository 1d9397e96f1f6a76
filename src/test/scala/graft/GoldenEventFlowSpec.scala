package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r17 #5: EventsSpec pins per-component flows, but the emit
  * SITES were only code-reviewed against the reference. This spec runs
  * the reference's QUICKSTART flow (examples/quickstart.js extended
  * per the verdict: create → ingest → search → hybrid → remember /
  * recall → learn → consolidate) over the full `Graft.create` stack
  * with an onAny tap on EVERY component bus, and asserts the complete
  * ordered (component, event) sequence against a committed golden
  * derived from the reference's emit sites (cited per line).
  *
  * Documented divergences from the reference (each strictly additive
  * or batch-shaped, none reordering):
  *   - batch counts: reference `rag.ingest` loops `engine.insert` per
  *     chunk (RAGPipeline.js:112) so `vectors:inserted` fires once per
  *     chunk; our ingest is ONE batch insert → ONE `vectors:inserted`
  *     (the payload carries the count). Same relative position
  *     (between ingest:start and ingest:complete).
  *   - `memory.recall` triggers lazy `AgentMemory.init()` collection
  *     creation exactly like the reference's `_getAgentStore`
  *     (AgentMemory.js:99,113) — `collection:created` events land
  *     before the first memory event on first use in BOTH systems.
  */
class GoldenEventFlowSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("quickstart flow emits the reference's event sequence, in order") {
    val root = Files.createTempDirectory("graft_golden_flow").toString
    val g = Graft.create(spark, root)
    val seen = collection.mutable.Buffer.empty[(String, String)]
    def tap(component: String, bus: graft.events.EventBus): Unit =
      bus.onAny((n, _) => seen.synchronized { seen += ((component, n)) })
    tap("engine", g.engine.events)
    tap("rag", g.rag.events)
    tap("tree", g.tree.events)
    tap("memory", g.memory.events)
    tap("learning", g.learning.events)
    tap("orchestrator", g.orchestrator.events)

    // 1. create a collection + insert (quickstart "engine in five lines")
    g.engine.createCollection("docs", graft.model.CollectionConfig(dimensions = 64))
    g.engine.insert("docs",
      Seq(("d1", g.embedder.embed("safety orientation"), "safety orientation"))
        .toDF("id", "vector", "content"))

    // 2. RAG ingest (quickstart.js:18 — auto-chunk, embed, index)
    g.rag.ingest(Seq(("doc-1",
      "All employees must complete safety orientation within 30 days of hire. " +
        "PPE must be worn in all laboratory areas.")).toDS())

    // 3. plain engine search: the reference has NO emit site on the
    // query path (FusionEngine.js search) — the golden must show
    // nothing here
    g.engine.search("docs", g.embedder.embed("orientation").map(_.toDouble).toSeq, topK = 3).collect()

    // 4. hybrid retrieve (vector + tree + keyword, RRF)
    val ret = g.retriever()
    tap("retriever", ret.events)
    ret.retrieve("What PPE is required?", topK = 3).collect()

    // 5-6. agent memory: remember / recall (quickstart.js:31,41)
    g.memory.remember("safety-bot", "User is a new hire in chemistry")
    g.memory.recall("safety-bot", "PPE requirements", trackAccess = false)

    // 7. learn (quickstart.js:36)
    g.memory.learn("safety-bot", "Chemistry lab requires safety goggles")

    // 8. consolidate (the verdict flow's last step)
    g.learning.consolidate("safety-bot")

    val golden = List(
      // createCollection → FusionEngine.js:110
      ("engine", "collection:created"),
      // insert → FusionEngine.js:191
      ("engine", "vectors:inserted"),
      // rag.ingest: init() ensures the collection BEFORE the start
      // emit (RAGPipeline.js:58-70 runs ahead of the :93 emit — same
      // call order here), then :93 start → engine insert :112 (ONE
      // batch — divergence note above) → :135 complete
      ("engine", "collection:created"),
      ("rag", "ingest:start"),
      ("engine", "vectors:inserted"),
      ("rag", "ingest:complete"),
      // engine.search: no emit site in the reference — nothing
      // hybrid retrieve → HybridRetriever.js:210 (no strategy:error —
      // all three branches healthy)
      ("retriever", "retrieve:complete"),
      // remember: lazy memory-collection creation — the reference's
      // four types (episodic/semantic/procedural/conversation,
      // AgentMemory.js:94) plus _memory_shared (:108, shared memory
      // on by default) = 5 — then engine insert + memory:stored (:165)
      ("engine", "collection:created"),
      ("engine", "collection:created"),
      ("engine", "collection:created"),
      ("engine", "collection:created"),
      ("engine", "collection:created"),
      ("engine", "vectors:inserted"),
      ("memory", "memory:stored"),
      // recall → AgentMemory.js:439
      ("memory", "memory:recalled"),
      // learn → engine insert into _memory_semantic + AgentMemory.js:208
      ("engine", "vectors:inserted"),
      ("memory", "memory:learned"),
      // consolidate → RecursiveLearningEngine.js:133 / :182
      ("learning", "consolidation:start"),
      ("learning", "consolidation:complete"))

    assert(seen.toList === golden,
      s"\nobserved:\n${seen.map { case (c, e) => s"  ($c, $e)" }.mkString("\n")}")
  }
}
