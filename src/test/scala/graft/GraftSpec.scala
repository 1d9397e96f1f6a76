package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** `create()` factory wiring end-to-end (reference
  * `test/fusionpact.test.js:318-336`: full wiring; ingest → context). */
class GraftSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("create wires all subsystems over one root; ingest -> retrieve -> learn round-trip") {
    val g = Graft.create(spark, Files.createTempDirectory("graft_all").toString)

    // RAG ingest through the factory instance
    val chunks = g.rag.ingest(Seq(("manual.txt",
      "All employees must complete safety orientation. The orientation covers chemical handling and fire evacuation procedures.")).toDS())
    assert(chunks > 0)
    val (prompt, _) = g.rag.buildContext("safety orientation")
    assert(prompt.nonEmpty)

    // tree + hybrid retriever share the same instance
    g.tree.indexDocument("m", "# Safety\n## Chemicals\nchemical handling requires care", "markdown")
    val res = g.retriever().retrieve("chemical handling safety", topK = 5)
    assert(res.count() > 0)

    // memory + learning on the same catalog root
    g.memory.remember("a1", "user asked about chemicals")
    g.learning.recordRetrievalFeedback("a1", "chemical query", "vector", 0.9)
    assert(g.memory.stats("a1").values.sum == 1)
    assert(g.learning.feedbackLog("a1").count() == 1)

    // orchestrator sees the same memory
    g.orchestrator.register("a1", Seq("chemistry"))
    assert(g.orchestrator.delegate("boss", Seq("chemistry"), "analyze").contains("a1"))

    // adapters bind without conflict
    assert(g.mcpServer().tools.length == 11)
    val srv = g.restServer()
    val port = srv.start()
    try {
      val resp = java.net.http.HttpClient.newHttpClient().send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"http://127.0.0.1:$port/health")).GET().build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(resp.body().contains("ok"))
    } finally srv.stop()
  }
}
