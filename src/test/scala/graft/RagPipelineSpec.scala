package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.providers.MockEmbedderProvider
import graft.rag.RagPipeline
import graft.text.Chunkers

/** RAG pipeline suite, mirroring `/root/reference/test/fusionpact.test.js:227-248`
  * (ingest chunk count > 0, buildContext non-empty, batch ingest). */
class RagPipelineSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private val manual =
    "All employees must complete safety orientation within 30 days. " +
      "The orientation covers fire evacuation, chemical handling, and emergency contacts. " +
      "All machinery must have proper guarding. Lockout/tagout procedures must be followed."

  private def freshRag(chunkSize: Int = 120, overlap: Int = 20): RagPipeline = {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_rag").toString)
    new RagPipeline(engine, new MockEmbedderProvider(64),
      chunkSize = chunkSize, chunkOverlap = overlap)
  }

  test("ingest chunks, embeds and appends; chunk ids follow ${source}_chunk_{i}") {
    val rag = freshRag()
    val n = rag.ingest(Seq(("manual.txt", manual)).toDS())
    val expected = Chunkers.recursiveChunk(manual, 120, 20)
    assert(n == expected.length && n > 1)
    val rows = rag.engine.table(rag.collection)
      .select("id", "content").as[(String, String)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == expected.indices.map(i => s"manual.txt_chunk_$i").sorted)
    // chunk text round-trips exactly
    assert(rows.map(_._2).sorted.toSeq == expected.sorted)
    // vectors are unit-normalized at write (cosine collection)
    val norms = rag.engine.table(rag.collection)
      .select("vector").as[Array[Float]].collect()
      .map(v => math.sqrt(v.map(x => x.toDouble * x).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-5))
  }

  test("ingest countAfter=false skips the recount only when nobody observes it") {
    // r18: the streaming sink discards ingest's return value, so the
    // per-micro-batch collection recount is skipped — UNLESS an
    // observer is registered, in which case the ingest:complete payload
    // must carry the true total exactly as before.
    val rag = freshRag()
    assert(rag.ingest(Seq(("a.txt", manual)).toDS(), countAfter = false) === -1L)
    val realTotal = rag.engine.count(rag.collection)
    assert(realTotal > 0)
    var observed = -2L
    rag.events.onAny((name, payload) =>
      if (name == "ingest:complete") observed = payload("indexed").asInstanceOf[Long])
    val n2 = rag.ingest(Seq(("b.txt", manual.toUpperCase)).toDS(), countAfter = false)
    assert(n2 > realTotal, "observer registered => the recount must still run")
    assert(observed === n2)
    // default callers are untouched
    assert(rag.ingest(Seq(("c.txt", manual)).toDS()) > n2)
  }

  test("batch ingest of multiple docs in one pass") {
    val rag = freshRag()
    val n = rag.ingest(Seq(("a.txt", manual), ("b.txt", manual.toUpperCase)).toDS())
    assert(n > 2)
    val sources = rag.engine.table(rag.collection)
      .selectExpr("metadata['source']").as[String].collect().toSet
    assert(sources == Set("a.txt", "b.txt"))
  }

  test("buildContext returns packed prompt within token budget, highest score first") {
    val rag = freshRag()
    rag.ingest(Seq(("manual.txt", manual)).toDS())
    val (prompt, sources) = rag.buildContext("safety orientation requirements", topK = 3)
    assert(prompt.nonEmpty)
    assert(prompt.contains("safety") || prompt.contains("orientation"))
    val rows = sources.select("tokens", "cum_tokens").as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.map(_._1).sum == rows.map(_._2).max)
    // tight budget cuts the pack
    val (smallPrompt, smallSources) = rag.buildContext("safety orientation requirements",
      topK = 3, maxTokens = Chunkers.DefaultChunkOverlap)
    assert(smallSources.count() <= sources.count())
    assert(smallPrompt.length <= prompt.length)
  }
}
