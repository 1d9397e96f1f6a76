package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.memory.AgentMemory
import graft.multimodal.Multimodal
import graft.orchestration.Orchestrator
import graft.providers.MockEmbedderProvider
import graft.rag.RagPipeline
import graft.streaming.StreamingIngest

/** Multimodal plumbing, Structured Streaming ingest, and orchestrator
  * (reference `test/fusionpact.test.js:252-288` for the orchestrator). */
class SubsystemsSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("multimodal: byte meta + frame sampling offsets/counts/features are consistent") {
    val media = Seq((1L, "image", "abcdefgh".repeat(12).getBytes("UTF-8")), // 96 bytes
      (2L, "audio", "xy".getBytes("UTF-8"))) // 2 bytes < frame
      .toDF("media_id", "media_type", "data")
    val meta = Multimodal.withByteMeta(media)
      .withColumn("n_frames", Multimodal.frameCount($"n_bytes", 32, 64))
    val byId = meta.collect().map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(byId(1L).getAs[Int]("n_bytes") == 96 && byId(1L).getAs[Int]("n_frames") == 2) // offsets 0, 64
    assert(byId(2L).getAs[Int]("n_frames") == 0)
    assert(byId(1L).getAs[String]("header_hex") == "6162636465666768") // 'abcdefgh'

    val frames = Multimodal.sampleFrames(media).collect()
    assert(frames.length == 2)
    assert(frames.map(_.getAs[Int]("frame_offset")).sorted.toSeq == Seq(0, 64))
    // histogram sums to frameSize
    frames.foreach(f => assert(f.getAs[Seq[Float]]("feature").sum == 32f))
    // resize stub truncates only
    val resized = Multimodal.resizeStub(media, 10)
      .select("media_id", "data").as[(Long, Array[Byte])].collect().toMap
    assert(resized(1L).length == 10 && resized(2L).length == 2)
  }

  test("streaming ingest: MemoryStream docs flow through chunk/embed/append exactly once") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_stream").toString)
    val rag = new RagPipeline(engine, new MockEmbedderProvider(64), chunkSize = 80, chunkOverlap = 10)
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String)]
    val checkpoint = Files.createTempDirectory("graft_ckpt").toString

    stream.addData(("doc1", "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"))
    val q1 = StreamingIngest.start(stream.toDS(), rag, checkpoint)
    q1.awaitTermination(60000)
    val afterFirst = engine.count(rag.collection)
    assert(afterFirst > 0)

    stream.addData(("doc2", "second streamed document with several more words to chunk"))
    val q2 = StreamingIngest.start(stream.toDS(), rag, checkpoint)
    q2.awaitTermination(60000)
    val afterSecond = engine.count(rag.collection)
    assert(afterSecond > afterFirst)
    val sources = engine.table(rag.collection)
      .selectExpr("metadata['source']").distinct().as[String].collect().toSet
    assert(sources == Set("doc1", "doc2"))

    // exactly-once: restarting on the same checkpoint with no new data adds nothing
    val q3 = StreamingIngest.start(stream.toDS(), rag, checkpoint)
    q3.awaitTermination(60000)
    assert(engine.count(rag.collection) == afterSecond)
  }

  test("streaming dedup: duplicate content dropped within and across micro-batches, new content flows") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_sdedup").toString)
    val rag = new RagPipeline(engine, new MockEmbedderProvider(64), chunkSize = 80, chunkOverlap = 10)
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, java.sql.Timestamp)]
    val checkpoint = Files.createTempDirectory("graft_sdedup_ckpt").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    val textA = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val textB = "completely different second document with its own words to chunk and embed"
    val textC = "third document arriving later with novel content that must be ingested"

    // batch 1: textA twice under different doc ids (within-batch dup) + textB
    stream.addData(("a", textA, ts(0)), ("a2", textA, ts(0)), ("b", textB, ts(1)))
    StreamingIngest.startDeduped(stream.toDS(), rag, checkpoint).awaitTermination(60000)
    val sources1 = engine.table(rag.collection)
      .selectExpr("metadata['source']").distinct().as[String].collect().toSet
    assert(sources1.size == 2, s"within-batch dup must collapse: $sources1")
    assert(sources1.contains("b"))
    val n1 = engine.count(rag.collection)

    // batch 2: textA AGAIN (cross-batch dup, within the watermark) — dropped
    stream.addData(("d", textA, ts(2)))
    StreamingIngest.startDeduped(stream.toDS(), rag, checkpoint).awaitTermination(60000)
    assert(engine.count(rag.collection) == n1, "cross-batch duplicate must be dropped")

    // batch 3: novel content — ingested
    stream.addData(("e", textC, ts(3)))
    StreamingIngest.startDeduped(stream.toDS(), rag, checkpoint).awaitTermination(60000)
    assert(engine.count(rag.collection) > n1)
    val sources3 = engine.table(rag.collection)
      .selectExpr("metadata['source']").distinct().as[String].collect().toSet
    assert(sources3.contains("e") && !sources3.contains("d"))
  }

  test("orchestrator: register/list, delegation argmax routes to best-capability agent (test.js:278-287)") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_orch").toString)
    val memory = new AgentMemory(engine, new MockEmbedderProvider(64))
    val o = new Orchestrator(memory)
    o.register("researcher", Seq("search", "analyze"))
    o.register("writer", Seq("write", "edit", "summarize"))
    assert(o.listAgents() == Seq("researcher", "writer"))

    val chosen = o.delegate("boss", Seq("write", "summarize"), "draft the report")
    assert(chosen.contains("writer"))
    val queue = o.drain("writer").select("msg_type", "payload").as[(String, String)].collect()
    assert(queue.toSeq == Seq(("task", "draft the report")))
    assert(o.delegate("boss", Seq("juggle"), "nope").isEmpty)
  }

  test("orchestrator: broadcast fan-out + collaborative recall over agents' memory union") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_orch2").toString)
    val memory = new AgentMemory(engine, new MockEmbedderProvider(64))
    val o = new Orchestrator(memory)
    o.register("a1", Seq("x")); o.register("a2", Seq("y")); o.register("a3", Seq("z"))
    assert(o.send("a1", "*", "status", "hello all") == 2) // everyone but sender
    assert(o.drain("a2").count() == 1 && o.drain("a1").count() == 0)

    memory.remember("a1", "safety protocols for chemical storage")
    memory.learn("a2", "chemical handling requires ventilation")
    val recall = o.collaborativeRecall(Seq("a1", "a2"), "chemical safety", topK = 3)
    val byAgent = recall.groupBy("agent_id").count().as[(String, Long)].collect().toMap
    assert(byAgent.keySet == Set("a1", "a2"))
  }

  test("streaming curation: quality gates drop spam/stubs before dedup state; clean docs flow") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_scurate").toString)
    val rag = new RagPipeline(engine, new MockEmbedderProvider(64), chunkSize = 80, chunkOverlap = 10)
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, java.sql.Timestamp)]
    val checkpoint = Files.createTempDirectory("graft_scurate_ckpt").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2026-01-01 00:$min%02d:00")
    val clean = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu nu xi"
    val spammy = "win now " * 30 + "win now big"
    // batch 1: clean doc + its exact dup + a spam doc + a stub
    stream.addData(("a", clean, ts(0)), ("a2", clean, ts(0)),
      ("spam", spammy, ts(0)), ("stub", "too short", ts(0)))
    StreamingIngest.startCurated(stream.toDS(), rag, checkpoint).awaitTermination(60000)
    val sources1 = engine.table(rag.collection)
      .selectExpr("metadata['source']").distinct().as[String].collect().toSet
    assert(sources1 == Set("a"), s"only the clean doc may land: $sources1")

    // batch 2: the spam again (would have matched dedup state if it had
    // entered) + a novel clean doc — only the clean doc lands
    val clean2 = "completely different second document with its own words to chunk and embed"
    stream.addData(("spam2", spammy, ts(1)), ("b", clean2, ts(1)))
    StreamingIngest.startCurated(stream.toDS(), rag, checkpoint).awaitTermination(60000)
    val sources2 = engine.table(rag.collection)
      .selectExpr("metadata['source']").distinct().as[String].collect().toSet
    assert(sources2 == Set("a", "b"), s"spam must stay out across batches: $sources2")
  }
}
