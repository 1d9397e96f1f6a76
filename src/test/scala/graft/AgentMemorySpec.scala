package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.memory.AgentMemory
import graft.providers.MockEmbedderProvider

/** Agent memory suite, mirroring
  * `/root/reference/test/fusionpact.test.js:173-223`: remember/recall per
  * type, conversations, GDPR forget, shared visibility across agents,
  * stats. */
class AgentMemorySpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  private def freshMemory(): AgentMemory =
    new AgentMemory(
      new FusionEngine(spark, Files.createTempDirectory("graft_mem").toString),
      new MockEmbedderProvider(64))

  test("unified-table plan builders: tenant filter before scoring, per-type rank, flat top-K") {
    val mem = Seq(
      ("m1", "episodic", "a1", Array(1f, 0f)),
      ("m2", "episodic", "a1", Array(0.6f, 0.8f)),
      ("m3", "semantic", "a1", Array(0.8f, 0.6f)),
      ("m4", "episodic", "a2", Array(1f, 0f)) // other tenant — must not appear
    ).toDF("id", "mem_type", "tenant_id", "vector")
    val qv = Seq(1.0, 0.0)
    val recalled = AgentMemory.recallPlan(mem, qv, topK = 1, tenant = Some("a1"))
      .select("mem_type", "id", "rank").as[(String, String, Int)].collect().toSet
    assert(recalled == Set(("episodic", "m1", 1), ("semantic", "m3", 1)))
    val flat = AgentMemory.searchAllPlan(mem, qv, topK = 2, tenant = Some("a1"))
      .select("id").as[String].collect().toSeq
    assert(flat == Seq("m1", "m3")) // cos: m1=1.0 > m3=0.8 > m2=0.6
  }

  test("remember/learn/registerTool then recall returns per-type ranked hits for the right agent") {
    val m = freshMemory()
    m.remember("agent-1", "User asked about chemical storage safety requirements")
    m.learn("agent-1", "OSHA 29 CFR 1910 covers general industry safety standards", confidence = 0.95)
    m.registerTool("agent-1", "search_regulations", "Search the regulatory database")
    m.remember("agent-2", "Unrelated agent memory about finance")

    val res = m.recall("agent-1", "safety regulations")
    assert(res.keySet == Set("episodic", "semantic", "procedural", "shared"))
    assert(res("episodic").count() == 1)
    assert(res("semantic").count() == 1)
    assert(res("procedural").count() == 1)
    // agent-2's row is invisible to agent-1
    val allIds = res.values.map(_.select("content").as[String].collect().toSeq).flatten
    assert(!allIds.exists(_.contains("finance")))
  }

  test("searchAll returns a flat globally-ranked list") {
    val m = freshMemory()
    m.remember("a", "alpha safety")
    m.learn("a", "beta safety standard")
    val flat = m.searchAll("a", "safety", topK = 5)
    val scores = flat.select("score").as[Double].collect().toSeq
    assert(scores.length == 2 && scores == scores.sorted.reverse)
  }

  test("shared memories are visible to OTHER agents, _allowed_agents stored not enforced") {
    val m = freshMemory()
    m.share("agent-1", "Customer ACME prefers ISO 14001", allowedAgents = Seq("agent-3"))
    val res = m.recall("agent-2", "ACME compliance")
    assert(res("shared").count() == 1) // agent-2 not in allowedAgents — still sees it
    val meta = m.engine.table("_memory_shared")
      .selectExpr("metadata['_allowed_agents']").as[String].head
    assert(meta == "agent-3") // stored
  }

  test("forget erases an agent's memories (GDPR), other agents untouched") {
    val m = freshMemory()
    m.remember("a", "one"); m.learn("a", "two"); m.remember("b", "keep me")
    assert(m.forget("a") == 2)
    assert(m.stats("a").values.sum == 0)
    assert(m.stats("b").values.sum == 1)
  }

  test("conversations: append, last-N window read, since filter, retention trim") {
    val m = freshMemory()
    val msgs = (1 to 8).map(i => ("a", "t1", i.toLong, if (i % 2 == 0) "user" else "assistant", s"msg$i"))
    m.addMessages(msgs.toDF("agent_id", "thread_id", "seq", "role", "content"))
    m.addMessage("a", "t2", 1, "user", "other thread")

    val last3 = m.getConversation("a", "t1", limit = 3)
      .select("content").as[String].collect().toSeq
    assert(last3 == Seq("msg6", "msg7", "msg8")) // oldest-first of the last 3

    val trimmed = new AgentMemory(m.engine, new MockEmbedderProvider(64),
      maxConversationLength = 4)
    assert(trimmed.trimConversations() == 4) // 8 in t1 -> keep 4; t2 has 1
    assert(trimmed.getConversation("a", "t1", limit = 50).count() == 4)
    assert(trimmed.getConversation("a", "t2", limit = 50).count() == 1)
  }

  test("recall appends to the access log; accessCounts aggregates it") {
    val m = freshMemory()
    m.remember("a", "tracked memory")
    m.recall("a", "tracked")
    m.recall("a", "tracked")
    val counts = m.accessCounts.select("access_count").as[Long].collect().toSeq
    assert(counts == Seq(2))
  }
}
