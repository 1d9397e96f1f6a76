package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.learning.LearningEngine
import graft.memory.AgentMemory
import graft.providers.MockEmbedderProvider

/** Learning suite mirroring
  * `/root/reference/test/fusionpact.test.js:340-554`: consolidation
  * decay/prune, weight learning (5× q=0.9 vector feedback ⇒ vector
  * weight rises, weights sum to 1), skills + EMA + eviction semantics,
  * triple extraction without LLM, reflection. */
class LearningEngineSpec extends AnyFunSuite {
  import TestSpark.spark

  private def fresh(): LearningEngine = {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_learn").toString)
    new LearningEngine(new AgentMemory(engine, new MockEmbedderProvider(64)))
  }

  test("weight learning: five quality-0.9 vector feedbacks raise vector weight; weights sum to 1") {
    val l = fresh()
    val query = "find the safety documents quickly"
    (1 to 5).foreach { i =>
      l.recordRetrievalFeedback("a", query, "vector", 0.9,
        now = new Timestamp(1000000L + i))
    }
    val (v, t, k) = l.getOptimalWeights("a", query)
    assert(v > 0.4) // boosted above the default
    assert(math.abs(v + t + k - 1.0) < 1e-9)
    assert(v > t && v > k)
    // unseen pattern -> defaults
    assert(l.getOptimalWeights("a", "zzz qqq www xyz") == (0.4, 0.4, 0.2))
  }

  test("feedback validation throws like the reference") {
    val l = fresh()
    assertThrows[IllegalArgumentException](l.recordRetrievalFeedback("a", "", "vector", 0.5))
    assertThrows[IllegalArgumentException](l.recordRetrievalFeedback("a", "q", "vector", 1.5))
    assertThrows[IllegalArgumentException](l.recordRetrievalFeedback("a", "q", "bogus", 0.5))
  }

  test("low-quality feedback with correction learns a retrieval-failure memory") {
    val l = fresh()
    l.recordRetrievalFeedback("a", "bad query", "tree", 0.1, correction = Some("use keywords"))
    val sem = l.memory.engine.table("_memory_semantic")
    assert(sem.count() == 1)
    import spark.implicits._
    assert(sem.select("content").as[String].head.contains("Retrieval failure"))
  }

  test("consolidation: unaccessed old memories decay and prune; accessed ones survive and strengthen") {
    val l = fresh()
    val old = new Timestamp(System.currentTimeMillis() - 10L * 24 * 3600 * 1000) // 10 days
    l.memory.remember("a", "stale low-importance memory", importance = 0.4, now = Some(old))
    l.memory.remember("a", "hot memory accessed often", importance = 0.4, now = Some(old))
    // access the hot one 4x (access log; boost = min(4*0.02,0.3)=0.08, count>3 strengthens)
    val hotId = l.memory.engine.table("_memory_episodic")
      .filter(org.apache.spark.sql.functions.col("content").contains("hot"))
      .select("id").collect().head.getString(0)
    import spark.implicits._
    (1 to 4).foreach { _ =>
      Seq((hotId, "episodic", "a")).toDF("id", "mem_type", "agent_id")
        .withColumn("ts", org.apache.spark.sql.functions.current_timestamp())
        .write.mode("append").parquet(s"${l.memory.engine.root}/_access_log")
    }
    // decay over 10 days: 0.05*(240/24)=0.5 -> stale 0.4 -> 0, pruned.
    // hot: recency ~0 -> decay ~0, +0.01 strengthen -> survives.
    val res = l.consolidate("a")
    assert(res.pruned == 1)
    assert(res.strengthened == 1)
    val left = l.memory.engine.table("_memory_episodic").select("content").as[String].collect()
    assert(left.length == 1 && left.head.contains("hot"))
  }

  test("consolidation merges near-identical contents (word-set jaccard > 0.85)") {
    val l = fresh()
    val now = Some(new Timestamp(System.currentTimeMillis()))
    l.memory.remember("a", "the quick brown fox jumps over the lazy dog", importance = 0.9, now = now)
    l.memory.remember("a", "the quick brown fox jumps over the lazy dog today", importance = 0.5, now = now)
    l.memory.remember("a", "completely different content here", importance = 0.9, now = now)
    val res = l.consolidate("a")
    assert(res.merged == 1)
    import spark.implicits._
    val contents = l.memory.engine.table("_memory_episodic").select("content").as[String].collect()
    assert(contents.length == 2)
    assert(contents.exists(_.contains(" | "))) // keeper absorbed the dup
  }

  test("skills: learn, keyword match ranking, EMA outcome update") {
    val l = fresh()
    l.learnSkill("a", "s1", "extract_dates", "Extract dates from text",
      keywords = Seq("date", "extract"), successRate = 1.0)
    l.learnSkill("a", "s2", "summarize", "Summarize documents",
      keywords = Seq("summary"), successRate = 1.0)
    val matches = l.findApplicableSkills("a", "please extract the date from this form")
    import spark.implicits._
    val top = matches.select("skill_id").as[String].collect()
    assert(top.toSeq == Seq("s1"))
    l.recordSkillOutcome("a", "s1", success = false)
    val rate = l.skills.filter($"skill_id" === "s1").select("success_rate").as[Double].head
    assert(math.abs(rate - 0.7) < 1e-9) // 0.3*0 + 0.7*1.0
    l.recordSkillOutcome("a", "s1", success = true)
    val rate2 = l.skills.filter($"skill_id" === "s1").select("success_rate").as[Double].head
    assert(math.abs(rate2 - (0.3 + 0.7 * 0.7)) < 1e-9)
  }

  test("batched skill outcomes: one rewrite equals the sequential single updates") {
    val l = fresh()
    l.learnSkill("a", "s1", "alpha", successRate = 1.0)
    l.learnSkill("a", "s2", "beta", successRate = 0.5)
    l.learnSkill("b", "s1", "gamma", successRate = 0.8)
    // batch: s1/a gets (false, true, true) in order; s2/a gets (true); b untouched
    l.recordSkillOutcomes(Seq(
      ("a", "s1", false), ("a", "s2", true), ("a", "s1", true), ("a", "s1", true)))
    import spark.implicits._
    def rate(agent: String, skill: String): (Double, Long) = {
      val r = l.skills.filter($"agent_id" === agent && $"skill_id" === skill)
        .select("success_rate", "use_count").as[(Double, Long)].head
      r
    }
    // sequential reference: 1.0 -> .7 -> .3+.7*.7=.79 -> .3+.7*.79=.853
    val (r1, k1) = rate("a", "s1")
    assert(math.abs(r1 - 0.853) < 1e-9 && k1 == 3)
    val (r2, k2) = rate("a", "s2")
    assert(math.abs(r2 - (0.3 + 0.7 * 0.5)) < 1e-9 && k2 == 1)
    val (r3, k3) = rate("b", "s1")
    assert(r3 == 0.8 && k3 == 0)
  }

  test("triple extraction without LLM: is/covers patterns, graph query + entities") {
    val l = fresh()
    val n = l.extractKnowledge("a",
      "OSHA 1910 is the general industry standard. The manual covers chemical handling procedures.")
    assert(n == 2)
    import spark.implicits._
    assert(l.queryKnowledgeGraph("a", predicate = Some("covers")).count() == 1)
    assert(l.queryKnowledgeGraph("a", subject = Some("osha")).count() == 1)
    val entities = l.graphEntities("a").as[String].collect()
    assert(entities.length == 4)
  }

  test("reflection summarizes recent feedback and stores an episodic memory") {
    val l = fresh()
    l.recordRetrievalFeedback("a", "good one", "vector", 0.9)
    l.recordRetrievalFeedback("a", "terrible query", "tree", 0.1)
    val r = l.reflect("a")
    assert(r.contains("failed") && r.contains("terrible query"))
    assert(l.reflections("a").count() == 1)
    import spark.implicits._
    val mems = l.memory.engine.table("_memory_episodic").select("content").as[String].collect()
    assert(mems.exists(_.startsWith("Self-reflection:")))
  }

  test("feedback retention trims to the cap per agent") {
    val l = fresh()
    (1 to 12).foreach(i => l.recordRetrievalFeedback("a", s"q$i", "hybrid", 0.5,
      now = new Timestamp(1000L * i)))
    val small = new LearningEngine(l.memory, maxFeedbackLog = 10)
    assert(small.trimFeedback() == 2)
    assert(small.feedbackLog("a").count() == 10)
  }
}
