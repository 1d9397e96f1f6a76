package graft.memory

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.FusionEngine
import graft.model.CollectionConfig
import graft.providers.Embedder

/** Agent memory on tables (reference
  * `/root/reference/src/memory/AgentMemory.js`).
  *
  * Memory types are vector collections named `_memory_{type}`
  * (`AgentMemory.js:92-120`) with `agent_id` as the tenant column —
  * agent isolation IS tenancy (`:398-411`). Conversations are a plain
  * (non-vector) table keyed `(agent_id, thread_id)` with last-N reads as
  * partitioned windows. Access tracking is an append-only log aggregated
  * at consolidation time — mutating rows per read is anti-Spark
  * (SURVEY §3.3).
  *
  * Quirks preserved from the reference (SURVEY §7.4):
  *   - shared-pool recall has NO tenant filter — all agents see all
  *     shared memories (`AgentMemory.js:422-437`);
  *   - `_allowed_agents` is stored on share but never enforced at recall
  *     (`:501`).
  */
final class AgentMemory(
    val engine: FusionEngine,
    val embedder: Embedder,
    val enableSharedMemory: Boolean = true,
    val maxConversationLength: Int = 100) {

  import engine.spark
  import AgentMemory._

  /** Event hooks (`AgentMemory.js` extends EventEmitter — :165, :208,
    * :265, :309, :439, :508, :563). */
  val events = new graft.events.EventBus

  val MemoryTypes = Seq("episodic", "semantic", "procedural", "conversation")

  private def coll(memType: String) = s"_memory_$memType"

  /** Auto-create memory collections (`AgentMemory.js:92-120`). */
  def init(): Unit = {
    val types = if (enableSharedMemory) MemoryTypes :+ "shared" else MemoryTypes
    types.foreach { t =>
      if (!engine.hasCollection(coll(t)))
        engine.createCollection(coll(t),
          CollectionConfig(dimensions = embedder.dimensions, distanceMetric = "cosine"))
    }
  }

  private def insertMemory(memType: String, agentId: String, id: String,
                           content: String, embedText: String,
                           importance: Double, metadata: Map[String, String],
                           ttlMs: Option[Long], now: Option[Timestamp]): String = {
    init()
    import spark.implicits._
    val meta = metadata ++ Map(
      "_content" -> content,
      "_agent_id" -> agentId,
      "_type" -> memType,
      "_importance" -> importance.toString)
    val df = Seq((id, embedText, content, meta)).toDF("id", "embed_text", "content", "metadata")
    val embedded = graft.providers.Embed.withEmbedding(df, "embed_text", "vector", embedder)
      .drop("embed_text")
    // shared pool is inserted WITHOUT a tenant (reference `share` passes
    // no tenantId — `AgentMemory.js:493-506`)
    val tenant = if (memType == "shared") None else Some(agentId)
    engine.insert(coll(memType), embedded, tenantId = tenant, ttlMs = ttlMs, now = now)
    id
  }

  /** Episodic memory: events/observations (`AgentMemory.js:144-167`). */
  def remember(agentId: String, content: String, importance: Double = 0.5,
               role: String = "system", metadata: Map[String, String] = Map.empty,
               ttlMs: Option[Long] = None, now: Option[Timestamp] = None): String = {
    val id = insertMemory("episodic", agentId, newId("mem"), content, content,
      importance, metadata + ("role" -> role), ttlMs, now)
    events.emit("memory:stored", // AgentMemory.js:165
      Map("agentId" -> agentId, "type" -> "episodic", "id" -> id))
    id
  }

  /** Semantic memory: facts; importance = confidence (default 0.7,
    * `AgentMemory.js:185-210`). */
  def learn(agentId: String, content: String, confidence: Double = 0.7,
            metadata: Map[String, String] = Map.empty,
            now: Option[Timestamp] = None): String = {
    val id = insertMemory("semantic", agentId, newId("mem"), content, content,
      confidence, metadata, None, now)
    events.emit("memory:learned", Map("agentId" -> agentId, "id" -> id)) // :208
    id
  }

  /** Procedural memory: tool registration (`AgentMemory.js:238-267`).
    * Content is the `Tool:/Description:/Schema:` block; the embedding is
    * of `"name: description"` — reference asymmetry preserved. */
  def registerTool(agentId: String, name: String, description: String,
                   schemaJson: String = "{}",
                   metadata: Map[String, String] = Map.empty,
                   now: Option[Timestamp] = None): String = {
    val content = s"Tool: $name\nDescription: $description\nSchema: $schemaJson"
    val id = insertMemory("procedural", agentId, newId("tool"), content, s"$name: $description",
      0.9, metadata ++ Map("toolName" -> name, "toolSchema" -> schemaJson), None, now)
    events.emit("memory:tool_registered", // :265
      Map("agentId" -> agentId, "toolName" -> name))
    id
  }

  /** Share into the cross-agent pool (`AgentMemory.js:493-506`).
    * `allowedAgents` is STORED but not enforced (reference quirk). */
  def share(agentId: String, content: String,
            allowedAgents: Seq[String] = Seq.empty,
            metadata: Map[String, String] = Map.empty,
            now: Option[Timestamp] = None): String = {
    require(enableSharedMemory, "Shared memory is disabled")
    val id = insertMemory("shared", agentId, newId("shared"), content, content, 0.5,
      metadata + ("_allowed_agents" -> allowedAgents.mkString(",")), None, now)
    events.emit("memory:shared", Map("agentId" -> agentId, "id" -> id)) // :508
    id
  }

  /** Per-type kNN recall with the agent as tenant
    * (`AgentMemory.js:379-437`). Returns type → ranked DataFrame
    * `(id, content, score, mem_type)`. Also appends to the access log
    * (the Spark stand-in for `_trackAccess` row mutation). */
  def recall(agentId: String, query: String,
             types: Seq[String] = Seq("episodic", "semantic", "procedural"),
             topK: Int = 10, includeShared: Boolean = true,
             trackAccess: Boolean = true): Map[String, DataFrame] = {
    init()
    val qv = embedder.embed(query).map(_.toDouble).toSeq
    val perType = types.map { t =>
      val hits = engine.search(coll(t), qv, topK, tenantId = Some(agentId))
        .select(col("id"), col("content"), col("score"), lit(t).as("mem_type"))
      t -> hits
    }.toMap
    val withShared =
      if (includeShared && enableSharedMemory) {
        // NO tenant filter — reference quirk (`AgentMemory.js:422-437`)
        val sh = engine.search(coll("shared"), qv, topK)
          .select(col("id"), col("content"), col("score"), lit("shared").as("mem_type"))
        perType + ("shared" -> sh)
      } else perType
    if (trackAccess) logAccess(agentId, withShared)
    // AgentMemory.js:439 emits {agentId, query, resultCounts}; counts
    // here would force each lazy per-type plan — the type list stands in
    events.emit("memory:recalled",
      Map("agentId" -> agentId, "query" -> query, "types" -> withShared.keys.toSeq.sorted))
    withShared
  }

  /** Flat ranked search across all memory types
    * (`AgentMemory.js:455-465`): union per-type results, global top-K.
    * One plan — no driver-side merge loop. */
  def searchAll(agentId: String, query: String, topK: Int = 10,
                includeShared: Boolean = true): DataFrame = {
    val parts = recall(agentId, query, topK = topK,
      includeShared = includeShared, trackAccess = false).values
    parts.reduce(_ unionByName _)
      .orderBy(desc("score"), asc("id"))
      .limit(topK)
  }

  /** GDPR-style erasure (`AgentMemory.js:530-560`): delete an agent's
    * rows for one type or all, optionally restricted to ids. Returns
    * rows deleted. */
  def forget(agentId: String, memType: String = "all",
             ids: Seq[String] = Seq.empty): Long = {
    init()
    val types = if (memType == "all") MemoryTypes.filterNot(_ == "conversation") else Seq(memType)
    val deleted = types.map { t =>
      var cond = col("tenant_id") === agentId
      if (ids.nonEmpty) cond = cond && col("id").isin(ids.map(lit(_)): _*)
      engine.deleteWhere(coll(t), cond)
    }.sum
    events.emit("memory:forgotten", // :563
      Map("agentId" -> agentId, "type" -> memType, "deleted" -> deleted))
    deleted
  }

  /** Per-type + total memory counts (`AgentMemory.js:572-590`). */
  def stats(agentId: String): Map[String, Long] = {
    init()
    MemoryTypes.filterNot(_ == "conversation").map { t =>
      t -> engine.table(coll(t)).filter(col("tenant_id") === agentId).count()
    }.toMap
  }

  // ─── Conversations (`AgentMemory.js:285-336`) ───

  private def convPath = Paths.get(engine.root, "_conversations")

  def conversations: DataFrame = {
    FusionEngine.recoverSwap(convPath) // crashed-swap restore
    if (Files.exists(convPath))
      spark.read.schema(ConversationSchema).parquet(convPath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], ConversationSchema)
  }

  /** Append messages. `df` columns: (agent_id, thread_id, seq, role,
    * content[, ts]). */
  def addMessages(df: DataFrame, now: Option[Timestamp] = None): Unit = {
    val withTs = if (df.columns.contains("ts")) df
      else df.withColumn("ts", lit(now.getOrElse(new Timestamp(System.currentTimeMillis()))))
    withTs.select(ConversationSchema.fieldNames.map(col): _*)
      .select(ConversationSchema.fields.map(f => col(f.name).cast(f.dataType)): _*)
      .write.mode(SaveMode.Append).parquet(convPath.toString)
  }

  def addMessage(agentId: String, threadId: String, seq: Long, role: String,
                 content: String, now: Option[Timestamp] = None): Unit = {
    import spark.implicits._
    addMessages(Seq((agentId, threadId, seq, role, content))
      .toDF("agent_id", "thread_id", "seq", "role", "content"), now)
    events.emit("conversation:message", // :309
      Map("agentId" -> agentId, "threadId" -> threadId, "role" -> role))
  }

  /** Last-`limit` messages of a thread, oldest-first
    * (`AgentMemory.js:323-336`): partitioned window, rank from the tail. */
  def getConversation(agentId: String, threadId: String, limit: Int = 50,
                      since: Option[Timestamp] = None): DataFrame = {
    var msgs = conversations
      .filter(col("agent_id") === agentId && col("thread_id") === threadId)
    since.foreach(s => msgs = msgs.filter(col("ts") > lit(s)))
    val w = Window.partitionBy("agent_id", "thread_id")
      .orderBy(desc("seq"))
    msgs.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= limit).drop("_rn")
      .orderBy(asc("seq"))
  }

  /** Batch retention job: keep only the last `maxConversationLength`
    * messages per thread (the reference trims at every append,
    * `AgentMemory.js:305-307`; a periodic partitioned-window rewrite is
    * the batch equivalent). Returns rows dropped. */
  def trimConversations(): Long = {
    if (!Files.exists(convPath)) return 0L
    val before = conversations.count()
    val w = Window.partitionBy("agent_id", "thread_id").orderBy(desc("seq"))
    val kept = conversations.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= maxConversationLength).drop("_rn")
    val tmp = Paths.get(engine.root, "_conversations_tmp")
    kept.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    FusionEngine.atomicSwap(convPath, tmp)
    before - conversations.count()
  }

  // ─── Access log (replaces in-place accessCount++, SURVEY §3.3) ───

  private def accessLogPath = Paths.get(engine.root, "_access_log")

  def accessLog: DataFrame =
    if (Files.exists(accessLogPath))
      spark.read.schema(AccessLogSchema).parquet(accessLogPath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], AccessLogSchema)

  private def logAccess(agentId: String, results: Map[String, DataFrame]): Unit = {
    val rows = results.map { case (t, df) =>
      df.select(col("id"), lit(t).as("mem_type"))
    }.reduce(_ unionByName _)
      .withColumn("agent_id", lit(agentId))
      .withColumn("ts", current_timestamp())
    rows.select(AccessLogSchema.fieldNames.map(col): _*)
      .write.mode(SaveMode.Append).parquet(accessLogPath.toString)
  }

  /** accessCount per memory id — aggregate of the log (what
    * consolidation reads instead of a mutable counter). */
  def accessCounts: DataFrame =
    accessLog.groupBy("id").agg(count(lit(1)).as("access_count"),
      max("ts").as("last_accessed"))
}

object AgentMemory {
  private val idCounter = new java.util.concurrent.atomic.AtomicLong()
  private def newId(prefix: String): String =
    s"${prefix}_${System.currentTimeMillis()}_${idCounter.incrementAndGet()}"

  /** Unified-table recall plan — the 100 TB shape of
    * [[AgentMemory.recall]]: ONE memory table partitioned by
    * `(tenant, mem_type)` instead of a collection per type, so tenant
    * and type predicates become partition pruning. Semantics match the
    * per-collection path: tenant filter BEFORE scoring
    * (filter-then-rank), cosine score rounded for cross-engine
    * reproducibility, ONE rank window partitioned by memory type.
    * Graded by the `memory_recall` entry. */
  def recallPlan(mem: DataFrame, queryVec: Seq[Double], topK: Int,
                 tenant: Option[String] = None,
                 tenantCol: String = "tenant_id", typeCol: String = "mem_type",
                 idCol: String = "id", vecCol: String = "vector",
                 roundTo: Option[Int] = Some(6)): DataFrame = {
    val scored = scoredMemories(mem, queryVec, tenant, tenantCol, vecCol, roundTo)
    val w = Window.partitionBy(col(typeCol)).orderBy(desc("score"), asc(idCol))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
  }

  /** Unified-table flat search — [[AgentMemory.searchAll]] over one
    * table: score, then ONE global top-K (TakeOrderedAndProject, no
    * full sort). Graded by the `memory_searchall` entry. */
  def searchAllPlan(mem: DataFrame, queryVec: Seq[Double], topK: Int,
                    tenant: Option[String] = None,
                    tenantCol: String = "tenant_id", idCol: String = "id",
                    vecCol: String = "vector",
                    roundTo: Option[Int] = Some(6)): DataFrame =
    scoredMemories(mem, queryVec, tenant, tenantCol, vecCol, roundTo)
      .orderBy(desc("score"), asc(idCol))
      .limit(topK)

  private def scoredMemories(mem: DataFrame, queryVec: Seq[Double],
                             tenant: Option[String], tenantCol: String,
                             vecCol: String, roundTo: Option[Int]): DataFrame = {
    import graft.functions.VectorFunctions
    var in = mem
    tenant.foreach(t => in = in.filter(col(tenantCol) === lit(t)))
    // Catalyst does not constant-fold aggregate() over a literal array —
    // inline the query self-norm as a literal (same left-to-right double
    // sum → bit-identical), exactly as VectorSearch.knn does.
    val qNorm = math.sqrt(queryVec.foldLeft(0.0)((acc, x) => acc + x * x))
    val raw = VectorFunctions.dotProduct(col(vecCol), VectorFunctions.vecLit(queryVec)) /
      (VectorFunctions.norm(col(vecCol)) * lit(qNorm))
    in.withColumn("score", roundTo.map(d => round(raw, d)).getOrElse(raw))
  }

  val ConversationSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType, nullable = false),
    StructField("thread_id", StringType, nullable = false),
    StructField("seq", LongType, nullable = false),
    StructField("role", StringType, nullable = true),
    StructField("content", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))

  val AccessLogSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("mem_type", StringType, nullable = true),
    StructField("agent_id", StringType, nullable = true),
    StructField("ts", TimestampType, nullable = true)))
}
