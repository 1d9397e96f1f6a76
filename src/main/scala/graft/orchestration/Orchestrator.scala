package graft.orchestration

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.memory.AgentMemory

/** Multi-agent coordination (reference
  * `/root/reference/src/orchestration/AgentOrchestrator.js`): an agent
  * registry table, a message log with broadcast fan-out, capability
  * delegation, and collaborative recall.
  *
  * The reference loops over agents in process; here registry queries
  * are DataFrame ops: delegation is `argmax |required ∩ capabilities|`
  * as a sorted limit-1 (`:305-323`), collaborative recall is ONE search
  * over the agents' memory union grouped by agent (`:243-268`) instead
  * of an N-agent fan-out loop.
  */
final class Orchestrator(val memory: AgentMemory) {

  private val engine = memory.engine
  import engine.spark
  import spark.implicits._
  import Orchestrator._

  /** Event hooks (`AgentOrchestrator.js` extends EventEmitter — :98,
    * :116, :172, :293). */
  val events = new graft.events.EventBus

  private def regPath = Paths.get(engine.root, "_agents")
  private def msgPath = Paths.get(engine.root, "_messages")

  def agents: DataFrame =
    if (Files.exists(regPath))
      spark.read.schema(AgentSchema).parquet(regPath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], AgentSchema)

  /** Register an agent with capabilities (`AgentOrchestrator.js:96-120`). */
  def register(agentId: String, capabilities: Seq[String],
               description: String = "",
               now: Timestamp = new Timestamp(System.currentTimeMillis())): Unit = {
    require(agentId.nonEmpty, "agentId must be non-empty")
    Seq((agentId, capabilities, description, now))
      .toDF("agent_id", "capabilities", "description", "registered_at")
      .write.mode(SaveMode.Append).parquet(regPath.toString)
    events.emit("agent:registered", // AgentOrchestrator.js:98
      Map("agentId" -> agentId, "description" -> description))
  }

  /** Unregister an agent (`AgentOrchestrator.js:107-120`): registry
    * rewrite (tmp + atomic swap, the engine's crash-safe pattern);
    * emits only when the agent existed, like the reference. */
  def unregister(agentId: String): Boolean = {
    val existed = listAgents().contains(agentId)
    if (existed) {
      val tmp = Paths.get(engine.root, "_agents_tmp")
      agents.filter(col("agent_id") =!= agentId)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      graft.engine.FusionEngine.atomicSwap(regPath, tmp)
      events.emit("agent:unregistered", Map("agentId" -> agentId)) // :116
    }
    existed
  }

  def listAgents(): Seq[String] =
    agents.select("agent_id").distinct().as[String].collect().toSeq.sorted

  // ─── Messaging (`AgentOrchestrator.js:131-195, 289-302`) ───

  def messages: DataFrame =
    if (Files.exists(msgPath))
      spark.read.schema(MessageSchema).parquet(msgPath.toString)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], MessageSchema)

  /** Send a message; `to = "*"` fans out to every registered agent
    * except the sender (broadcast delivery, `:152-158`). */
  def send(from: String, to: String, msgType: String, payload: String,
           now: Timestamp = new Timestamp(System.currentTimeMillis())): Long = {
    require(ValidMessageTypes.contains(msgType),
      s"type must be one of: ${ValidMessageTypes.mkString(", ")}")
    val recipients =
      if (to == "*") listAgents().filterNot(_ == from)
      else Seq(to)
    if (recipients.isEmpty) return 0L
    recipients.map(r => (from, r, msgType, payload, now))
      .toDF("from_agent", "to_agent", "msg_type", "payload", "ts")
      .write.mode(SaveMode.Append).parquet(msgPath.toString)
    // AgentOrchestrator.js:172 emits once per sendMessage with the msg;
    // the batch fan-out reports the recipient count
    events.emit("message:sent",
      Map("from" -> from, "to" -> to, "type" -> msgType,
        "recipients" -> recipients.size))
    recipients.size.toLong
  }

  /** Drain + handle (`AgentOrchestrator.js:289-302`): apply `handler`
    * to each pending message oldest-first; a throwing handler emits
    * message:error and processing continues (reference semantics).
    * Delivery is CONSUME-ONCE, like the reference's `getMessages`
    * (`:191-193` clears the queue after reading): the handled messages
    * are removed from the log afterwards via the registry's
    * tmp + atomic-swap rewrite, so a second call re-delivers nothing —
    * and, also like the reference, a message whose handler threw is
    * still consumed (the queue clears on read, not on success).
    * Returns (processed, failed). Driver-side — the queue is an
    * agent's pending control messages, not data-plane rows. */
  def processMessages(agentId: String)(
      handler: org.apache.spark.sql.Row => Unit): (Long, Long) = {
    val msgs = drain(agentId).collect()
    var ok = 0L
    var bad = 0L
    msgs.foreach { m =>
      try { handler(m); ok += 1 }
      catch {
        case e: Exception =>
          bad += 1
          events.emit("message:error", // :293
            Map("agentId" -> agentId, "error" -> String.valueOf(e.getMessage)))
      }
    }
    if (msgs.nonEmpty) {
      val tmp = Paths.get(engine.root, "_messages_tmp")
      messages.filter(col("to_agent") =!= agentId)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      graft.engine.FusionEngine.atomicSwap(msgPath, tmp)
    }
    (ok, bad)
  }

  /** An agent's pending messages, oldest first — a read-only PEEK
    * (the plan is lazy; nothing is consumed). [[processMessages]] is
    * the consuming path. */
  def drain(agentId: String): DataFrame =
    messages.filter(col("to_agent") === agentId).orderBy(asc("ts"), asc("payload"))

  // ─── Delegation (`AgentOrchestrator.js:212-232, 305-323`) ───

  /** Best agent for required capabilities: argmax of the capability
    * intersection size (ties → lexicographic agent id), then a task
    * message to it. Returns the chosen agent, or None when nobody
    * overlaps. */
  def delegate(from: String, requiredCapabilities: Seq[String], task: String,
               now: Timestamp = new Timestamp(System.currentTimeMillis())): Option[String] = {
    val best = rankAgents(requiredCapabilities)
      .limit(1).select("agent_id").as[String].collect().headOption
    best.foreach(b => send(from, b, "task", task, now))
    best
  }

  /** Capability ranking as a DataFrame op (the argmax made inspectable):
    * `(agent_id, match_count)` sorted. */
  def rankAgents(requiredCapabilities: Seq[String]): DataFrame = {
    val req = array(requiredCapabilities.map(lit(_)): _*)
    agents
      .withColumn("match_count", size(array_intersect(col("capabilities"), req)))
      .filter(col("match_count") > 0)
      .orderBy(desc("match_count"), asc("agent_id"))
      .select("agent_id", "match_count")
  }

  // ─── Collaborative recall (`AgentOrchestrator.js:243-268`) ───

  /** One query across several agents' memories: a single kNN over the
    * union with the agent id kept, ranked per agent — replaces the
    * reference's per-agent loop with one plan. Returns
    * `(agent_id, id, content, score, rank)`, rank ≤ topK per agent. */
  def collaborativeRecall(agentIds: Seq[String], query: String,
                          topK: Int = 5): DataFrame = {
    memory.init()
    val qv = memory.embedder.embed(query).map(_.toDouble).toSeq
    import org.apache.spark.sql.expressions.Window
    val types = Seq("episodic", "semantic", "procedural")
    val union = types.map(t => engine.table(s"_memory_$t"))
      .reduce(_ unionByName _)
      .filter(col("tenant_id").isin(agentIds.map(lit(_)): _*))
    val scored = union.withColumn("score",
      graft.functions.VectorFunctions.dotProduct(col("vector"),
        graft.functions.VectorFunctions.vecLit(normalize(qv))))
    val w = Window.partitionBy("tenant_id").orderBy(desc("score"), asc("id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("tenant_id").as("agent_id"), col("id"), col("content"),
        col("score"), col("rank"))
  }

  private def normalize(v: Seq[Double]): Seq[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n > 0) v.map(_ / n) else v
  }
}

object Orchestrator {
  val ValidMessageTypes: Set[String] = Set("task", "result", "query", "knowledge", "status")

  val AgentSchema: StructType = StructType(Seq(
    StructField("agent_id", StringType, nullable = false),
    StructField("capabilities", ArrayType(StringType), nullable = true),
    StructField("description", StringType, nullable = true),
    StructField("registered_at", TimestampType, nullable = true)))

  val MessageSchema: StructType = StructType(Seq(
    StructField("from_agent", StringType), StructField("to_agent", StringType),
    StructField("msg_type", StringType), StructField("payload", StringType),
    StructField("ts", TimestampType)))
}
