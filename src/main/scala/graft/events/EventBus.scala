package graft.events

/** Driver-side event hooks — the reference's `EventEmitter` surface
  * (~31 event types across FusionEngine / TreeIndex / LearningEngine /
  * AgentMemory / Orchestrator / RAGPipeline / HybridRetriever /
  * MCPServer; every `this.emit(...)` site in `/root/reference/src`,
  * e.g. `core/FusionEngine.js:110,191`, `rag/RAGPipeline.js:93,135`,
  * `orchestration/AgentOrchestrator.js:98,172`) re-expressed as a
  * plain synchronous listener registry each component owns.
  *
  * CONTROL PLANE ONLY, by design (SURVEY §2.10): events fire on the
  * driver at the same semantic points the reference emits — after the
  * corresponding Spark action has completed — and nothing on an
  * executor hot path ever touches the bus, so the data plane stays
  * fully declarative and the hooks cost nothing at 100 TB. Payloads
  * mirror the reference's object shapes as `Map[String, Any]`
  * (component-level differences — e.g. batch APIs carrying a count
  * where the reference's single-row API carried one id — are noted at
  * each emit site).
  *
  * Semantics match Node's synchronous `emit`: listeners run in
  * registration order on the emitting thread, and a throwing listener
  * propagates to the caller (hooks are the caller's code; swallowing
  * their failures would hide bugs the reference surfaces).
  * Registration is thread-safe (copy-on-write), emission lock-free.
  */
final class EventBus {
  @volatile private var named =
    Map.empty[String, Vector[Map[String, Any] => Unit]]
  @volatile private var any =
    Vector.empty[(String, Map[String, Any]) => Unit]

  /** Subscribe to one event type (the reference's `.on(name, fn)`). */
  def on(event: String)(f: Map[String, Any] => Unit): this.type =
    synchronized {
      named = named.updated(event, named.getOrElse(event, Vector.empty) :+ f)
      this
    }

  /** Subscribe to every event (observability taps, test harnesses). */
  def onAny(f: (String, Map[String, Any]) => Unit): this.type =
    synchronized { any = any :+ f; this }

  /** Listeners registered for `event` — NAMED listeners only, matching
    * Node's `listenerCount(name)` (onAny taps are the wildcard surface
    * Node lacks and are intentionally excluded; counting them here
    * diverged from the EventEmitter semantics this bus documents
    * itself as mirroring — ADVICE r17). */
  def listenerCount(event: String): Int =
    named.getOrElse(event, Vector.empty).size

  /** Would an `emit(event, …)` reach ANY code — a named listener or an
    * onAny tap? Lets an emit site skip computing an expensive payload
    * field when provably nobody observes it (the streaming-ingest
    * collection recount, r18) without ever changing what an observer
    * sees. */
  private[graft] def hasObservers(event: String): Boolean =
    any.nonEmpty || named.getOrElse(event, Vector.empty).nonEmpty

  /** Fire an event: named listeners in registration order, then the
    * onAny taps. No-op when nobody listens (the common case — one map
    * lookup and a vector-emptiness check). */
  def emit(event: String, payload: Map[String, Any] = Map.empty): Unit = {
    val n = named.getOrElse(event, Vector.empty)
    n.foreach(_(payload))
    any.foreach(_(event, payload))
  }
}
