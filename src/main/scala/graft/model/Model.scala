package graft.model

import java.sql.Timestamp

/** Core typed records (SURVEY §1.4 Spark mapping).
  *
  * System metadata the reference keeps as `_`-prefixed keys inside a
  * schemaless object (`/root/reference/src/core/HNSWIndex.js:28-35`:
  * `_tenant_id`, `_timestamp`, `_ttl`) is promoted to real, typed,
  * predicate-pushdown-friendly columns; the schemaless tail stays in
  * `metadata MAP<STRING,STRING>`.
  */
final case class VectorRecord(
    id: String,
    vector: Array[Float],
    tenant_id: Option[String],
    ts: Timestamp,
    ttl_ms: Option[Long],
    content: Option[String],
    metadata: Map[String, String])

/** Collection config (`FusionEngine.js:96-104` defaults). The HNSW build
  * parameters (M / efConstruction / efSearch) are accepted for config
  * parity but are no-ops: the Spark engine's exact path needs no graph,
  * and the ANN path (graft.ann) has its own parameters. */
final case class CollectionConfig(
    dimensions: Int = 768,
    distanceMetric: String = "cosine",
    m: Int = 16,
    efConstruction: Int = 200,
    efSearch: Int = 50,
    createdAt: String = "",
    /** Hive-partition the data dir by tenant: tenant filters become
      * storage-level partition pruning (the 100 TB multi-tenant layout;
      * the reference's tenancy is a post-filter). Off by default —
      * right when tenants are few and searches are tenant-scoped. */
    partitionByTenant: Boolean = false,
    /** Hash-shard the data dir on `crc32(id) % shards` (0 = unsharded).
      * Point lookups then prune to ONE partition instead of scanning
      * every file, and delete-by-id rewrites only the affected shards —
      * at 100 TB a get/delete touches 1/shards of the table. Sharding
      * nests ABOVE tenant partitioning when both are on. Scans and kNN
      * are unaffected (they read all shards either way). */
    shards: Int = 0)

/** One chunk of an ingested document (`RAGPipeline.js:100-122`). */
final case class Chunk(
    doc_id: String,
    chunk_index: Int,
    total_chunks: Int,
    text: String)

/** Memory entry (`AgentMemory.js:29-41`): one row per memory, typed.
  * `agent_id` is the tenant column (agent isolation IS tenancy,
  * `AgentMemory.js:398-411`). */
final case class MemoryEntry(
    id: String,
    agent_id: String,
    mem_type: String, // episodic | semantic | procedural | conversation
    content: String,
    vector: Array[Float],
    importance: Double,
    ts: Timestamp,
    ttl_ms: Option[Long],
    metadata: Map[String, String])

/** Conversation message (`AgentMemory.js:44-49`). */
final case class ConversationMessage(
    agent_id: String,
    thread_id: String,
    seq: Long,
    role: String,
    content: String,
    ts: Timestamp)

/** Document-tree node in adjacency form (SURVEY §1.4: Spark has no
  * recursive struct; `citation_path` is precomputed at build time so the
  * `" > "`-joined citation (`TreeIndex.js:710-715`) is a column op). */
final case class TreeNodeRow(
    doc_id: String,
    node_id: String,
    parent_id: Option[String],
    level: Int,
    pos: Int,
    title: String,
    summary: String,
    content: String,
    citation_path: Seq[String])

/** Knowledge-graph triple (`RecursiveLearningEngine.js:538-545`). */
final case class Triple(
    agent_id: String,
    subject: String,
    predicate: String,
    obj: String,
    confidence: Double,
    source: String,
    extracted_at: Timestamp)

/** Learned skill (`RecursiveLearningEngine.js:410-420`). */
final case class Skill(
    agent_id: String,
    skill_id: String,
    name: String,
    description: String,
    keywords: Seq[String],
    steps: Seq[String],
    success_rate: Double,
    use_count: Long,
    learned_at: Timestamp)

/** Retrieval feedback row (`RecursiveLearningEngine.js:262-284`). */
final case class Feedback(
    agent_id: String,
    query: String,
    strategy: String,
    quality: Double,
    result_ids: Seq[String],
    ts: Timestamp)
