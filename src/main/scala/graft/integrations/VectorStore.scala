package graft.integrations

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.FusionEngine
import graft.model.CollectionConfig
import graft.providers.{Embed, Embedder}

/** LangChain-style vector-store facade (reference
  * `/root/reference/src/integrations/langchain.js`; behavioral bar from
  * `test/fusionpact.test.js:558-609`): addDocuments / similaritySearch
  * / similaritySearchWithScore / fromTexts / fromDocuments /
  * asRetriever — thin sugar over the engine, no new operators. */
final class VectorStore(val engine: FusionEngine, val embedder: Embedder,
                        val collection: String = "langchain") {
  import engine.spark.implicits._

  private var counter = 0L

  def init(): Unit =
    if (!engine.hasCollection(collection))
      engine.createCollection(collection,
        CollectionConfig(dimensions = embedder.dimensions, distanceMetric = "cosine"))

  /** Add `(pageContent, metadata)` documents; ids auto-assigned. */
  def addDocuments(docs: Seq[(String, Map[String, String])]): Seq[String] = {
    init()
    val ids = docs.map { _ => counter += 1; s"lc_$counter" }
    val df = ids.zip(docs).map { case (id, (text, meta)) => (id, text, meta) }
      .toDF("id", "content", "metadata")
    engine.insert(collection, Embed.withEmbedding(df, "content", "vector", embedder))
    ids
  }

  /** Top-k documents for a query: `(content, metadata)` rows.
    * `filter` is the optional metadata filter the reference's
    * `similaritySearch(query, k, filter)` accepts
    * (`langchain.js:88-93` — forwarded to the engine search); build it
    * with [[graft.engine.MetadataFilter]]. */
  def similaritySearch(query: String, k: Int = 4,
                       filter: Option[Column] = None): DataFrame =
    similaritySearchWithScore(query, k, filter).drop("score")

  /** Same with the score kept. */
  def similaritySearchWithScore(query: String, k: Int = 4,
                                filter: Option[Column] = None): DataFrame = {
    init()
    engine.search(collection, embedder.embed(query).map(_.toDouble).toSeq, k,
        filter = filter)
      .select($"content", $"metadata", $"score")
  }

  /** Retriever view (`asRetriever(config)`, `langchain.js:126-140`):
    * holds `k` and `strategy`. Quirk kept from the reference: the
    * default strategy is `vector` (the doc comment there says `hybrid`,
    * the code says `vector` — `:130` vs `:125`), and retrieval ignores
    * the strategy entirely (`FusionPactRetriever.getRelevantDocuments`
    * just calls `similaritySearch`, `:186-188`). */
  def asRetriever(k: Int = 4, strategy: String = "vector"): VectorStore.Retriever =
    new VectorStore.Retriever(this, k, strategy)
}

object VectorStore {

  /** LangChain-compatible retriever (`langchain.js:173-197`): stores the
    * config, answers via the store's `similaritySearch`; `invoke` is the
    * LangChain-compatibility alias. */
  final class Retriever(val store: VectorStore, val k: Int, val strategy: String) {
    def getRelevantDocuments(query: String): Seq[String] =
      store.similaritySearch(query, k).select("content")
        .collect().map(_.getString(0)).toSeq
    /** Alias for [[getRelevantDocuments]] (`langchain.js:192-194`). */
    def invoke(query: String): Seq[String] = getRelevantDocuments(query)
  }

  /** `fromTexts(texts, metadatas, …)` factory
    * (`langchain.js:151-163`; behavior bar `test/fusionpact.test.js:585-595`):
    * missing metadata entries default to empty. */
  def fromTexts(texts: Seq[String], engine: FusionEngine, embedder: Embedder,
                metadatas: Seq[Map[String, String]] = Seq.empty,
                collection: String = "langchain"): VectorStore =
    fromDocuments(
      texts.zipWithIndex.map { case (t, i) =>
        (t, if (i < metadatas.length) metadatas(i) else Map.empty[String, String])
      }, engine, embedder, collection)

  /** `fromDocuments` factory (`langchain.js:139-147`). */
  def fromDocuments(docs: Seq[(String, Map[String, String])], engine: FusionEngine,
                    embedder: Embedder, collection: String = "langchain"): VectorStore = {
    val store = new VectorStore(engine, embedder, collection)
    store.addDocuments(docs)
    store
  }
}
