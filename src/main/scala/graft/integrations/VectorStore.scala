package graft.integrations

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.FusionEngine
import graft.model.CollectionConfig
import graft.providers.{Embed, Embedder}

/** LangChain-style vector-store facade (reference
  * `/root/reference/src/integrations/langchain.js`; behavioral bar from
  * `test/fusionpact.test.js:558-609`): addDocuments / similaritySearch
  * / similaritySearchWithScore / fromTexts / asRetriever — thin sugar
  * over the engine, no new operators. */
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

  /** Top-k documents for a query: `(content, metadata)` rows. */
  def similaritySearch(query: String, k: Int = 4): DataFrame =
    similaritySearchWithScore(query, k).drop("score")

  /** Same with the score kept. */
  def similaritySearchWithScore(query: String, k: Int = 4): DataFrame = {
    init()
    engine.search(collection, embedder.embed(query).map(_.toDouble).toSeq, k)
      .select($"content", $"metadata", $"score")
  }

  /** Retriever-function view (`asRetriever`): query → contents. */
  def asRetriever(k: Int = 4): String => Seq[String] =
    (query: String) => similaritySearch(query, k).select("content").as[String].collect().toSeq
}

object VectorStore {
  /** `fromTexts` factory (`test/fusionpact.test.js:592-600`). */
  def fromTexts(texts: Seq[String], engine: FusionEngine, embedder: Embedder,
                collection: String = "langchain"): VectorStore = {
    val store = new VectorStore(engine, embedder, collection)
    store.addDocuments(texts.map(t => (t, Map.empty[String, String])))
    store
  }
}
