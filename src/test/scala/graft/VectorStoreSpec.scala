package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{FusionEngine, MetadataFilter}
import graft.integrations.VectorStore
import graft.providers.MockEmbedderProvider

/** LangChain-store facade (`test/fusionpact.test.js:558-609`,
  * `langchain.js:88,126-140`). */
class VectorStoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("addDocuments / similaritySearch / withScore / fromTexts / asRetriever") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_vs").toString)
    val store = new VectorStore(engine, new MockEmbedderProvider(64))
    val ids = store.addDocuments(Seq(
      ("chemical safety requires protective equipment", Map("cat" -> "safety")),
      ("quarterly revenue grew with cloud services", Map("cat" -> "finance"))))
    assert(ids.length == 2 && ids.distinct.length == 2)

    val hits = store.similaritySearchWithScore("chemical safety equipment", k = 2).collect()
    assert(hits.length == 2)
    assert(hits.head.getAs[String]("content").contains("chemical"))
    assert(hits.head.getAs[Double]("score") >= hits(1).getAs[Double]("score"))
    assert(store.similaritySearch("chemical", k = 1).columns.toSeq == Seq("content", "metadata"))

    val retriever = store.asRetriever(k = 1)
    // exact-text query: cosine 1.0 with its own stored embedding
    assert(retriever.getRelevantDocuments("quarterly revenue grew with cloud services")
      .head.contains("revenue"))

    val engine2 = new FusionEngine(spark, Files.createTempDirectory("graft_vs2").toString)
    val fromTexts = VectorStore.fromTexts(Seq("alpha", "beta"), engine2, new MockEmbedderProvider(64))
    assert(fromTexts.similaritySearch("alpha", k = 2).count() == 2)
  }

  test("similaritySearch with a metadata filter restricts results (langchain.js:88)") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_vsf").toString)
    val store = new VectorStore(engine, new MockEmbedderProvider(64))
    store.addDocuments(Seq(
      ("chemical safety requires protective equipment", Map("cat" -> "safety")),
      ("chemical storage and labeling rules", Map("cat" -> "safety")),
      ("quarterly revenue grew with cloud services", Map("cat" -> "finance"))))

    val safetyOnly = store.similaritySearch("chemical", k = 10,
      filter = Some(MetadataFilter.eq("cat", "safety"))).collect()
    assert(safetyOnly.length == 2)
    assert(safetyOnly.forall(_.getAs[String]("content").contains("chemical")))

    val inList = store.similaritySearchWithScore("chemical", k = 10,
      filter = Some(MetadataFilter.in("cat", Seq("safety", "finance")))).count()
    assert(inList == 3)

    assert(store.similaritySearch("chemical", k = 10,
      filter = Some(MetadataFilter.eq("cat", "hr"))).count() == 0)
  }

  test("asRetriever config: k honored, strategy stored (reference quirk: unused), invoke alias") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_vsr").toString)
    val store = new VectorStore(engine, new MockEmbedderProvider(64))
    store.addDocuments(Seq(
      ("alpha document content", Map.empty[String, String]),
      ("beta document content", Map.empty[String, String]),
      ("gamma document content", Map.empty[String, String])))

    val r = store.asRetriever(k = 2, strategy = "hybrid")
    assert(r.k == 2 && r.strategy == "hybrid")
    val docs = r.getRelevantDocuments("alpha document content")
    assert(docs.length == 2)
    assert(r.invoke("alpha document content") == docs) // invoke() alias
    // default strategy mirrors the reference's code (vector, not hybrid)
    assert(store.asRetriever().strategy == "vector")
  }

  test("fromTexts zips metadatas (missing entries default empty); fromDocuments factory") {
    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_vsm").toString)
    val store = VectorStore.fromTexts(
      Seq("hello world", "test content", "third text"), engine,
      new MockEmbedderProvider(64),
      metadatas = Seq(Map("source" -> "a"), Map("source" -> "b"))) // 3rd missing
    val rows = store.similaritySearch("hello", k = 3).collect()
    assert(rows.length == 3)
    val bySource = rows.map(r =>
      r.getAs[String]("content") -> r.getAs[Map[String, String]]("metadata")).toMap
    assert(bySource("hello world").get("source").contains("a"))
    assert(bySource("test content").get("source").contains("b"))
    assert(bySource("third text").isEmpty)

    val engine2 = new FusionEngine(spark, Files.createTempDirectory("graft_vsd").toString)
    val fromDocs = VectorStore.fromDocuments(
      Seq(("doc one", Map("k" -> "v")), ("doc two", Map.empty[String, String])),
      engine2, new MockEmbedderProvider(64))
    assert(fromDocs.similaritySearch("doc", k = 5).count() == 2)
  }
}
