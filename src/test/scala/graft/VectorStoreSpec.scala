package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.engine.FusionEngine
import graft.integrations.VectorStore
import graft.providers.MockEmbedderProvider

/** LangChain-store facade (`test/fusionpact.test.js:558-609`). */
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
    assert(retriever("quarterly revenue grew with cloud services").head.contains("revenue"))

    val engine2 = new FusionEngine(spark, Files.createTempDirectory("graft_vs2").toString)
    val fromTexts = VectorStore.fromTexts(Seq("alpha", "beta"), engine2, new MockEmbedderProvider(64))
    assert(fromTexts.similaritySearch("alpha", k = 2).count() == 2)
  }
}
