package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.FusionEngine
import graft.model.CollectionConfig
import graft.providers.{Embed, MockEmbedderProvider}

/** CLI demo — the engine's end-to-end slice, mirroring the reference's
  * `bin/cli.js demo` (`/root/reference/bin/cli.js:10-35`): create a
  * 64-dim collection, insert 4 mock-embedded docs, run the
  * "chemical safety requirements" query (d1/d4 must outrank d3), then
  * exercise the write path: TTL vacuum, delete-by-id, export/import.
  *
  * Run: `sbt "runMain graft.Demo"` */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val engine = new FusionEngine(spark, Files.createTempDirectory("graft_demo").toString)
    val embedder = new MockEmbedderProvider(64)

    println("=== 1. Vector search ===")
    engine.createCollection("demo", CollectionConfig(dimensions = 64))
    val docs = Seq(
      "d1" -> "OSHA requires chemical hazard communication including safety data sheets",
      "d2" -> "Personal protective equipment must be provided at no cost to employees",
      "d3" -> "Quarterly revenue increased by 15% driven by cloud services growth",
      "d4" -> "Confined space entry requires atmospheric testing before access")
    engine.insert("demo", Embed.withEmbedding(docs.toDF("id", "content"), "content", "vector", embedder))
    val qv = embedder.embed("chemical safety requirements").map(_.toDouble).toSeq
    engine.search("demo", qv, topK = 3).select("id", "score", "content")
      .collect().zipWithIndex.foreach { case (r, i) =>
        println(f"  ${i + 1}. [${r.getDouble(1)}%.3f] ${r.getString(0)}: ${r.getString(2).take(60)}")
      }

    println("=== 1b. RAG pipeline ===")
    val rag = new graft.rag.RagPipeline(engine, embedder, chunkSize = 120, chunkOverlap = 20)
    val ingested = rag.ingest(Seq(("manual.txt",
      "All employees must complete safety orientation within 30 days. " +
        "The orientation covers fire evacuation, chemical handling, and emergency contacts. " +
        "All machinery must have proper guarding. Lockout/tagout procedures must be followed.")).toDS())
    val (prompt, sources) = rag.buildContext("safety orientation requirements")
    println(s"  ingested $ingested chunks; context: ${sources.count()} chunks, ${prompt.length} chars")

    println("=== 1c. Agent memory ===")
    val memory = new graft.memory.AgentMemory(engine, embedder)
    memory.remember("agent-1", "User asked about chemical storage safety requirements")
    memory.learn("agent-1", "OSHA 29 CFR 1910 covers general industry safety standards", confidence = 0.95)
    memory.registerTool("agent-1", "search_regulations", "Search the regulatory database")
    memory.share("agent-1", "Customer ACME prefers ISO 14001")
    val recallRes = memory.recall("agent-2", "safety standards")
    println(s"  agent-2 recall: ${recallRes.map { case (t, df) => s"$t=${df.count()}" }.toSeq.sorted.mkString(", ")} (shared crosses agents)")
    memory.addMessage("agent-1", "t1", 1, "user", "What are the storage rules?")
    memory.addMessage("agent-1", "t1", 2, "assistant", "See OSHA 1910.")
    println(s"  conversation t1 last-N: ${memory.getConversation("agent-1", "t1").count()} msgs; forget(agent-1) erased ${memory.forget("agent-1")} memories")

    println("=== 1d. Tree index ===")
    val tree = new graft.tree.TreeIndex(spark, Files.createTempDirectory("graft_tree").toString)
    tree.indexDocument("safety-manual",
      "# Safety\n## Chemical Handling\nAlways wear PPE when handling chemicals.\n## Fire Safety\nKnow your evacuation routes.",
      format = "markdown")
    tree.keywordSearch("safety-manual", "chemical PPE requirements").collect().foreach { r =>
      println(f"  [${r.getAs[Double]("score")}%.3f] ${r.getAs[String]("citation_path_str")}")
    }
    val llmGuided = tree.reasoningSearch("safety-manual", "chemical handling",
      new graft.providers.MockLLMProvider(p =>
        if (p.contains("Sections:")) """[{"index": 0, "score": 0.7}, {"index": 1, "score": 0.6}]"""
        else """{"score": 0.8}"""))
    println(s"  LLM-guided traversal: ${llmGuided.count()} results")

    println("=== 1e. Recursive learning ===")
    val learn = new graft.learning.LearningEngine(memory)
    (1 to 5).foreach(i => learn.recordRetrievalFeedback("agent-3",
      "find the safety documents quickly", "vector", 0.9,
      now = Some(new java.sql.Timestamp(1000000L + i)).get))
    val (wv, wt, wk) = learn.getOptimalWeights("agent-3", "find the safety documents quickly")
    println(f"  learned weights after 5x vector q=0.9: vector=$wv%.3f tree=$wt%.3f keyword=$wk%.3f")
    learn.learnSkill("agent-3", "s1", "extract_dates", "Extract dates", keywords = Seq("date"))
    learn.recordSkillOutcome("agent-3", "s1", success = false)
    println(s"  skill EMA after one failure: ${learn.skills.select("success_rate").head.getDouble(0)}")
    println(s"  triples extracted: ${learn.extractKnowledge("agent-3", "OSHA 1910 is the standard. It covers safety.")}; reflection: '${learn.reflect("agent-3").take(60)}...'")

    println("=== 1f. Orchestrator + multimodal ===")
    val orch = new graft.orchestration.Orchestrator(memory)
    orch.register("researcher", Seq("search", "analyze"))
    orch.register("writer", Seq("write", "edit", "summarize"))
    println(s"  delegate(write+summarize) -> ${orch.delegate("boss", Seq("write", "summarize"), "draft report").getOrElse("none")}; broadcast reached ${orch.send("boss", "*", "status", "hi")} agents")
    val media = Seq((1L, "image", "abcdefgh".repeat(12).getBytes("UTF-8"))).toDF("media_id", "media_type", "data")
    val frames = graft.multimodal.Multimodal.sampleFrames(media)
    println(s"  multimodal: ${frames.count()} frames sampled from 96-byte payload (stub decode)")

    println("=== 1g. VectorStore facade ===")
    val store = graft.integrations.VectorStore.fromTexts(
      Seq("chemical safety requires protective equipment",
        "quarterly revenue grew with cloud services"), engine, embedder)
    val top = store.similaritySearchWithScore("chemical safety requires protective equipment", k = 1).head
    println(f"  fromTexts + similaritySearch top hit [${top.getAs[Double]("score")}%.3f]: ${top.getAs[String]("content").take(40)}")

    println("=== 2. Write path ===")
    println(s"  collections: ${engine.listCollections().map { case (n, c, s) => s"$n(dims=${c.dimensions}, rows=$s)" }.mkString(", ")}")
    engine.deleteByIds("demo", Seq("d3"))
    println(s"  after delete d3: rows=${engine.count("demo")}, has(d3)=${engine.has("demo", "d3")}")
    engine.insert("demo",
      Embed.withEmbedding(Seq("tmp1" -> "ephemeral row").toDF("id", "content"), "content", "vector", embedder),
      ttlMs = Some(1L),
      now = Some(new java.sql.Timestamp(System.currentTimeMillis() - 1000)))
    println(s"  inserted expired row: rows=${engine.count("demo")}, vacuumed=${engine.vacuum("demo")}, rows=${engine.count("demo")}")

    println("=== 3. Export / import round-trip ===")
    val snap = Files.createTempDirectory("graft_demo_snap").toString
    engine.exportData(snap)
    val engine2 = new FusionEngine(spark, Files.createTempDirectory("graft_demo2").toString)
    engine2.importData(snap)
    val r2 = engine2.search("demo", qv, topK = 1).select("id").as[String].head
    println(s"  imported rows=${engine2.count("demo")}, top result after import: $r2")

    println("=== 4. Graft.create + tenancy (hive-partitioned, pruned scans) ===")
    // composition-root boot (reference create()): all subsystems wired
    val g = Graft.create(spark, Files.createTempDirectory("graft_demo_g").toString)
    g.engine.createCollection("mt", CollectionConfig(dimensions = 64, partitionByTenant = true))
    g.engine.tenant("mt", "acme").insert(Embed.withEmbedding(Seq("a1" -> "alpha").toDF("id", "content"), "content", "vector", embedder))
    g.engine.tenant("mt", "globex").insert(Embed.withEmbedding(Seq("g1" -> "alpha").toDF("id", "content"), "content", "vector", embedder))
    val tenantHits = g.engine.tenant("mt", "acme").search(embedder.embed("alpha").map(_.toDouble).toSeq)
    val seen = tenantHits.select("id").as[String].collect().toSeq
    val partDirs = new java.io.File(s"${g.engine.root}/mt/data").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted.mkString(", ")
    println(s"  acme sees: ${seen.mkString(",")}; partition dirs: [$partDirs]")
    // the 100×-scale story, inspectable: the tenant predicate must reach
    // the scan as a PartitionFilter (directory pruning, not a row filter)
    val plan = tenantHits.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = plan.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    require(pf.exists(_.contains("tenant_id")), "tenant predicate did not prune partitions")
    pf.foreach(l => println(s"  ${l.trim.take(110)}"))
    // the full Graft surface stays live end-to-end through the facade
    g.memory.remember("demo-agent", "Graft boots through create()")
    println(s"  facade health: ${g.mcpServer().callTool("fusionpact_list_collections", "{}").take(80)}")

    println("=== 5. LLM-pipeline scale paths (dedup + IVF-PQ) ===")
    // near-dup dedup end-to-end: pairs -> groups -> canonical keep
    val boiler = "the quarterly report shows strong growth across all regions and every product line this year"
    val dupDocs = Seq((1L, boiler), (2L, boiler), (3L, boiler + " again"),
      (4L, "an entirely different document about spark physical planning"))
      .toDF("id", "text")
    val kept = graft.dedup.Dedup.dedupNearLsh(dupDocs, "text", "id", tau = 0.5)
      .select("id").as[Long].collect().sorted
    println(s"  dedupNearLsh(4 docs, 1 dup family) keeps: ${kept.mkString(",")}")
    // IVF-PQ: 8-byte codes, ADC search, exact re-rank from the source
    val corpus = spark.range(2000).map { i =>
      val rc = new scala.util.Random((i % 10) * 31 + 5)
      val rn = new scala.util.Random(i)
      (i, Array.fill(64)((rc.nextGaussian() + 0.3 * rn.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val ivfM = graft.ann.Ann.trainIvf(corpus, "embedding", nCells = 8, maxIter = 4)
    val cells = graft.ann.Ann.assignCells(corpus, "embedding", "vec_id", ivfM)
    val pqM = graft.ann.Pq.train(corpus, "embedding", "vec_id", m = 8, maxTrain = 1000, iters = 6)
    val pqIdx = graft.search.PackedIndex.buildIvfPq(
      graft.ann.Pq.encodeCells(cells, pqM), ivfM, pqM)
    val q0 = corpus.head.getSeq[Float](1).map(_.toDouble)
    val hit = pqIdx.searchRefined(corpus, "embedding", "vec_id",
      Seq((0L, q0)), k = 3, nProbe = 4).orderBy("rank").collect()
    println(s"  IVF-PQ (${pqM.bytesPerVector} B/vector vs ${64 * 4} float): top hit id=${hit.head.getLong(1)} " +
      f"score=${hit.head.getDouble(2)}%.4f (self), ${hit.length} refined hits")
    pqIdx.unpersist()

    println("=== 6. Corpus curation (split / dedup / quality gates) ===")
    val longDoc = "spark catalyst plans the query and tungsten executes it with codegen stages " +
      "while the optimizer pushes filters into the parquet scan and prunes columns early " +
      "so the shuffle carries only the keys and aggregates the job actually needs"
    val spammy = "buy now " * 30 + "buy now limited"
    val rawCorpus = Seq(
      (100L, "en", longDoc), (101L, "en", longDoc),           // exact dups
      (102L, "de", longDoc + " und mehr"),                    // near-dup, survives exact dedup
      (103L, "en", spammy),                                   // high repetition -> dropped
      (104L, "en", "too short")                               // length gate -> dropped
    ).toDF("doc_id", "lang", "text")
    val curated = graft.pipeline.CorpusOps.curate(rawCorpus, "text", "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().sortBy(_._1)
    println(s"  curate(5 raw) -> ${curated.map { case (i, s) => s"$i:$s" }.mkString(", ")} " +
      "(dup 101, spam 103, short 104 dropped)")
    val contam = graft.pipeline.CorpusOps.contaminationStats(
        rawCorpus, "text", "doc_id", $"doc_id" === 100)
      .filter($"overlap_grams" > 0).count()
    println(s"  contamination vs bench doc 100: $contam train docs share 3-grams")
    val mix = graft.pipeline.CorpusOps.corpusMix(rawCorpus, "text", Seq("lang"))
      .select($"lang", $"tok_share").as[(String, Double)].collect().sortBy(_._1)
    println(s"  training mix by lang: ${mix.map { case (l, s) => f"$l=$s%.2f" }.mkString(", ")}")

    println("=== 7. Scrub passes + SQL surface ===")
    val dirty = Seq(
      (200L, "contact jane.doe@corp.example.com or +1 (555) 010-1234 from 10.0.0.7\nall rights reserved"),
      (201L, "released 2026-08-12 build 555-0109 keeps dates and short runs\nall rights reserved"))
      .toDF("doc_id", "text")
    graft.functions.Registry.register(spark)
    dirty.createOrReplaceTempView("dirty_docs")
    val scrubbed = spark.sql(
      """SELECT doc_id, graft_redact_pii(text) AS clean, graft_lang_id(text) AS lang,
        |  graft_bpeish_tokens(text) AS toks FROM dirty_docs ORDER BY doc_id""".stripMargin)
      .as[(Long, String, String, Int)].collect()
    scrubbed.foreach { case (id, clean, lang, toks) =>
      println(s"  doc $id [$lang, $toks toks]: ${clean.linesIterator.next()}")
    }
    val deboiler = graft.pipeline.CorpusOps.dropBoilerplateLines(dirty, "text", "doc_id", minDf = 2)
      .orderBy("id").as[(Long, String, Long, Long)].collect()
    println(s"  boilerplate lines dropped: ${deboiler.map(r => s"doc ${r._1} kept=${r._3} dropped=${r._4}").mkString(", ")}")

    spark.stop()
  }
}
