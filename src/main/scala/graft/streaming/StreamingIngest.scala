package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.rag.RagPipeline

/** Structured Streaming ingest path (SURVEY §2.8 decision): where the
  * reference has incremental `insert()` per document, the streaming
  * parity is `readStream → chunk/embed → append` with exactly-once
  * micro-batches.
  *
  * Each micro-batch runs the SAME batch pipeline
  * ([[RagPipeline.ingest]]) via `foreachBatch` — chunking and embedding
  * stay narrow per batch; the parquet append is the only sink work. No
  * watermark is needed for capability parity (the reference never drops
  * late data; SURVEY §2.8).
  */
object StreamingIngest {

  /** Start ingesting a stream of `(doc_id, text)` rows. The caller owns
    * the checkpoint location (exactly-once bookkeeping). */
  def start(stream: Dataset[(String, String)], rag: RagPipeline,
            checkpointDir: String,
            tenantId: Option[String] = None,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    rag.init()
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[(String, String)], _: Long) =>
        if (!batch.isEmpty) rag.ingest(batch, tenantId = tenantId, countAfter = false): Unit
      }
      .start()
  }

  /** Exactly-once CONTENT dedup on an ingest stream: drop any document
    * whose text digest was already seen within the watermark horizon,
    * then ingest survivors — the streaming twin of
    * [[graft.dedup.Dedup.dedupExact]]. State is one digest per distinct
    * document bounded by the watermark (`dropDuplicatesWithinWatermark`
    * evicts expired keys), so a 100 TB/day firehose holds state ∝
    * distinct-docs-per-horizon, not per-history. Duplicate arrivals
    * WITHIN a micro-batch dedup too (first by digest wins,
    * deterministic within the batch Spark delivers).
    *
    * Input rows are `(doc_id, text, event_ts)`; the digest is computed
    * here (sha2-256 over the text), so producers need no coordination. */
  def startDeduped(stream: Dataset[(String, String, java.sql.Timestamp)],
                   rag: RagPipeline, checkpointDir: String,
                   watermark: String = "10 minutes",
                   tenantId: Option[String] = None,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions._
    rag.init()
    val spark = stream.sparkSession
    import spark.implicits._
    stream.toDF("doc_id", "text", "ts")
      .withColumn("digest", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.select("doc_id", "text").as[(String, String)]
        if (!docs.isEmpty) rag.ingest(docs, tenantId = tenantId, countAfter = false): Unit
      }
      .start()
  }

  /** Streaming CURATION: [[startDeduped]] plus the row-level quality
    * gates of [[graft.pipeline.CorpusOps.curate]] — length and
    * 3-gram-repetition — applied BEFORE the stateful dedup, so spam and
    * stubs never enter the dedup state store (at firehose scale the
    * state bound matters more than the sink). Gates are a narrow typed
    * filter (same Scala shingles as the batch path — one pass per row,
    * no O(words²) SQL higher-order form); dedup state stays one digest
    * per distinct SURVIVING document within the watermark horizon. */
  def startCurated(stream: Dataset[(String, String, java.sql.Timestamp)],
                   rag: RagPipeline, checkpointDir: String,
                   watermark: String = "10 minutes",
                   maxRepetition: Double = 0.5, minChars: Int = 50,
                   tenantId: Option[String] = None,
                   trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import org.apache.spark.sql.functions._
    rag.init()
    val spark = stream.sparkSession
    import spark.implicits._
    val gated = stream.filter { (r: (String, String, java.sql.Timestamp)) =>
      val t = r._2
      t != null && t.length >= minChars && {
        val total = t.split(" ", -1).length - 2
        total > 0 &&
          // count-only shingle kernel (r18): same value as
          // shingleSet(t).size (equality spec-pinned in DedupSpec)
          // without materializing the gram vector per doc
          1.0 - graft.dedup.Dedup.distinctShingleCount(t, 3).toDouble / total < maxRepetition
      }
    }
    gated.toDF("doc_id", "text", "ts")
      .withColumn("digest", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("digest")
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val docs = batch.select("doc_id", "text").as[(String, String)]
        if (!docs.isEmpty) rag.ingest(docs, tenantId = tenantId, countAfter = false): Unit
      }
      .start()
  }

  /** Streaming auto-save twin of the reference's 30 s timer
    * (`FusionEngine.js:340-344`): periodic JSON snapshot export driven
    * by a processing-time trigger over any ticking stream. Parquet
    * appends are already durable, so this is interop-only — exposed as
    * a helper the caller wires to a rate source if wanted. */
  def autoSaveBatch(engine: graft.engine.FusionEngine, outDir: String): Unit = {
    engine.exportData(outDir)
    // FusionEngine.js:342 emits engine:autosave with the exported data;
    // the batch twin reports where the snapshot landed instead of
    // materializing it twice
    engine.events.emit("engine:autosave", Map("outDir" -> outDir))
  }
}
