package graft.providers

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType}
import graft.text.MockEmbedder

/** Pluggable embedding / LLM backends (SURVEY §2.10; reference
  * `/root/reference/src/embedders/providers.js`).
  *
  * The reference embeds texts one HTTP call at a time with an in-process
  * memo cache (`providers.js:23-39`). On Spark the same trait executes on
  * executors via `mapPartitions` in batches — the provider is
  * `Serializable`, holds no session state, and opens its own connections
  * per partition (connection reuse amortized across a batch). HTTP-backed
  * providers (Ollama/OpenAI in the reference) would implement `embedBatch`
  * with a pooled client; this container is zero-egress so only the
  * deterministic mock backend is shipped, but the execution path —
  * batching, schema, cache-key join — is the real one.
  */
trait Embedder extends Serializable {
  def model: String
  def dimensions: Int
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
  final def embed(text: String): Array[Float] = embedBatch(Seq(text)).head

  /** Cache key `model:len:hash(first 500 chars)` — bit-exact port of
    * `providers.js:45-51` (JS `(h<<5)-h+c | 0` ≡ `h*31+c` on wrapping
    * Int). Used as the join key of the embedding-cache table. */
  final def cacheKey(text: String): String = {
    var h = 0
    var i = 0
    val n = math.min(text.length, 500)
    while (i < n) { h = h * 31 + text.charAt(i); i += 1 }
    s"$model:${text.length}:$h"
  }
}

/** Deterministic mock embedder (`providers.js:87-105` port in
  * [[graft.text.MockEmbedder]]) — the test oracle's embedder. */
final class MockEmbedderProvider(val dimensions: Int = 64) extends Embedder {
  val model = "mock"
  def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map(t => MockEmbedder.embed(t, dimensions))
}

/** LLM completion backend (`providers.js:107-146`). Same executor-side
  * `mapPartitions` contract as [[Embedder]]. */
trait LLMProvider extends Serializable {
  def name: String
  def complete(prompt: String, maxTokens: Int = 500, temperature: Double = 0.1): String
}

/** Deterministic mock LLM: answers from a prompt→response function.
  * Used to exercise LLM-in-the-loop plumbing (tree traversal §2.9)
  * without network. */
final class MockLLMProvider(fn: String => String) extends LLMProvider {
  val name = "mock"
  def complete(prompt: String, maxTokens: Int, temperature: Double): String = fn(prompt)
}

/** Batched executor-side embedding over DataFrames. */
object Embed {

  /** Append `outCol ARRAY<FLOAT>` = embedding of `textCol`, computed in
    * `batchSize` groups per partition via `mapPartitions`. Narrow (no
    * shuffle); scales linearly with partitions. Null/absent text embeds
    * as the empty string (reference embeds whatever it is given). */
  def withEmbedding(df: DataFrame, textCol: String, outCol: String,
                    embedder: Embedder, batchSize: Int = 32): DataFrame = {
    val schema = df.schema.add(outCol, ArrayType(FloatType))
    val textIdx = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val vecs = embedder.embedBatch(batch.map { r =>
          if (r.isNullAt(textIdx)) "" else r.getString(textIdx)
        })
        batch.lazyZip(vecs).map((r, v) => Row.fromSeq(r.toSeq :+ v))
      }
    }(Encoders.row(schema))
  }

  /** Cache-key column for `textCol` (join key of a `(cache_key, vector)`
    * cache table). Scala UDF — acceptable here: key derivation is a tiny
    * per-row op off the scan hot path. */
  def cacheKeyCol(embedder: Embedder, textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val f = udf((s: String) => embedder.cacheKey(if (s == null) "" else s))
    f(textCol)
  }

  /** Embed with a persistent cache table: rows whose `cache_key` hits the
    * cache reuse the cached vector; only misses run the provider. Returns
    * (resultDf, newCacheRows) so callers can append misses back to the
    * cache table. The cache join is a broadcast/shuffle equi-join on the
    * key — the Spark rendering of the reference's memo Map
    * (`providers.js:24-30`). */
  def withEmbeddingCached(df: DataFrame, textCol: String, outCol: String,
                          cache: DataFrame, embedder: Embedder,
                          batchSize: Int = 32): (DataFrame, DataFrame) = {
    val keyed = df.withColumn("__ck", cacheKeyCol(embedder, col(textCol)))
    val cacheRenamed = cache
      .withColumnRenamed("cache_key", "__ck")
      .withColumnRenamed("vector", "__cached")
    val joined = keyed.join(cacheRenamed, Seq("__ck"), "left")
    val hits = joined.filter(col("__cached").isNotNull)
      .withColumn(outCol, col("__cached")).drop("__cached")
    val misses = withEmbedding(
      joined.filter(col("__cached").isNull).drop("__cached"),
      textCol, outCol, embedder, batchSize)
    val out = hits.unionByName(misses)
    val newCache = misses.select(col("__ck").as("cache_key"), col(outCol).as("vector"))
    (out.drop("__ck"), newCache)
  }
}
