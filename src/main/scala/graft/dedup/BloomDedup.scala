package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter incremental dedup — the memory-bounded scale path for
  * "drop incoming docs already in the corpus".
  *
  * [[Dedup]]'s stored-index incremental paths keep the history as an
  * exact id/hash table: correct, but the membership join shuffles the
  * incoming batch against a table that grows with the corpus. At
  * 100 TB of history (~10¹¹ docs) the exact table is tens of TB; a
  * Bloom filter at 1% FPP is ~*12 bits per doc* (~150 GB for 10¹¹ —
  * still shardable, and at the 10⁹-doc per-ingest-window granularity a
  * single ~1.5 GB filter), lives driver/broadcast-side, and turns the
  * membership check into a per-row predicate with NO shuffle and NO
  * join.
  *
  * Semantics (one-sided error, the right direction for dedup):
  *  - **no false negatives** — a doc whose text was in the history can
  *    never pass the filter, so duplicate leakage is exactly zero;
  *  - false positives drop at most `fpp` of genuinely-novel docs —
  *    acceptable loss for corpus curation, and the caller can route
  *    "maybe-dup" rows to an exact re-check instead of dropping
  *    ([[novelLossless]]) to make the path lossless: the exact join
  *    then runs on `fpp`×batch rows instead of the whole batch.
  *
  * Implementation: the sketch is `org.apache.spark.util.sketch
  * .BloomFilter` built via `DataFrame.stat.bloomFilter` (per-partition
  * build + merge in an RDD aggregate — no SQL-conf dependency, no
  * session-global state, safe under concurrent builds; r10 review
  * replaced the `BloomFilterAggregate` build that mutated
  * `runtime.bloomFilter.maxNumItems/maxNumBits` around the action).
  * Keys are `xxhash64(text)` on BOTH sides, so build and probe share
  * one hash definition. The probe has two physical forms, picked by
  * filter size ([[LiteralProbeMaxBytes]]):
  *  - small filters embed as a binary `Literal` feeding Spark's own
  *    `BloomFilterMightContain` codegen predicate — exactly what
  *    `InjectRuntimeFilter` does with its bloom subquery result;
  *  - large filters (a Literal is serialized into EVERY task binary
  *    and codegen reference, and would hit the 2 GB array / task-size
  *    limits near the GB scale the scaladoc above advertises) ship
  *    ONCE per executor as a broadcast variable, deserialized once per
  *    JVM ([[FilterCache]]) and probed by a UDF on the same xxhash64
  *    key.
  */
object BloomDedup {

  /** ~1% FPP: optimal bits/item = -ln(p)/ln2² ≈ 9.585·(ln 1/p / ln 100). */
  private def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  /** Filters at or under this serialized size probe via a plan
    * `Literal` + codegen `BloomFilterMightContain`; larger ones go
    * through the broadcast + cached-deserialize path. 16 MB keeps the
    * task binary well under Spark's 1 GB broadcast/task warnings while
    * covering every join-runtime-filter-sized sketch (~10⁷ items). */
  val LiteralProbeMaxBytes: Int = 16 << 20

  /** Build the serialized history filter with one distributed
    * per-partition build + merge over `xxhash64(history(textCol))`.
    * `expectedItems` sizes the filter (overestimate is safe — FPP only
    * drops); at warehouse scale pass the history row count from table
    * stats. An empty history yields a real empty filter (contains
    * nothing → the whole first batch is novel), never SQL NULL. */
  def buildFilter(history: DataFrame, textCol: String,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val items = math.max(expectedItems, 1L)
    // per-partition build + tree merge over the raw hash RDD.
    // (`stat.bloomFilter` / `BloomFilterAggregate` silently clamp to
    // `runtime.bloomFilter.maxNumBits` — 67M bits, sized for join
    // runtime filters; a clamped 1e9-doc build would drop nearly every
    // NOVEL doc as FPP→1. The RDD build has no conf in the loop.)
    // Partitions with no rows contribute null so empty-history builds
    // don't allocate; filters share (numBits, items) so mergeInPlace
    // is always compatible.
    val bf0 = history.select(xxhash64(col(textCol)).as("_k"))
      .rdd.map(_.getLong(0))
      .treeAggregate(null: BloomFilter)(
        (bf, h) => {
          val b = if (bf == null) BloomFilter.create(items, numBits) else bf
          b.putLong(h); b
        },
        (a, b) =>
          if (a == null) b
          else if (b == null) a
          else { a.mergeInPlace(b); a })
    val bf = if (bf0 == null) BloomFilter.create(items, numBits) else bf0
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    bos.toByteArray
  }

  /** Per-JVM deserialized-filter cache for the broadcast probe path:
    * every task on an executor shares ONE deserialized filter per
    * broadcast id instead of re-reading the byte image. BOUNDED
    * (r11 review): entries for old broadcasts evict once more than
    * [[MaxCachedFilters]] accumulate — a long-lived session running
    * hourly ingest windows must not pin every window's filter. */
  private object FilterCache {
    val MaxCachedFilters = 4
    private val cache = new java.util.LinkedHashMap[Long, BloomFilter](16, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[Long, BloomFilter]): Boolean =
        size() > MaxCachedFilters
    }
    def get(id: Long, bytes: () => Array[Byte]): BloomFilter = cache.synchronized {
      val hit = cache.get(id)
      if (hit != null) hit
      else {
        val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes()))
        cache.put(id, bf)
        bf
      }
    }
  }

  /** `might_contain(filter, xxhash64(c))`. Small filters inline as a
    * codegen `Literal` predicate; filters past [[LiteralProbeMaxBytes]]
    * ship as ONE broadcast per job and deserialize once per executor
    * (the Literal form would serialize the filter into every task). */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    if (filterBytes.length <= LiteralProbeMaxBytes)
      GraftSqlBridge.column(
        BloomFilterMightContain(Literal(filterBytes, BinaryType), keyOf(c)))
    else {
      val spark = org.apache.spark.sql.SparkSession.active
      val bc = spark.sparkContext.broadcast(filterBytes)
      val probe = udf { h: Long =>
        FilterCache.get(bc.id, () => bc.value).mightContainLong(h)
      }
      probe(xxhash64(c))
    }

  private def keyOf(c: Column) = GraftSqlBridge.expression(xxhash64(c))

  /** Rows of `incoming` that are DEFINITELY not in the filtered
    * history (zero duplicate leakage; up to `fpp` of novel rows are
    * conservatively dropped). Pure per-row predicate — no shuffle. */
  def novelOnly(incoming: DataFrame, filterBytes: Array[Byte],
                textCol: String): DataFrame =
    incoming.filter(!mightContain(filterBytes, col(textCol)))

  /** Lossless two-phase variant: split `incoming` by the filter, keep
    * definite-novel rows shuffle-free, and exact-anti-join ONLY the
    * maybe-dup slice (≈ true-dups + fpp·novel rows) against the
    * history — the join's probe side shrinks from the whole batch to
    * the filter's positives. Returns all genuinely-novel rows. The
    * rescue join hash-partitions on `xxhash64(text)` but keeps the
    * text itself as a second equi-key, so even a 2⁻⁶⁴ hash collision
    * between a novel doc and a history doc cannot drop the novel row —
    * the path is exact, not merely 2⁻⁶⁴-exact (r10 review). */
  def novelLossless(history: DataFrame, incoming: DataFrame,
                    textCol: String, expectedItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(history, textCol, expectedItems, fpp)
    // ONE probe Column reused by both branches: the large-filter path
    // allocates a broadcast per mightContain call (r11 review — two
    // broadcasts of the same GB-scale image per ingest window
    // otherwise)
    val probe = mightContain(bf, col(textCol))
    val definiteNovel = incoming.filter(!probe)
    val maybeDup = incoming.filter(probe)
    val rescued = maybeDup.join(
      history.select(xxhash64(col(textCol)).as("_h"),
        col(textCol).as("_t")).distinct(),
      xxhash64(col(textCol)) === col("_h") && col(textCol) === col("_t"),
      "left_anti")
    definiteNovel.unionByName(rescued)
  }
}
