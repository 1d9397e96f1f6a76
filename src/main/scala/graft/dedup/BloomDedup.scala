package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

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
  * membership check into a per-row codegen predicate with NO shuffle
  * and NO join.
  *
  * Semantics (one-sided error, the right direction for dedup):
  *  - **no false negatives** — a doc whose text was in the history can
  *    never pass the filter, so duplicate leakage is exactly zero;
  *  - false positives drop at most `fpp` of genuinely-novel docs —
  *    acceptable loss for corpus curation, and the caller can route
  *    "maybe-dup" rows to an exact re-check instead of dropping
  *    ([[novelAndMaybe]]) to make the path lossless: the exact join
  *    then runs on `fpp`×batch rows instead of the whole batch.
  *
  * Implementation: Spark's own runtime-filter machinery —
  * `BloomFilterAggregate` builds the sketch as a distributed partial
  * aggregate (each partition builds, sketches merge up the exec tree),
  * and `BloomFilterMightContain` probes it as a codegen predicate.
  * Keys are `xxhash64(text)` on BOTH sides, so build and probe share
  * one hash definition. Embedding the serialized filter as a binary
  * literal mirrors what Spark's `InjectRuntimeFilter` does with its
  * bloom subquery result.
  */
object BloomDedup {

  /** ~1% FPP: optimal bits/item = -ln(p)/ln2² ≈ 9.585·(ln 1/p / ln 100). */
  private def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong.max(64L)
  }

  private def keyExpr(c: Column) =
    GraftSqlBridge.expression(xxhash64(c))

  /** Build the serialized history filter with one distributed
    * aggregate over `history(textCol)`. `expectedItems` sizes the
    * filter (overestimate is safe — FPP only drops); at warehouse scale
    * pass the history row count from table stats.
    *
    * Two silent failure modes of the raw aggregate are handled here
    * (review r10):
    *  - `BloomFilterAggregate` clamps its arguments to
    *    `spark.sql.optimizer.runtime.bloomFilter.maxNumItems/maxNumBits`
    *    (defaults 4M items / 67M bits — sized for join runtime filters,
    *    not corpus dedup). A silent clamp at 1e9 docs would yield
    *    ~0.07 bits/doc and FPP→1: nearly every NOVEL doc dropped as a
    *    "duplicate". The confs are raised to the requested size for the
    *    build (and restored), and the serialized size is verified.
    *  - An EMPTY history aggregates to SQL NULL (not an empty filter);
    *    `might_contain(null, …)` is null and both filter directions
    *    drop every row — the bootstrap ingest would vanish. A null
    *    result becomes a real empty filter (contains nothing → the
    *    whole first batch is novel, as it should be). */
  def buildFilter(history: DataFrame, textCol: String,
                  expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    val numBits = optimalNumBits(expectedItems, fpp)
    val conf = history.sparkSession.conf
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val oldItems = conf.getOption(itemsKey)
    val oldBits = conf.getOption(bitsKey)
    val bytes = try {
      conf.set(itemsKey, math.max(expectedItems, 4000000L).toString)
      conf.set(bitsKey, math.max(numBits, 67108864L).toString)
      val agg = new BloomFilterAggregate(
        keyExpr(col(textCol)), Literal(expectedItems), Literal(numBits))
      history
        .select(GraftSqlBridge.column(agg.toAggregateExpression()).as("bf"))
        .head().getAs[Array[Byte]](0)
    } finally {
      def restore(k: String, old: Option[String]): Unit =
        old.fold(conf.unset(k))(v => conf.set(k, v))
      restore(itemsKey, oldItems)
      restore(bitsKey, oldBits)
    }
    if (bytes == null) {
      // empty history → genuine empty filter, not SQL NULL
      val empty = org.apache.spark.util.sketch.BloomFilter.create(1L, fpp)
      val bos = new java.io.ByteArrayOutputStream()
      empty.writeTo(bos)
      bos.toByteArray
    } else {
      // belt-and-braces vs any residual clamp: the serialized filter
      // must be within 20% of the requested bit budget
      require(bytes.length.toLong * 8 >= numBits - (numBits / 5),
        s"bloom filter came back ${bytes.length * 8L} bits for a $numBits-bit " +
          "request — a conf cap truncated it; FPP would be unbounded")
      bytes
    }
  }

  /** `might_contain(filter, xxhash64(c))` as a codegen predicate. */
  def mightContain(filterBytes: Array[Byte], c: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(Literal(filterBytes, BinaryType), keyExpr(c)))

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
    * the filter's positives. Returns all genuinely-novel rows. */
  def novelLossless(history: DataFrame, incoming: DataFrame,
                    textCol: String, expectedItems: Long,
                    fpp: Double = 0.01): DataFrame = {
    val bf = buildFilter(history, textCol, expectedItems, fpp)
    val definiteNovel = novelOnly(incoming, bf, textCol)
    val maybeDup = incoming.filter(mightContain(bf, col(textCol)))
    val rescued = maybeDup.join(
      history.select(xxhash64(col(textCol)).as("_h")).distinct(),
      xxhash64(col(textCol)) === col("_h"), "left_anti")
    definiteNovel.unionByName(rescued)
  }
}
