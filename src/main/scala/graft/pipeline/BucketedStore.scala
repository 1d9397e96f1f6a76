package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Hash-bucketed table layout — the 100 TB co-location story.
  *
  * A `groupBy`/`join` on a key shuffles the WHOLE input every run; at
  * petabyte scale the repeated exchange dominates. Bucketing pays the
  * shuffle ONCE at write: the table is hash-partitioned into `nBuckets`
  * files per partition by the key, and every later equi-join or
  * aggregation on that key reads buckets pre-co-located — Catalyst
  * plans the join with ZERO Exchange on the bucketed side(s) (assert it
  * with [[countShuffles]]; BucketedStoreSpec pins the plan shape).
  *
  * Rules of engagement at scale:
  *  - Both join sides bucketed on the join key with the SAME bucket
  *    count → no exchange at all. One side bucketed → only the other
  *    side shuffles (still halves the exchange volume).
  *  - `sortBy` the key at write: per-bucket sorted files let the
  *    sort-merge join skip its sort stage too (one-file-per-bucket
  *    required — repartition before write, below).
  *  - Pick `nBuckets` so a bucket ≈ 100–500 MB at target scale (100 TB
  *    / 256 MB ≈ 400k buckets is too many files per partition — combine
  *    with date/tenant partition columns so each partition holds its
  *    own bucket set).
  *
  * Spark only honors bucketing through the session catalog
  * (`saveAsTable` — plain `parquet(path)` writes carry no bucket
  * metadata), so this store manages named catalog tables; pass
  * `path` to pin them to an external location. */
object BucketedStore {

  /** Write `df` as a bucketed (and per-bucket sorted) catalog table.
    * Repartitions by the bucket key FIRST so each bucket lands in ONE
    * file — without it every task writes a file per bucket (task×bucket
    * small files, and the per-bucket sort guarantee Catalyst needs to
    * elide the SMJ sort only holds for single-file buckets). */
  def saveBucketed(df: DataFrame, table: String, bucketCol: String,
                   nBuckets: Int, sortCols: Seq[String] = Seq.empty,
                   path: Option[String] = None,
                   overwrite: Boolean = true): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val sorts = if (sortCols.isEmpty) Seq(bucketCol) else sortCols
    var w = df.repartition(nBuckets, df.col(bucketCol))
      .write.format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
    path.foreach(p => w = w.option("path", p))
    w.mode(if (overwrite) "overwrite" else "errorifexists").saveAsTable(table)
  }

  /** Equi-join two bucketed tables on their bucket key. With equal
    * bucket counts this plans exchange-free (verify in tests / at
    * deploy with [[countShuffles]] == 0). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, Seq(key), joinType)
  }

  /** Number of shuffle exchanges in the df's (executed) physical plan —
    * the co-location assertion. Counts through AQE wrapper nodes;
    * resilient to plan-node renames across Spark versions. */
  def countShuffles(df: DataFrame): Int = {
    def walk(p: SparkPlan): Int = {
      val self = p match {
        case _: ShuffleExchangeLike => 1
        case _ => 0
      }
      val nested = p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case _ => 0
      }
      self + nested + p.children.map(walk).sum
    }
    walk(df.queryExecution.executedPlan)
  }
}
