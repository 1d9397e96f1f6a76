package graft.retrieval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The retriever's own learned weights (reference
  * `HybridRetriever.js:258-303` — distinct from the learning engine's
  * additive rule, and both are preserved per SURVEY §7.4): per
  * (query-pattern, strategy) keep the last ≤100 quality scores, average
  * them (strategy default when absent), normalize across strategies.
  *
  * Expressed as one plan: partitioned ranking window (last-100 cap) →
  * partial+final average → pivot with default fill → per-row normalize.
  */
object AdaptiveWeights {

  val Defaults: Map[String, Double] = Map("vector" -> 0.4, "tree" -> 0.4, "keyword" -> 0.2)

  /** Retriever query pattern (`HybridRetriever.js:402-406`): first 5
    * sorted lowercase words joined by `_`. */
  def queryPattern(query: Column): Column =
    graft.functions.TextFunctions.queryPatternRetriever(query)

  /** Per-pattern normalized strategy weights from a feedback DataFrame
    * `(pattern, strategy, quality, ts, id)` (id = tie-break). Strategies
    * outside {vector, tree, keyword} are ignored (the reference's
    * per-strategy lists exist only for those keys). Averages use
    * decimal-cast sums (order-free); qualities are expected pre-rounded. */
  def compute(feedback: DataFrame, lastN: Int = 100): DataFrame = {
    val w = Window.partitionBy("pattern", "strategy").orderBy(desc("ts"), desc("id"))
    val avgs = feedback
      .filter(col("strategy").isin("vector", "tree", "keyword"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= lastN)
      .groupBy("pattern", "strategy")
      .agg((sum(col("quality").cast("decimal(12,6)")).cast("double") / count(lit(1))).as("avg_q"))
    val pivoted = avgs.groupBy("pattern").agg(
      coalesce(max(when(col("strategy") === "vector", col("avg_q"))), lit(Defaults("vector"))).as("v"),
      coalesce(max(when(col("strategy") === "tree", col("avg_q"))), lit(Defaults("tree"))).as("t"),
      coalesce(max(when(col("strategy") === "keyword", col("avg_q"))), lit(Defaults("keyword"))).as("k"))
    pivoted.select(col("pattern"),
      round(col("v") / (col("v") + col("t") + col("k")), 6).as("w_vector"),
      round(col("t") / (col("v") + col("t") + col("k")), 6).as("w_tree"),
      round(col("k") / (col("v") + col("t") + col("k")), 6).as("w_keyword"))
  }
}
