package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Metadata filter model (reference `HNSWIndex.js:283-292`): equality
  * per key, IN-list for array values, AND across keys — against the
  * schemaless `metadata MAP<STRING,STRING>` tail. Typed system columns
  * (tenant/ts/ttl) have real columns; this covers the rest.
  *
  * Build with [[eq]]/[[in]] and pass to `FusionEngine.search(filter=…)`.
  * `element_at` on a map is a codegen'd lookup; at scale, keys that
  * matter for pruning should be promoted to real columns (then filters
  * push down to the scan — the map tail cannot).
  */
object MetadataFilter {

  /** `metadata[key] = value` (`HNSWIndex.js:290`). */
  def eq(key: String, value: String, metadataCol: Column = col("metadata")): Column =
    element_at(metadataCol, key) === lit(value)

  /** `value.includes(metadata[key])` — IN-list (`HNSWIndex.js:288`). */
  def in(key: String, values: Seq[String], metadataCol: Column = col("metadata")): Column =
    element_at(metadataCol, key).isin(values.map(lit(_)): _*)

  /** AND across keys (`HNSWIndex.js:283-292`): equalities plus
    * IN-lists. Empty spec = keep-all. */
  def and(eqs: Map[String, String] = Map.empty,
          ins: Map[String, Seq[String]] = Map.empty,
          metadataCol: Column = col("metadata")): Column = {
    val conds = eqs.toSeq.sortBy(_._1).map { case (k, v) => eq(k, v, metadataCol) } ++
      ins.toSeq.sortBy(_._1).map { case (k, vs) => in(k, vs, metadataCol) }
    conds.reduceOption(_ && _).getOrElse(lit(true))
  }
}
