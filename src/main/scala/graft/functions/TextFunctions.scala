package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives mirroring the reference's retrieval text
  * processing (`/root/reference/src/retrieval/HybridRetriever.js:365-418`).
  *
  * Everything is built from codegen'd builtins (`split`, `regexp_*`,
  * `length`, higher-order functions) — no UDFs in the hot path, so these
  * stay inside whole-stage codegen at any scale.
  */
object TextFunctions {

  /** 43-word stoplist, verbatim from `HybridRetriever.js:409-418`. */
  val StopWords: Seq[String] = Seq(
    "the", "is", "at", "which", "on", "a", "an", "and", "or", "but",
    "in", "with", "to", "for", "of", "not", "no", "can", "had", "has",
    "have", "this", "that", "was", "are", "were", "been", "be", "do",
    "does", "did", "will", "would", "could", "should", "may", "might",
    "what", "how", "when", "where", "who", "why")

  private val stopSet = StopWords.toSet

  /** `toLowerCase().split(/\s+/)` (`HybridRetriever.js:366`).
    * Known divergence (ADVICE r1): Java `\s` is ASCII-only while JS
    * `/\s+/` also matches Unicode whitespace (NBSP, BOM, …) — identical
    * on ASCII corpora; switch to an explicit Unicode class if JS parity
    * on such input ever matters. */
  def tokenize(c: Column): Column = split(lower(c), "\\s+")

  /** Driver-side term extraction for a literal query string: tokens with
    * `length > 2` and not in the stoplist (`HybridRetriever.js:366-368`). */
  def queryTerms(query: String): Seq[String] =
    query.toLowerCase.split("\\s+").toSeq
      .filter(t => t.length > 2 && !stopSet.contains(t))

  /** Column form of the same predicate, for when terms live in data. */
  def contentTerms(c: Column): Column =
    filter(tokenize(c), t => length(t) > 2 && !t.isin(StopWords: _*))

  /** Non-overlapping substring occurrence count — the reference counts
    * regex hits of the raw term over the lowercased text
    * (`HybridRetriever.js:383`), which for literal terms equals the
    * replace-and-diff count. Avoids regex escaping issues entirely. */
  def substrCount(lowerText: Column, term: String): Column =
    ((length(lowerText) - length(replace(lowerText, lit(term), lit("")))) / term.length).cast("int")

  /** TF-saturation term score `(tf*2.2)/(tf+1.2)` — deliberately *not*
    * real BM25 (no IDF, no length norm), matching `HybridRetriever.js:385`. */
  def tfSaturation(tf: Column): Column = (tf * 2.2) / (tf + 1.2)

  /** bm25ish document score for a literal query: mean of per-term
    * TF-saturation scores over the lowercased text
    * (`HybridRetriever.js:365-399`). Returns 0 when no term matches. */
  def bm25ish(text: Column, terms: Seq[String]): Column =
    if (terms.isEmpty) lit(0.0)
    else {
      val lt = lower(text)
      terms.map(t => tfSaturation(substrCount(lt, t)))
        .reduce(_ + _) / lit(terms.length)
    }

  /** Token estimate `ceil(chars/4)` (`HybridRetriever.js:246`,
    * `RAGPipeline.js:221`). */
  def tokenEstimate(c: Column): Column = ceil(length(c) / 4.0)

  /** Jaccard similarity of whitespace word sets
    * (`RecursiveLearningEngine.js:793-800`). */
  def jaccardWords(a: Column, b: Column): Column = {
    val sa = array_distinct(tokenize(a))
    val sb = array_distinct(tokenize(b))
    val inter = size(array_intersect(sa, sb)).cast("double")
    val union = size(array_union(sa, sb)).cast("double")
    when(union === 0.0, 0.0).otherwise(inter / union)
  }

  /** Retriever query pattern: first 5 sorted lowercase words joined by `_`
    * (`HybridRetriever.js:402-406`). */
  def queryPatternRetriever(c: Column): Column =
    array_join(slice(array_sort(tokenize(c)), 1, 5), "_")

  /** Learning query pattern: strip punctuation, words with `length > 3`,
    * sorted, first 4 joined by `_`, `'generic'` when empty
    * (`RecursiveLearningEngine.js:773-776`). */
  def queryPatternLearning(c: Column): Column = {
    val cleaned = regexp_replace(lower(c), "[^\\w\\s]", "")
    val words = filter(split(cleaned, "\\s+"), w => length(w) > 3)
    val key = array_join(slice(array_sort(words), 1, 4), "_")
    when(length(key) === 0, "generic").otherwise(key)
  }

  /** Weighted Reciprocal Rank Fusion contribution `w / (rrfK + rank)`
    * (`HybridRetriever.js:346`, rrfK=60). Sum per id across strategies. */
  def rrfContribution(weight: Column, rank: Column, rrfK: Int = 60): Column =
    weight / (lit(rrfK) + rank)
}
