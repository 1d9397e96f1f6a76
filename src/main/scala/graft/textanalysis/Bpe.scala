package graft.textanalysis

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: distributed training + encoding for
  * LLM-pipeline token accounting (budget packing, mix reports, dedup
  * shingles that match the downstream tokenizer's segmentation).
  *
  * THE SCALE SHAPE (how HF/sentencepiece train, re-expressed Spark-
  * first): BPE never needs the corpus per-iteration — only the WORD
  * FREQUENCY table. So the distributed part is ONE `groupBy(word)`
  * count (map-side partial agg, one shuffle of distinct words), capped
  * to the top-`maxVocab` words (at 100 TB the distinct-word tail is
  * unbounded junk; capping bounds driver memory AND is standard
  * practice — token coverage loss is the long tail's corpus share,
  * log it, don't hide it). The merge loop then runs on the driver over
  * the ≤ `maxVocab` word-freq dict — zero further cluster round-trips
  * per merge (an iterative corpus-wide pair count would be `nMerges`
  * full shuffles: the naive shape this class exists to avoid).
  *
  * Determinism: ties on pair frequency break lexicographically, word
  * cap ties break lexicographically — same corpus, same merges, on any
  * partitioning/cluster (content-addressed, like every sampler here).
  *
  * Encoding is a pure function of the broadcast merge ranks — batched
  * `mapPartitions`, no shuffle, codegen-adjacent cost per token. */
object Bpe {

  /** Word-end sentinel appended to each word's last symbol so merges
    * never cross word boundaries (the classic `</w>` scheme). */
  val EndOfWord = "</w>"

  final case class BpeModel(merges: Seq[(String, String)]) {
    /** rank map for greedy encoding: earlier merge = lower rank. */
    @transient lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
  }

  private def words(text: String): Array[String] =
    Option(text).getOrElse("").toLowerCase.split("\\s+").filter(_.nonEmpty)

  /** A word as its initial symbol sequence: characters, last one
    * suffixed with [[EndOfWord]]. */
  private def symbols(word: String): Vector[String] = {
    val cs = word.map(_.toString).toVector
    cs.init :+ (cs.last + EndOfWord)
  }

  /** Train `nMerges` merges on a text column. One distributed word
    * count; merge loop on the (bounded) driver-side word-freq dict. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
            maxVocab: Int = 100000, minPairFreq: Long = 2L): BpeModel = {
    require(nMerges >= 0 && maxVocab > 0, "nMerges/maxVocab must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    // ONE shuffle: per-word counts, partial-agg'd map-side. The cap is
    // top-by-count with a lexicographic tiebreak (determinism).
    val wordFreq: Array[(String, Long)] = df
      .select(explode(split(lower(coalesce(col(textCol), lit(""))), "\\s+")).as("w"))
      .filter(length($"w") > 0)
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("w")).limit(maxVocab)
      .as[(String, Long)].collect()

    // driver merge loop over symbolized words
    var vocab: Array[(Vector[String], Long)] =
      wordFreq.map { case (w, n) => (symbols(w), n) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var done = false
    while (i < nMerges && !done) {
      val pairCounts = mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + n)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        // max by count, ties lexicographic — deterministic
        val best = pairCounts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (best._2 < minPairFreq) done = true
        else {
          val (a, b) = best._1
          merges += ((a, b))
          val merged = a + b
          vocab = vocab.map { case (syms, n) =>
            if (syms.length < 2) (syms, n)
            else {
              val out = Vector.newBuilder[String]
              var j = 0
              while (j < syms.length) {
                if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
                  out += merged; j += 2
                } else { out += syms(j); j += 1 }
              }
              (out.result(), n)
            }
          }
        }
      }
      i += 1
    }
    BpeModel(merges.toSeq)
  }

  /** Encode one word: repeatedly merge the LOWEST-RANK adjacent pair
    * (exactly the training order — the canonical greedy BPE). */
  def encodeWord(word: String, model: BpeModel): Vector[String] = {
    var syms = symbols(word)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        model.ranks.get((syms(j), syms(j + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestIdx = j }
        }
        j += 1
      }
      if (bestIdx < 0) continue = false
      else {
        syms = (syms.take(bestIdx) :+ (syms(bestIdx) + syms(bestIdx + 1))) ++
          syms.drop(bestIdx + 2)
        if (syms.length < 2) continue = false
      }
    }
    syms
  }

  /** Tokenize a full text (whitespace words → BPE subwords). */
  def encode(text: String, model: BpeModel): Seq[String] =
    words(text).toSeq.flatMap(w => encodeWord(w, model))

  /** Column form: `(…, tokens ARRAY<STRING>, n_tokens)` via broadcast
    * ranks + batched mapPartitions — no shuffle, no driver loop. */
  def encodeCol(df: DataFrame, textCol: String, model: BpeModel,
                tokensCol: String = "tokens"): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    val enc = udf { (t: String) => encode(t, bc.value) }
    df.withColumn(tokensCol, enc(col(textCol)))
      .withColumn("n_" + tokensCol, size(col(tokensCol)))
  }
}
