package graft.text

import scala.collection.mutable.ArrayBuffer

/** Deterministic ports of the reference's chunking strategies
  * (`/root/reference/src/rag/RAGPipeline.js:246-339`), producing identical
  * chunk boundaries for identical input. Used from `Dataset.flatMap` — the
  * reference's only UDTF-shaped operator (SURVEY §2.10). Chunking is
  * embarrassingly parallel per document, so the Spark plan is a narrow
  * `flatMap` with no shuffle.
  */
object Chunkers {

  val DefaultChunkSize = 512
  val DefaultChunkOverlap = 50

  sealed trait Strategy
  case object Recursive extends Strategy
  case object Sentence extends Strategy
  case object Paragraph extends Strategy

  def chunk(text: String, strategy: Strategy = Recursive,
            chunkSize: Int = DefaultChunkSize,
            chunkOverlap: Int = DefaultChunkOverlap): Seq[String] =
    strategy match {
      case Recursive => recursiveChunk(text, chunkSize, chunkOverlap)
      case Sentence  => sentenceChunk(text, chunkSize, chunkOverlap)
      case Paragraph => paragraphChunk(text, chunkSize)
    }

  /** `_recursiveChunk` / `_splitRecursive` (`RAGPipeline.js:260-303`):
    * split on separators `["\n\n", "\n", ". ", " "]` in order, greedily
    * packing parts up to `chunkSize` with a `chunkOverlap`-char tail
    * carried between chunks; chunks still > 1.5× size recurse to the next
    * separator. */
  def recursiveChunk(text: String, chunkSize: Int = DefaultChunkSize,
                     chunkOverlap: Int = DefaultChunkOverlap): Seq[String] =
    splitRecursive(text, List("\n\n", "\n", ". ", " "), chunkSize, chunkOverlap)

  private def splitRecursive(text: String, separators: List[String],
                             chunkSize: Int, chunkOverlap: Int): Seq[String] = {
    if (text.length <= chunkSize) return Seq(text)
    val separator = separators.head
    // JS String.split on a literal keeps trailing empty strings — Scala's
    // split drops them, so use a -1 limit split to match.
    val parts = splitLiteral(text, separator)
    val chunks = ArrayBuffer.empty[String]
    var current = ""
    for (part <- parts) {
      val candidate = if (current.nonEmpty) current + separator + part else part
      if (candidate.length > chunkSize && current.nonEmpty) {
        chunks += current
        val overlapText = current.takeRight(chunkOverlap)
        current = overlapText + separator + part
      } else {
        current = candidate
      }
    }
    if (current.nonEmpty) chunks += current
    if (separators.tail.nonEmpty) {
      chunks.toSeq.flatMap { c =>
        if (c.length > chunkSize * 1.5)
          splitRecursive(c, separators.tail, chunkSize, chunkOverlap)
        else Seq(c)
      }
    } else chunks.toSeq
  }

  /** Literal (non-regex) split preserving empty parts, like JS
    * `String.prototype.split(str)`. */
  private[graft] def splitLiteral(text: String, sep: String): Seq[String] = {
    val out = ArrayBuffer.empty[String]
    var from = 0
    var idx = text.indexOf(sep, from)
    while (idx >= 0) {
      out += text.substring(from, idx)
      from = idx + sep.length
      idx = text.indexOf(sep, from)
    }
    out += text.substring(from)
    out.toSeq
  }

  /** `_sentenceChunk` (`RAGPipeline.js:306-321`): sentences matched by
    * `[^.!?]+[.!?]+`, greedily packed; tail-overlap carried. Falls back to
    * the whole text when nothing matches. */
  def sentenceChunk(text: String, chunkSize: Int = DefaultChunkSize,
                    chunkOverlap: Int = DefaultChunkOverlap): Seq[String] = {
    val re = "[^.!?]+[.!?]+".r
    val matches = re.findAllIn(text).toSeq
    val sentences = if (matches.isEmpty) Seq(text) else matches
    val chunks = ArrayBuffer.empty[String]
    var current = ""
    for (sentence <- sentences) {
      if ((current + sentence).length > chunkSize && current.nonEmpty) {
        chunks += current.trim
        current = current.takeRight(chunkOverlap) + sentence
      } else {
        current += sentence
      }
    }
    if (current.trim.nonEmpty) chunks += current.trim
    chunks.toSeq
  }

  /** `_paragraphChunk` (`RAGPipeline.js:324-339`): split on `\n\n+`,
    * greedily packed with `\n\n` re-joins; no overlap. */
  def paragraphChunk(text: String, chunkSize: Int = DefaultChunkSize): Seq[String] = {
    val paragraphs = text.split("\n\n+", -1).toSeq
    val chunks = ArrayBuffer.empty[String]
    var current = ""
    for (para <- paragraphs) {
      if ((current + "\n\n" + para).length > chunkSize && current.nonEmpty) {
        chunks += current.trim
        current = para
      } else {
        current = if (current.nonEmpty) current + "\n\n" + para else para
      }
    }
    if (current.trim.nonEmpty) chunks += current.trim
    chunks.toSeq
  }
}
