package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** HTML main-content extraction — the boilerpipe/jusText-shaped
  * pipeline stage that turns a RAW PAGE into main text (VERDICT r17
  * #4: the one daily-hit training-data stage the engine lacked; the
  * tree parser reads headings and `line_dedup`/`c4_filters` clean
  * already-extracted text, but nothing segmented a page).
  *
  * Method (public literature): segment the page into text BLOCKS at
  * block-level tag boundaries, then classify each block with
  * link-density / word-count rules in the spirit of Kohlschütter et
  * al., "Boilerplate Detection using Shallow Text Features" (WSDM
  * 2010) and Pomikálek's jusText (2011). The rules here are
  * deliberately EXACT-INTEGER so a SQL oracle can replay the
  * classification bit-for-bit:
  *
  *   - `<script>`/`<style>` subtrees and comments are dropped whole;
  *   - a block inside a `<nav>`, `<header>`, `<footer>`, `<aside>` or
  *     `<head>` container is boilerplate regardless of content (the
  *     semantic-tag shortcut both papers' feature sets subsume);
  *   - otherwise a block is CONTENT iff
  *       `words >= minWords  &&  3 * linkWords < words`
  *     where `words` counts whitespace tokens of the block's visible
  *     text and `linkWords` those inside `<a>` elements (the integer
  *     form of jusText's link-density < 1/3 gate);
  *   - main text = content blocks joined with `\n`, in page order.
  *
  * Spark shape: ONE narrow projection per page — no shuffle, no UDF
  * registry, a per-partition pure-Scala kernel exactly like the
  * `c4Filters`/`gopherRules` scan family. At 100 TB this is
  * scan-speed work that scales with input splits.
  */
object HtmlExtract {

  /** One segmented block: visible text, token counts, and whether it
    * sits inside a boilerplate container. */
  final case class Block(text: String, words: Int, linkWords: Int,
                         inBoilerplateContainer: Boolean) {
    def isContent(minWords: Int): Boolean =
      !inBoilerplateContainer && words >= minWords && 3 * linkWords < words
  }

  /** Tags whose OPEN or CLOSE ends the current block. `br` included —
    * visually it terminates a text run. */
  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "nav", "header", "footer", "aside", "article", "section", "table",
    "tr", "td", "th", "blockquote", "pre", "title", "head", "body",
    "html", "br", "hr", "main", "figure", "figcaption", "dl", "dt", "dd")

  /** Containers whose whole subtree is boilerplate. */
  private val BoilerplateContainers: Set[String] =
    Set("nav", "header", "footer", "aside", "head")

  /** Subtrees dropped entirely (never visible text). */
  private val DroppedSubtrees: Set[String] = Set("script", "style", "noscript")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "#39" -> "'", "nbsp" -> " ")

  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 7) {
          val name = s.substring(i + 1, semi).toLowerCase
          Entities.get(name) match {
            case Some(rep) => out.append(rep); i = semi + 1
            case None => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def countWords(s: String): Int = {
    var n = 0; var inWord = false; var i = 0
    while (i < s.length) {
      val ws = Character.isWhitespace(s.charAt(i))
      if (!ws && !inWord) { n += 1; inWord = true }
      else if (ws) inWord = false
      i += 1
    }
    n
  }

  /** Case-insensitive indexOf without lowercasing the whole page. */
  private def indexOfIgnoreCase(haystack: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val limit = haystack.length - needle.length
    while (i <= limit) {
      if (haystack.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Segment a page into classified blocks — a single linear pass
    * with small tag-context counters (no DOM build: pages are read
    * once, forward, which is what a 100 TB scan wants). Malformed
    * HTML degrades gracefully: unknown tags are treated as inline,
    * an unclosed container marks everything after it. */
  def blocks(html: String): Vector[Block] = {
    val out = Vector.newBuilder[Block]
    val text = new java.lang.StringBuilder
    val linkText = new java.lang.StringBuilder
    var boilerDepth = 0 // nesting inside BoilerplateContainers
    var linkDepth = 0 // nesting inside <a>
    // did any VISIBLE text of the current block sit inside a
    // boilerplate container? (set at append time — a container that
    // opens mid-page must not leak its state onto text outside it)
    var blockBoiler = false

    def flush(): Unit = {
      val t = decodeEntities(text.toString).trim
      if (t.nonEmpty) {
        val lw = countWords(decodeEntities(linkText.toString))
        out += Block(t.replaceAll("\\s+", " "), countWords(t), lw, blockBoiler)
      }
      text.setLength(0); linkText.setLength(0)
      blockBoiler = false
    }

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) { // comment: skip to -->
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val close = html.indexOf('>', i + 1)
          if (close < 0) { i = n } // truncated tag: stop
          else {
            val inner = html.substring(i + 1, close)
            val isEnd = inner.startsWith("/")
            val body = (if (isEnd) inner.substring(1) else inner).trim
            val name = body.takeWhile(ch => ch != ' ' && ch != '\t' &&
              ch != '\n' && ch != '/').toLowerCase
            i = close + 1
            if (DroppedSubtrees.contains(name)) {
              // skip the whole subtree: scripts legally contain '<'
              // that is not markup, so jump to the matching close tag
              if (!isEnd && !body.endsWith("/")) {
                val at = indexOfIgnoreCase(html, s"</$name", i)
                if (at < 0) i = n
                else {
                  val gt = html.indexOf('>', at)
                  i = if (gt < 0) n else gt + 1
                }
              } // a stray close tag is just dropped
            } else if (BlockTags.contains(name)) {
              flush()
              if (BoilerplateContainers.contains(name)) {
                if (isEnd) { if (boilerDepth > 0) boilerDepth -= 1 }
                else if (!body.endsWith("/")) boilerDepth += 1
              }
            } else if (name == "a") {
              if (isEnd) { if (linkDepth > 0) linkDepth -= 1 }
              else if (!body.endsWith("/")) linkDepth += 1
              // separate adjacent anchors' text runs — six one-word
              // links must count six link words, not one glued token
              linkText.append(' ')
            }
            // other inline tags are removed without inserting space —
            // "one<b>two</b>" renders "onetwo"; block tags flushed
            // above already separate text runs
          }
        }
      } else {
        text.append(c)
        if (linkDepth > 0) linkText.append(c)
        if (boilerDepth > 0 && !Character.isWhitespace(c)) blockBoiler = true
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** Extract a page's main text: content blocks joined with `\n`.
    * Returns (mainText, nBlocks, nKept). */
  def mainText(html: String, minWords: Int = 10): (String, Int, Int) = {
    val bs = blocks(html)
    val kept = bs.filter(_.isContent(minWords))
    (kept.map(_.text).mkString("\n"), bs.length, kept.length)
  }

  /** DataFrame form: `(idCol, main_text, n_blocks, n_kept)` — one
    * narrow pass, no shuffle (the `c4Filters` scan shape). */
  def extractMainText(df: DataFrame, htmlCol: String, idCol: String,
                      minWords: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, String)] = df
      .select(col(idCol).cast("long"), col(htmlCol).cast("string"))
      .as[(Long, String)]
    ds.mapPartitions { it =>
      it.map { case (id, html) =>
        val (t, nb, nk) = mainText(if (html == null) "" else html, minWords)
        (id, t, nb, nk)
      }
    }.toDF(idCol, "main_text", "n_blocks", "n_kept")
  }
}
