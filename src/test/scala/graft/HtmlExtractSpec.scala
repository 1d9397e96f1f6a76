package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.HtmlExtract

/** HTML main-content extraction (VERDICT r17 #4) over hand-built
  * pages: block segmentation, the boilerplate-container rule, the
  * exact-integer word-count / link-density gates, dropped subtrees
  * (script/style/comments), entity decoding, and graceful handling of
  * malformed markup. The `html_extract` oracle entry grades the same
  * rules end-to-end over synthesized pages at SF. */
class HtmlExtractSpec extends AnyFunSuite {

  private val tenWords = "alpha beta gamma delta epsilon zeta eta theta iota kappa"

  test("container rule: nav/header/footer/aside/head text is boilerplate regardless of length") {
    val html =
      s"""<html><head><title>$tenWords</title></head><body>
         |<header>$tenWords $tenWords</header>
         |<nav><a href="/">$tenWords</a></nav>
         |<p>$tenWords</p>
         |<aside>$tenWords $tenWords</aside>
         |<footer>$tenWords</footer>
         |</body></html>""".stripMargin
    val (main, _, nKept) = HtmlExtract.mainText(html)
    assert(main === tenWords && nKept === 1)
    // the container blocks WERE segmented, just classified boilerplate
    // (title inside <head>, header, nav, aside, footer = 5)
    val bs = HtmlExtract.blocks(html)
    assert(bs.count(_.inBoilerplateContainer) === 5)
  }

  test("word-count gate: 10 words keep, 9 words reject; a long heading is content") {
    val nine = tenWords.split(" ").take(9).mkString(" ")
    val html = s"<body><p>$nine</p><h2>$tenWords</h2><p>x</p></body>"
    val (main, nBlocks, nKept) = HtmlExtract.mainText(html)
    assert(main === tenWords && nKept === 1 && nBlocks === 3)
  }

  test("link-density gate: 3*linkWords < words, boundary exact") {
    // 10 words of which 3 linked: 9 < 10 -> content
    val keep = s"""<p>one two three four five six seven <a href="/">l1 l2 l3</a></p>"""
    // 10 words of which 4 linked: 12 !< 10 -> boilerplate
    val drop = s"""<p>one two three four five six <a href="/">l1 l2 l3 l4</a></p>"""
    assert(HtmlExtract.mainText(keep)._3 === 1)
    assert(HtmlExtract.mainText(drop)._3 === 0)
    val b = HtmlExtract.blocks(drop).head
    assert(b.words === 10 && b.linkWords === 4)
    // adjacent ONE-WORD anchors: six links = six link words, not one
    // glued token (the bug the sf0.001 oracle caught in r18)
    val stuffed = """<p>subscribe to our newsletter today <a href="/s">subscribe</a> <a href="/l">login</a> <a href="/r">register</a> <a href="/f">follow</a> <a href="/t">tweet</a> <a href="/m">more</a></p>"""
    val sb = HtmlExtract.blocks(stuffed).head
    assert(sb.words === 11 && sb.linkWords === 6)
    assert(HtmlExtract.mainText(stuffed)._3 === 0)
  }

  test("script/style/noscript subtrees and comments are dropped whole, '<' inside script survives") {
    val html =
      s"""<body><script>if (1 < 2) { document.write("<p>not content</p>"); }</script>
         |<style>p { color: red; }</style>
         |<!-- a comment with <p>markup</p> inside -->
         |<p>$tenWords</p><noscript>enable javascript $tenWords</noscript></body>""".stripMargin
    val (main, _, nKept) = HtmlExtract.mainText(html)
    assert(main === tenWords && nKept === 1)
  }

  test("entities decode and whitespace normalizes before counting") {
    val html = s"<p>fish &amp; chips &lt;best&gt; in&nbsp;town   really good &quot;value&quot; meal</p>"
    val bs = HtmlExtract.blocks(html)
    assert(bs.head.text === "fish & chips <best> in town really good \"value\" meal")
    assert(bs.head.words === 10)
    assert(HtmlExtract.mainText(html)._3 === 1)
  }

  test("inline tags glue (no phantom spaces); block tags separate") {
    val bs = HtmlExtract.blocks("<p>one<b>two</b> three</p><div>four</div>")
    assert(bs.map(_.text) === Vector("onetwo three", "four"))
    assert(bs.head.words === 2)
  }

  test("malformed pages degrade gracefully: unclosed container marks what follows, truncated tag stops cleanly") {
    // unclosed <nav>: everything after it stays boilerplate-marked
    val (m1, _, k1) = HtmlExtract.mainText(s"<body><nav>menu<p>$tenWords</p></body>")
    assert(m1 === "" && k1 === 0)
    // attributes, self-closing and uppercase tags parse; truncated tag at EOF is ignored
    val html = s"""<BODY><P class="x" data-y="1">$tenWords</P><br/><p""" // truncated
    val (m2, _, k2) = HtmlExtract.mainText(html)
    assert(m2 === tenWords && k2 === 1)
  }

  test("nested non-container blocks inside an article stay content; a container nested in content does not leak") {
    val html =
      s"""<article><div><p>$tenWords</p></div>
         |<nav><a>x</a></nav><p>$tenWords $tenWords</p></article>""".stripMargin
    val (main, _, nKept) = HtmlExtract.mainText(html)
    assert(nKept === 2 && main === s"$tenWords\n$tenWords $tenWords")
  }

  test("extractMainText DataFrame form: one narrow pass, no shuffle in the plan") {
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq(
      (1L, s"<body><nav>home about</nav><p>$tenWords</p></body>"),
      (2L, "<body><p>too short</p></body>")).toDF("doc_id", "html")
    val out = HtmlExtract.extractMainText(df, "html", "doc_id")
    val rows = out.orderBy("doc_id").collect()
    assert(rows(0).getString(1) === tenWords && rows(0).getInt(3) === 1)
    assert(rows(1).getString(1) === "" && rows(1).getInt(3) === 0)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "main-content extraction must be a narrow map")
  }
}
