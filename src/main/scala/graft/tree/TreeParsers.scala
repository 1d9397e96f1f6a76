package graft.tree

import scala.collection.mutable.ArrayBuffer

import graft.model.TreeNodeRow

/** Deterministic ports of the reference's section parsers
  * (`/root/reference/src/index/TreeIndex.js:305-440`) and the stack-based
  * tree builder (`:457-498`), producing the adjacency-row form
  * (SURVEY §1.4: Spark has no recursive struct — `citation_path` is
  * precomputed at build time so citations are a column op).
  *
  * Node ids are `"{docId}#{n}"` with n in construction order (root = 0),
  * deterministic per document — unlike the reference's global mutable
  * counter, which would not survive distributed builds.
  */
object TreeParsers {

  final case class Section(title: String, level: Int, content: String)

  /** `_parseMarkdown` (`TreeIndex.js:305-348`): `^#{1,6}\s+` headings;
    * content = lines until next heading; leading non-heading text becomes
    * a 'Document' section only when no heading exists at all. */
  def parseMarkdown(content: String): Seq[Section] = {
    val lines = content.split("\n", -1)
    val sections = ArrayBuffer.empty[Section]
    var current: Option[(String, Int)] = None
    val buffer = ArrayBuffer.empty[String]
    val heading = "^(#{1,6})\\s+(.+)$".r
    for (line <- lines) {
      heading.findFirstMatchIn(line) match {
        case Some(m) =>
          current.foreach { case (t, l) =>
            sections += Section(t, l, buffer.mkString("\n").trim)
          }
          current = Some((m.group(2).trim, m.group(1).length))
          buffer.clear()
        case None =>
          buffer += line
      }
    }
    current match {
      case Some((t, l)) => sections += Section(t, l, buffer.mkString("\n").trim)
      case None if buffer.nonEmpty =>
        sections += Section("Document", 1, buffer.mkString("\n").trim)
      case None => ()
    }
    sections.toSeq
  }

  /** `_parseHTML` (`TreeIndex.js:351-393`): `<h1..6>` headings, content
    * between headings tag-stripped. */
  def parseHtml(content: String): Seq[Section] = {
    val headingRe = "(?i)<h([1-6])[^>]*>(.*?)</h[1-6]>".r
    val sections = ArrayBuffer.empty[Section]
    var lastEnd = 0
    var pending: Option[(String, Int)] = None
    for (m <- headingRe.findAllMatchIn(content)) {
      pending.foreach { case (t, l) =>
        sections += Section(t, l, stripHtml(content.substring(lastEnd, m.start)))
      }
      pending = Some((stripHtml(m.group(2)), m.group(1).toInt))
      lastEnd = m.end
    }
    pending match {
      case Some((t, l)) => sections += Section(t, l, stripHtml(content.substring(lastEnd)))
      case None => sections += Section("Document", 1, stripHtml(content))
    }
    sections.toSeq
  }

  /** `_parsePlainText` (`TreeIndex.js:396-440`): numbered (`1.`, `1.1`)
    * or ALL-CAPS (< 80 chars) headers; level = dotted-number depth. */
  def parsePlainText(content: String): Seq[Section] = {
    val lines = content.split("\n", -1)
    val sections = ArrayBuffer.empty[Section]
    val buffer = ArrayBuffer.empty[String]
    var title = "Document"
    var level = 1
    val numbered = "^(\\d+(?:\\.\\d+)*)\\s+(.+)$".r
    val caps = "^([A-Z][A-Z\\s]{3,})$".r
    for (line <- lines) {
      val num = numbered.findFirstMatchIn(line)
      val cap = caps.findFirstMatchIn(line).filter(_ => line.length < 80)
      if (num.isDefined || cap.isDefined) {
        if (buffer.nonEmpty) {
          sections += Section(title, level, buffer.mkString("\n").trim)
          buffer.clear()
        }
        num match {
          case Some(m) =>
            title = m.group(2).trim
            level = m.group(1).split("\\.").length
          case None =>
            title = cap.get.group(1).trim
            level = 1
        }
      } else buffer += line
    }
    if (buffer.nonEmpty || sections.isEmpty)
      sections += Section(title, level, buffer.mkString("\n").trim)
    sections.toSeq
  }

  private def stripHtml(html: String): String =
    html.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim

  /** `_detectTitle` (`TreeIndex.js:448-452`). */
  def detectTitle(content: String): String = {
    val first = content.split("\n", -1)(0).trim
    if (first.length < 200) first else "Untitled Document"
  }

  def parse(content: String, format: String): Seq[Section] = format match {
    case "markdown" => parseMarkdown(content)
    case "html"     => parseHtml(content)
    case _          => parsePlainText(content)
  }

  /** Stack-based tree build (`TreeIndex.js:457-498`) flattened to
    * adjacency rows with precomputed citation paths. Root is level 0
    * with the document title; a section's parent is the nearest
    * preceding section with a strictly lower level. */
  def buildRows(docId: String, content: String, format: String = "text",
                title: Option[String] = None): Seq[TreeNodeRow] = {
    val docTitle = title.getOrElse(detectTitle(content))
    var n = 0
    def nextId(): String = { val id = s"$docId#$n"; n += 1; id }

    val root = TreeNodeRow(docId, nextId(), None, 0, 0, docTitle, "", "", Seq(docTitle))
    val rows = ArrayBuffer(root)
    // stack of (node_id, level, citation_path)
    var stack = List((root.node_id, 0, root.citation_path))
    var pos = 0
    for (s <- parse(content, format)) {
      while (stack.lengthCompare(1) > 0 && stack.head._2 >= s.level) stack = stack.tail
      val (parentId, _, parentPath) = stack.head
      val path = parentPath :+ s.title
      val row = TreeNodeRow(docId, nextId(), Some(parentId), s.level, pos,
        s.title, "", s.content, path)
      rows += row
      stack = (row.node_id, s.level, path) :: stack
      pos += 1
    }
    rows.toSeq
  }
}
