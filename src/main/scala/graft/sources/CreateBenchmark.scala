package graft.sources

import scala.collection.mutable.ArrayBuffer

import graft.eval.CaseModel._

/** scripts/create_benchmark.py — the reference's benchmark AUTHORING
  * pipeline: a hand-annotated text file (`[QID|original text]` spans,
  * nestable, with OPTIONAL:/DESC:/COREF:/NO_COREF_ALT: tags) becomes
  * ground-truth labels attached to benchmark articles.
  *
  * Ported EXACTLY, including the reference's quirks (all golden-tested
  * against the executed reference parser, golden/create_benchmark.json):
  *   - an opening '[' whose label cell (text up to the next '|') contains
  *     a bracket is literal text, so `[OPTIONAL:[Q1|x]]` silently drops
  *     the outer tag and annotates only the inner span
  *     (create_benchmark.py:110-117);
  *   - `children` is the ALIASED per-level id list, reset only at nesting
  *     level 0 — a later sibling subtree at level k+1 leaks into an
  *     already-closed level-k label's children (`[Q1|aa [Q2|bb [Q3|cc] dd]
  *     ee [Q4|ff] gg]` gives Q4 children [Q3]) (create_benchmark.py:144);
  *   - label ids keep counting across deleted labels, and delete_labels
  *     re-wires parent/children around the deleted node
  *     (create_benchmark.py:221-240);
  *   - `Unknown*` labels become <NIL>; a label that is neither Unknown
  *     nor `Q[0-9]+`-prefixed is its own type (DATETIME, QUANTITY, custom
  *     type names); QIDs get type OTHER (create_benchmark.py:146-149).
  */
object CreateBenchmark {

  private val StartTag = "<START>"
  private val EndTag = "<END>"

  /** read_labeled_texts(create_benchmark.py:37-53): articles are delimited
    * by lines starting "**** ARTICLE"; START/END tags are stripped
    * anywhere in a line. (The reference implicitly returns None when the
    * file ends directly after a delimiter; this port returns the
    * accumulated texts — declared divergence, the None crashes main.) */
  def readLabeledTexts(content: String, n: Option[Int] = None): Seq[String] = {
    val texts = ArrayBuffer[String]()
    val lines = ArrayBuffer[String]()
    val it = content.linesWithSeparators
    var done = false
    while (it.hasNext && !done) {
      val line = it.next()
      if (line.startsWith("**** ARTICLE")) {
        if (lines.nonEmpty) {
          texts += lines.mkString
          lines.clear()
          if (n.exists(texts.length == _)) done = true
        }
      } else {
        lines += line.replace(StartTag, "").replace(EndTag, "")
      }
    }
    if (!done && lines.nonEmpty) texts += lines.mkString
    texts.toSeq
  }

  /** Mutable label during parsing — children stays an ALIASED buffer
    * until the end (the reference stores the live Python list). */
  private final class MLabel(
      val id: Int,
      val begin: Int,
      val end: Int,
      var entityId: String,
      var parent: Option[Int],
      val children: ArrayBuffer[Int],
      val optional: Boolean,
      val tpe: String,
      val coref: Option[Boolean],
      val desc: Boolean)

  /** get_nested_labels (create_benchmark.py:88-220). */
  def getNestedLabels(
      labeledText: String,
      noCorefVariant: Boolean = false,
      noCorefTags: Boolean = false): Seq[GtLabel] = {
    var pos = 0
    val labels = ArrayBuffer[String]()
    val optionalTags = ArrayBuffer[Boolean]()
    val descTags = ArrayBuffer[Boolean]()
    val corefTags = ArrayBuffer[Boolean]()
    val noCorefAltTags = ArrayBuffer[Boolean]()
    var inside = 0
    val articleLabels = ArrayBuffer[MLabel]()
    var originalTexts = ArrayBuffer[ArrayBuffer[StringBuilder]]()
    var labelIds = ArrayBuffer[ArrayBuffer[Int]]()
    var startPos = ArrayBuffer[Int]()
    var originalTextCell = false
    var entityNameCell = false
    var labelIdCounter = 0
    val deleteIds = scala.collection.mutable.Set[Int]()

    var charIdx = 0
    while (charIdx < labeledText.length) {
      val char = labeledText.charAt(charIdx)
      if (char == '[') {
        // annotation only if the label cell (up to the next '|') is
        // bracket-free; Python's text[i+1:-1] on a missing '|' drops the
        // final char — replicated
        val nextDelimiter = labeledText.indexOf('|', charIdx + 1)
        val substring =
          if (nextDelimiter >= 0) labeledText.substring(charIdx + 1, nextDelimiter)
          else if (charIdx + 1 >= labeledText.length - 1) ""
          else labeledText.substring(charIdx + 1, labeledText.length - 1)
        if (substring.contains('[') || substring.contains(']')) {
          pos += 1
        } else {
          inside += 1
          originalTextCell = false
          startPos += pos
          if (originalTexts.length < inside) originalTexts += ArrayBuffer[StringBuilder]()
          originalTexts(inside - 1) += new StringBuilder
          if (labelIds.length < inside) labelIds += ArrayBuffer[Int]()
          labelIds(inside - 1) += labelIdCounter
          labelIdCounter += 1
          labels += ""
          optionalTags += false
          descTags += false
          corefTags += false
          noCorefAltTags += false
        }
      } else if (inside > 0 && char == '|') {
        originalTextCell = true
        entityNameCell = false
      } else if (inside > 0 && char == ']') {
        val originalText = originalTexts(inside - 1).last.toString
        val endPos = originalText.length
        val parent = if (inside - 2 >= 0) Some(labelIds(inside - 2).last) else None
        // the ALIASED deeper-level id list (quirk: accumulates across
        // sibling subtrees until nesting returns to level 0)
        val children =
          if (inside < labelIds.length) labelIds(inside) else ArrayBuffer[Int]()
        val labelId = labelIds(inside - 1).last
        // reference create_benchmark.py:147 uses re.match(r"Q[0-9]+") — a
        // PREFIX test; Scala matches() would demand a full match and its
        // '.' excludes newlines, misclassifying a multi-line QID cell
        val qidPrefix = labels.last.length >= 2 &&
          labels.last.charAt(0) == 'Q' &&
          labels.last.charAt(1) >= '0' && labels.last.charAt(1) <= '9'
        val labelType =
          if (!labels.last.startsWith("Unknown") && !qidPrefix) labels.last
          else OTHER
        if (labels.last.startsWith("Unknown")) labels(labels.length - 1) = NIL
        val corefTag = if (noCorefTags) None else Some(corefTags.last)
        articleLabels += new MLabel(labelId, startPos.last, startPos.last + endPos,
          labels.last, parent, children, optionalTags.last, labelType, corefTag,
          descTags.last)
        if ((noCorefVariant && corefTags.last) ||
          (!noCorefVariant && noCorefAltTags.last)) deleteIds += labelId
        optionalTags.remove(optionalTags.length - 1)
        descTags.remove(descTags.length - 1)
        corefTags.remove(corefTags.length - 1)
        noCorefAltTags.remove(noCorefAltTags.length - 1)
        labels.remove(labels.length - 1)
        startPos.remove(startPos.length - 1)
        inside -= 1
        if (inside == 0) {
          originalTextCell = false
          originalTexts = ArrayBuffer[ArrayBuffer[StringBuilder]]()
          startPos = ArrayBuffer[Int]()
          labelIds = ArrayBuffer[ArrayBuffer[Int]]()
        }
      } else if (inside > 0 && originalTextCell) {
        originalTexts(inside - 1).last.append(char)
        var k = 0
        while (k < inside - 1) {
          originalTexts(k).foreach(_.append(char))
          k += 1
        }
        pos += 1
      } else if (inside > 0) {
        if (char == ':') {
          labels.last match {
            case "OPTIONAL" => optionalTags(optionalTags.length - 1) = true; labels(labels.length - 1) = ""
            case "DESC" => descTags(descTags.length - 1) = true; labels(labels.length - 1) = ""
            case "COREF" => corefTags(corefTags.length - 1) = true; labels(labels.length - 1) = ""
            case "NO_COREF_ALT" => noCorefAltTags(noCorefAltTags.length - 1) = true; labels(labels.length - 1) = ""
            case _ => entityNameCell = true
          }
        } else if (!entityNameCell) {
          labels(labels.length - 1) = labels.last + char
        }
      } else {
        pos += 1
      }
      charIdx += 1
    }
    deleteLabels(articleLabels, deleteIds.toSet)
  }

  /** delete_labels (create_benchmark.py:221-240): unlink the deleted node
    * from its parent's children, re-parent its children, drop it. */
  private def deleteLabels(labels: ArrayBuffer[MLabel], deleteIds: Set[Int]): Seq[GtLabel] = {
    val labelDict = scala.collection.mutable.LinkedHashMap(labels.map(l => l.id -> l).toSeq: _*)
    labels.foreach { l =>
      if (deleteIds.contains(l.id)) {
        l.parent.foreach { p =>
          labelDict.get(p).foreach { par =>
            if (par.children.nonEmpty) {
              val idx = par.children.indexOf(l.id)
              if (idx >= 0) par.children.remove(idx)
            }
          }
        }
        if (l.children.nonEmpty) {
          l.children.foreach { childId =>
            labelDict.get(childId).foreach(_.parent = l.parent)
          }
        }
        labelDict.remove(l.id)
      }
    }
    labelDict.values.toSeq.sortBy(_.id).map { l =>
      GtLabel(l.id, l.begin, l.end, l.entityId, "Unknown", l.parent,
        l.children.toSeq, l.optional,
        l.tpe.split('|').toSeq.filter(_.nonEmpty), l.coref, l.desc)
    }
  }

  /** The main() composition (create_benchmark.py:243-296, minus the bold
    * title-span sidecar — EvalDoc carries no title synonyms): pair each
    * article with its annotation text (honoring the skip-index
    * bookkeeping, including the quirk that a skipped index under
    * --no-skip advances the annotation cursor), parse the labels, and
    * attach them. */
  def compose(
      annotations: String,
      articles: Seq[EvalDoc],
      skipArticles: Set[Int] = Set.empty, // 0-based, like the reference's num-1
      skip: Boolean = false,
      nArticles: Option[Int] = None,
      noCorefTags: Boolean = false,
      noCorefVariant: Boolean = false): Seq[EvalDoc] = {
    val labelsTexts = readLabeledTexts(annotations, nArticles)
    val out = ArrayBuffer[EvalDoc]()
    var skipCount = 0
    var i = 0
    var break = false
    while (i < articles.length && !break) {
      if (i + skipCount >= labelsTexts.length ||
        nArticles.exists(out.length >= _)) break = true
      else {
        if (!skip || !skipArticles.contains(i + skipCount)) {
          if (!skip && skipArticles.contains(i + skipCount)) skipCount += 1
          val labels = getNestedLabels(labelsTexts(i + skipCount),
            noCorefVariant = noCorefVariant, noCorefTags = noCorefTags)
          out += articles(i).copy(labels = labels)
        }
        i += 1
      }
    }
    out.toSeq
  }
}
