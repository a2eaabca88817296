package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseLogic
import graft.eval.CaseModel._

/** Per-case golden test of the error-label cascade against the reference's
  * hand-crafted error-category examples (one article per category, shipped
  * with expected eval_cases —
  * evaluation-webapp/example-benchmark/ - SURVEY §5.4).
  *
  * Compared exactly: factor, linking/NER eval types (both modes),
  * mention type (GT cases), and every KB-FREE error label. Labels that
  * need the Wikidata-derived entity database (demonym / metonymy / rare
  * and their OTHER fallbacks) are excluded — that KB is not shipped.
  */
class ErrorCascadeGoldenSpec extends AnyFunSuite {

  private val Base = "/root/reference/evaluation-webapp/example-benchmark"

  private val KbFreeLabels: Set[String] = Set(
    "NER_FN", "NER_FN_LOWERCASED", "NER_FN_PARTIALLY_INCLUDED",
    "NER_FN_PARTIAL_OVERLAP", "NER_FN_OTHER",
    "AVOIDED_NER_FN", "AVOIDED_NER_FN_LOWERCASED",
    "AVOIDED_NER_FN_PARTIALLY_INCLUDED", "AVOIDED_NER_FN_PARTIAL_OVERLAP",
    "AVOIDED_NER_FN_OTHER",
    "NER_FP", "NER_FP_LOWERCASED", "NER_FP_GROUNDTRUTH_UNKNOWN",
    "NER_FP_OTHER", "NER_FP_WRONG_SPAN",
    "AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN", "AVOIDED_NER_FP_WRONG_SPAN",
    "DISAMBIGUATION_WRONG", "DISAMBIGUATION_CORRECT",
    "DISAMBIGUATION_CANDIDATES_WRONG", "DISAMBIGUATION_CANDIDATES_CORRECT",
    "DISAMBIGUATION_MULTI_CANDIDATES_WRONG", "DISAMBIGUATION_MULTI_CANDIDATES_CORRECT",
    "HYPERLINK_CORRECT", "HYPERLINK_WRONG",
    "COREFERENCE_FALSE_DETECTION", "COREFERENCE_UNDETECTED",
    "COREFERENCE_WRONG_MENTION_REFERENCED",
    "COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED")

  private def readLines(path: String): Seq[ujsonLite.Value] =
    scala.io.Source.fromFile(path, "UTF-8").getLines().toSeq.map(ujsonLite.parse)

  private def docFrom(line: ujsonLite.Value): EvalDoc = {
    val text = line("text").str
    val labels = line("labels").arr.map { l =>
      GtLabel(
        l("id").num.toInt, l("span").arr(0).num.toInt, l("span").arr(1).num.toInt,
        l("entity_id").str,
        if (l.node.has("name")) l("name").str else "Unknown",
        if (l.node.has("parent")) Some(l("parent").num.toInt) else None,
        if (l.node.has("children")) l("children").arr.map(_.num.toInt).toSeq else Nil,
        if (l.node.has("optional")) l("optional").bool else false,
        if (l.node.has("type")) l("type").str.split('|').toSeq.filter(_.nonEmpty) else Nil,
        if (l.node.has("coref")) Some(l("coref").bool) else None,
        if (l.node.has("desc")) l("desc").bool else false)
    }.toSeq
    val preds =
      if (!line.node.has("entity_mentions") || line("entity_mentions").isNull) Nil
      else line("entity_mentions").arr.map { m =>
        PredSpan(
          m("span").arr(0).num.toInt, m("span").arr(1).num.toInt,
          m("id").str,
          if (m.node.has("candidates")) m("candidates").arr.map(_.str).toSeq else Nil,
          if (m.node.has("linked_by")) m("linked_by").str else "")
      }.toSeq
    val span = if (line.node.has("evaluation_span") && !line("evaluation_span").isNull)
      (line("evaluation_span").arr(0).num.toInt, line("evaluation_span").arr(1).num.toInt)
    else (0, text.length)
    val hyperlinks =
      if (!line.node.has("hyperlinks") || line("hyperlinks").isNull) Nil
      else line("hyperlinks").arr.map { h =>
        graft.model.Span(h.arr(0).arr(0).num.toInt, h.arr(0).arr(1).num.toInt)
      }.toSeq
    EvalDoc(line("title").str, text, span._1, span._2, labels, preds, hyperlinks)
  }

  /** The EXECUTED reference (tools/run_reference_labeler.py runs the
    * current code with the same empty KB as our engine) — full
    * label-for-label comparison, no exclusions. The shipped eval_cases
    * golden is stale vs the current reference code (verified by
    * execution: it lacks AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN on the
    * "Sean Kelly" case the current code emits), so the executed output is
    * the authoritative fixture. */
  test("error-label cascade matches the EXECUTED reference per case, all labels") {
    val articles = readLines(s"$Base/example.error-category-examples.linked_articles.jsonl")
    val fixture = ujsonLite.parse(scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/error_cascade.json"), "UTF-8").mkString).arr
    assert(articles.size == 20 && fixture.size == 20)

    var checkedLabels = 0
    articles.zip(fixture).zipWithIndex.foreach { case ((art, goldLine), docIdx) =>
      val doc = docFrom(art)
      val ours = CaseLogic.generateCases(doc, EntityMeta.empty)
        .map(c => (c.begin, c.end) -> c).toMap
      assert(ours.size == goldLine.arr.size,
        s"doc $docIdx: case count ${ours.size} != ${goldLine.arr.size}")
      goldLine.arr.foreach { g =>
        val span = (g("span").arr(0).num.toInt, g("span").arr(1).num.toInt)
        val c = ours.getOrElse(span,
          fail(s"doc $docIdx: no case generated for span $span (${g("text").str})"))
        assert(c.factor == g("factor").num.toInt, s"doc $docIdx $span factor")
        def types(k: String, mode: String): Seq[String] = g(k)(mode).arr.map(_.str).toSeq
        assert(c.linkingIgnored == types("linking_eval_types", "IGNORED"),
          s"doc $docIdx $span linking IGNORED")
        assert(c.linkingRequired == types("linking_eval_types", "REQUIRED"),
          s"doc $docIdx $span linking REQUIRED")
        assert(c.nerIgnored == types("ner_eval_types", "IGNORED"),
          s"doc $docIdx $span ner IGNORED")
        assert(c.nerRequired == types("ner_eval_types", "REQUIRED"),
          s"doc $docIdx $span ner REQUIRED")
        if (g.node.has("mention_type"))
          assert(c.mentionType == g("mention_type").str, s"doc $docIdx $span mention_type")
        Seq("IGNORED" -> c.errorsIgnored, "REQUIRED" -> c.errorsRequired).foreach {
          case (mode, oursLabels) =>
            val want = g("error_labels")(mode).arr.map(_.str).toSet
            val got = oursLabels.toSet
            assert(got == want,
              s"doc $docIdx $span [$mode] labels: got=$got want=$want (text='${g("text").str}')")
            checkedLabels += want.size
        }
      }
    }
    info(s"compared $checkedLabels error labels (ALL categories) across 20 hand-crafted articles")
    assert(checkedLabels > 100)
  }

  test("shipped eval_cases golden agrees on the KB-free subset (stale-golden aware)") {
    val articles = readLines(s"$Base/example.error-category-examples.linked_articles.jsonl")
    val goldenCases = readLines(s"$Base/example.error-category-examples.eval_cases.jsonl")
    var mismatches = 0
    articles.zip(goldenCases).foreach { case (art, goldLine) =>
      val doc = docFrom(art)
      val ours = CaseLogic.generateCases(doc, EntityMeta.empty)
        .map(c => (c.begin, c.end) -> c).toMap
      goldLine.arr.foreach { g =>
        val span = (g("span").arr(0).num.toInt, g("span").arr(1).num.toInt)
        ours.get(span).foreach { c =>
          val want = g("error_labels")("IGNORED").arr.map(_.str).toSet.intersect(KbFreeLabels)
          val got = c.errorsIgnored.toSet.intersect(KbFreeLabels)
          if (got != want) mismatches += 1
        }
      }
    }
    // the one known stale-golden divergence is in REQUIRED mode; IGNORED
    // must agree everywhere
    assert(mismatches == 0, s"$mismatches IGNORED-mode KB-free label mismatches vs shipped golden")
  }
}
