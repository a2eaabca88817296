package graft.pipeline

import graft.eval.CaseModel._
import graft.util.Json.esc

/** ONE implementation of the reference's article.to_json evaluation
  * format (article.py:40-62) shared by the benchmark writer
  * (AddBenchmark) and the linked-articles writer (LinkBenchmark) — the
  * two previously carried hand-synced copies of the label serializer.
  *
  * Field order mirrors to_dict: id, title, text, [hyperlinks],
  * [entity_mentions], evaluation_span, labels. Hyperlinks serialize in
  * the reference shape [[begin, end], target]; EvalDoc carries spans
  * only, so the target cell is "" (declared divergence — evaluation
  * consumes only the spans, errors.py:328-336). */
object ArticleJson {

  def labelJson(l: GtLabel): String = {
    val sb = new StringBuilder
    sb ++= s"""{"id": ${l.id}, "span": [${l.begin}, ${l.end}], """
    sb ++= s""""entity_id": "${esc(l.entityId)}", "name": "${esc(l.name)}", """
    // reference writes "|".join(types) — empty list becomes ""
    sb ++= s""""type": "${esc(l.types.mkString("|"))}""""
    l.parent.foreach(p => sb ++= s""", "parent": $p""")
    if (l.children.nonEmpty) sb ++= s""", "children": [${l.children.mkString(", ")}]"""
    if (l.optionalFlag) sb ++= s""", "optional": true"""
    if (l.desc) sb ++= s""", "desc": true"""
    l.coref.foreach(c => sb ++= s""", "coref": $c""")
    sb ++= "}"
    sb.toString
  }

  /** entity_mention.py:21-36 to_dict (evaluation format): span, id,
    * recognized_by, linked_by, candidates SORTED. */
  def mentionJson(p: PredSpan): String = {
    val sb = new StringBuilder
    sb ++= s"""{"span": [${p.begin}, ${p.end}], "id": "${esc(p.entityId)}""""
    if (p.predictedBy.nonEmpty) {
      sb ++= s""", "recognized_by": "${esc(p.predictedBy)}""""
      sb ++= s""", "linked_by": "${esc(p.predictedBy)}""""
    }
    sb ++= s""", "candidates": [${p.candidates.sorted.map(c => "\"" + esc(c) + "\"").mkString(", ")}]"""
    sb ++= "}"
    sb.toString
  }

  /** One article.to_json line. `withMentions` = the linked-articles
    * variant (predictions present, sorted by span); the benchmark variant
    * omits the entity_mentions field like the reference does for
    * prediction-free articles. */
  def line(doc: EvalDoc, id: Long, withMentions: Boolean): String = {
    val sb = new StringBuilder
    sb ++= s"""{"id": $id, "title": "${esc(doc.url)}", "text": "${esc(doc.text)}""""
    if (doc.hyperlinks.nonEmpty) {
      val hs = doc.hyperlinks
        .map(h => s"""[[${h.begin}, ${h.end}], ""]""")
        .mkString(", ")
      sb ++= s""", "hyperlinks": [$hs]"""
    }
    if (withMentions) {
      val mentions = doc.predictions.sortBy(p => (p.begin, p.end))
        .map(mentionJson).mkString(", ")
      sb ++= s""", "entity_mentions": [$mentions]"""
    }
    val labels = doc.labels.sortBy(_.id).map(labelJson).mkString(", ")
    sb ++= s""", "evaluation_span": [${doc.evalBegin}, ${doc.evalEnd}], "labels": [$labels]}"""
    sb.toString
  }
}
