package graft.eval

import scala.collection.mutable

import graft.eval.CaseModel._

/** Fine-grained error-category labeling — the reference's 9 labelers
  * (/root/reference/src/elevant/evaluation/errors.py:14-379) as one pure
  * per-document function over the (root-GT + false-detection) case list.
  *
  * Labels are attached per evaluation mode; the aggregation side counts
  * `factor`-weighted label occurrences (evaluator.py:196-204).
  */
object ErrorLabeler {

  // settings.py:114-119
  val TypePerson = "Q215627"
  val TypeFictionalCharacter = "Q95074"
  val TypeOrganization = "Q43229"
  val TypeLocation = "Q27096213"
  val TypeEthnicity = "Q33829"
  val TypeLanguoid = "Q17376908"
  val DemonymTypes: Set[String] = Set(TypeLocation, TypeEthnicity, TypeLanguoid)

  /** KB side of error labeling (demonym list, link-frequency argmax table). */
  final case class ErrorMeta(
      demonyms: Set[String] = Set.empty,
      mostPopularCandidates: Map[String, Set[String]] = Map.empty,
      types: Map[String, Seq[String]] = Map.empty) {
    def entityTypes(id: String): Seq[String] = types.getOrElse(id, Nil)
  }

  private def overlaps(a: (Int, Int), b: (Int, Int)): Boolean =
    !(a._1 >= b._2 || b._1 >= a._2)

  private def isSubspan(span: (Int, Int), sub: (Int, Int)): Boolean =
    !(span._1 == sub._1 && span._2 == sub._2) && span._1 <= sub._1 && span._2 >= sub._2

  /** first alpha char of the mention text is lowercase (mention_type.py). */
  private def isNonNamed(text: String): Boolean =
    MentionTypes.entityMentionType(text, Some("Qx")) == "ENTITY_NON_NAMED"

  /** Per-case per-mode accessors over the EvalCase row. */
  private final class V(val c: EvalCase, mode: String) {
    val linking: Seq[String] = if (mode == CaseLogic.Ignored) c.linkingIgnored else c.linkingRequired
    val ner: Seq[String] = if (mode == CaseLogic.Ignored) c.nerIgnored else c.nerRequired
    def span: (Int, Int) = (c.begin, c.end)
    def linkingTp: Boolean = linking.contains("TP")
    def linkingFp: Boolean = linking.contains("FP")
    def linkingFn: Boolean = linking.contains("FN")
    def nerTp: Boolean = ner.contains("TP")
    def nerFp: Boolean = ner.contains("FP")
    def nerFn: Boolean = ner.contains("FN")
    def hasGt: Boolean = c.labelId.isDefined
    def gtUnknown: Boolean = !hasGt || c.gtEntityId.exists(isUnknownEntity)
    def gtKnown: Boolean = hasGt && c.gtEntityId.exists(id =>
      !isUnknownEntity(id) && !c.gtTypes.contains(DATETIME) && !c.gtTypes.contains(QUANTITY))
    def predKnown: Boolean = c.predEntityId.exists(id => !isUnknownEntity(id))
    def trueIsCandidate: Boolean = c.gtEntityId.exists(c.candidates.contains)
    /** errors.py has_relevant_ground_truth */
    def relevantGt(m: String): Boolean =
      if (m == CaseLogic.Ignored) gtKnown && !c.optional else hasGt
  }

  private def isDemonym(v: V, meta: ErrorMeta): Boolean =
    meta.demonyms.contains(v.c.text) &&
      v.c.gtEntityId.exists(id => meta.entityTypes(id).toSet.intersect(DemonymTypes).nonEmpty)

  private def isPartialName(v: V, gtName: String): Boolean =
    v.gtKnown && gtName.contains(' ') && v.c.text.length < gtName.length && gtName.contains(v.c.text)

  private def mostPopular(meta: ErrorMeta, alias: String): Set[String] =
    meta.mostPopularCandidates.getOrElse(alias, Set.empty)

  private def isRare(v: V, meta: ErrorMeta): Boolean = {
    val mp = mostPopular(meta, v.c.text)
    mp.nonEmpty && !v.c.gtEntityId.exists(mp.contains)
  }

  private def isMetonymy(v: V, meta: ErrorMeta): Boolean = {
    if (!v.gtKnown) return false
    val trueTypes = v.c.gtEntityId.map(meta.entityTypes).getOrElse(Nil).toSet
    if (trueTypes.contains(TypeLocation) || trueTypes.contains(TypePerson) ||
        trueTypes.contains(TypeEthnicity) || trueTypes.contains(TypeFictionalCharacter)) return false
    val mp = mostPopular(meta, v.c.text)
    if (mp.isEmpty) return false
    mp.flatMap(meta.entityTypes).contains(TypeLocation)
  }

  private def isMetonymyError(v: V, meta: ErrorMeta): Boolean =
    isMetonymy(v, meta) &&
      v.c.predEntityId.exists(id => meta.entityTypes(id).contains(TypeLocation))

  /** gtName lookup: EvalCase doesn't carry the GT name; the labeler takes a
    * per-label name map from the document. */
  def labelDocument(
      cases: Seq[EvalCase],
      gtNames: Map[Int, String],
      hyperlinkSpans: Set[(Int, Int)],
      meta: ErrorMeta,
      containsUnknowns: Boolean,
      mode: String): Map[(Int, Int, Option[Int]), Set[String]] = {

    // root GT cases + false detections only (errors.py:20)
    val eligible = cases.filter(c => c.labelId.isEmpty || c.gtParent.isEmpty)
    val vs = eligible.map(new V(_, mode))
    val labels = mutable.Map.empty[Int, mutable.Set[String]] // index in vs → labels
    vs.indices.foreach(i => labels(i) = mutable.Set.empty)
    def add(i: Int, l: String): Unit = labels(i) += l

    def gtName(v: V): String =
      v.c.labelId.flatMap(gtNames.get).getOrElse(v.c.gtEntityId.getOrElse("Unknown"))

    // --- label_undetected_errors ---
    val fpSpans = vs.filter(_.nerFp).map(_.span)
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference && v.nerFn) {
        add(i, "NER_FN")
        if (isNonNamed(v.c.text)) add(i, "NER_FN_LOWERCASED")
        else if (fpSpans.exists(fp => isSubspan(v.span, fp))) add(i, "NER_FN_PARTIALLY_INCLUDED")
        else if (fpSpans.exists(fp => overlaps(v.span, fp))) add(i, "NER_FN_PARTIAL_OVERLAP")
        else add(i, "NER_FN_OTHER")
      }
    }

    // --- label_disambiguation_errors ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference && v.linkingFn && v.linkingFp) {
        add(i, "DISAMBIGUATION_WRONG")
        if (isDemonym(v, meta)) add(i, "DISAMBIGUATION_DEMONYM_WRONG")
        else if (isMetonymyError(v, meta)) add(i, "DISAMBIGUATION_METONYMY_WRONG")
        else if (isPartialName(v, gtName(v))) add(i, "DISAMBIGUATION_PARTIAL_NAME_WRONG")
        else if (isRare(v, meta) && v.c.predEntityId.exists(mostPopular(meta, v.c.text).contains))
          add(i, "DISAMBIGUATION_RARE_WRONG")
        else add(i, "DISAMBIGUATION_OTHER_WRONG")
      }
    }

    // --- label_false_detections ---
    val gtSpans = vs.filter(_.relevantGt(mode)).map(_.span)
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference && v.nerFp) {
        add(i, "NER_FP")
        val overlap = gtSpans.exists(g => overlaps(v.span, g))
        if (!overlap && isNonNamed(v.c.text)) add(i, "NER_FP_LOWERCASED")
        else if (!isNonNamed(v.c.text) &&
                 ((!overlap && !containsUnknowns) || (v.hasGt && v.gtUnknown)))
          add(i, "NER_FP_GROUNDTRUTH_UNKNOWN")
        else add(i, "NER_FP_OTHER")
      }
    }

    // --- label_candidate_errors ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference && v.nerTp) {
        if (v.linkingTp || v.trueIsCandidate) add(i, "DISAMBIGUATION_CANDIDATES_CORRECT")
        else if (v.linkingFn && v.linkingFp && !v.trueIsCandidate)
          add(i, "DISAMBIGUATION_CANDIDATES_WRONG")
      }
    }

    // --- label_multi_candidates ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference && v.hasGt && v.c.candidates.size > 1 && v.trueIsCandidate) {
        if (v.linkingTp) add(i, "DISAMBIGUATION_MULTI_CANDIDATES_CORRECT")
        else if (v.linkingFn && v.linkingFp) add(i, "DISAMBIGUATION_MULTI_CANDIDATES_WRONG")
      }
    }

    // --- label_hyperlink_errors ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (hyperlinkSpans.contains(v.span)) {
        if (v.linkingTp) add(i, "HYPERLINK_CORRECT")
        else if (v.linkingFn || v.linkingFp) add(i, "HYPERLINK_WRONG")
      }
    }

    // --- label_span_errors ---
    val gtSpanEntities = vs.filter(_.relevantGt(mode))
      .map(v => v.span -> (v.c.gtEntityId.getOrElse(""), v.c.gtTypes))
    vs.zipWithIndex.foreach { case (v, i) =>
      if (v.nerFp) {
        val hit = gtSpanEntities.exists { case (gs, (gid, gtypes)) =>
          gs != v.span && overlaps(v.span, gs) && (
            v.c.predEntityId.contains(gid) ||
              // is_true_quantity_or_datetime on FP case (errors.py:377-379)
              (v.c.predType.contains(if (gtypes.isEmpty) OTHER else gtypes.mkString("|")) &&
                (gtypes.contains(DATETIME) || gtypes.contains(QUANTITY))))
        }
        if (hit) add(i, "NER_FP_WRONG_SPAN")
      }
    }

    // --- label_coreference_errors ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (v.c.isCoreference) {
        if (v.nerFp) add(i, "COREFERENCE_FALSE_DETECTION")
        else if (v.nerFn) add(i, "COREFERENCE_UNDETECTED")
        else if (v.linkingFn && v.linkingFp) {
          val ref = (i - 1 to 0 by -1).iterator
            .map(j => (j, vs(j)))
            .find { case (_, u) =>
              u.c.mentionType == "ENTITY_NAMED" && u.hasGt &&
                u.c.gtEntityId == v.c.gtEntityId
            }
          ref match {
            case Some((_, u)) =>
              if (u.predKnown && u.c.predEntityId == v.c.predEntityId)
                add(i, "COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED")
              else add(i, "COREFERENCE_WRONG_MENTION_REFERENCED")
            case None => ()
          }
        }
      }
    }

    // --- label_correct ---
    vs.zipWithIndex.foreach { case (v, i) =>
      if (!v.c.isCoreference) {
        if (v.linkingTp) {
          add(i, "DISAMBIGUATION_CORRECT")
          if (isDemonym(v, meta)) add(i, "DISAMBIGUATION_DEMONYM_CORRECT")
          else if (isMetonymy(v, meta)) add(i, "DISAMBIGUATION_METONYMY_CORRECT")
          else if (isPartialName(v, gtName(v))) add(i, "DISAMBIGUATION_PARTIAL_NAME_CORRECT")
          else if (isRare(v, meta)) add(i, "DISAMBIGUATION_RARE_CORRECT")
          else add(i, "DISAMBIGUATION_OTHER_CORRECT")
        }
        if (v.nerTp) add(i, "AVOIDED_NER_FN")
        if ((v.nerTp || v.nerFp) && !labels(i).contains("NER_FP_WRONG_SPAN"))
          add(i, "AVOIDED_NER_FP_WRONG_SPAN")
        if (isNonNamed(v.c.text)) {
          if (v.nerTp) add(i, "AVOIDED_NER_FN_LOWERCASED")
        } else if (v.c.text.contains(' ')) {
          if ((v.nerTp || v.nerFn) && !labels(i).contains("NER_FN_PARTIALLY_INCLUDED"))
            add(i, "AVOIDED_NER_FN_PARTIALLY_INCLUDED")
        }
        if (!isNonNamed(v.c.text) && (v.nerTp || v.nerFn)) {
          if (!labels(i).contains("NER_FN_PARTIAL_OVERLAP")) add(i, "AVOIDED_NER_FN_PARTIAL_OVERLAP")
          if (!labels(i).contains("NER_FN_OTHER")) add(i, "AVOIDED_NER_FN_OTHER")
        }
        if (!isNonNamed(v.c.text) && v.hasGt && v.gtUnknown && !v.nerFp)
          add(i, "AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN")
      }
    }

    vs.zipWithIndex.map { case (v, i) =>
      (v.c.begin, v.c.end, v.c.labelId) -> labels(i).toSet
    }.toMap
  }
}
