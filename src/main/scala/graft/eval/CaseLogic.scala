package graft.eval

import scala.collection.mutable

import graft.eval.CaseModel._
import graft.text.Extract

/** Per-document evaluation-case logic — the reference's CaseGenerator +
  * Case decision tables as pure functions
  * (/root/reference/src/elevant/evaluation/case_generator.py:65-343,
  * case.py:107-311). Runs inside a per-url flatMap; everything here is
  * deterministic and independent of partitioning.
  */
object CaseLogic {

  final val Ignored = "IGNORED"
  final val Required = "REQUIRED"
  val Modes: Seq[String] = Seq(Ignored, Required)

  /** Inputs the decision table reads (one evaluation case, one mode). */
  final case class CaseView(
      factor: Int,
      gt: Option[GtLabel],
      predId: Option[String],
      predType: Option[String],
      optional: Boolean,
      hasNonOptionalChildren: Boolean,
      childLinking: Option[Map[String, Set[String]]],
      childNer: Option[Map[String, Set[String]]]) {

    def hasGroundTruth: Boolean = gt.isDefined
    def hasPrediction: Boolean = predId.isDefined
    def predictionIsKnown: Boolean = predId.exists(id => !isUnknownEntity(id))
    def gtHasKnownEntityId: Boolean =
      gt.exists(l => !isUnknownEntity(l.entityId) && !l.isDatetime && !l.isQuantity)
    def gtIsDatetimeOrQuantity: Boolean = gt.exists(l => l.isQuantity || l.isDatetime)
    /** case.py:362-364: same pipe-joined type AND gt is quantity/datetime */
    def isTrueQuantityOrDatetime: Boolean =
      gt.exists(l => predId.isDefined && predType.contains(l.typeStr) && (l.isQuantity || l.isDatetime))
  }

  /** Linking eval types for one mode (case.py:121-222 verbatim logic). */
  def linkingEvalTypes(c: CaseView, mode: String): Seq[String] = {
    if (c.factor == 0) {
      c.childLinking match {
        case None => Nil
        case Some(byMode) =>
          val s = byMode.getOrElse(mode, Set.empty)
          if (s.contains("FN")) Seq("FN")
          else if (s.contains("TP") && s.size == 1) Seq("TP")
          else Nil
      }
    } else if (!c.hasGroundTruth) {
      if (c.hasPrediction) {
        if (mode == Ignored && !c.predictionIsKnown) Nil else Seq("FP")
      } else Nil
    } else if (!c.hasPrediction) {
      if (c.optional && !c.hasNonOptionalChildren) Nil
      else if (mode == Ignored && !c.gtHasKnownEntityId) Nil
      else Seq("FN")
    } else if (c.optional) {
      if (c.predictionIsKnown) {
        if ((c.gtHasKnownEntityId && c.gt.get.entityId == c.predId.get) || c.isTrueQuantityOrDatetime) Nil
        else Seq("FP")
      } else {
        if ((c.gtHasKnownEntityId || c.gtIsDatetimeOrQuantity) && mode == Required) Seq("FP")
        else Nil
      }
    } else if (c.gtHasKnownEntityId) {
      if (c.predictionIsKnown) {
        if (c.gt.get.entityId == c.predId.get) Seq("TP") else Seq("FN", "FP")
      } else {
        if (mode == Ignored) Seq("FN") else Seq("FN", "FP")
      }
    } else {
      if (c.predictionIsKnown) {
        if (mode == Ignored) Seq("FP") else Seq("FN", "FP")
      } else {
        if (mode == Ignored) Nil else Seq("TP")
      }
    }
  }

  /** NER eval types for one mode (case.py:224-311 verbatim logic). */
  def nerEvalTypes(c: CaseView, mode: String): Seq[String] = {
    if (c.factor == 0) {
      c.childNer match {
        case None => Nil
        case Some(byMode) =>
          val s = byMode.getOrElse(mode, Set.empty)
          if (s.contains("FN")) Seq("FN")
          else if (s.contains("TP") && s.size == 1) Seq("TP")
          else Nil
      }
    } else if (!c.hasGroundTruth) {
      if (c.hasPrediction) {
        if (mode == Ignored && !c.predictionIsKnown) Nil else Seq("FP")
      } else Nil
    } else if (!c.hasPrediction) {
      if (c.optional && !c.hasNonOptionalChildren) Nil
      else if (mode == Ignored && !c.gtHasKnownEntityId) Nil
      else Seq("FN")
    } else if (c.optional) {
      if (!(c.gtHasKnownEntityId || c.gtIsDatetimeOrQuantity) && c.predictionIsKnown && mode == Ignored)
        Seq("FP")
      else Nil
    } else if (c.gtHasKnownEntityId) {
      if (c.predictionIsKnown) Seq("TP")
      else if (mode == Ignored) Seq("FN")
      else Seq("TP")
    } else {
      if (c.predictionIsKnown) {
        if (mode == Ignored) Seq("FP") else Seq("TP")
      } else {
        if (mode == Ignored) Nil else Seq("TP")
      }
    }
  }

  /** reference: groundtruth_label.py:69-75 */
  def hasNonOptionalChild(label: GtLabel, byId: Map[Int, GtLabel]): Boolean =
    label.children.exists { cid =>
      byId.get(cid).exists(c => !c.isOptional || hasNonOptionalChild(c, byId))
    }

  /** Factor recursion — character-exact port of
    * case_generator.py:212-343 (incl. the sibling lookahead and the
    * "don't overwrite while determining siblings" rule). */
  final class FactorComputer(
      text: String,
      byId: Map[Int, GtLabel],
      allPredictions: Map[(Int, Int), PredSpan]) {
    val factorDict: mutable.Map[Int, Int] = mutable.Map.empty

    private def predFor(label: GtLabel): Option[String] = {
      val span = (label.begin, label.end)
      val expanded = Extract.wordBoundary(label.begin, label.end, text)
      allPredictions.get(span).orElse(allPredictions.get(expanded)).map(_.entityId)
    }

    def determine(labelId: Int, determiningSiblings: Boolean = false): Int = {
      val label = byId(labelId)
      val predEntityId = predFor(label)

      val correct = predEntityId.exists(pid =>
        pid.nonEmpty && (label.entityId == pid ||
          (isUnknownEntity(label.entityId) && isUnknownEntity(pid))))
      if (predEntityId.exists(_.nonEmpty) && correct) {
        if (!determiningSiblings) factorDict(labelId) = 1
        return 1
      }

      var biggestChildFactor = 0
      label.children.foreach { cid =>
        biggestChildFactor = math.max(biggestChildFactor, determine(cid))
      }

      if (label.parent.isEmpty) {
        val factor = if (biggestChildFactor == 0) 1 else 0
        if (!determiningSiblings) factorDict(labelId) = factor
        factor
      } else {
        var factor = 0
        val parentSpan = byId(label.parent.get)
        if (predEntityId.exists(_.nonEmpty) && biggestChildFactor == 0 &&
            Extract.wordBoundary(parentSpan.begin, parentSpan.end, text) !=
              Extract.wordBoundary(label.begin, label.end, text)) {
          factor = 1
        } else if (predEntityId.isEmpty && !determiningSiblings && biggestChildFactor == 0) {
          val siblings = byId(label.parent.get).children.filterNot(_ == labelId)
          val it = siblings.iterator
          var found = false
          while (it.hasNext && !found) {
            if (determine(it.next(), determiningSiblings = true) > 0) { factor = 1; found = true }
          }
        }
        if (!determiningSiblings) factorDict(labelId) = factor
        math.max(biggestChildFactor, factor)
      }
    }
  }

  /** Full per-document case generation (case_generator.py:65-210):
    * span-join GT labels with predictions (raw + word-boundary-expanded
    * keys), factor recursion, potential-false-detection cases, and the
    * root re-derivation from child eval types. */
  def generateCases(
      doc: EvalDoc,
      meta: EntityMeta,
      errMeta: ErrorLabeler.ErrorMeta = ErrorLabeler.ErrorMeta(),
      containsUnknowns: Boolean = true): Seq[EvalCase] = {
    val text = doc.text
    val byId = doc.labels.map(l => l.id -> l).toMap

    // predictions keyed by raw span, then expanded spans overriding
    // (dict.update order in the reference); iterate span-sorted for
    // determinism
    val sortedPreds = doc.predictions.sortBy(p => (p.begin, p.end))
    val raw = sortedPreds.map(p => (p.begin, p.end) -> p)
    val expanded = sortedPreds.map(p => Extract.wordBoundary(p.begin, p.end, text) -> p)
    val allPredictions: Map[(Int, Int), PredSpan] = (raw ++ expanded).toMap

    val groundTruthSpans: Set[(Int, Int)] =
      doc.labels.flatMap(l => Seq((l.begin, l.end), Extract.wordBoundary(l.begin, l.end, text))).toSet

    val fc = new FactorComputer(text, byId, allPredictions)

    val rootLabels = doc.labels.filter(_.parent.isEmpty).sortBy(_.id)
    val childLabels = doc.labels.filter(_.parent.isDefined).sortBy(_.id)

    // intermediate mutable view per GT label
    final case class GtCase(
        label: GtLabel,
        pred: Option[PredSpan],
        var factor: Int,
        var hasNonOptChildren: Boolean = false,
        var childLinking: Option[Map[String, Set[String]]] = None,
        var childNer: Option[Map[String, Set[String]]] = None)

    val gtCases = mutable.LinkedHashMap.empty[Int, GtCase]
    (rootLabels ++ childLabels).foreach { label =>
      val span = (label.begin, label.end)
      val exp = Extract.wordBoundary(label.begin, label.end, text)
      val pred = allPredictions.get(span).orElse(allPredictions.get(exp))
      val factor =
        if (label.parent.isEmpty) fc.determine(label.id)
        else fc.factorDict.getOrElse(label.id, 0)
      gtCases(label.id) = GtCase(label, pred, factor)
    }

    def view(g: GtCase): CaseView = CaseView(
      factor = g.factor,
      gt = Some(g.label),
      predId = g.pred.map(_.entityId),
      predType = g.pred.map(p => meta.determineType(p.entityId)),
      optional = g.label.isOptional,
      hasNonOptionalChildren = g.hasNonOptChildren,
      childLinking = g.childLinking,
      childNer = g.childNer)

    // reevaluate_root_gt_cases (case_generator.py:162-210): child eval
    // types for factor-0 roots, has_non_optional_children for optionals
    def relevantChildEvalTypes(label: GtLabel): (Map[String, Set[String]], Map[String, Set[String]]) = {
      var linking = Map(Ignored -> Set.empty[String], Required -> Set.empty[String])
      var ner = Map(Ignored -> Set.empty[String], Required -> Set.empty[String])
      label.children.foreach { cid =>
        val childLabel = byId(cid)
        val (cl, cn) = relevantChildEvalTypes(childLabel)
        linking = Modes.map(m => m -> (linking(m) ++ cl(m))).toMap
        ner = Modes.map(m => m -> (ner(m) ++ cn(m))).toMap
        val g = gtCases(cid)
        if (g.factor != 0) {
          val v = view(g)
          linking = Modes.map(m => m -> (linking(m) ++ linkingEvalTypes(v, m))).toMap
          ner = Modes.map(m => m -> (ner(m) ++ nerEvalTypes(v, m))).toMap
        }
      }
      (linking, ner)
    }

    gtCases.values.filter(_.label.parent.isEmpty).foreach { g =>
      if (g.label.children.nonEmpty) {
        if (g.label.isOptional)
          g.hasNonOptChildren = hasNonOptionalChild(g.label, byId)
        if (g.factor == 0) {
          val (cl, cn) = relevantChildEvalTypes(g.label)
          g.childLinking = Some(cl)
          g.childNer = Some(cn)
        }
      }
    }

    val gtEvalCases = gtCases.values.toSeq.map { g =>
      val v = view(g)
      val label = g.label
      EvalCase(
        url = doc.url,
        begin = label.begin,
        end = label.end,
        text = text.substring(math.max(0, label.begin), math.min(text.length, label.end)),
        labelId = Some(label.id),
        gtEntityId = Some(label.entityId),
        gtParent = label.parent,
        gtTypes = label.types,
        optional = label.isOptional,
        predEntityId = g.pred.map(_.entityId),
        predType = g.pred.map(p => meta.determineType(p.entityId)),
        candidates = g.pred.map(_.candidates.sorted).getOrElse(Nil),
        predictedBy = g.pred.map(_.predictedBy),
        mentionType = MentionTypes.mentionType(
          text.substring(math.max(0, label.begin), math.min(text.length, label.end)),
          Some(label), g.pred.map(_.entityId), meta),
        factor = g.factor,
        linkingIgnored = linkingEvalTypes(v, Ignored).sorted,
        linkingRequired = linkingEvalTypes(v, Required).sorted,
        nerIgnored = nerEvalTypes(v, Ignored).sorted,
        nerRequired = nerEvalTypes(v, Required).sorted)
    }

    // potential false detections (case_generator.py:136-158)
    val fdCases = sortedPreds.flatMap { p =>
      val span = (p.begin, p.end)
      val exp = Extract.wordBoundary(p.begin, p.end, text)
      val inside = p.begin >= doc.evalBegin && p.end <= doc.evalEnd
      if (!groundTruthSpans.contains(span) && !groundTruthSpans.contains(exp) &&
          p.entityId != null && inside) {
        val v = CaseView(1, None, Some(p.entityId), Some(meta.determineType(p.entityId)),
          optional = false, hasNonOptionalChildren = false, None, None)
        val surface = text.substring(math.max(0, p.begin), math.min(text.length, p.end))
        Some(EvalCase(
          url = doc.url, begin = p.begin, end = p.end, text = surface,
          labelId = None, gtEntityId = None, gtParent = None, gtTypes = Nil,
          optional = false,
          predEntityId = Some(p.entityId),
          predType = Some(meta.determineType(p.entityId)),
          candidates = p.candidates.sorted,
          predictedBy = Some(p.predictedBy),
          mentionType = MentionTypes.mentionType(surface, None, Some(p.entityId), meta),
          factor = 1,
          linkingIgnored = linkingEvalTypes(v, Ignored).sorted,
          linkingRequired = linkingEvalTypes(v, Required).sorted,
          nerIgnored = nerEvalTypes(v, Ignored).sorted,
          nerRequired = nerEvalTypes(v, Required).sorted))
      } else None
    }

    val sortedCases = (gtEvalCases ++ fdCases).sortBy(c => (c.begin, c.end))

    // error-category labeling per mode (errors.py:14-28; root-GT + FD
    // cases only — child labels keep empty error sets)
    val gtNames = doc.labels.map(l => l.id -> l.name).toMap
    val linkSpans = doc.hyperlinks.map(h => (h.begin, h.end)).toSet
    val errIgn = ErrorLabeler.labelDocument(sortedCases, gtNames, linkSpans, errMeta, containsUnknowns, Ignored)
    val errReq = ErrorLabeler.labelDocument(sortedCases, gtNames, linkSpans, errMeta, containsUnknowns, Required)
    sortedCases.map { c =>
      val key = (c.begin, c.end, c.labelId)
      c.copy(
        errorsIgnored = errIgn.getOrElse(key, Set.empty).toSeq.sorted,
        errorsRequired = errReq.getOrElse(key, Set.empty).toSeq.sorted)
    }
  }
}
