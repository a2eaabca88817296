package graft.eval

import graft.eval.CaseModel._

/** Oracle linker — replays ground-truth labels as predictions (reference:
  * /root/reference/src/elevant/linkers/oracle_linker.py:6-39). Evaluating
  * oracle output must yield P = R = F1 = 1.0; this is the reference's
  * strongest end-to-end self-check and ours. */
object OracleLinker {

  def predictions(labels: Seq[GtLabel]): Seq[PredSpan] = {
    val byId = labels.map(l => l.id -> l).toMap
    def mk(l: GtLabel): PredSpan = {
      val id = if (isUnknownEntity(l.entityId)) NIL else l.entityId
      PredSpan(l.begin, l.end, id, Seq(id), "ORACLE")
    }
    val out = scala.collection.mutable.LinkedHashMap.empty[(Int, Int), PredSpan]
    labels.filter(_.parent.isEmpty).foreach { root =>
      if (!root.isOptional) out((root.begin, root.end)) = mk(root)
      else if (CaseLogic.hasNonOptionalChild(root, byId)) {
        // promote non-optional descendants of optional/descriptive parents
        val stack = scala.collection.mutable.Stack[Int](root.children: _*)
        while (stack.nonEmpty) {
          val child = byId(stack.pop())
          if (!child.isOptional) out((child.begin, child.end)) = mk(child)
          else if (CaseLogic.hasNonOptionalChild(child, byId)) stack.pushAll(child.children)
        }
      }
    }
    out.values.toSeq
  }

  def linkDocs(docs: Seq[EvalDoc]): Seq[EvalDoc] =
    docs.map(d => d.copy(predictions = predictions(d.labels)))
}
