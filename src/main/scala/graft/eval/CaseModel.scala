package graft.eval

/** Evaluation data model — the reference's GroundtruthLabel / EntityMention /
  * Case re-expressed as Spark-encodable case classes
  * (/root/reference/src/elevant/evaluation/groundtruth_label.py:4-75,
  * case.py:78-105). */
object CaseModel {

  val NIL = "<NIL>"
  val NO_MAPPING = "<NO_MAPPING>"
  val QUANTITY = "QUANTITY"
  val DATETIME = "DATETIME"
  val OTHER = "OTHER"

  def isUnknownEntity(id: String): Boolean = id == NIL || id == NO_MAPPING

  /** Ground-truth label (types pipe-joined in the reference; a Seq here). */
  final case class GtLabel(
      id: Int,
      begin: Int,
      end: Int,
      entityId: String,
      name: String,
      parent: Option[Int],
      children: Seq[Int],
      optionalFlag: Boolean,
      types: Seq[String],
      coref: Option[Boolean],
      desc: Boolean) {
    def typeStr: String = if (types.isEmpty) OTHER else types.mkString("|")
    def isQuantity: Boolean = types.contains(QUANTITY)
    def isDatetime: Boolean = types.contains(DATETIME)
    /** reference: groundtruth_label.py:30-31 */
    def isOptional: Boolean = optionalFlag || isQuantity || isDatetime || desc
  }

  /** A predicted mention attached to a document. */
  final case class PredSpan(
      begin: Int,
      end: Int,
      entityId: String,
      candidates: Seq[String],
      predictedBy: String)

  /** One evaluation case = (GT label ∪ predicted span). Eval types are
    * per-mode sorted lists of "TP"/"FP"/"FN" strings (reference:
    * case.py:107-311). */
  final case class EvalCase(
      url: String,
      begin: Int,
      end: Int,
      text: String,
      labelId: Option[Int],
      gtEntityId: Option[String],
      gtParent: Option[Int],
      gtTypes: Seq[String],
      optional: Boolean,
      predEntityId: Option[String],
      predType: Option[String],
      candidates: Seq[String],
      predictedBy: Option[String],
      mentionType: String,
      factor: Int,
      linkingIgnored: Seq[String],
      linkingRequired: Seq[String],
      nerIgnored: Seq[String],
      nerRequired: Seq[String],
      errorsIgnored: Seq[String] = Nil,
      errorsRequired: Seq[String] = Nil) {
    def isCoreference: Boolean =
      mentionType == "COREF_NOMINAL" || mentionType == "COREF_PRONOMINAL"
  }

  /** Per-document article for evaluation (benchmark side). Hyperlink spans
    * feed the HYPERLINK_* error labels (errors.py:328-336). */
  final case class EvalDoc(
      url: String,
      text: String,
      evalBegin: Int,
      evalEnd: Int,
      labels: Seq[GtLabel],
      predictions: Seq[PredSpan],
      hyperlinks: Seq[graft.model.Span] = Nil)

  /** KB metadata needed by case generation: entity → whitelist types, and
    * the QUANTITY/DATETIME id sets (reference: entity_database
    * get_entity_types / is_quantity / is_datetime). */
  final case class EntityMeta(
      types: Map[String, Seq[String]],
      quantities: Set[String],
      datetimes: Set[String],
      names: Map[String, String] = Map.empty) {
    /** reference: case_generator.py:50-64 */
    def determineType(entityId: String): String =
      if (quantities.contains(entityId)) QUANTITY
      else if (datetimes.contains(entityId)) DATETIME
      else {
        val t = types.getOrElse(entityId, Nil)
        if (t.nonEmpty) t.mkString("|") else OTHER
      }
    def name(entityId: String): String = names.getOrElse(entityId, "Unknown")
  }
  object EntityMeta { val empty: EntityMeta = EntityMeta(Map.empty, Set.empty, Set.empty) }
}
