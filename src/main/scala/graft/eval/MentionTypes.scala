package graft.eval

import graft.eval.CaseModel._

/** Mention-type classification (reference:
  * /root/reference/src/elevant/evaluation/mention_type.py:7-80 and
  * utils/pronoun_finder.py:7-37). */
object MentionTypes {

  val Pronouns: Set[String] = Set(
    "i", "my", "me", "myself", "mine",
    "you", "your", "yourself", "yours",
    "he", "his", "him", "himself",
    "she", "her", "herself", "hers",
    "it", "its", "itself",
    "we", "us", "our", "ourselves", "ours",
    "yourselves",
    "they", "their", "them", "themselves", "theirs")

  /** Do not match "US" or "IT" but match "I". */
  def isPronoun(text: String): Boolean =
    Pronouns.contains(text.toLowerCase) &&
      (!(text.nonEmpty && text.forall(c => !Character.isLetter(c) || Character.isUpperCase(c)) &&
        text.exists(Character.isLetter)) || text.toLowerCase == "i")

  private val CorefPrefixes = Seq(
    "the ", "that ", "this ", "these ", "those ",
    "my ", "your ", "his ", "her ", "its ", "our ", "their ")

  def isNominal(mention: String): Boolean = {
    val lower = mention.toLowerCase
    CorefPrefixes.exists { prefix =>
      lower.startsWith(prefix) && mention.length > prefix.length &&
        !Character.isUpperCase(mention.charAt(prefix.length))
    }
  }

  /** NAMED iff the first alphabetic char of the entity NAME is uppercase. */
  def entityMentionType(entityName: String, entityId: Option[String]): String = {
    val unknown = entityId match {
      case Some(id) => isUnknownEntity(id)
      case None => entityName == "Unknown"
    }
    if (unknown) "ENTITY_UNKNOWN"
    else {
      val firstAlpha = entityName.find(Character.isLetter)
      firstAlpha match {
        case Some(c) if Character.isUpperCase(c) => "ENTITY_NAMED"
        case _ => "ENTITY_NON_NAMED"
      }
    }
  }

  /** reference: get_mention_type (mention_type.py:66-80). */
  def mentionType(
      mention: String,
      gt: Option[GtLabel],
      predId: Option[String],
      meta: EntityMeta): String = {
    gt match {
      case Some(label) if label.coref.isDefined =>
        if (label.coref.contains(false)) entityMentionType(label.name, Some(label.entityId))
        else if (isPronoun(mention)) "COREF_PRONOMINAL"
        else "COREF_NOMINAL"
      case _ =>
        if (isPronoun(mention)) "COREF_PRONOMINAL"
        else if (isNominal(mention)) "COREF_NOMINAL"
        else {
          val (name, id) = gt match {
            case Some(label) => (label.name, Some(label.entityId))
            case None => (predId.map(meta.name).getOrElse("Unknown"), predId)
          }
          entityMentionType(name, id)
        }
    }
  }
}
