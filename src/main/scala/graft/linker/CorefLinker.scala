package graft.linker

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.eval.MentionTypes
import graft.model.Page

/** KB coreference linking (SURVEY §2.8 G4; reference:
  * /root/reference/src/elevant/linkers/kb_coref_linker.py:134-315).
  *
  * Two tiers:
  *
  *   - `resolve` — the KB-FREE degraded tier: pronoun mentions resolve to
  *     the nearest preceding linked mention, no agreement (for pipelines
  *     without gender/type dimensions).
  *   - `resolveTyped` — the reference's agreement tier: pronouns resolve
  *     to the nearest preceding linked mention of MATCHING GENDER
  *     (pronoun_finder.py's pronoun→gender table; UNKNOWN-gender pronouns
  *     match anything) within 200 chars, and "the/that/this <type>"
  *     nominals resolve to the nearest preceding entity whose
  *     coref-type aliases contain <type> within 300 chars
  *     (kb_coref_linker.py:201-315, COREF_PREFIXES/max_distance values
  *     kept). Resolved coref sites join the preceding-entity pool under
  *     the resolved entity (kb_coref_linker.py:296-305), so later
  *     references can bind to them.
  *
  * Declared divergences (SURVEY §7.4 positional-heuristic policy): the
  * reference's spaCy dependency conditions — nsubj preference, the
  * "problematic it" dependency check, direct-speech speaker binding, and
  * the neutral-paragraph-subject title rule — are replaced by
  * nearest-preceding order; the sentence-window (MAX_NUM_SENTS=-1 in the
  * reference, i.e. unbounded) is the char-distance cap alone.
  *
  * Scale: agreement data rides ON the linked-mention rows (joined
  * DataFrame columns, not a driver map), so the gender/type dimensions
  * can be corpus-sized; per-document resolution is one cogroup.
  */
object CorefLinker {

  final case class CorefMention(
      url: String,
      begin: Int,
      end: Int,
      surface: String,
      entity_id: String,
      referenced_begin: Int,
      referenced_end: Int)

  /** pronoun_finder.py:8-19 pronoun→gender table. */
  val PronounGenders: Map[String, String] = {
    val unknown = Seq("i", "my", "me", "myself", "mine", "you", "your", "yourself",
      "yours", "we", "us", "our", "ourselves", "ours", "yourselves",
      "they", "their", "them", "themselves", "theirs").map(_ -> "UNKNOWN")
    val male = Seq("he", "his", "him", "himself").map(_ -> "MALE")
    val female = Seq("she", "her", "herself", "hers").map(_ -> "FEMALE")
    val neutral = Seq("it", "its", "itself").map(_ -> "NEUTRAL")
    (unknown ++ male ++ female ++ neutral).toMap
  }

  /** kb_coref_linker.py:136. */
  val CorefPrefixes: Set[String] = Set("the", "that", "this")

  /** pronoun_finder.py:35-37 (case-sensitive by design). */
  def isFirstPersonSingular(text: String): Boolean =
    text == "I" || text == "my" || text == "me"

  /** Pronoun token occurrences (with offsets) in a text. */
  def pronounSpans(text: String): Seq[(Int, Int)] = {
    DictionaryNer.tokenSpans(text).collect {
      case (b, e) if MentionTypes.isPronoun(text.substring(b, e)) => (b, e)
    }
  }

  /** Degraded KB-free tier: every pronoun → nearest preceding linked
    * mention. linked: (url, begin, end, entity_id). */
  def resolve(pages: Dataset[Page], linked: DataFrame): Dataset[CorefMention] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val linkedDs = linked
      .select("url", "begin", "end", "entity_id")
      .as[(String, Int, Int, String)]
    val byUrl = linkedDs.groupByKey(_._1)
    val pagesByUrl = pages.groupByKey(_.url)
    pagesByUrl.cogroup(byUrl) { (url, pagesIt, linkedIt) =>
      pagesIt.toSeq.headOption match {
        case None => Iterator.empty
        case Some(page) =>
          val text = page.text
          val mentions = linkedIt.toSeq.sortBy(_._2)
          if (mentions.isEmpty) Iterator.empty
          else {
            val out = new ArrayBuffer[CorefMention]
            pronounSpans(text).foreach { case (b, e) =>
              val preceding = mentions.takeWhile(_._3 <= b)
              preceding.lastOption.foreach { case (_, mb, me, ent) =>
                out += CorefMention(url, b, e, text.substring(b, e), ent, mb, me)
              }
            }
            out.iterator
          }
      }
    }
  }

  private final case class PoolEntry(
      begin: Int, end: Int, entityId: String, gender: String, types: Set[String])

  /** The agreement tier. linkedTyped must carry
    * (url, begin, end, entity_id, gender STRING, type_aliases ARRAY<STRING>)
    * — gender null/missing → "UNKNOWN", aliases null → empty (use
    * enrichLinked to join the dimensions on). */
  def resolveTyped(
      pages: Dataset[Page],
      linkedTyped: DataFrame,
      pronounMaxDistance: Int = 200,
      nominalMaxDistance: Int = 300): Dataset[CorefMention] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val linkedDs = linkedTyped
      .select(col("url"), col("begin"), col("end"), col("entity_id"),
        coalesce(col("gender"), lit("UNKNOWN")).as("gender"),
        coalesce(col("type_aliases"), array()).as("type_aliases"))
      .as[(String, Int, Int, String, String, Seq[String])]
    val byUrl = linkedDs.groupByKey(_._1)
    val pagesByUrl = pages.groupByKey(_.url)
    pagesByUrl.cogroup(byUrl) { (url, pagesIt, linkedIt) =>
      pagesIt.toSeq.headOption match {
        case None => Iterator.empty
        case Some(page) =>
          val text = page.text
          val mentions = linkedIt.toSeq.sortBy(_._2)
            .map { case (_, b, e, id, g, ts) => PoolEntry(b, e, id, g, ts.toSet) }
          if (mentions.isEmpty) Iterator.empty
          else Iterator.from(resolveDocument(url, text, mentions,
            pronounMaxDistance, nominalMaxDistance))
      }
    }
  }

  /** Sequential per-document pass (kb_coref_linker.py:202-309 minus the
    * dependency-parse conditions). Exposed for spec-level testing. */
  private[graft] def resolveDocument(
      url: String,
      text: String,
      mentions: Seq[PoolEntry],
      pronounMaxDistance: Int,
      nominalMaxDistance: Int): Seq[CorefMention] = {
    val out = new ArrayBuffer[CorefMention]
    val pool = new ArrayBuffer[PoolEntry]
    val seenTypes = scala.collection.mutable.Set.empty[String]
    var mIdx = 0
    var prevTok: (Int, Int) = null

    def nearestMatching(spanBegin: Int, maxDist: Int)(matches: PoolEntry => Boolean): Option[PoolEntry] = {
      // The reference filters by agreement, scans newest-first, BREAKS at
      // the first entity beyond max distance, and falls back to the newest
      // (i == 0) unless an nsubj-dep entity appears later in the scan
      // (ref :180-186). With the nsubj preference dropped (declared
      // divergence) this reduces to: newest agreeing entity, None if it
      // is already out of range.
      pool.reverseIterator.find(matches).filter(_.end + maxDist >= spanBegin)
    }

    DictionaryNer.tokenSpans(text).foreach { case (tb, te) =>
      // admit AT MOST ONE linked mention per token (ref :231-232 uses `if`,
      // not `while`: when two linked mentions begin between consecutive
      // tokens, the second only joins the pool at the NEXT token)
      if (mIdx < mentions.length && tb >= mentions(mIdx).begin) {
        pool += mentions(mIdx)
        seenTypes ++= mentions(mIdx).types
        mIdx += 1
      }
      val tokText = text.substring(tb, te)
      var resolved: Option[(PoolEntry, Int, Int)] = None

      if (MentionTypes.isPronoun(tokText)) {
        val pGender = PronounGenders.getOrElse(tokText.toLowerCase, "UNKNOWN")
        if (pGender != "UNKNOWN" || isFirstPersonSingular(tokText)) {
          // gender agreement (ref :191-196): entity matches if its gender
          // equals the pronoun's, or the pronoun's gender is UNKNOWN
          nearestMatching(tb, pronounMaxDistance)(e =>
            e.gender == pGender || pGender == "UNKNOWN")
            .foreach(e => resolved = Some((e, tb, te)))
        }
      } else if (seenTypes.contains(tokText) && prevTok != null &&
        CorefPrefixes.contains(text.substring(prevTok._1, prevTok._2).toLowerCase)) {
        // "the <type>" nominal (ref :287-293); span includes the prefix
        val typ = tokText.toLowerCase
        nearestMatching(prevTok._1, nominalMaxDistance)(e => e.types.contains(typ))
          .foreach(e => resolved = Some((e, prevTok._1, te)))
      }

      resolved.foreach { case (e, sb, se) =>
        out += CorefMention(url, sb, se, text.substring(sb, se), e.entityId, e.begin, e.end)
        // the coref site joins the pool under the resolved entity (ref :296-303)
        pool += PoolEntry(sb, se, e.entityId, e.gender, e.types)
      }
      prevTok = (tb, te)
    }
    out.toSeq
  }

  /** Join gender + coref-type-alias dimensions onto linked mentions. The
    * alias table expands each entity's coref TYPE ids to the type
    * entities' lowercase alias words (kb_coref_linker.py:240-249: aliases
    * split on "/", lowercased). corefTypes: (entity_id, types
    * ARRAY<STRING> of type QIDs); typeEntityAliases: (entity_id, alias). */
  def enrichLinked(
      linked: DataFrame,
      genders: DataFrame,
      corefTypes: DataFrame,
      typeEntityAliases: DataFrame): DataFrame = {
    val typeAliasWords = corefTypes
      .select(col("entity_id"), explode(col("types")).as("type_id"))
      .join(typeEntityAliases.select(col("entity_id").as("type_id"), col("alias")), Seq("type_id"))
      .select(col("entity_id"), explode(split(lower(col("alias")), "/")).as("word"))
      .groupBy(col("entity_id"))
      .agg(sort_array(collect_set(col("word"))).as("type_aliases"))
    linked
      .join(genders.select(col("entity_id"), col("gender")), Seq("entity_id"), "left")
      .join(typeAliasWords, Seq("entity_id"), "left")
  }
}
