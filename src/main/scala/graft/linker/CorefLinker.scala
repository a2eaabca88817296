package graft.linker

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.eval.MentionTypes
import graft.model.Page

/** KB-free coreference linking — the dictionary/regex tier of the
  * reference's kb_coref_linker (SURVEY §2.8 G4;
  * /root/reference/src/elevant/linkers/kb_coref_linker.py:134-315). The
  * dependency-parse conditions (nsubj preference, direct-speech binding)
  * are replaced by documented positional heuristics per SURVEY §7.4:
  *
  *   - pronoun mentions (the reference's pronoun table) resolve to the
  *     NEAREST PRECEDING linked mention in the same document;
  *   - "the <word>" nominal mentions resolve the same way (the reference
  *     additionally checks type agreement against KB coref-types; without
  *     a typed KB the nearest-preceding rule is the declared fallback).
  *
  * Output rows carry the referenced span — the reference's
  * `referenced_span` back-pointer (models/entity_mention.py:4-19). The
  * cluster of mentions sharing a resolved entity id IS the reference's
  * coref cluster (kb_coref_linker.py:311-315).
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

  /** Pronoun token occurrences (with offsets) in a text. */
  def pronounSpans(text: String): Seq[(Int, Int)] = {
    DictionaryNer.tokenSpans(text).collect {
      case (b, e) if MentionTypes.isPronoun(text.substring(b, e)) => (b, e)
    }
  }

  /** linked: (url, begin, end, entity_id) rows of already-linked mentions. */
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
              // nearest preceding linked mention
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
}
