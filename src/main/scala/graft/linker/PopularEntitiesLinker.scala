package graft.linker

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Mention

/** Popular-entities linking (SURVEY T1; reference:
  * /root/reference/src/elevant/linkers/popular_entities_linker.py:246-259):
  * among an alias's candidates pick the entity with the highest sitelink
  * count, requiring count >= minScore; name/demonym-source candidates are
  * preferred over plain aliases at equal counts, and iteration order is
  * sorted — i.e. the total order is
  *   (sitelink desc, is_name_or_demonym_source desc, entity_id asc),
  * replicated exactly (the reference's `sorted(names)+sorted(candidates)`
  * with strictly-greater updates keeps the FIRST maximum — the smallest
  * id within the preferred source class).
  */
object PopularEntitiesLinker {

  /** aliases: (alias, entity_id, source) with source ∈ {name, demonym,
    * family_name, link, alias}; sitelinks: (entity_id, sitelinks). */
  def link(
      mentions: Dataset[Mention],
      aliases: DataFrame,
      sitelinks: DataFrame,
      minScore: Long = 0L): DataFrame = {
    val cands = aliases
      .withColumn("pref", when(col("source").isin("name", "demonym"), 1).otherwise(0))
      // no broadcast hint: sitelinks is corpus-sized at web scale; AQE
      // broadcasts it automatically when it measures small
      .join(sitelinks, Seq("entity_id"), "left")
      .withColumn("sitelinks", coalesce(col("sitelinks"), lit(0L)))
    val joined = mentions.toDF()
      .join(cands, col("norm_surface") === col("alias"))
      .where(col("sitelinks") >= minScore)
    val w = Window.partitionBy(col("mention_id"))
      .orderBy(col("sitelinks").desc, col("pref").desc, col("entity_id").asc)
    joined
      .withColumn("rn", row_number().over(w))
      .groupBy(col("url"), col("mention_id"), col("begin"), col("end"),
        col("surface"), col("gold_entity"))
      .agg(
        min_by(col("entity_id"), col("rn")).as("entity_id"),
        sort_array(collect_set(col("entity_id"))).as("candidates"))
  }

  final case class LowercaseDetection(begin: Int, end: Int, entity_id: String)

  /** Modest English stopword set standing in for spaCy's is_stop on the
    * first token of a candidate (declared divergence, SURVEY §7.4). */
  val DefaultStopwords: Set[String] = Set(
    "a", "an", "the", "this", "that", "these", "those", "some", "any",
    "and", "or", "but", "if", "of", "in", "on", "at", "to", "from", "by",
    "with", "as", "for", "is", "are", "was", "were", "be", "been", "being",
    "it", "its", "he", "she", "they", "we", "you", "i", "his", "her",
    "their", "our", "your", "my", "not", "no", "so", "than", "then",
    "there", "here", "when", "where", "which", "who", "what", "how", "all",
    "each", "both", "more", "most", "other", "such", "only", "own", "same",
    "very", "can", "will", "just", "do", "does", "did", "have", "has", "had")

  /** The reference's lowercase non-named detection pass
    * (popular_entities_linker.py:170-230): scan lowercase tokens, walk the
    * alias trie greedily with single-token backtracking and a
    * singular-form fallback ("...s" matches the stem,
    * is_snippet_variant_in_trie :235-240), skip spans overlapping an
    * already-linked entity, and keep the hit only if the entity clears
    * the sitelink threshold and has a non-OTHER type. Quirks preserved:
    * the consumed range is `i = j + 1` — one token PAST the matched span
    * is skipped; a hit failing the sitelink/type filter still consumes
    * (parts of it must not be re-linked). Declared divergences: the spaCy
    * POS "contains a NOUN" condition and spaCy's stopword list are
    * replaced by the stopword screen on the first token.
    *
    * trie: lowercase alias → entity id, as a sorted map (prefix queries
    * via ceiling lookups stand in for pygtrie's has_subtrie). Broadcast
    * by callers, same pattern as DictionaryNer. */
  def lowercaseDetections(
      text: String,
      trie: java.util.TreeMap[String, String],
      linkedSpans: Seq[(Int, Int)],
      sitelinks: Map[String, Long],
      entityTypes: Map[String, Seq[String]],
      minScore: Long = 0L,
      stopwords: Set[String] = DefaultStopwords): Seq[LowercaseDetection] = {
    def hasSubtrie(s: String): Boolean = {
      val k = trie.higherKey(s)
      k != null && k.startsWith(s)
    }
    def variantInTrie(s: String): Boolean =
      trie.containsKey(s) ||
        (s.nonEmpty && s.last == 's' && trie.containsKey(s.substring(0, s.length - 1)))
    def entityFromTrie(s: String): String =
      if (trie.containsKey(s)) trie.get(s) else trie.get(s.substring(0, s.length - 1))
    def isLowerWord(s: String): Boolean =
      s.exists(Character.isLetter) &&
        s.forall(c => !Character.isLetter(c) || Character.isLowerCase(c))

    val toks = DictionaryNer.tokenSpans(text)
    val out = scala.collection.mutable.ArrayBuffer.empty[LowercaseDetection]
    var i = 0
    while (i < toks.length) {
      val (tb, te0) = toks(i)
      val tokText = text.substring(tb, te0)
      if (!isLowerWord(tokText) || stopwords.contains(tokText)) i += 1
      else {
        var spanEnd = te0
        var snippet = tokText
        var lastInTrie: String = null
        var lastInTrieJ = -1
        var j = i + 1
        while (hasSubtrie(snippet) && j < toks.length) {
          val (_, newEnd) = toks(j)
          if (variantInTrie(snippet)) { lastInTrie = snippet; lastInTrieJ = j }
          snippet += text.substring(spanEnd, newEnd)
          spanEnd = newEnd
          j += 1
        }
        var matched = true
        if (variantInTrie(snippet)) ()
        else if (lastInTrie != null) { snippet = lastInTrie; j = lastInTrieJ }
        else matched = false

        if (!matched) i += 1
        else {
          val span = (tb, tb + snippet.length)
          val overlapsLinked = linkedSpans.exists(ls => span._1 < ls._2 && ls._1 < span._2)
          if (overlapsLinked) i += 1
          else {
            val entityId = entityFromTrie(snippet)
            if (sitelinks.getOrElse(entityId, 0L) >= minScore &&
              entityTypes.getOrElse(entityId, Seq("OTHER")) != Seq("OTHER")) {
              out += LowercaseDetection(span._1, span._2, entityId)
            }
            // reference: i = j + 1 — consumes one token past the match,
            // and consumes even when the sitelink/type filter rejected
            i = j + 1
          }
        }
      }
    }
    out.toSeq
  }
}
