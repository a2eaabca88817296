package graft.kb

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Page
import graft.text.Extract

/** KB dimension-table builders — the reference's offline corpus scripts
  * re-expressed as Spark jobs (SURVEY §2.5 A1-A7, replacing
  * /root/reference/scripts/{get_link_frequencies,count_unigrams,
  * extract_title_synonyms}.py and the LMDB build in create_databases.py;
  * the stores become Parquet/DataFrame dimension tables joined by key —
  * the LMDB-point-lookup → equi-join inversion of SURVEY §1.3).
  */
object KbBuild {

  /** Exploded hyperlink relation: (url, link_text, norm_text, target). */
  def hyperlinks(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap { p =>
      val ex = Extract.processExtractorText(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      ex.hyperlinks.map(h => (p.url, ex.text.substring(h.begin, h.end),
        Extract.normalizeSurface(ex.text.substring(h.begin, h.end)), h.target))
    }.toDF("url", "link_text", "norm_text", "target")
  }

  /** A1 — link-frequency aggregation (get_link_frequencies.py:13-47):
    * count (link_text, entity) over all hyperlinks. Two-phase hash agg. */
  def linkFrequencies(pages: Dataset[Page]): DataFrame =
    hyperlinks(pages)
      .groupBy(col("norm_text").as("link_text"), col("target").as("entity_id"))
      .agg(count(lit(1)).as("freq"))

  /** A2 — most-popular candidate per alias, ties kept as a set
    * (create_databases.py:107-126). */
  def mostPopularCandidates(linkFreq: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("link_text")).orderBy(col("freq").desc)
    linkFreq
      .withColumn("rnk", rank().over(w))
      .where(col("rnk") === 1)
      .groupBy(col("link_text"))
      .agg(sort_array(collect_set(col("entity_id"))).as("candidates"),
        max(col("freq")).as("freq"))
  }

  /** A3 — corpus unigram counts (count_unigrams.py:12-31). */
  def unigramCounts(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap(p => Extract.tokenize(p.text)).toDF("token")
      .groupBy("token").agg(count(lit(1)).as("freq"))
  }

  /** A6 — family-name aliases: names with a space → last token → entity set
    * (entity_database.py:210-220). */
  def familyNameAliases(entities: DataFrame): DataFrame =
    entities
      .where(col("name").contains(" "))
      .withColumn("family_name", element_at(split(col("name"), " "), -1))
      .groupBy(col("family_name"))
      .agg(sort_array(collect_set(col("qid"))).as("qids"))

  /** A7 — title-synonym aggregation: bold-span texts per linked title
    * (extract_title_synonyms.py:11-33; "List of" pages excluded). */
  def titleSynonyms(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    pages.flatMap { p =>
      val ex = Extract.processExtractorText(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      ex.titleSynonyms.map(s => (ex.text.substring(s.begin, s.end), p.url))
    }.toDF("synonym", "url")
      .where(!col("synonym").startsWith("List of"))
      .groupBy(col("synonym"))
      .agg(sort_array(collect_set(col("url"))).as("urls"))
  }

  /** A4 — alias frequency: total link count per alias
    * (entity_database.py:394-398). */
  def aliasFrequency(linkFreq: DataFrame): DataFrame =
    linkFreq.groupBy(col("link_text").as("alias")).agg(sum(col("freq")).as("freq"))

  /** Alias → candidate-probability table: the relational kernel of the
    * spaCy-KB build loop (knowledge_base_creator.py:36-51 — per alias,
    * p(entity) = link frequency / alias total, uniform 1/n when the total
    * is zero, empty aliases skipped). The spaCy vocab/vector serialization
    * around it is model-bound (declared out of scope); this table is the
    * per-alias information the KB stores. One windowed pass over the
    * link-frequency dimension — no extra shuffle beyond the alias key.
    *
    * DECLARED DIVERGENCE (default mode): the reference first filters
    * candidates to `kb.contains_entity` — entities that got a word vector
    * (knowledge_base_creator.py:38-43) — BEFORE summing, so its
    * probabilities are normalized over the vector-backed candidate subset;
    * with vectors out of scope, the default here normalizes over the
    * UNFILTERED candidate set, and the two diverge whenever an alias has a
    * candidate without a vector. Pass `entityFilter` (a one-column
    * DataFrame of entity ids, the relational stand-in for contains_entity)
    * to reproduce the reference's filtered normalization exactly. */
  def aliasCandidateProbs(
      linkFreq: DataFrame,
      entityFilter: Option[DataFrame] = None): DataFrame = {
    val w = Window.partitionBy(col("link_text"))
    val candidates = entityFilter match {
      case Some(ents) =>
        // left-semi on the entity universe — the same candidate pruning
        // contains_entity does, as a join instead of a per-row dict probe
        linkFreq.join(
          ents.select(col(ents.columns(0)).as("entity_id")),
          Seq("entity_id"), "left_semi")
      case None => linkFreq
    }
    candidates
      .where(length(col("link_text")) > 0)
      .withColumn("total", sum(col("freq")).over(w))
      .withColumn("n_cands", count(lit(1)).over(w))
      .select(col("link_text").as("alias"), col("entity_id"),
        when(col("total") > 0, col("freq").cast("double") / col("total").cast("double"))
          .otherwise(lit(1.0) / col("n_cands").cast("double")).as("prob"))
  }

  /** A5 — entity frequency: total link count per entity
    * (entity_database.py:379-384). */
  def entityFrequency(linkFreq: DataFrame): DataFrame =
    linkFreq.groupBy(col("entity_id")).agg(sum(col("freq")).as("freq"))

  /** A8 — redirect extraction from raw dump lines: a `<title>` line
    * followed by a `#REDIRECT [[target]]` line (reference:
    * scripts/extract_redirects.py:19-57 — the sequential title/body
    * pairing becomes a per-line parse + self-pairing via lag). */
  def extractRedirects(rawLines: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("file")).orderBy(col("line_no"))
    rawLines
      .withColumn("title", regexp_extract(col("value"), "<title>(.*?)</title>", 1))
      .withColumn("redirect", regexp_extract(col("value"), "#REDIRECT\\s*\\[\\[(.*?)(?:\\||#|]])", 1))
      .withColumn("last_title", last(when(col("title") =!= "", col("title")), ignoreNulls = true).over(w))
      .where(col("redirect") =!= "")
      .select(col("last_title").as("from_title"), col("redirect").as("to_title"))
      .where(col("from_title").isNotNull)
  }

  /** J5/E2 — link-target → entity resolution with redirect chase: the
    * reference's two-step dict fallback (entity_database.py:345-356)
    * becomes two left joins + coalesce; the uppercase-first-letter
    * variant (wikipedia_dump_reader.py:49-54) is an initcap retry key. */
  def resolveTargets(links: DataFrame, title2qid: DataFrame, redirects: DataFrame): DataFrame = {
    // No broadcast() hints: title2qid/redirects are corpus-derived (~10^8
    // rows for a full wiki) — a forced hint overrides
    // autoBroadcastJoinThreshold and OOMs the driver at web scale. AQE
    // still broadcasts them when the measured size is under the threshold.
    val t2qDirect = title2qid.select(
      col("title").as("t_direct"), col("qid").as("qid_direct"))
    val red = redirects.select(
      col("from_title").as("r_from"), col("to_title").as("r_to"))
    val t2qRedir = title2qid.select(
      col("title").as("t_redir"), col("qid").as("qid_redir"))
    links
      // normalize: uppercase first letter (the wiki-title convention)
      .withColumn("norm_target",
        concat(upper(substring(col("target"), 1, 1)), substring(col("target"), 2, 1000000)))
      .join(t2qDirect, col("norm_target") === col("t_direct"), "left")
      .join(red, col("norm_target") === col("r_from"), "left")
      .join(t2qRedir, col("r_to") === col("t_redir"), "left")
      .withColumn("entity_id", coalesce(col("qid_direct"), col("qid_redir")))
      .drop("t_direct", "r_from", "r_to", "t_redir")
  }

  /** Acronym extraction (scripts/extract_akronyms.py:12-35): a hyperlink
    * followed within 10 chars by " (CAPS)..." yields acronym → target,
    * kept when 2 < len(acronym) <= word count of the link text (the
    * reference tokenizes with [\w']+). One narrow flatMap + one groupBy. */
  def extractAcronyms(pages: Dataset[Page]): DataFrame = {
    import pages.sparkSession.implicits._
    val AcronymRe = """ \(([A-Z]+)\).*""".r
    // (?U) = UNICODE_CHARACTER_CLASS: Python's \w is Unicode-aware, Java's
    // is ASCII-only by default — without the flag a fully non-ASCII link
    // text (CJK, accented) counts 0 words and drops acronyms the
    // reference keeps
    val WordRe = """(?U)[\w']+""".r
    pages.flatMap { p =>
      val ex = Extract.processExtractorText(new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
      val text = ex.text
      ex.hyperlinks.flatMap { h =>
        val after = text.substring(h.end, math.min(text.length, h.end + 10))
        AcronymRe.findPrefixMatchOf(after) match { // re.match = anchored prefix
          case Some(m) =>
            val acronym = m.group(1)
            val linkWords = WordRe.findAllIn(text.substring(h.begin, h.end)).length
            if (acronym.length > 2 && acronym.length <= linkWords)
              Some((acronym, h.target))
            else None
          case None => None
        }
      }
    }.toDF("acronym", "target")
      .groupBy(col("acronym"))
      .agg(sort_array(collect_set(col("target"))).as("targets"))
  }

  /** U1 — alias candidate table: union of the name / family-name /
    * link-text sources with provenance (entity_database.py:264-274). */
  def aliasTable(entities: DataFrame, linkFreq: DataFrame): DataFrame = {
    val names = entities.select(
      lower(col("name")).as("alias"), col("qid").as("entity_id"), lit("name").as("source"))
    val family = entities
      .where(col("name").contains(" "))
      .select(lower(element_at(split(col("name"), " "), -1)).as("alias"),
        col("qid").as("entity_id"), lit("family_name").as("source"))
    val links = linkFreq.select(
      col("link_text").as("alias"), col("entity_id"), lit("link").as("source"))
    names.unionByName(family).unionByName(links).distinct()
  }
}
