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
