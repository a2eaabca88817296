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
}
