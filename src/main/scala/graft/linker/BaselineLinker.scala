package graft.linker

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Mention

/** Reference-parity linkers: mention → entity via the KB dimension tables.
  *
  * BaselineLinker = the reference's "wikipedia strategy"
  * (/root/reference/src/elevant/linkers/baseline_linker.py:76-80): look the
  * mention text up in the most-popular-candidates table and take the
  * MINIMUM entity id among ties — the reference's determinism trick,
  * replicated exactly (`min(candidates)` ↔ array_min after sort).
  *
  * PriorLinker = argmax by link frequency with entity-id tie-break
  * (prior_linker.py:110-113 → SURVEY T2), as one max_by-shaped window.
  *
  * Neither join carries a broadcast() hint: the alias tables derive from
  * the corpus (tens of GB at web scale), and a forced hint overrides
  * autoBroadcastJoinThreshold — AQE picks broadcast when the measured build
  * side is small and shuffle-hash/sort-merge otherwise.
  */
object BaselineLinker {

  /** mentions ⋈ mostPopularCandidates on normalized surface; prediction =
    * min of the tied top candidates; is_date mentions dropped
    * (baseline_linker.py:74) — via codegen'd `rlike` on the anchored
    * Extract.DateRe port, not a row-at-a-time UDF. */
  def linkMostPopular(mentions: Dataset[Mention], mostPopular: DataFrame): DataFrame = {
    mentions.toDF()
      .where(!col("surface").rlike(graft.text.Extract.DateReAnchored))
      .join(mostPopular, col("norm_surface") === col("link_text"), "inner")
      .select(
        col("url"), col("mention_id"), col("begin"), col("end"), col("surface"),
        col("gold_entity"),
        array_min(col("candidates")).as("entity_id"),
        col("candidates"))
  }

  /** Argmax link frequency per (mention, alias) with total ordering
    * (freq desc, entity_id asc) — deterministic under any partitioning. */
  def linkByPrior(mentions: Dataset[Mention], linkFreq: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("mention_id"))
      .orderBy(col("freq").desc, col("entity_id").asc)
    mentions.toDF()
      .join(linkFreq, col("norm_surface") === col("link_text"), "inner")
      .withColumn("rn", row_number().over(w))
      .groupBy(col("url"), col("mention_id"), col("begin"), col("end"),
        col("surface"), col("gold_entity"))
      .agg(
        min_by(col("entity_id"), col("rn")).as("entity_id"),
        sort_array(collect_set(col("entity_id"))).as("candidates"))
  }

  /** Micro accuracy of a linker output vs the gold hyperlink targets. */
  def accuracy(linked: DataFrame): DataFrame =
    linked.agg(
      count(lit(1)).as("n_linked"),
      sum(when(col("entity_id") === col("gold_entity"), 1L).otherwise(0L)).as("n_correct"))
}
