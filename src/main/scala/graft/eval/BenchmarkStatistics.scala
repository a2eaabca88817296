package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.eval.CaseModel._

/** A12 — benchmark statistics as Catalyst aggregations (reference:
  * /root/reference/src/elevant/evaluation/benchmark_statistics.py:19-150).
  *
  * Per-label facts are computed in one narrow flatMap; every histogram is a
  * groupBy over the exploded fact table. Word/sentence counts use the
  * rule-based tokenizer + [.!?] sentence splitting (spaCy divergence,
  * SURVEY §7.4); everything else (mention types, type histogram,
  * multi-word histogram, case/unknown/root tags) is exact and
  * golden-tested against the reference's shipped
  * benchmarks/<b>.benchmark_statistics.jsonl. */
object BenchmarkStatistics {

  final case class LabelFact(
      url: String,
      mentionType: String,
      types: Seq[String],
      wordCount: Int,
      tags: Seq[String])

  def labelFacts(docs: Dataset[EvalDoc], meta: EntityMeta): Dataset[LabelFact] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val metaB = spark.sparkContext.broadcast(meta)
    docs.flatMap { d =>
      d.labels.map { l =>
        val mention = d.text.substring(
          math.max(0, l.begin), math.min(d.text.length, l.end))
        val mt = MentionTypes.mentionType(mention, Some(l), None, metaB.value)
        val tags = Seq.newBuilder[String]
        if (mention.nonEmpty && Character.isUpperCase(mention.charAt(0))) tags += "capitalized"
        else if (mention.nonEmpty && Character.isLowerCase(mention.charAt(0))) {
          tags += "lowercased"
          if (mt == "ENTITY_NON_NAMED") tags += "lowercased_non_named"
        } else tags += "non_alpha"
        if (l.isOptional) tags += "optional"
        if (isUnknownEntity(l.entityId)) tags += "unknown"
        if (l.entityId == NIL) tags += "unknown_nil"
        else if (l.entityId == NO_MAPPING) tags += "unknown_no_mapping"
        tags += (if (l.parent.isEmpty) "root" else "child")
        LabelFact(d.url, mt.toLowerCase,
          (if (l.types.isEmpty) Seq(OTHER) else l.types),
          mention.split(" ", -1).length, tags.result())
      }
    }
  }

  def mentionTypeHistogram(facts: Dataset[LabelFact]): DataFrame =
    facts.toDF().groupBy(col("mentionType").as("mention_type"))
      .agg(count(lit(1)).as("n"))

  def typeHistogram(facts: Dataset[LabelFact]): DataFrame =
    facts.toDF().select(explode(col("types")).as("type"))
      .groupBy("type").agg(count(lit(1)).as("n"))

  def multiWordHistogram(facts: Dataset[LabelFact]): DataFrame =
    facts.toDF().groupBy(col("wordCount").as("word_count"))
      .agg(count(lit(1)).as("n"))

  def tagHistogram(facts: Dataset[LabelFact]): DataFrame =
    facts.toDF().select(explode(col("tags")).as("tag"))
      .groupBy("tag").agg(count(lit(1)).as("n"))

  /** Text statistics: articles, labels, words, sentences (rule-based). */
  def textStatistics(docs: Dataset[EvalDoc]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map { d =>
      val span = d.text.substring(math.max(0, d.evalBegin), math.min(d.text.length, d.evalEnd))
      val words = graft.text.Extract.tokenize(span).size.toLong
      val sents = span.count(c => c == '.' || c == '!' || c == '?').toLong.max(if (span.trim.nonEmpty) 1L else 0L)
      (1L, d.labels.size.toLong, words, sents)
    }.toDF("articles", "labels", "words", "sents")
      .agg(sum("articles").as("articles"), sum("labels").as("labels"),
        sum("words").as("words"), sum("sents").as("sents"))
  }
}
