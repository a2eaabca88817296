package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Dataset

import graft.eval.BenchmarkStatistics
import graft.eval.CaseModel._

/** The reference's `add_benchmark.py:16-68` as one job: any reader's
  * EvalDocs → per-label name/type enrichment from the entity dimension →
  * ours-JSONL benchmark file + metadata + benchmark statistics. All the
  * pieces (readers, dimension joins, statistics) exist individually; this
  * is the entry point that composes them, so converting a benchmark is one
  * call instead of hand-wiring.
  *
  * Output files mirror the reference:
  *   <name>.benchmark.jsonl   one article.to_json line per doc
  *   <name>.metadata.json     {name, description, timestamp}
  *
  * The final file write is driver-side by contract — benchmark files are
  * small (the reference streams them through one Python process); the
  * enrichment map and the statistics aggregations stay distributed.
  *
  * DECLARED DIVERGENCE (ordering): the reference preserves the input
  * file's article order and ids; this writer re-sorts by url and assigns
  * ids 0..n-1 in that order, because a Dataset has no stable input-line
  * order to preserve (EvalDoc deliberately carries no source line number).
  * Every reader and consumer in THIS engine keys articles by title/url, so
  * round-trips are unaffected; reference-side tooling that correlates
  * sibling files by id/line must not be pointed at files from this writer.
  */
object AddBenchmark {

  /** add_benchmark.py:39-46: unknown entities and QUANTITY/DATETIME labels
    * keep their annotations; every other label gets name and types from
    * the dimension (missing → "Unknown" / empty, like
    * entity_db.get_entity_name/get_entity_types). */
  def enrich(docs: Dataset[EvalDoc], meta: EntityMeta): Dataset[EvalDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val metaB = spark.sparkContext.broadcast(meta)
    docs.map { d =>
      d.copy(labels = d.labels.map { l =>
        if (isUnknownEntity(l.entityId) || l.isQuantity || l.isDatetime) l
        else l.copy(
          types = metaB.value.types.getOrElse(l.entityId, Nil),
          name = metaB.value.names.getOrElse(l.entityId, "Unknown"))
      })
    }
  }

  private def esc(s: String): String = graft.util.Json.esc(s)

  /** One article.to_json (evaluation format) line without predictions —
    * shared serializer in ArticleJson. */
  def toJsonLine(doc: EvalDoc, id: Long): String =
    ArticleJson.line(doc, id, withMentions = false)

  final case class Result(
      benchmarkFile: String,
      metadataFile: String,
      facts: Dataset[BenchmarkStatistics.LabelFact])

  /** Convert + write. Returns the written paths and the distributed
    * label-fact table feeding the statistics histograms. */
  def run(
      docs: Dataset[EvalDoc],
      meta: EntityMeta,
      outDir: String,
      name: String,
      description: String = "",
      timestamp: String = ""): Result = {
    val enriched = enrich(docs, meta)
    // deterministic file order: by url (readers key docs by title/url)
    val collected = enriched.collect().sortBy(_.url)
    Files.createDirectories(Paths.get(outDir))
    val bFile = s"$outDir/$name.benchmark.jsonl"
    val mFile = s"$outDir/$name.metadata.json"
    val lines = collected.zipWithIndex
      .map { case (d, i) => toJsonLine(d, i.toLong) }
      .mkString("", "\n", "\n")
    Files.write(Paths.get(bFile), lines.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(mFile),
      (s"""{"name": "${esc(name)}", "description": "${esc(description)}", """ +
        s""""timestamp": "${esc(timestamp)}"}""").getBytes(StandardCharsets.UTF_8))
    Result(bFile, mFile, BenchmarkStatistics.labelFacts(enriched, meta))
  }
}
