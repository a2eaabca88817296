package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Dataset

import graft.eval.CaseModel._
import graft.eval.OracleLinker
import graft.util.Json.esc

/** The reference's `link_benchmark.py:34-105` as one job: run a linker
  * over a benchmark's docs and write
  * `<experiment>.<benchmark>.linked_articles.jsonl` (article.to_json in
  * evaluation format — labels preserved, predictions as entity_mentions
  * sorted by span) plus the experiment metadata JSON. The output is
  * readable back by `BenchmarkReader.linkedArticles` and by the
  * reference's own evaluate.py, so a reference user can swap either side
  * of their link→evaluate loop.
  *
  * The linker runs distributed (the caller passes a docs→docs linking
  * function, e.g. built from BaselineLinker/PopularEntitiesLinker joins
  * or OracleLinker); only the final benchmark-sized file write is
  * driver-side, like the reference's single-process writer.
  */
object LinkBenchmark {

  /** One article.to_json line WITH entity_mentions (and hyperlinks when
    * present) — shared serializer in ArticleJson. */
  def toJsonLine(doc: EvalDoc, id: Long): String =
    ArticleJson.line(doc, id, withMentions = true)

  final case class Result(linkedFile: String, metadataFile: String, nArticles: Long)

  /** Link + write. `linker` maps the benchmark docs to docs carrying
    * predictions ("oracle" behavior = `withOracle`). */
  def run(
      docs: Dataset[EvalDoc],
      linker: Dataset[EvalDoc] => Dataset[EvalDoc],
      outDir: String,
      experimentName: String,
      benchmarkName: String,
      linkerName: String,
      description: String = "",
      timestamp: String = ""): Result = {
    val linked = linker(docs).collect().sortBy(_.url)
    Files.createDirectories(Paths.get(outDir))
    val lFile = s"$outDir/$experimentName.$benchmarkName.linked_articles.jsonl"
    val mFile = s"$outDir/$experimentName.$benchmarkName.metadata.json"
    val lines = linked.zipWithIndex
      .map { case (d, i) => toJsonLine(d, i.toLong) }
      .mkString("", "\n", "\n")
    Files.write(Paths.get(lFile), lines.getBytes(StandardCharsets.UTF_8))
    Files.write(Paths.get(mFile),
      (s"""{"experiment_name": "${esc(experimentName)}", """ +
        s""""experiment_description": "${esc(description)}", """ +
        s""""linker_name": "${esc(linkerName)}", """ +
        s""""timestamp": "${esc(timestamp)}"}""").getBytes(StandardCharsets.UTF_8))
    Result(lFile, mFile, linked.length.toLong)
  }

  /** The reference's oracle mode (link_benchmark.py:17-31
    * link_entities_with_oracle): every root GT label becomes a correct
    * prediction. */
  def withOracle(docs: Dataset[EvalDoc]): Dataset[EvalDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.map(d => d.copy(predictions = OracleLinker.predictions(d.labels)))
  }
}
