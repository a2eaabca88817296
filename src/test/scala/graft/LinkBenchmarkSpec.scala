package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.eval.Evaluation
import graft.pipeline.LinkBenchmark
import graft.sources.BenchmarkReader

/** link_benchmark.py analogue: benchmark → linker → linked_articles.jsonl.
  * The written file must round-trip through the standard linked-articles
  * reader and evaluate identically to the in-memory linked docs (oracle
  * mode ⇒ F1 = 1.0, the reference's own sanity gate). */
class LinkBenchmarkSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  test("oracle-linked kore50 written + re-read evaluates to F1=1.0 with identical counters") {
    val docs = BenchmarkReader.ourJsonl(
      spark, "/root/reference/benchmarks/kore50.benchmark.jsonl")
    val out = java.nio.file.Files.createTempDirectory("linkbench").toFile
    out.deleteOnExit()
    val res = LinkBenchmark.run(
      docs, LinkBenchmark.withOracle, out.getPath,
      experimentName = "oracle-rt", benchmarkName = "kore50", linkerName = "oracle")
    new java.io.File(res.linkedFile).deleteOnExit()
    new java.io.File(res.metadataFile).deleteOnExit()
    assert(res.nArticles == 50L)

    // evaluate the in-memory linked docs and the round-tripped file
    def countsOf(ds: org.apache.spark.sql.Dataset[EvalDoc]): Map[(String, String), (Long, Long, Long)] =
      Evaluation.counts(Evaluation.cases(ds, EntityMeta.empty), EntityMeta.empty)
        .collect()
        .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
    val inMem = countsOf(LinkBenchmark.withOracle(docs))
    val rt = countsOf(BenchmarkReader.linkedArticles(spark, res.linkedFile))
    assert(rt === inMem, "round-tripped counters differ from in-memory evaluation")

    val all = rt(("IGNORED", "all"))
    assert(all._1 > 0 && all._2 == 0L && all._3 == 0L,
      s"oracle linking must be fp=fn=0, got $all")

    // metadata file parses and carries the linker name
    val meta = ujsonLite.parse(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(res.metadataFile)), "UTF-8"))
    assert(meta("linker_name").str == "oracle")
    assert(meta("experiment_name").str == "oracle-rt")
  }

  test("hyperlinks survive the linked-articles round trip (hyperlink error labels need the spans)") {
    import spark.implicits._
    val doc = EvalDoc("hdoc", "Alpha beta gamma delta.", 0, 23,
      labels = Seq(GtLabel(0, 0, 5, "Q1", "Alpha", None, Nil, optionalFlag = false, Nil, None, desc = false)),
      predictions = Nil,
      hyperlinks = Seq(graft.model.Span(0, 5), graft.model.Span(11, 16)))
    val out = java.nio.file.Files.createTempDirectory("linkbench2").toFile
    out.deleteOnExit()
    val res = LinkBenchmark.run(spark.createDataset(Seq(doc)), LinkBenchmark.withOracle,
      out.getPath, "hl-rt", "synthetic", "oracle")
    new java.io.File(res.linkedFile).deleteOnExit()
    new java.io.File(res.metadataFile).deleteOnExit()
    val back = BenchmarkReader.linkedArticles(spark, res.linkedFile).collect()
    assert(back.length == 1)
    assert(back(0).hyperlinks === doc.hyperlinks,
      s"hyperlink spans lost: ${back(0).hyperlinks}")
    // and the benchmark writer path carries them too
    val res2 = graft.pipeline.AddBenchmark.run(
      spark.createDataset(Seq(doc)), EntityMeta.empty, out.getPath, "hl_bench")
    new java.io.File(res2.benchmarkFile).deleteOnExit()
    new java.io.File(res2.metadataFile).deleteOnExit()
    val back2 = BenchmarkReader.ourJsonl(spark, res2.benchmarkFile).collect()
    assert(back2(0).hyperlinks === doc.hyperlinks)
  }
}
