package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.BenchmarkStatistics
import graft.eval.CaseModel._
import graft.sources.BenchmarkReader

/** A12 golden parity: histograms vs the reference's shipped
  * benchmarks/kore50.benchmark_statistics.jsonl (mention types, type
  * histogram, multi-word histogram, exact tags; spaCy-dependent
  * word/sent counts excluded per SURVEY §7.4). */
class BenchmarkStatsSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private lazy val golden = ujsonLite.parse(new String(
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      "/root/reference/benchmarks/kore50.benchmark_statistics.jsonl")), "UTF-8"))

  private lazy val facts = BenchmarkStatistics.labelFacts(
    BenchmarkReader.ourJsonl(spark, "/root/reference/benchmarks/kore50.benchmark.jsonl"),
    EntityMeta.empty).cache()

  test("mention-type histogram matches the golden") {
    val got = BenchmarkStatistics.mentionTypeHistogram(facts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = golden("mention_types")
    Seq("entity_named", "entity_non_named", "entity_unknown",
      "coref_nominal", "coref_pronominal").foreach { k =>
      assert(got.getOrElse(k, 0L) == want(k).num.toLong, s"mention type $k")
    }
  }

  test("type histogram matches the golden") {
    val got = BenchmarkStatistics.typeHistogram(facts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = golden("types")
    Seq("Q215627", "Q43229", "Q27096213", "OTHER").foreach { k =>
      assert(got.getOrElse(k, 0L) == want(k).num.toLong, s"type $k: got=${got.get(k)}")
    }
  }

  test("multi-word histogram matches the golden") {
    val got = BenchmarkStatistics.multiWordHistogram(facts)
      .collect().map(r => r.getInt(0).toString -> r.getLong(1)).toMap
    val want = golden("multi_word_statistics")
    Seq("1", "2", "3", "4").foreach { k =>
      assert(got.getOrElse(k, 0L) == want(k).num.toLong, s"multi-word $k")
    }
  }

  test("exact tags match the golden (capitalized/unknown/root/child/optional)") {
    val got = BenchmarkStatistics.tagHistogram(facts)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = golden("tags")
    Seq("capitalized", "lowercased", "non_alpha", "unknown", "unknown_nil",
      "unknown_no_mapping", "optional", "root", "child").foreach { k =>
      assert(got.getOrElse(k, 0L) == want(k).num.toLong,
        s"tag $k: got=${got.getOrElse(k, 0L)} want=${want(k).num.toLong}")
    }
  }

  test("label count matches the golden") {
    val stats = BenchmarkStatistics.textStatistics(
      BenchmarkReader.ourJsonl(spark, "/root/reference/benchmarks/kore50.benchmark.jsonl")).head()
    assert(stats.getLong(0) == 50L) // articles
    assert(stats.getLong(1) == golden("text_statistics")("labels").num.toLong)
  }

  test("add_benchmark: kore50 converted through the job reproduces the shipped histograms") {
    // The add_benchmark.py composition (reader -> label name/type
    // enrichment -> ours-JSONL write -> statistics): the dimension is
    // built from the shipped file's own annotations, so a correct
    // enrichment join + a faithful JSONL writer must reproduce the shipped
    // benchmark_statistics histograms when the CONVERTED file is re-read.
    val docs = BenchmarkReader.ourJsonl(
      spark, "/root/reference/benchmarks/kore50.benchmark.jsonl")
    val dim = docs.collect().flatMap(_.labels)
      .filterNot(l => isUnknownEntity(l.entityId))
      .map(l => l.entityId -> (l.types, l.name)).toMap
    val meta = EntityMeta(
      types = dim.map { case (k, v) => k -> v._1 },
      quantities = Set.empty, datetimes = Set.empty,
      names = dim.map { case (k, v) => k -> v._2 })

    val out = java.nio.file.Files.createTempDirectory("addbench").toFile
    out.deleteOnExit()
    val res = graft.pipeline.AddBenchmark.run(docs, meta, out.getPath, "kore50_converted")
    new java.io.File(res.benchmarkFile).deleteOnExit()
    new java.io.File(res.metadataFile).deleteOnExit()

    // re-read the CONVERTED file with the standard reader
    val facts2 = BenchmarkStatistics.labelFacts(
      BenchmarkReader.ourJsonl(spark, res.benchmarkFile), EntityMeta.empty)
    val got = BenchmarkStatistics.tagHistogram(facts2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = golden("tags")
    Seq("capitalized", "lowercased", "non_alpha", "unknown", "unknown_nil",
      "unknown_no_mapping", "optional", "root", "child").foreach { k =>
      assert(got.getOrElse(k, 0L) == want(k).num.toLong, s"converted tag $k")
    }
    val gotTypes = BenchmarkStatistics.typeHistogram(facts2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("Q215627", "Q43229", "Q27096213", "OTHER").foreach { k =>
      assert(gotTypes.getOrElse(k, 0L) == golden("types")(k).num.toLong, s"converted type $k")
    }
    val gotMt = BenchmarkStatistics.mentionTypeHistogram(facts2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    Seq("entity_named", "entity_non_named", "entity_unknown").foreach { k =>
      assert(gotMt.getOrElse(k, 0L) == golden("mention_types")(k).num.toLong,
        s"converted mention type $k")
    }
    val stats = BenchmarkStatistics.textStatistics(
      BenchmarkReader.ourJsonl(spark, res.benchmarkFile)).head()
    assert(stats.getLong(0) == 50L && stats.getLong(1) ==
      golden("text_statistics")("labels").num.toLong)
  }

  test("add_benchmark writer round-trips wiki-fair-v2 (nested/optional/desc/coref labels) exactly") {
    // wiki-fair-v2 exercises every conditional label field the writer
    // emits (parent, children, optional, desc, coref); the written file
    // re-read through the standard reader must reproduce the enriched
    // docs bit-for-bit.
    val docs = BenchmarkReader.ourJsonl(
      spark, "/root/reference/benchmarks/wiki-fair-v2.benchmark.jsonl")
    val out = java.nio.file.Files.createTempDirectory("addbench2").toFile
    out.deleteOnExit()
    val res = graft.pipeline.AddBenchmark.run(
      docs, EntityMeta.empty, out.getPath, "wikifair_rt")
    new java.io.File(res.benchmarkFile).deleteOnExit()
    new java.io.File(res.metadataFile).deleteOnExit()
    // EntityMeta.empty: enrichment maps every non-unknown, non-QUANTITY/
    // DATETIME label to (Nil types, "Unknown" name) — the round-trip must
    // preserve exactly THAT enriched content
    val want = graft.pipeline.AddBenchmark.enrich(docs, EntityMeta.empty)
      .collect().map(d => d.url -> d).toMap
    val got = BenchmarkReader.ourJsonl(spark, res.benchmarkFile)
      .collect().map(d => d.url -> d).toMap
    assert(got.keySet === want.keySet)
    want.foreach { case (url, w) =>
      val g = got(url)
      assert(g.text === w.text, s"$url text")
      assert((g.evalBegin, g.evalEnd) === ((w.evalBegin, w.evalEnd)), s"$url span")
      assert(g.labels.sortBy(_.id) === w.labels.sortBy(_.id), s"$url labels")
    }
  }

  test("word/sentence divergence vs spaCy is PINNED numerically (A12 declared divergence)") {
    // The reference counts words/sents with spaCy en_core_web_lg (a
    // statistical model: utils.compute_num_words over non-punct tokens,
    // doc.sents from the parser) — not reproducible without the model.
    // Our rule tokenizer's EXACT numbers are pinned here next to the
    // shipped spaCy goldens, so the divergence is explicit and any
    // tokenizer change that moves these counts fails loudly.
    // (benchmark, ours (articles, labels, words, sents), spaCy golden (words, sents))
    val pins = Seq(
      ("kore50", (50L, 144L, 641L, 51L), (640L, 52L)),
      ("aida-conll-test", (231L, 5616L, 32977L, 2322L), (41955L, 2257L)),
      ("derczynski", (183L, 292L, 3574L, 555L), (3360L, 404L)))
    pins.foreach { case (b, (art, lab, words, sents), (gWords, gSents)) =>
      val r = BenchmarkStatistics.textStatistics(
        BenchmarkReader.ourJsonl(spark, s"/root/reference/benchmarks/$b.benchmark.jsonl")).head()
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((art, lab, words, sents)), s"$b rule-based counts moved")
      // articles/labels are tokenizer-free and must match the golden exactly
      val g = ujsonLite.parse(new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"/root/reference/benchmarks/$b.benchmark_statistics.jsonl")), "UTF-8"))
      assert(r.getLong(0) == g("text_statistics")("articles").num.toLong, s"$b articles")
      assert(r.getLong(1) == g("text_statistics")("labels").num.toLong, s"$b labels")
      // the declared delta band vs spaCy (worst observed: aida words -21%)
      assert(math.abs(words - gWords).toDouble / gWords <= 0.25, s"$b words drifted further from spaCy")
      assert(math.abs(sents - gSents).toDouble / gSents <= 0.40, s"$b sents drifted further from spaCy")
    }
  }
}
