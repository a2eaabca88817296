package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.eval.Evaluation
import graft.sources.{BenchmarkReader, NestedGt, QidMapper, WhitelistFilter}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  test("S1: reads the reference's own kore50 benchmark JSONL faithfully") {
    val docs = BenchmarkReader.ourJsonl(spark, "/root/reference/benchmarks/kore50.benchmark.jsonl")
      .collect().sortBy(_.url)
    assert(docs.length == 50)
    val first = docs.find(_.text.startsWith("After the death of Steve")).get
    assert(first.labels.map(l => (l.begin, l.end, l.entityId)).toSet ==
      Set((19, 24, "Q19837"), (44, 49, "Q312"), (78, 86, "Q41506")))
    assert(first.labels.find(_.entityId == "Q312").get.types == Seq("Q2424752", "Q431289", "Q43229"))
    assert(first.evalBegin == 0 && first.evalEnd == 118)
  }

  test("S1 + oracle: reference benchmark replayed through our evaluator gives F1 = 1.0") {
    import spark.implicits._
    val docs = BenchmarkReader.ourJsonl(spark, "/root/reference/benchmarks/kore50.benchmark.jsonl")
      .map(d => d.copy(predictions = graft.eval.OracleLinker.predictions(d.labels)))
    val counts = Evaluation.counts(Evaluation.cases(docs, EntityMeta.empty), EntityMeta.empty)
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      val f = Evaluation.microF1(counts, mode)
      assert(f.precision == 1.0 && f.recall == 1.0,
        s"$mode tp=${f.tp} fp=${f.fp} fn=${f.fn} on the reference's own benchmark")
    }
    // kore50 has 144 labels total (BASELINE.md benchmark scale table)
    val f = Evaluation.microF1(counts, "IGNORED")
    assert(f.tp > 100, s"tp=${f.tp}")
  }

  test("S4: simple-JSONL reader normalizes URIs and nests labels") {
    val dir = Files.createTempDirectory("bench").toString
    val line =
      """{"title":"T1","text":"Albert Einstein was born in Ulm.","labels":[
        |{"start_char":0,"end_char":15,"entity_reference":"http://www.wikidata.org/entity/Q937"},
        |{"start_char":7,"end_char":15,"entity_reference":"https://en.wikipedia.org/wiki/Einstein_family"},
        |{"start_char":28,"end_char":31,"entity_reference":"NIL"}]}""".stripMargin.replace("\n", "")
    Files.write(java.nio.file.Paths.get(s"$dir/b.jsonl"), line.getBytes)
    val docs = BenchmarkReader.simpleJsonl(spark, s"$dir/b.jsonl",
      title2qid = Map("Einstein family" -> "Q2621873")).collect()
    assert(docs.length == 1)
    val labels = docs.head.labels.sortBy(_.begin)
    assert(labels.map(_.entityId) == Seq("Q937", "Q2621873", NIL))
    // nested: label (7,15) is inside (0,15)
    assert(labels(1).parent.contains(labels(0).id))
    assert(labels(0).children.contains(labels(1).id))
  }

  test("S5: order-based prediction attach (zipWithIndex join)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("preds").toString
    val lines = Seq(
      """{"predictions":[{"start_char":0,"end_char":15,"entity_reference":"http://www.wikidata.org/entity/Q937","candidates":["Q937","Q2621873"]}]}""",
      """{"predictions":[]}""")
    Files.write(java.nio.file.Paths.get(s"$dir/p.jsonl"), lines.mkString("\n").getBytes)
    val docs = Seq(
      EvalDoc("a", "Albert Einstein was born.", 0, 25, Nil, Nil),
      EvalDoc("b", "Nothing here.", 0, 13, Nil, Nil)).toDS()
    val got = BenchmarkReader.attachSimpleJsonlPredictions(spark, docs, s"$dir/p.jsonl")
      .collect().sortBy(_.url)
    assert(got(0).predictions.map(p => (p.begin, p.end, p.entityId)) == Seq((0, 15, "Q937")))
    assert(got(0).predictions.head.candidates.toSet == Set("Q937", "Q2621873"))
    assert(got(1).predictions.isEmpty)
  }

  test("S2: AIDA-CoNLL IOB TSV reader on a synthetic fixture") {
    val tsv = Seq(
      "-DOCSTART- (1 EU)",
      "EU\tB\tEU\t--NME--",
      "rejects\tO",
      "German\tB\tGerman\tGermany\thttp://en.wikipedia.org/wiki/Germany\t11867\t/m/0345h",
      "call\tO",
      "-DOCSTART- (2 Peter)",
      "Peter\tB\tPeter Blackburn\tPeter_Blackburn\thttp://www.wikidata.org/entity/Q7172668",
      "Blackburn\tI\tPeter Blackburn\tnull",
      "spoke\tO",
      "").mkString("\n")
    val docs = graft.sources.AidaConllReader.parseFile(tsv,
      Map("Germany" -> "Q183"))
    assert(docs.length == 2)
    val d1 = docs(0)
    assert(d1.text == "EU rejects German call")
    assert(d1.labels.map(l => (l.begin, l.end, l.entityId)).toSet ==
      Set((0, 2, NIL), (11, 17, "Q183")))
    assert(d1.text.substring(11, 17) == "German")
    val d2 = docs(1)
    assert(d2.text == "Peter Blackburn spoke")
    // "I" + "null" continuation: one label spanning both tokens
    assert(d2.labels.map(l => (l.begin, l.end, l.entityId)) ==
      Seq((0, 15, "Q7172668")))
    assert(d2.text.substring(0, 15) == "Peter Blackburn")
  }

  test("J6: text-prefix prediction matching (100-char key join)") {
    import spark.implicits._
    val docs = Seq(
      EvalDoc("a", "Alpha text that goes on. " + ("x" * 120), 0, 140, Nil, Nil),
      EvalDoc("b", "Beta text here.", 0, 15, Nil, Nil),
      EvalDoc("c", "Gamma unmatched.", 0, 16, Nil, Nil)).toDS()
    val preds = Seq(
      ("Alpha text that goes on. " + ("x" * 120) + "TRAILING DIFFERS",
        Seq(PredSpan(0, 5, "Q1", Seq("Q1"), "t"))),
      ("Beta text here.", Seq(PredSpan(0, 4, "Q2", Seq("Q2"), "t")))).toDS()
    val got = graft.sources.BenchmarkReader.attachPredictionsByTextPrefix(docs, preds)
      .collect().map(d => d.url -> d.predictions.map(_.entityId)).toMap
    assert(got("a") == Seq("Q1"), "prefix match must tolerate trailing divergence")
    assert(got("b") == Seq("Q2"))
    assert(got("c").isEmpty, "unmatched article keeps empty predictions")
  }

  test("F8: QID normalization semantics") {
    assert(QidMapper.getWikidataQid("", Map.empty) == NIL)
    assert(QidMapper.getWikidataQid("NIL", Map.empty) == NIL)
    assert(QidMapper.getWikidataQid("http://www.wikidata.org/entity/Q64", Map.empty) == "Q64")
    assert(QidMapper.getWikidataQid("Q12345", Map.empty) == "Q12345")
    assert(QidMapper.getWikidataQid("http://aksw.org/notInWiki/Foo", Map.empty) == NIL)
    assert(QidMapper.getWikidataQid(
      "https://en.wikipedia.org/wiki/Caf%C3%A9_de_Flore",
      Map("Café de Flore" -> "Q1142296")) == "Q1142296")
    assert(QidMapper.getWikidataQid(
      "http://dbpedia.org/resource/Unmapped_Page", Map.empty) == NO_MAPPING)
  }

  test("G1: nested assignment keeps the reference's last-containing-parent quirk") {
    val l0 = GtLabel(0, 0, 20, "A", "A", None, Nil, false, Nil, None, false)
    val l1 = GtLabel(1, 5, 15, "B", "B", None, Nil, false, Nil, None, false)
    val l2 = GtLabel(2, 6, 10, "C", "C", None, Nil, false, Nil, None, false)
    val out = NestedGt.assignParentChild(Seq(l0, l1, l2))
    assert(out(2).parent.contains(1)) // last containing label wins
    assert(out(0).children.toSet == Set(1, 2))
    assert(out(1).children == Seq(2))
    assert(out(1).parent.contains(0))
  }

  test("F6: whitelist label filtering with parent-consistency and unknown passthrough") {
    import spark.implicits._
    val labels = Seq(
      GtLabel(0, 0, 20, "Q1", "A", None, Seq(1), false, Seq("Q215627"), None, false), // person: kept
      GtLabel(1, 5, 15, "Q2", "B", Some(0), Nil, false, Seq("Qx"), None, false), // child of kept: kept
      GtLabel(2, 30, 40, "Q3", "C", None, Nil, false, Seq("Qother"), None, false), // wrong type: dropped
      GtLabel(3, 50, 60, NIL, "D", None, Nil, false, Nil, None, false)) // unknown: kept
    val docs = Seq(EvalDoc("u", "x" * 70, 0, 70, labels, Nil)).toDS()
    val got = WhitelistFilter.filterLabels(docs, Set("Q215627")).collect().head
    assert(got.labels.map(_.id).toSet == Set(0, 1, 3))
  }

  test("F7: prediction whitelist filtering by entity types") {
    import spark.implicits._
    val docs = Seq(EvalDoc("u", "some text", 0, 9, Nil, Seq(
      PredSpan(0, 4, "Q1", Seq("Q1"), "t"),
      PredSpan(5, 9, "Q2", Seq("Q2"), "t")))).toDS()
    val got = WhitelistFilter.filterPredictions(docs,
      Map("Q1" -> Seq("Q215627"), "Q2" -> Seq("Qzzz")), Set("Q215627")).collect().head
    assert(got.predictions.map(_.entityId) == Seq("Q1"))
  }
}
