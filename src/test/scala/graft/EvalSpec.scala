package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseLogic
import graft.eval.CaseModel._
import graft.eval.{Evaluation, MentionTypes, OracleLinker}

/** Evaluation-semantics parity suite. Factor scenarios are the reference's
  * own doctests (case_generator.py:218-285); the decision-table tests
  * enumerate the truth-table comments in case.py:121-311. */
class EvalSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private def gt(id: Int, b: Int, e: Int, ent: String, parent: Option[Int] = None,
                 children: Seq[Int] = Nil, optional: Boolean = false,
                 types: Seq[String] = Nil, coref: Option[Boolean] = None,
                 desc: Boolean = false, name: String = null): GtLabel =
    GtLabel(id, b, e, ent, if (name == null) ent else name, parent, children,
      optional, types, coref, desc)

  private def pred(b: Int, e: Int, ent: String): PredSpan =
    PredSpan(b, e, ent, Seq(ent), "test")

  private def factors(labels: Seq[GtLabel], preds: Seq[PredSpan], text: String = "aa, bb, cc"): Map[Int, Int] = {
    val byId = labels.map(l => l.id -> l).toMap
    val allPred = preds.map(p => (p.begin, p.end) -> p).toMap
    val fc = new CaseLogic.FactorComputer(text, byId, allPred)
    labels.filter(_.parent.isEmpty).foreach(l => fc.determine(l.id))
    fc.factorDict.toMap
  }

  // --- the reference's four factor doctests ---------------------------------
  test("factor doctest 1: child detected => parent 0, child 1") {
    val labels = Seq(gt(1, 0, 10, "Q1", children = Seq(2)), gt(2, 0, 2, "Q2", parent = Some(1)))
    assert(factors(labels, Seq(pred(0, 2, "Q2"))) == Map(1 -> 0, 2 -> 1))
  }

  test("factor doctest 2: unknown GT matched by unknown prediction") {
    val labels = Seq(gt(1, 0, 10, "Q1", children = Seq(2)), gt(2, 0, 2, NIL, parent = Some(1)))
    assert(factors(labels, Seq(pred(0, 2, NIL))) == Map(1 -> 0, 2 -> 1))
  }

  test("factor doctest 3: deep forest with sibling lookahead") {
    val labels = Seq(
      gt(1, 0, 10, "Q1", children = Seq(2, 5)),
      gt(2, 0, 2, "Q2", parent = Some(1), children = Seq(3)),
      gt(3, 0, 2, "Q3", parent = Some(2), children = Seq(4)),
      gt(4, 0, 2, "Q4", parent = Some(3)),
      gt(5, 4, 10, "Q5", parent = Some(1), children = Seq(6, 7)),
      gt(6, 4, 6, "Q6", parent = Some(5), children = Seq(8)),
      gt(7, 8, 10, "Q7", parent = Some(5)),
      gt(8, 4, 6, "Q8", parent = Some(6)))
    val preds = Seq(pred(0, 2, "Q3"), pred(4, 6, "Q8"), pred(8, 10, "Q7"))
    assert(factors(labels, preds) ==
      Map(1 -> 0, 2 -> 0, 3 -> 1, 5 -> 0, 6 -> 0, 7 -> 1, 8 -> 1))
  }

  test("factor doctest 4: undetected single root has factor 1") {
    val labels = Seq(gt(1, 0, 10, "Q1"))
    assert(factors(labels, Nil) == Map(1 -> 1))
  }

  // --- eval-type decision table (case.py truth-table comments) ---------------
  private def v(gtl: Option[GtLabel], predId: Option[String], predType: Option[String] = None,
                factor: Int = 1): CaseLogic.CaseView =
    CaseLogic.CaseView(factor, gtl, predId,
      predType.orElse(predId.map(_ => OTHER)),
      optional = gtl.exists(_.isOptional), hasNonOptionalChildren = false, None, None)

  test("linking eval types: known GT") {
    val g = Some(gt(1, 0, 2, "Q1"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q1")), "IGNORED") == Seq("TP"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q2")), "IGNORED") == Seq("FN", "FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "IGNORED") == Seq("FN"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "REQUIRED") == Seq("FN", "FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, None), "IGNORED") == Seq("FN"))
    assert(CaseLogic.linkingEvalTypes(v(g, None), "REQUIRED") == Seq("FN"))
  }

  test("linking eval types: unknown GT") {
    val g = Some(gt(1, 0, 2, NIL))
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q2")), "IGNORED") == Seq("FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q2")), "REQUIRED") == Seq("FN", "FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "REQUIRED") == Seq("TP"))
    assert(CaseLogic.linkingEvalTypes(v(g, None), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(g, None), "REQUIRED") == Seq("FN"))
  }

  test("linking eval types: no GT (potential false detection)") {
    assert(CaseLogic.linkingEvalTypes(v(None, Some("Q2")), "IGNORED") == Seq("FP"))
    assert(CaseLogic.linkingEvalTypes(v(None, Some("Q2")), "REQUIRED") == Seq("FP"))
    assert(CaseLogic.linkingEvalTypes(v(None, Some(NIL)), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(None, Some(NIL)), "REQUIRED") == Seq("FP"))
  }

  test("linking eval types: optional GT") {
    val g = Some(gt(1, 0, 2, "Q1", optional = true))
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q1")), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(g, Some("Q2")), "IGNORED") == Seq("FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(g, Some(NIL)), "REQUIRED") == Seq("FP"))
    assert(CaseLogic.linkingEvalTypes(v(g, None), "IGNORED") == Seq())
    // quantity GT with same predicted type counts as correct
    val q = Some(gt(1, 0, 2, "Q1", types = Seq(QUANTITY)))
    assert(CaseLogic.linkingEvalTypes(v(q, Some("Qx"), Some(QUANTITY)), "IGNORED") == Seq())
    assert(CaseLogic.linkingEvalTypes(v(q, Some("Qx"), Some(OTHER)), "IGNORED") == Seq("FP"))
  }

  test("ner eval types spot checks") {
    val g = Some(gt(1, 0, 2, "Q1"))
    assert(CaseLogic.nerEvalTypes(v(g, Some("Q2")), "IGNORED") == Seq("TP"))
    assert(CaseLogic.nerEvalTypes(v(g, Some(NIL)), "IGNORED") == Seq("FN"))
    assert(CaseLogic.nerEvalTypes(v(g, Some(NIL)), "REQUIRED") == Seq("TP"))
    val unk = Some(gt(1, 0, 2, NIL))
    assert(CaseLogic.nerEvalTypes(v(unk, Some("Q2")), "IGNORED") == Seq("FP"))
    assert(CaseLogic.nerEvalTypes(v(unk, Some("Q2")), "REQUIRED") == Seq("TP"))
  }

  test("mention types") {
    assert(MentionTypes.isPronoun("he"))
    assert(MentionTypes.isPronoun("I"))
    assert(!MentionTypes.isPronoun("US"))
    assert(!MentionTypes.isPronoun("IT"))
    assert(MentionTypes.isNominal("the company"))
    assert(!MentionTypes.isNominal("the Company"))
    assert(MentionTypes.entityMentionType("Berlin", Some("Q64")) == "ENTITY_NAMED")
    assert(MentionTypes.entityMentionType("physics", Some("Q413")) == "ENTITY_NON_NAMED")
    assert(MentionTypes.entityMentionType("x", Some(NIL)) == "ENTITY_UNKNOWN")
  }

  // --- end-to-end oracle identity -------------------------------------------
  private def benchmarkDocs: Seq[EvalDoc] = {
    val t1 = "Albert Einstein was born in Ulm. He studied physics there."
    val d1 = EvalDoc("u1", t1, 0, t1.length,
      labels = Seq(
        gt(0, 0, 15, "Q937", name = "Albert Einstein"),
        gt(1, 28, 31, "Q3012", name = "Ulm"),
        gt(2, 33, 35, "Q937", name = "Albert Einstein", coref = Some(true)),
        gt(3, 44, 51, "Q413", name = "physics")),
      predictions = Nil)
    // nested labels: parent with two children, plus an optional label and an unknown
    val t2 = "University of Ulm is near the Danube. MYSTERY99 waits."
    val d2 = EvalDoc("u2", t2, 0, t2.length,
      labels = Seq(
        gt(0, 0, 17, "Q1234", children = Seq(1), name = "University of Ulm"),
        gt(1, 14, 17, "Q3012", parent = Some(0), name = "Ulm"),
        gt(2, 26, 36, "Q1653", optional = true, name = "Danube"),
        gt(3, 38, 47, NIL, name = "Unknown1")),
      predictions = Nil)
    // quantity + datetime labels
    val t3 = "In 1905 he wrote 4 papers."
    val d3 = EvalDoc("u3", t3, 0, t3.length,
      labels = Seq(
        gt(0, 3, 7, "D1905", types = Seq(DATETIME), name = "1905"),
        gt(1, 17, 18, "Qty4", types = Seq(QUANTITY), name = "4")),
      predictions = Nil)
    Seq(d1, d2, d3)
  }

  test("oracle identity: replaying GT as predictions yields P = R = F1 = 1.0") {
    import spark.implicits._
    val docs = OracleLinker.linkDocs(benchmarkDocs).toDS()
    val meta = EntityMeta(
      types = Map("Q937" -> Seq("Q5"), "Q3012" -> Seq("Q515"), "Q413" -> Seq("Qfield")),
      quantities = Set("Qty4"), datetimes = Set("D1905"),
      names = Map("Q937" -> "Albert Einstein", "Q3012" -> "Ulm", "Q413" -> "physics"))
    val (cases, counts) = Evaluation.evaluate(docs, meta)
    assert(cases.count() > 0)
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      val f = Evaluation.microF1(counts, mode)
      assert(f.f1 == 1.0, s"$mode micro F1 = ${f.f1} (tp=${f.tp} fp=${f.fp} fn=${f.fn})")
      assert(f.precision == 1.0 && f.recall == 1.0)
    }
    val json = Evaluation.resultsJson(counts)
    assert(json.contains("\"mention_types\"") && json.contains("\"entity_types\""))
  }

  test("corpus-scale oracle identity over the synthetic pages (driver query path)") {
    val counts = graft.queries.EvalQueries.evalOracleCounts(spark, "/root/testdata/sf0.001")
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      val f = Evaluation.microF1(counts, mode)
      assert(f.tp > 500 && f.fp == 0 && f.fn == 0, s"$mode: tp=${f.tp} fp=${f.fp} fn=${f.fn}")
    }
  }

  test("baseline linker evaluated with reference semantics scores below oracle") {
    val counts = graft.queries.EvalQueries.evalBaselineCounts(spark, "/root/testdata/sf0.001")
    val f = Evaluation.microF1(counts, "IGNORED")
    assert(f.tp > 0 && (f.fp > 0 || f.fn > 0), s"tp=${f.tp} fp=${f.fp} fn=${f.fn}")
    assert(f.f1 > 0.5 && f.f1 < 1.0, s"baseline F1 = ${f.f1}")
  }

  test("wrong predictions are penalized (micro F1 < 1)") {
    import spark.implicits._
    val base = benchmarkDocs.head
    val wrong = base.copy(predictions = Seq(
      pred(0, 15, "WRONG"), // ent/ent false -> FN+FP
      pred(44, 51, "Q413"))) // correct
    val docs = Seq(wrong).toDS()
    val meta = EntityMeta(Map.empty, Set.empty, Set.empty)
    val (_, counts) = Evaluation.evaluate(docs, meta)
    val f = Evaluation.microF1(counts, "IGNORED")
    assert(f.tp == 1 && f.fp == 1)
    assert(f.fn == 3, s"expected 3 FN (wrong + 2 undetected known GT), got ${f.fn}")
  }

  test("word-boundary-expanded prediction spans join with GT labels") {
    import spark.implicits._
    val t = "Meet Alice Smith today."
    //            5..16 = "Alice Smith"; prediction span chopped to 5..14
    val doc = EvalDoc("u", t, 0, t.length,
      labels = Seq(gt(0, 5, 16, "Q1", name = "Alice Smith")),
      predictions = Seq(pred(5, 14, "Q1")))
    val (cases, counts) = Evaluation.evaluate(Seq(doc).toDS(), EntityMeta.empty)
    val f = Evaluation.microF1(counts, "IGNORED")
    assert(f.tp == 1 && f.fp == 0 && f.fn == 0,
      s"expanded span should match: ${cases.collect().mkString("; ")}")
  }

  test("nested detected child suppresses parent (factor) in counting") {
    import spark.implicits._
    val t = "University of Ulm is great."
    val doc = EvalDoc("u", t, 0, t.length,
      labels = Seq(
        gt(0, 0, 17, "Q1234", children = Seq(1), name = "University of Ulm"),
        gt(1, 14, 17, "Q3012", parent = Some(0), name = "Ulm")),
      predictions = Seq(pred(14, 17, "Q3012")))
    val (_, counts) = Evaluation.evaluate(Seq(doc).toDS(), EntityMeta.empty)
    val f = Evaluation.microF1(counts, "IGNORED")
    // child correct -> parent factor 0, child TP propagates to root case
    assert(f.tp == 1 && f.fp == 0 && f.fn == 0, s"got tp=${f.tp} fp=${f.fp} fn=${f.fn}")
  }
}
