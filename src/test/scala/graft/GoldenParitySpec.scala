package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.eval.Evaluation
import graft.sources.BenchmarkReader

/** THE parity gate: evaluate the reference's SHIPPED linker outputs
  * (evaluation-results/<sys>/<sys>.<bench>.linked_articles.jsonl) with our
  * Catalyst evaluator and compare micro "all" TP/FP/FN + P/R/F1 against
  * the reference's SHIPPED eval_results.json — input+output pairs produced
  * by the reference itself (SURVEY §5.3). */
class GoldenParitySpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private def golden(path: String): (Long, Long, Long, Double, Double, Double) = {
    val json = ujsonLite.parse(new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))
    val all = json("IGNORED")("mention_types")("all")
    (all("true_positives").num.toLong, all("false_positives").num.toLong,
      all("false_negatives").num.toLong,
      all("precision").num, all("recall").num, all("f1").num)
  }

  /** KB attributes of PREDICTED entities (quantity/datetime class + name),
    * reconstructed from the shipped eval_cases' `predicted_entity`
    * records. This is the subset of the reference's (unshipped) Wikidata
    * KB that the pair actually touched — KB INPUT data, not answers: the
    * eval types/counters are still computed entirely by our evaluator.
    * Without it, a system predicting year entities (e.g. grasp's Q2650 =
    * "1965") on DATETIME ground truths diverges, because
    * is_true_quantity_or_datetime needs the prediction's KB class. */
  private def metaFromEvalCases(path: String): EntityMeta = {
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(path))) return EntityMeta.empty
    val datetimes = Set.newBuilder[String]
    val quantities = Set.newBuilder[String]
    val names = Map.newBuilder[String, String]
    val types = Map.newBuilder[String, Seq[String]]
    scala.io.Source.fromFile(path, "UTF-8").getLines().foreach { line =>
      ujsonLite.parse(line).arr.foreach { c =>
        if (c.node.has("predicted_entity") && !c("predicted_entity").isNull) {
          val pe = c("predicted_entity")
          val id = pe("entity_id").str
          if (pe.node.has("type") && !pe("type").isNull) {
            pe("type").str match {
              case "DATETIME" => datetimes += id
              case "QUANTITY" => quantities += id
              case "OTHER" => ()
              case t => types += id -> t.split('|').toSeq // pipe-joined whitelist QIDs
            }
          }
          if (pe.node.has("name") && !pe("name").isNull && pe("name").str != "Unknown")
            names += id -> pe("name").str
        }
      }
    }
    EntityMeta(types.result(), quantities.result(), datetimes.result(), names.result())
  }

  private def ours(linkedPath: String, meta: EntityMeta = EntityMeta.empty): Evaluation.F1 = {
    val docs = BenchmarkReader.linkedArticles(spark, linkedPath)
    val counts = Evaluation.counts(Evaluation.cases(docs, meta), meta)
    Evaluation.microF1(counts, "IGNORED")
  }

  private def checkParity(sys: String, bench: String, dir: String = null): Unit = {
    val d = if (dir == null) sys else dir
    val base = s"/root/reference/evaluation-results/$d/$sys.$bench"
    val f = ours(s"$base.linked_articles.jsonl", metaFromEvalCases(s"$base.eval_cases.jsonl"))
    val (tp, fp, fn, p, r, f1) = golden(s"$base.eval_results.json")
    info(f"$sys/$bench: ours tp=${f.tp} fp=${f.fp} fn=${f.fn} F1=${f.f1}%.4f " +
      f"| golden tp=$tp fp=$fp fn=$fn F1=$f1%.4f")
    assert(f.tp == tp, s"$sys/$bench TP mismatch: ours=${f.tp} golden=$tp")
    assert(f.fp == fp, s"$sys/$bench FP mismatch: ours=${f.fp} golden=$fp")
    assert(f.fn == fn, s"$sys/$bench FN mismatch: ours=${f.fn} golden=$fn")
    assert(math.abs(f.precision - p) < 1e-9 && math.abs(f.recall - r) < 1e-9 &&
      math.abs(f.f1 - f1) < 1e-9)
  }

  test("golden parity, full bucket structure: baseline on aida-conll-test") {
    // beyond micro-"all": every mention-type bucket and the NER counters,
    // in BOTH evaluation modes
    val base = "/root/reference/evaluation-results/baseline/baseline.aida-conll-test"
    val docs = BenchmarkReader.linkedArticles(spark, s"$base.linked_articles.jsonl")
    val counts = Evaluation.counts(Evaluation.cases(docs, EntityMeta.empty), EntityMeta.empty)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val json = ujsonLite.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base.eval_results.json")), "UTF-8"))
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      val cats = Seq("all", "coref", "entity_named", "entity_non_named", "entity_unknown",
        "coref_nominal", "coref_pronominal")
      cats.foreach { cat =>
        val g = json(mode)("mention_types")(cat)
        val (gotTp, gotFp, gotFn) = counts.getOrElse((mode, cat), (0L, 0L, 0L))
        // TP/FN bucket assignment uses GT label names (shipped in the file)
        // → exact. FP bucket assignment for false detections uses the
        // PREDICTED entity's KB name (this pair ships no eval_cases to
        // reconstruct it from) → compared as the entity-rollup sum below;
        // the refined/wiki-fair-v2 test below has the exact per-bucket FP.
        assert(gotTp == g("true_positives").num.toLong, s"$mode/$cat TP")
        assert(gotFn == g("false_negatives").num.toLong, s"$mode/$cat FN")
        if (cat == "all" || cat.startsWith("coref"))
          assert(gotFp == g("false_positives").num.toLong, s"$mode/$cat FP")
      }
      val entityFpGot = Seq("entity_named", "entity_non_named", "entity_unknown")
        .map(c => counts.getOrElse((mode, c), (0L, 0L, 0L))._2).sum
      val entityFpWant = Seq("entity_named", "entity_non_named", "entity_unknown")
        .map(c => json(mode)("mention_types")(c)("false_positives").num.toLong).sum
      assert(entityFpGot == entityFpWant, s"$mode entity-rollup FP")
      val g = json(mode)("error_categories")("ner")
      val want = (g("true_positives").num.toLong, g("false_positives").num.toLong,
        g("false_negatives").num.toLong)
      val got = counts.getOrElse((mode, "ner"), (0L, 0L, 0L))
      assert(got == want, s"$mode/ner: got=$got want=$want")
    }
  }

  test("golden parity, full bucket structure incl. per-bucket FP: refined on wiki-fair-v2") {
    // this pair SHIPS eval_cases, so the predicted-entity KB names that
    // drive FP bucket assignment (named vs non-named is the name's case)
    // are reconstructable -> every bucket is exact in both modes
    val base = "/root/reference/evaluation-results/refined/refined__aida_.wiki-fair-v2"
    val docs = BenchmarkReader.linkedArticles(spark, s"$base.linked_articles.jsonl")
    val meta = metaFromEvalCases(s"$base.eval_cases.jsonl")
    val counts = Evaluation.counts(Evaluation.cases(docs, meta), meta)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val json = ujsonLite.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base.eval_results.json")), "UTF-8"))
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      Seq("all", "coref", "entity_named", "entity_non_named", "entity_unknown",
        "coref_nominal", "coref_pronominal").foreach { cat =>
        val g = json(mode)("mention_types")(cat)
        val (gotTp, gotFp, gotFn) = counts.getOrElse((mode, cat), (0L, 0L, 0L))
        assert(gotTp == g("true_positives").num.toLong, s"$mode/$cat TP")
        assert(gotFn == g("false_negatives").num.toLong, s"$mode/$cat FN")
        assert(gotFp == g("false_positives").num.toLong,
          s"$mode/$cat FP: got=$gotFp want=${g("false_positives").num.toLong}")
      }
      // per-entity-type counters: GT types ship in the benchmark labels;
      // predicted-entity types (for the FP side) reconstructed from
      // eval_cases — every per-type TP/FP/FN must match
      import scala.jdk.CollectionConverters._
      val et = json(mode)("entity_types")
      et.node.properties().asScala.foreach { e =>
        val (typeId, g) = (e.getKey, ujsonLite.Value(e.getValue))
        val (gotTp, gotFp, gotFn) = counts.getOrElse((mode, s"type:$typeId"), (0L, 0L, 0L))
        assert(gotTp == g("true_positives").num.toLong, s"$mode type $typeId TP")
        assert(gotFp == g("false_positives").num.toLong,
          s"$mode type $typeId FP: got=$gotFp want=${g("false_positives").num.toLong}")
        assert(gotFn == g("false_negatives").num.toLong, s"$mode type $typeId FN")
      }
    }
  }

  test("golden parity: KB-free error-category counters on refined/wiki-fair-v2") {
    // factor-weighted error-label sums vs the shipped eval_results
    // error_categories, for every counter that does not depend on the
    // unshipped KB (demonym/metonymy/rare splits) or the spaCy word
    // denominators (ner_fp all/lowercased/other)
    val base = "/root/reference/evaluation-results/refined/refined__aida_.wiki-fair-v2"
    val docs = BenchmarkReader.linkedArticles(spark, s"$base.linked_articles.jsonl")
    val meta = metaFromEvalCases(s"$base.eval_cases.jsonl")
    val cs = Evaluation.cases(docs, meta)
    val errs = Evaluation.errorCounts(cs)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val counts = Evaluation.counts(cs, meta)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val json = ujsonLite.parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base.eval_results.json")), "UTF-8"))
    def e(mode: String, l: String): Long = errs.getOrElse((mode, l), 0L)
    var checked = 0
    Seq("IGNORED", "REQUIRED").foreach { mode =>
      val ec = json(mode)("error_categories")
      def check(cat: ujsonLite.Value, key: String, errors: Long, total: Long): Unit = {
        assert(cat(key)("errors").num.toLong == errors,
          s"$mode/$key errors: got=$errors want=${cat(key)("errors").num.toLong}")
        assert(cat(key)("total").num.toLong == total,
          s"$mode/$key total: got=$total want=${cat(key)("total").num.toLong}")
        checked += 2
      }
      val nf = ec("ner_fn")
      Seq("all" -> ("NER_FN", "AVOIDED_NER_FN"),
        "lowercased" -> ("NER_FN_LOWERCASED", "AVOIDED_NER_FN_LOWERCASED"),
        "partially_included" -> ("NER_FN_PARTIALLY_INCLUDED", "AVOIDED_NER_FN_PARTIALLY_INCLUDED"),
        "partial_overlap" -> ("NER_FN_PARTIAL_OVERLAP", "AVOIDED_NER_FN_PARTIAL_OVERLAP"),
        "other" -> ("NER_FN_OTHER", "AVOIDED_NER_FN_OTHER")).foreach { case (k, (w, a)) =>
        check(nf, k, e(mode, w), e(mode, w) + e(mode, a))
      }
      val np = ec("ner_fp")
      check(np, "wrong_span", e(mode, "NER_FP_WRONG_SPAN"),
        e(mode, "NER_FP_WRONG_SPAN") + e(mode, "AVOIDED_NER_FP_WRONG_SPAN"))
      check(np, "groundtruth_unknown", e(mode, "NER_FP_GROUNDTRUTH_UNKNOWN"),
        e(mode, "NER_FP_GROUNDTRUTH_UNKNOWN") + e(mode, "AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN"))
      val wd = ec("wrong_disambiguation")
      check(wd, "all", e(mode, "DISAMBIGUATION_WRONG"),
        e(mode, "DISAMBIGUATION_WRONG") + e(mode, "DISAMBIGUATION_CORRECT"))
      val wc = ec("wrong_coreference")
      val corefGt = counts.getOrElse((mode, "coref"), (0L, 0L, 0L)) match {
        case (tp, _, fn) => tp + fn
      }
      check(wc, "undetected", e(mode, "COREFERENCE_UNDETECTED"), corefGt)
      check(wc, "wrong_mention_referenced", e(mode, "COREFERENCE_WRONG_MENTION_REFERENCED"),
        corefGt - e(mode, "COREFERENCE_UNDETECTED"))
      check(wc, "reference_wrongly_disambiguated",
        e(mode, "COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED"),
        corefGt - e(mode, "COREFERENCE_UNDETECTED") - e(mode, "COREFERENCE_WRONG_MENTION_REFERENCED"))
      // STALE-GOLDEN pin: the current reference code (executed via the
      // tools/run_reference_labeler.py stubbing pattern) adds
      // COREFERENCE_FALSE_DETECTION to the coref-nominal FD case
      // 'the "Asparagus Revenue Market Loss Program' (doc 114, REQUIRED) —
      // errors.py:label_coreference_errors fires on any coref ner-FP —
      // while this pair's shipped eval_cases/eval_results predate that and
      // carry 0. We match the EXECUTED reference: golden + 1 in REQUIRED.
      val staleDelta = if (mode == "REQUIRED") 1L else 0L
      assert(wc("false_detection").num.toLong + staleDelta ==
        e(mode, "COREFERENCE_FALSE_DETECTION"),
        s"$mode coref false_detection (incl. stale-golden delta $staleDelta)")
      checked += 1
    }
    info(s"compared $checked KB-free error-category counters in both modes")
    assert(checked >= 30)
  }

  test("golden parity: oracle on kore50 (P=R=F1=1.0)") { checkParity("oracle", "kore50") }
  test("golden parity: baseline on kore50") { checkParity("baseline", "kore50") }
  test("golden parity: baseline on aida-conll-test (the headline baseline)") {
    checkParity("baseline", "aida-conll-test")
  }
  test("golden parity: oracle on aida-conll-test") { checkParity("oracle", "aida-conll-test") }
  test("golden parity: baseline on msnbc") { checkParity("baseline", "msnbc") }
  test("golden parity: baseline on wiki-fair-v2 (nested + optional + coref labels)") {
    checkParity("baseline", "wiki-fair-v2")
  }
  test("golden parity: refined on aida-conll-test (best shipped system)") {
    checkParity("refined__aida_", "aida-conll-test", dir = "refined")
  }
  test("golden parity: rel on aida-conll-test") {
    checkParity("rel__2014_", "aida-conll-test", dir = "rel")
  }
  test("golden parity: baseline on rss-500 (NIL-heavy Derczynski-style)") {
    checkParity("baseline", "rss-500")
  }
  // round 2: widen to every shipped system family (each links differently,
  // exercising distinct case-generation paths)
  test("golden parity: ambiverse on aida-conll-test") {
    checkParity("ambiverse", "aida-conll-test")
  }
  test("golden parity: dbpedia-spotlight on aida-conll-test") {
    checkParity("dbpedia_spotlight", "aida-conll-test", dir = "dbpedia-spotlight")
  }
  test("golden parity: genre on aida-conll-test") {
    checkParity("genre__yago_", "aida-conll-test", dir = "genre")
  }
  test("golden parity: neural-el on derczynski") {
    checkParity("neural_el", "derczynski", dir = "neural_el")
  }
  test("golden parity: spel on aida-conll-dev") {
    checkParity("spel__large_", "aida-conll-dev", dir = "spel")
  }
  test("golden parity: grasp on wiki-fair-v2-no-coref") {
    checkParity("grasp_parallel", "wiki-fair-v2-no-coref", dir = "grasp")
  }
}
