package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseLogic
import graft.eval.CaseModel._
import graft.eval.ErrorLabeler
import graft.eval.ErrorLabeler.ErrorMeta

/** Table-driven error-category tests modeled on the reference's
  * error-category-examples benchmark (SURVEY §5.4; semantics from
  * errors.py:14-379). Each scenario constructs a document that must
  * produce exactly the named error label in IGNORED mode. */
class ErrorLabelSpec extends AnyFunSuite {

  private def gt(id: Int, b: Int, e: Int, ent: String, name: String = null,
                 types: Seq[String] = Nil, optional: Boolean = false,
                 coref: Option[Boolean] = None): GtLabel =
    GtLabel(id, b, e, ent, if (name == null) ent else name, None, Nil, optional, types, coref, desc = false)

  private def pred(b: Int, e: Int, ent: String, cands: Seq[String] = Nil): PredSpan =
    PredSpan(b, e, ent, if (cands.isEmpty) Seq(ent) else cands, "test")

  private def labelsOf(doc: EvalDoc, meta: EntityMeta = EntityMeta.empty,
                       err: ErrorMeta = ErrorMeta()): Map[(Int, Int), Set[String]] = {
    CaseLogic.generateCases(doc, meta, err)
      .map(c => (c.begin, c.end) -> c.errorsIgnored.toSet).toMap
  }

  test("NER_FN + NER_FN_OTHER: undetected named GT") {
    val t = "Berlin is a city."
    val m = labelsOf(EvalDoc("u", t, 0, t.length, Seq(gt(0, 0, 6, "Q64", "Berlin")), Nil))
    assert(m((0, 6)).contains("NER_FN"))
    assert(m((0, 6)).contains("NER_FN_OTHER"))
  }

  test("NER_FN_LOWERCASED: undetected lowercase GT") {
    val t = "the physics class."
    val m = labelsOf(EvalDoc("u", t, 0, t.length, Seq(gt(0, 4, 11, "Q413", "physics")), Nil))
    assert(m((4, 11)).contains("NER_FN_LOWERCASED"))
  }

  test("NER_FN_PARTIALLY_INCLUDED: FP subspan of the GT span") {
    val t = "New York City is big."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 13, "Q60", "New York City")),
      Seq(pred(0, 8, "Q60")))
    val m = labelsOf(doc)
    assert(m((0, 13)).contains("NER_FN_PARTIALLY_INCLUDED"), m.toString)
    assert(m((0, 8)).contains("NER_FP_WRONG_SPAN"), m.toString)
  }

  test("DISAMBIGUATION_WRONG + OTHER_WRONG: detected but mislinked") {
    val t = "Berlin is a city."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 6, "Q64", "Berlin")), Seq(pred(0, 6, "Q614184")))
    val m = labelsOf(doc)
    assert(m((0, 6)).contains("DISAMBIGUATION_WRONG"))
    assert(m((0, 6)).contains("DISAMBIGUATION_OTHER_WRONG"))
  }

  test("DISAMBIGUATION_RARE_WRONG: prediction is the popular-but-wrong candidate") {
    // GT name must not contain the mention (that would be PARTIAL_NAME,
    // which precedes RARE in the reference cascade)
    val t = "Paris lived here."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 5, "Q_celeb", "Hiltonia")), Seq(pred(0, 5, "Q90")))
    val err = ErrorMeta(mostPopularCandidates = Map("Paris" -> Set("Q90")))
    val m = labelsOf(doc, err = err)
    assert(m((0, 5)).contains("DISAMBIGUATION_RARE_WRONG"), m.toString)
  }

  test("DISAMBIGUATION_DEMONYM_WRONG: demonym surface with location-typed GT") {
    val t = "German cars are fast."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 6, "Q183", "Germany")), Seq(pred(0, 6, "Q188")))
    val err = ErrorMeta(
      demonyms = Set("German"),
      types = Map("Q183" -> Seq(ErrorLabeler.TypeLocation)))
    val m = labelsOf(doc, err = err)
    assert(m((0, 6)).contains("DISAMBIGUATION_DEMONYM_WRONG"), m.toString)
  }

  test("NER_FP + NER_FP_LOWERCASED: lowercase false detection off any GT") {
    val t = "the table stands here."
    val doc = EvalDoc("u", t, 0, t.length, Nil, Seq(pred(4, 9, "Q14748")))
    val m = labelsOf(doc)
    assert(m((4, 9)).contains("NER_FP"))
    assert(m((4, 9)).contains("NER_FP_LOWERCASED"), m.toString)
  }

  test("NER_FP_GROUNDTRUTH_UNKNOWN: FP on an unknown-entity GT") {
    val t = "Mystery99 appears."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 9, NIL, "Unknown1")), Seq(pred(0, 9, "Q1")))
    val m = labelsOf(doc)
    assert(m((0, 9)).contains("NER_FP_GROUNDTRUTH_UNKNOWN"), m.toString)
  }

  test("HYPERLINK_CORRECT / HYPERLINK_WRONG") {
    val t = "Berlin and Hamburg."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 6, "Q64", "Berlin"), gt(1, 11, 18, "Q1055", "Hamburg")),
      Seq(pred(0, 6, "Q64"), pred(11, 18, "WRONG")),
      hyperlinks = Seq(graft.model.Span(0, 6), graft.model.Span(11, 18)))
    val m = labelsOf(doc)
    assert(m((0, 6)).contains("HYPERLINK_CORRECT"))
    assert(m((11, 18)).contains("HYPERLINK_WRONG"))
  }

  test("COREFERENCE_UNDETECTED and COREFERENCE_FALSE_DETECTION") {
    val t = "Berlin grew. He won. It shrank."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 21, 23, "Q64", "Berlin", coref = Some(true))),
      Seq(pred(13, 15, "Q5"))) // "He" false detection
    val m = labelsOf(doc)
    assert(m((21, 23)).contains("COREFERENCE_UNDETECTED"), m.toString)
    assert(m((13, 15)).contains("COREFERENCE_FALSE_DETECTION"), m.toString)
  }

  test("COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED: back-reference chain") {
    val t = "Berlin grew fast. It shrank."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(
        gt(0, 0, 6, "Q64", "Berlin"),
        gt(1, 18, 20, "Q64", "Berlin", coref = Some(true))),
      Seq(pred(0, 6, "WRONG"), pred(18, 20, "WRONG")))
    val m = labelsOf(doc)
    // named reference was wrongly disambiguated to the same wrong id
    assert(m((18, 20)).contains("COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED"), m.toString)
  }

  test("AVOIDED_* labels on correct cases") {
    val t = "Albert Einstein lived."
    val doc = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 15, "Q937", "Albert Einstein")), Seq(pred(0, 15, "Q937")))
    val m = labelsOf(doc)
    val l = m((0, 15))
    assert(l.contains("DISAMBIGUATION_CORRECT"))
    assert(l.contains("AVOIDED_NER_FN"))
    assert(l.contains("AVOIDED_NER_FP_WRONG_SPAN"))
    assert(l.contains("AVOIDED_NER_FN_PARTIALLY_INCLUDED")) // multiword named TP
    assert(l.contains("AVOIDED_NER_FN_PARTIAL_OVERLAP"))
    assert(l.contains("AVOIDED_NER_FN_OTHER"))
  }

  test("candidate labels: true entity among >1 candidates") {
    val t = "Berlin is a city."
    val right = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 6, "Q64", "Berlin")),
      Seq(pred(0, 6, "Q64", cands = Seq("Q64", "Q614184"))))
    val m1 = labelsOf(right)
    assert(m1((0, 6)).contains("DISAMBIGUATION_MULTI_CANDIDATES_CORRECT"))
    assert(m1((0, 6)).contains("DISAMBIGUATION_CANDIDATES_CORRECT"))
    val wrong = EvalDoc("u", t, 0, t.length,
      Seq(gt(0, 0, 6, "Q64", "Berlin")),
      Seq(pred(0, 6, "Q614184", cands = Seq("Q64", "Q614184"))))
    val m2 = labelsOf(wrong)
    assert(m2((0, 6)).contains("DISAMBIGUATION_MULTI_CANDIDATES_WRONG"))
  }
}
