package graft

import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.sources.CreateBenchmark

/** create_benchmark.py parity: the annotation parser's labels match the
  * EXECUTED reference (tools/gen_createbench_fixtures.py →
  * golden/create_benchmark.json) across all three variants, including the
  * literal-bracket rule, the children-aliasing quirk, Unknown→<NIL>, the
  * QID-prefix type rule, and the NO_COREF_ALT / COREF deletion +
  * rewiring. */
class CreateBenchmarkSpec extends AnyFunSuite {

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/create_benchmark.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  private def fields(v: ujsonLite.Value): Map[String, ujsonLite.Value] =
    v.node.properties().asScala.map(e => e.getKey -> ujsonLite.Value(e.getValue)).toMap

  test("read_labeled_texts splits on ARTICLE delimiters, strips tags, honors the n cap") {
    val annotated = golden("annotated").str
    val texts = CreateBenchmark.readLabeledTexts(annotated)
    val want = golden("texts").arr.map(_.str)
    assert(texts === want.toSeq)
    val capped = CreateBenchmark.readLabeledTexts(annotated, n = Some(2))
    assert(capped === golden("texts_capped_2").arr.map(_.str).toSeq)
  }

  private def asTuple(l: GtLabel) =
    (l.id, l.begin, l.end, l.entityId, l.name, l.parent, l.children.toList,
      l.optionalFlag, if (l.types.isEmpty) OTHER else l.types.mkString("|"),
      l.coref, l.desc)

  private def goldenTuple(g: ujsonLite.Value) = {
    val f = fields(g)
    (f("id").num.toInt, f("span").arr(0).num.toInt, f("span").arr(1).num.toInt,
      f("entity_id").str, f("name").str,
      if (f("parent").isNull) None else Some(f("parent").num.toInt),
      f("children").arr.map(_.num.toInt).toList,
      f("optional").bool, f("type").str,
      if (f("coref").isNull) None else Some(f("coref").bool),
      f("desc").bool)
  }

  test("get_nested_labels matches the executed reference on all variants") {
    golden("cases").arr.zipWithIndex.foreach { case (c, ci) =>
      val text = c("labeled_text").str
      Seq(
        ("default", false, false),
        ("no_coref_variant", true, false),
        ("no_coref_tags", false, true)).foreach { case (key, ncv, nct) =>
        val ours = CreateBenchmark.getNestedLabels(text,
          noCorefVariant = ncv, noCorefTags = nct).map(asTuple)
        val want = c(key).arr.map(goldenTuple).toSeq
        assert(ours === want, s"case $ci variant $key")
      }
    }
  }

  test("compose attaches parsed labels to articles with the skip bookkeeping") {
    val annotated = golden("annotated").str
    val docs = (0 until 3).map(i =>
      EvalDoc(s"article-$i", "x" * 200, 0, 200, Nil, Nil))
    val out = CreateBenchmark.compose(annotated, docs)
    assert(out.length == 3)
    assert(out(0).labels.map(_.entityId) === Seq("Q76", "Q64", "<NIL>", "DATETIME"))
    // --no-skip with a skipped index advances the annotation cursor
    // (reference main loop quirk): article 1 then gets annotation 2
    val skipped = CreateBenchmark.compose(annotated, docs.take(2),
      skipArticles = Set(1), skip = false)
    assert(skipped.length == 2)
    assert(skipped(1).labels.map(_.entityId).contains("Q1")) // article 3's labels
    // --skip drops the annotation AND the article at that index
    val skipMode = CreateBenchmark.compose(annotated, docs, skipArticles = Set(1),
      skip = true)
    assert(skipMode.map(_.url) === Seq("article-0", "article-2"))
  }
}
