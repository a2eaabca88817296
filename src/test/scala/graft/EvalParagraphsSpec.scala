package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CorpusJobs, EvalParagraphs}

/** Executed-reference goldens for the seed-31072020 evaluation-paragraph
  * sampler: the MT19937 shuffle permutation, per-article randint draws in
  * shuffled order, the span arithmetic (incl. the empty-article (2,0)
  * quirk and the python-strip trailing-paragraph discount), and the
  * --text mode block format. */
class EvalParagraphsSpec extends AnyFunSuite {

  private lazy val golden: ujsonLite.Value = {
    val s = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/eval_paragraphs.json"), "UTF-8").mkString
    ujsonLite.parse(s)
  }

  private def inputPath(): String = {
    val dir = Files.createTempDirectory("evalparas")
    val p = dir.resolve("dev.jsonl")
    Files.write(p, golden("input").arr.map(_.node.toString)
      .mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("shuffled order, spans and text blocks match the executed reference") {
    val spark = SparkSessions.spark
    val arts = CorpusJobs.wikipediaArticles(spark, inputPath())
    val spanned = EvalParagraphs.withEvalSpans(arts)
    val got = spanned.collect().sortBy(_.getLong(0))
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3),
        r.getInt(4), r.getInt(5)))
    val want = golden("rows").arr.map(r =>
      (r("article_num").num.toLong, r("id").num.toLong.toString, r("title").str,
        r("url").str, r("eval_begin").num.toInt, r("eval_end").num.toInt))
    assert(got.toSeq == want.toSeq)

    val blocks = EvalParagraphs.textMode(spanned).collect()
      .sortBy(_.getLong(0)).map(_.getString(1))
    assert(blocks.toSeq == golden("text_blocks").arr.map(_.str).toSeq)
  }

  test("python paragraph split keeps empties and randint guard holds") {
    assert(EvalParagraphs.pySplitParas("") == Vector(""))
    assert(EvalParagraphs.pySplitParas("a\n\n\n\nb") == Vector("a", "", "b"))
    assert(EvalParagraphs.pySplitParas("x\n\n") == Vector("x", ""))
    assert(EvalParagraphs.effectiveParagraphs("x\n\n  ") == 1)
    // n-1 <= 3 → begin paragraph pinned to 1 without consuming randomness
    val plan = EvalParagraphs.plan(IndexedSeq(2, 3, 4))
    assert(plan.forall(_._3 == 1))
  }

  test("parity-mode ceiling: corpus-scale article counts fail loudly instead of OOMing the driver") {
    EvalParagraphs.checkParityBudget(1000L) // within budget: no-op
    val ex = intercept[IllegalArgumentException] {
      EvalParagraphs.checkParityBudget(EvalParagraphs.MaxParityArticles + 1)
    }
    assert(ex.getMessage.contains("PARITY-MODE"))
  }
}
