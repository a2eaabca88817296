package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.er.Mentions
import graft.linker.{CorefLinker, DictionaryNer}
import graft.synth.Synth
import graft.text.Extract

class NerCorefSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  test("greedy longest match prefers the longest alias and consumes it") {
    val aliases = Set("new york", "new york city", "york")
    val got = DictionaryNer.greedyMatch("Visit New York City today", aliases)
    assert(got == Seq((6, 19))) // "New York City", not "New York"+"City" or "York"
    val got2 = DictionaryNer.greedyMatch("York and New York", aliases)
    assert(got2 == Seq((0, 4), (9, 17)))
  }

  test("greedy matching is sequential: consumed tokens are not rematched") {
    val aliases = Set("a b", "b c")
    // "a b" matches first and consumes "b", so "b c" cannot match
    assert(DictionaryNer.greedyMatch("a b c", aliases) == Seq((0, 3)))
  }

  test("dictionary NER over synthetic pages finds the canonical mentions") {
    val pages = Synth.pages(spark, 100, seed = 42L, nDomains = 5).cache()
    val nEnt = Synth.nEntities(100)
    val aliasSet = (0 until nEnt)
      .map(e => Extract.normalizeSurface(Synth.canonicalName(e))).toSet + "global syndicate"
    val tagged = DictionaryNer.tag(pages, aliasSet).cache()
    val gold = Mentions.fromPages(pages).cache()
    // every gold canonical-surface mention must be found by the tagger
    val goldCanonical = gold.toDF()
      .where(col("norm_surface").isin(aliasSet.toSeq.take(500): _*))
      .select("url", "begin", "end")
    val found = tagged.toDF().select("url", "begin", "end")
    val missed = goldCanonical.except(found).count()
    assert(missed == 0, s"$missed canonical gold mentions not found by dictionary NER")
  }

  test("overlap resolution keeps the longer span, deterministic tie-breaks") {
    import spark.implicits._
    val spans = Seq(
      DictionaryNer.NerSpan("u", 0, 8, "New York", "new york"),
      DictionaryNer.NerSpan("u", 0, 13, "New York City", "new york city"),
      DictionaryNer.NerSpan("u", 20, 25, "Paris", "paris")).toDS()
    val kept = DictionaryNer.resolveOverlaps(spans, Map.empty)
      .collect().map(s => (s.begin, s.end)).sorted.toSeq
    assert(kept == Seq((0, 13), (20, 25)))
  }

  test("coref linker resolves pronoun paragraphs to the nearest preceding mention") {
    val pages = Synth.pages(spark, 200, seed = 42L, nDomains = 5).cache()
    assert(pages.filter(_.text.contains("He returned to the scene.")).count() > 10,
      "coref fixture sentences missing from synth corpus")
    val mentions = Mentions.fromPages(pages).cache()
    val linked = mentions.toDF()
      .select(col("url"), col("begin"), col("end"), col("gold_entity").as("entity_id"))
    val corefs = CorefLinker.resolve(pages, linked).cache()
    assert(corefs.count() > 10)
    // by construction the nearest preceding mention IS the gold antecedent:
    // verify the referenced span matches a gold mention with the same entity
    val check = corefs.toDF()
      .join(mentions.toDF().select(col("url"), col("begin").as("referenced_begin"),
        col("gold_entity")), Seq("url", "referenced_begin"))
      .where(col("entity_id") =!= col("gold_entity"))
    assert(check.count() == 0, "coref resolved to a mention with mismatched entity")
    // all pronouns in the fixture are "He"
    assert(corefs.collect().forall(c => c.surface == "He" || c.surface == "he"))
  }

  test("byte-identity still holds after the coref fixture change") {
    val nEnt = Synth.nEntities(100)
    (0L until 100L).foreach { p =>
      val g = Synth.buildPage(42L, p, nEnt, 5)
      val got = Extract.processExtractorText(new String(g.html, "UTF-8"))
      assert(got.text == g.text, s"extraction mismatch on page $p")
    }
  }
}
