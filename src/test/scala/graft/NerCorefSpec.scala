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

  test("\"the X\" strip rule matches the executed-reference decision table (ner_postprocessing.py:17-29)") {
    import DictionaryNer.NerSpan
    val names = Set("The Netherlands", "Netherlands", "Beatles", "The Hague", "Hague", "press")
    // goldens from executing the reference's verbatim condition expression
    // against the same name set (spaCy absent; the condition is a pure
    // (text, dict) predicate lifted unchanged):
    val decisions = Seq(
      "the press" -> true,          // lowercase branch: NO dictionary guard
      "the unknown thing" -> true,  // lowercase strips even unknown tails
      "The Netherlands" -> false,   // full text is a known name
      "The Beatles" -> true,        // full unknown, tail known
      "The Hague" -> false,         // full known (tail known too: keep wins)
      "The Unknownia" -> false,     // neither known
      "Theatre" -> false,           // no "the " prefix
      "the" -> false,               // bare "the", no trailing space
      "The " -> false,              // empty tail is not a known name
      "the  double  space" -> true) // lookup keeps spaces, span skips them
    decisions.foreach { case (text, expectStrip) =>
      val in = NerSpan("u", 10, 10 + text.length, text, Extract.normalizeSurface(text))
      val out = DictionaryNer.stripLeadingThe(in, names)
      assert((out != in) == expectStrip, s"'$text': expected strip=$expectStrip, got $out")
    }
    // stripped span geometry: begin advances to the SECOND token, end fixed
    val beatles = DictionaryNer.stripLeadingThe(
      NerSpan("u", 7, 18, "The Beatles", "the beatles"), names)
    assert(beatles == NerSpan("u", 11, 18, "Beatles", "beatles"))
    // extra whitespace: the new span starts at the next token, but the
    // DICTIONARY lookup saw the space-preserving 4-char tail
    val dbl = DictionaryNer.stripLeadingThe(
      NerSpan("u", 0, 18, "the  double  space", "the double space"), names)
    assert(dbl.begin == 5 && dbl.surface == "double  space")
    // distributed form agrees with the scalar rule
    val spark2 = spark
    import spark2.implicits._
    val ds = decisions.map { case (t, _) =>
      NerSpan("u", 0, t.length, t, Extract.normalizeSurface(t)) }.toDS()
    val got = DictionaryNer.withTheStripped(ds, names).collect().map(_.surface).toSet
    val want = decisions.map { case (t, strip) =>
      if (strip) DictionaryNer.stripLeadingThe(
        NerSpan("u", 0, t.length, t, Extract.normalizeSurface(t)), names).surface
      else t }.toSet
    assert(got == want)
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

  test("typed coref tier: gender agreement, distance caps, nominal type references") {
    import spark.implicits._
    val filler = "x " * 120 // 240 chars > both distance caps
    val text =
      "Marie Curie met Albert Einstein in Paris . " + // mentions at fixed offsets
        "She won two Nobel prizes . He admired her . " +
        "Berlin is large . The city grew fast . " +
        filler +
        "They stayed ."
    def page(u: String) = graft.model.Page(u, new java.sql.Timestamp(0L),
      Array.empty[Byte], text, "en")
    val pages = Seq(page("u1")).toDS()
    val mc = (0, 11, "Q7186", "FEMALE", Seq.empty[String])      // Marie Curie
    val ae = (16, 31, "Q937", "MALE", Seq.empty[String])         // Albert Einstein
    val paris = (35, 40, "Q90", "NEUTRAL", Seq("capital"))
    val berlin = (text.indexOf("Berlin"), text.indexOf("Berlin") + 6, "Q64", "NEUTRAL", Seq("city"))
    val linked = Seq(mc, ae, paris, berlin)
      .map { case (b, e, id, g, ts) => ("u1", b, e, id, g, ts) }
      .toDF("url", "begin", "end", "entity_id", "gender", "type_aliases")
    val got = CorefLinker.resolveTyped(pages, linked).collect()
      .map(c => (c.surface, c.entity_id, c.begin)).sortBy(_._3)

    // "She" -> Marie Curie (FEMALE), skipping nearer MALE/NEUTRAL entities
    assert(got.exists { case (s, id, _) => s == "She" && id == "Q7186" })
    // "He" -> Albert Einstein (MALE)
    assert(got.exists { case (s, id, _) => s == "He" && id == "Q937" })
    // "her" -> Marie Curie via the earlier "She" coref site re-binding
    assert(got.exists { case (s, id, _) => s == "her" && id == "Q7186" })
    // "The city" nominal -> Berlin via its type alias
    assert(got.exists { case (s, id, _) => s == "The city" && id == "Q64" })
    // "They" after 240 chars of filler: UNKNOWN gender matches anything but
    // every antecedent is beyond the 200-char cap -> unresolved... except
    // "They" has UNKNOWN gender and the reference only resolves pronouns
    // with known gender or first-person-singular -> never resolved at all
    assert(!got.exists(_._1 == "They"))
  }

  test("typed coref tier: pronoun beyond the distance cap stays unresolved") {
    import spark.implicits._
    val filler = "x " * 120
    val text = "Albert Einstein lived . " + filler + "He returned ."
    val pages = Seq(graft.model.Page("u2", new java.sql.Timestamp(0L),
      Array.empty[Byte], text, "en")).toDS()
    val linked = Seq(("u2", 0, 15, "Q937", "MALE", Seq.empty[String]))
      .toDF("url", "begin", "end", "entity_id", "gender", "type_aliases")
    assert(CorefLinker.resolveTyped(pages, linked).collect().isEmpty)
    // same text within range resolves
    val text2 = "Albert Einstein lived . He returned ."
    val pages2 = Seq(graft.model.Page("u3", new java.sql.Timestamp(0L),
      Array.empty[Byte], text2, "en")).toDS()
    val linked2 = Seq(("u3", 0, 15, "Q937", "MALE", Seq.empty[String]))
      .toDF("url", "begin", "end", "entity_id", "gender", "type_aliases")
    val got2 = CorefLinker.resolveTyped(pages2, linked2).collect()
    assert(got2.length == 1 && got2.head.entity_id == "Q937")
  }

  test("enrichLinked expands coref-type ids to lowercase alias words split on '/'") {
    import spark.implicits._
    val linked = Seq(("u", 0, 6, "Q64")).toDF("url", "begin", "end", "entity_id")
    val genders = Seq(("Q64", "NEUTRAL")).toDF("entity_id", "gender")
    val corefTypes = Seq(("Q64", Seq("Q515"))).toDF("entity_id", "types")
    val aliases = Seq(("Q515", "City/Town"), ("Q515", "municipality"))
      .toDF("entity_id", "alias")
    val row = CorefLinker.enrichLinked(linked, genders, corefTypes, aliases)
      .select("gender", "type_aliases").head()
    assert(row.getString(0) == "NEUTRAL")
    assert(row.getSeq[String](1).toSet == Set("city", "town", "municipality"))
  }

  test("popular-entities lowercase pass: trie walk, singular fallback, consume quirks") {
    import graft.linker.PopularEntitiesLinker.{lowercaseDetections, LowercaseDetection}
    val trie = new java.util.TreeMap[String, String]()
    trie.put("black hole", "Q589")
    trie.put("black hole thermodynamics", "Q2248279")
    trie.put("neutron star", "Q4202")
    trie.put("boring", "Q999")      // type OTHER -> filtered but consumed
    val sitelinks = Map("Q589" -> 100L, "Q2248279" -> 5L, "Q4202" -> 80L, "Q999" -> 50L)
    val types = Map("Q589" -> Seq("Q27096213"), "Q2248279" -> Seq("Q27096213"),
      "Q4202" -> Seq("Q27096213"), "Q999" -> Seq("OTHER"))

    // longest match wins where the full extension is in the trie
    val t1 = "a black hole thermodynamics paper"
    val d1 = lowercaseDetections(t1, trie, Nil, sitelinks, types)
    assert(d1 === Seq(LowercaseDetection(2, 27, "Q2248279")))

    // backtracking: extension leaves the trie -> fall back to last hit;
    // singular-form fallback: "neutron stars" matches the stem
    val t2 = "the black hole evaporated near neutron stars again"
    val d2 = lowercaseDetections(t2, trie, Nil, sitelinks, types)
    assert(d2.contains(LowercaseDetection(4, 14, "Q589")))
    assert(d2.exists(d => d.entity_id == "Q4202" &&
      t2.substring(d.begin, d.end) == "neutron stars"))

    // overlap with an already-linked span suppresses the detection
    val d3 = lowercaseDetections(t2, trie, Seq((4, 14)), sitelinks, types)
    assert(!d3.exists(_.entity_id == "Q589"))

    // OTHER-typed entities are filtered but still consume their span
    val t4 = "boring boring text"
    val d4 = lowercaseDetections(t4, trie, Nil, sitelinks, types)
    assert(d4.isEmpty)

    // sitelink threshold
    val d5 = lowercaseDetections(t1, trie, Nil, sitelinks, types, minScore = 10L)
    assert(d5.isEmpty) // Q2248279 has only 5 sitelinks

    // capitalized tokens and stopword-initial snippets are skipped
    val d6 = lowercaseDetections("Black Hole is the name", trie, Nil, sitelinks, types)
    assert(d6.isEmpty)
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
