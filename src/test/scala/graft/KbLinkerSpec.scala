package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.er.Mentions
import graft.kb.KbBuild
import graft.linker.BaselineLinker
import graft.synth.Synth

class KbLinkerSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private lazy val pages = Synth.pages(spark, 300, seed = 42L, nDomains = 10).cache()
  private lazy val mentions = Mentions.fromPages(pages).cache()

  test("A1 link frequencies: counts sum to the number of hyperlinks") {
    val lf = KbBuild.linkFrequencies(pages).cache()
    val total = lf.agg(sum("freq")).head().getLong(0)
    assert(total == mentions.count())
    // the hot alias maps to multiple entities
    val hot = lf.where(col("link_text") === "global syndicate")
    assert(hot.count() > 1)
  }

  test("alias candidate probabilities: freq/total per alias, sums to 1, uniform fallback") {
    import spark.implicits._
    val lf = Seq(
      ("acme", "E1", 3L), ("acme", "E2", 1L),
      ("solo", "E9", 5L),
      ("", "E0", 2L) // empty alias: reference skips it (len(alias) > 0)
    ).toDF("link_text", "entity_id", "freq")
    val probs = KbBuild.aliasCandidateProbs(lf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(probs == Map(
      ("acme", "E1") -> 0.75, ("acme", "E2") -> 0.25, ("solo", "E9") -> 1.0))
    // per-alias probabilities sum to 1 on the full synthetic corpus too
    val sums = KbBuild.aliasCandidateProbs(KbBuild.linkFrequencies(pages))
      .groupBy("alias").agg(sum("prob").as("s"))
      .where(abs(col("s") - 1.0) > 1e-9)
    assert(sums.count() == 0)
  }

  test("alias candidate probabilities: entityFilter reproduces the reference's filtered normalization") {
    import spark.implicits._
    // knowledge_base_creator.py:38-51 filters candidates to
    // kb.contains_entity BEFORE summing; with a filter excluding E2, the
    // acme alias renormalizes over {E1} alone and solo vanishes entirely
    val lf = Seq(
      ("acme", "E1", 3L), ("acme", "E2", 1L),
      ("solo", "E9", 5L)
    ).toDF("link_text", "entity_id", "freq")
    val probs = KbBuild.aliasCandidateProbs(lf, Some(Seq("E1").toDF("entity_id")))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(probs == Map(("acme", "E1") -> 1.0))
    // default (no filter) keeps the documented unfiltered normalization
    val unfiltered = KbBuild.aliasCandidateProbs(lf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(unfiltered(("acme", "E1")) == 0.75)
  }

  test("A2 most popular candidates: rank-1 ties kept as sorted set") {
    val lf = KbBuild.linkFrequencies(pages)
    val mp = KbBuild.mostPopularCandidates(lf).cache()
    assert(mp.count() > 0)
    // for each alias the kept freq is the true max of the link frequencies
    val check = mp.withColumnRenamed("freq", "kept_freq")
      .join(lf, Seq("link_text"))
      .groupBy("link_text")
      .agg(max(col("freq")).as("true_max"), first(col("kept_freq")).as("kept"))
      .where(col("true_max") =!= col("kept"))
    assert(check.count() == 0)
  }

  test("acronym extraction: anchored ' (CAPS)' after a link, length bounds, set semantics") {
    import spark.implicits._
    val html =
      """The <a href="German_People's_Party">German People's Party</a> (DVP) was a party.
        |Then <a href="Democratic_Volks_Party">Democratic Volks Party</a> (DVP) merged.
        |But <a href="Texas">Texas</a> (USA) must be dropped - acronym longer than the link words.
        |And <a href="Alberta">Alberta</a> (AB) is too short. Inline
        |<a href="North_Atlantic_Treaty_Organization">North Atlantic Treaty Organization</a> (NATO) works.
        |Far <a href="France">France</a> x (FRA) is not anchored at the link end.""".stripMargin
    val docs = Seq(graft.model.Page("u1", new java.sql.Timestamp(0L),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), "", "en")).toDS()
    val got = KbBuild.extractAcronyms(docs)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got.get("DVP") === Some(List("Democratic_Volks_Party", "German_People's_Party")))
    assert(got.get("NATO") === Some(List("North_Atlantic_Treaty_Organization")))
    assert(!got.contains("USA")) // 3 > 1 link word
    assert(!got.contains("AB"))  // len <= 2
    assert(!got.contains("FRA")) // not anchored immediately after the link
  }

  test("A3 unigram counts cover the synthetic vocabulary") {
    val ug = KbBuild.unigramCounts(pages)
    assert(ug.where(col("token").startsWith("tok")).count() > 100)
    assert(ug.where(col("token") === "the").count() == 1)
  }

  test("A6 family-name aliases group entities by last token") {
    import spark.implicits._
    val entities = Synth.entities(spark, 300).toDF()
      .select(col("qid"), col("name"))
    val fam = KbBuild.familyNameAliases(entities).cache()
    assert(fam.count() > 0)
    // every family name is the last token of some entity name
    val sample = fam.limit(5).collect()
    sample.foreach { r =>
      assert(r.getString(0).nonEmpty && r.getSeq[String](1).nonEmpty)
    }
  }

  test("A7 title synonyms extracted from first-paragraph bold spans") {
    val ts = KbBuild.titleSynonyms(pages)
    assert(ts.count() > 0)
  }

  test("U1 alias table unions name, family-name and link sources") {
    import spark.implicits._
    val entities = Synth.entities(spark, 300).toDF().select(col("qid"), col("name"))
    val alias = KbBuild.aliasTable(entities, KbBuild.linkFrequencies(pages)).cache()
    val sources = alias.select("source").distinct().collect().map(_.getString(0)).toSet
    assert(sources == Set("name", "family_name", "link"))
  }

  test("A4/A5 alias and entity frequencies sum to the hyperlink total") {
    val lf = KbBuild.linkFrequencies(pages).cache()
    val total = mentions.count()
    assert(KbBuild.aliasFrequency(lf).agg(sum("freq")).head().getLong(0) == total)
    assert(KbBuild.entityFrequency(lf).agg(sum("freq")).head().getLong(0) == total)
  }

  test("A8 redirect extraction pairs titles with redirect bodies") {
    import spark.implicits._
    val lines = Seq(
      ("f1", 1L, "  <title>Old Name</title>"),
      ("f1", 2L, "  some xml"),
      ("f1", 3L, "#REDIRECT [[New Name]]"),
      ("f1", 4L, "  <title>Regular Page</title>"),
      ("f1", 5L, "  body text, no redirect"),
      ("f1", 6L, "  <title>Other Old</title>"),
      ("f1", 7L, "#REDIRECT [[Target#Section]]")).toDF("file", "line_no", "value")
    val got = KbBuild.extractRedirects(lines)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("Old Name", "New Name"), ("Other Old", "Target")))
  }

  test("J5 link resolution chases redirects with coalesce fallback") {
    import spark.implicits._
    val links = Seq(("u1", "direct_page"), ("u2", "Old Name"), ("u3", "Nowhere"))
      .toDF("url", "target")
    val t2q = Seq(("Direct_page", "Q1"), ("New Name", "Q2")).toDF("title", "qid")
    val redirects = Seq(("Old Name", "New Name")).toDF("from_title", "to_title")
    val got = KbBuild.resolveTargets(links, t2q, redirects)
      .select("url", "entity_id")
      .collect().map(r => (r.getString(0), Option(r.getString(1)))).toMap
    assert(got("u1").contains("Q1")) // direct (with initcap normalization)
    assert(got("u2").contains("Q2")) // via redirect
    assert(got("u3").isEmpty) // unresolvable -> null
  }

  test("q19 event-type domain is fixed across all sfs") {
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val types = spark.read.parquet(s"/root/testdata/$sf/events.parquet")
        .select("event_type").distinct().collect().map(_.getString(0)).sorted.toSeq
      assert(types == graft.queries.Queries2.EventTypes, s"event types changed at $sf")
    }
  }

  test("baseline linker (most-popular, min-tie-break) links canonical mentions correctly") {
    val lf = KbBuild.linkFrequencies(pages)
    val mp = KbBuild.mostPopularCandidates(lf)
    val linked = BaselineLinker.linkMostPopular(mentions, mp).cache()
    assert(linked.count() > 0)
    val acc = BaselineLinker.accuracy(linked).head()
    val (n, correct) = (acc.getLong(0), acc.getLong(1))
    // most mentions are unambiguous canonical surfaces → high accuracy;
    // hot-alias mentions are inherently ambiguous → below 1.0
    assert(correct.toDouble / n > 0.9, s"accuracy ${correct.toDouble / n}")
    assert(correct < n, "hot alias should cause some wrong links")
  }

  test("popular-entities linker: sitelink argmax with name-preference tie-break") {
    import spark.implicits._
    import graft.linker.PopularEntitiesLinker
    // entity E1 canonical name normalized; two candidates for the alias
    val ment = mentions.limit(50).cache()
    val surf = ment.head().norm_surface
    val aliases = Seq(
      (surf, "Zx9", "alias"), // higher id, alias source
      (surf, "Ax1", "name"), // name source
      (surf, "Mx5", "alias")).toDF("alias", "entity_id", "source")
    // equal sitelinks: name-source with smallest id must win
    val equalSl = Seq(("Zx9", 10L), ("Ax1", 10L), ("Mx5", 10L)).toDF("entity_id", "sitelinks")
    val got1 = PopularEntitiesLinker.link(ment, aliases, equalSl)
      .where(col("surface").isNotNull).select("entity_id").head().getString(0)
    assert(got1 == "Ax1", s"name-source preference broken: $got1")
    // higher sitelinks dominates source preference
    val skewSl = Seq(("Zx9", 99L), ("Ax1", 10L), ("Mx5", 10L)).toDF("entity_id", "sitelinks")
    val got2 = PopularEntitiesLinker.link(ment, aliases, skewSl)
      .select("entity_id").head().getString(0)
    assert(got2 == "Zx9", s"sitelink argmax broken: $got2")
    // minScore filters everything -> no rows
    val none = PopularEntitiesLinker.link(ment, aliases, equalSl, minScore = 50L)
    assert(none.count() == 0)
  }

  test("prior linker argmax is deterministic under repartitioning") {
    val lf = KbBuild.linkFrequencies(pages).cache()
    val l1 = BaselineLinker.linkByPrior(mentions, lf)
      .select("mention_id", "entity_id").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val l2 = BaselineLinker.linkByPrior(
      Mentions.fromPages(pages.repartition(7)), lf.repartition(5))
      .select("mention_id", "entity_id").collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(l1 == l2)
  }
}
