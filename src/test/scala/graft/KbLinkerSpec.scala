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
