package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.model.Section
import graft.sources.CorpusJobs

/** Executed-reference goldens for the corpus scans + dump-mapping jobs
  * (tools/gen_corpus_fixtures.py runs NewscrawlDumpReader.json2article,
  * WikipediaDumpReader.json2article, Article.get_abstract_span and the
  * REAL EntityDatabase.link2id / get_wikidata_qid chain on synthetic
  * inputs). */
class CorpusJobsSpec extends AnyFunSuite {

  private lazy val golden: ujsonLite.Value = {
    val s = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/corpus_jobs.json"), "UTF-8").mkString
    ujsonLite.parse(s)
  }

  private def spark = SparkSessions.spark

  private def writeJsonl(lines: Vector[ujsonLite.Value]): String = {
    val dir = Files.createTempDirectory("corpus")
    val p = dir.resolve("in.jsonl")
    Files.write(p, lines.map(_.node.toString).mkString("\n").getBytes(StandardCharsets.UTF_8))
    p.toString
  }

  test("newscrawl scan matches json2article on every golden line") {
    val cases = golden("newscrawl").arr
    val path = writeJsonl(cases.map(_("input")))
    val got = CorpusJobs.newscrawlArticles(spark, path).collect()
      .map(a => (a.id, a.title, a.text)).sortBy(_._1)
    val want = cases.map(c => (c("id").str, c("title").str, c("text").str)).sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("wikipedia corpus scan matches json2article (extraction + spans)") {
    val cases = golden("wikipedia").arr
    val path = writeJsonl(cases.map(_("input")))
    val got = CorpusJobs.wikipediaArticles(spark, path).collect()
      .map(a => (a.id, (a.title, a.text, a.url,
        a.hyperlinks.map(h => (h.begin, h.end, h.target)),
        a.sections.map(s => (s.begin, s.end, s.title))))).toMap
    for (c <- cases) {
      val (title, text, url, links, secs) = got(c("id").num.toLong.toString)
      assert(title == c("title").str && text == c("text").str && url == c("url").str)
      val wantLinks = c("hyperlinks").arr.map(l =>
        (l.arr(0).arr(0).num.toInt, l.arr(0).arr(1).num.toInt, l.arr(1).str))
      assert(links == wantLinks.toSeq)
      val wantSecs = c("sections").arr.map(s =>
        (s.arr(0).arr(0).num.toInt, s.arr(0).arr(1).num.toInt, s.arr(1).str))
      assert(secs == wantSecs.toSeq)
    }
  }

  test("id->title mapping reproduces the script's sorted last-wins TSV") {
    val lines = golden("id_title")("input").arr
    val path = writeJsonl(lines)
    val arts = CorpusJobs.wikipediaArticles(spark, path)
    val df = CorpusJobs.idTitleMapping(arts)
    val out = Files.createTempDirectory("idt").resolve("map.tsv").toString
    CorpusJobs.writeTsvLocal(df, out)
    val got = Source.fromFile(out, "UTF-8").getLines().toVector
    assert(got == golden("id_title")("lines").arr.map(_.str))
  }

  test("abstract spans match Article.get_abstract_span on every case") {
    for (c <- golden("abstracts")("spans").arr) {
      val secs = c("sections").arr.map(s =>
        Section(s.arr(0).arr(0).num.toInt, s.arr(0).arr(1).num.toInt, s.arr(1).str))
      val got = CorpusJobs.abstractSpan(c("text").str, secs)
      val want = (c("span").arr(0).num.toInt, c("span").arr(1).num.toInt)
      assert(got.contains(want), s"span mismatch for ${c("title").str}")
    }
  }

  test("abstracts mapping reproduces the script's sorted TSV (QID chain + last-wins)") {
    val sp = spark
    import sp.implicits._
    val a = golden("abstracts")
    val path = writeJsonl(a("input").arr)
    val arts = CorpusJobs.wikipediaArticles(spark, path)
    val t2q = a("title2qid").arr.map(p => (p.arr(0).str, p.arr(1).str)).toDF("title", "qid")
    val red = a("redirects").arr.map(p => (p.arr(0).str, p.arr(1).str)).toDF("from_title", "to_title")
    val df = CorpusJobs.abstractsMapping(arts, t2q, red)
    val out = Files.createTempDirectory("abs").resolve("abs.tsv").toString
    CorpusJobs.writeTsvLocal(df, out)
    val got = Source.fromFile(out, "UTF-8").getLines().toVector
    assert(got == a("lines").arr.map(_.str))
  }

  test("lookup-key normalization handles NIL forms and empty names") {
    assert(CorpusJobs.wikipediaLookupKeys("").isEmpty)
    assert(CorpusJobs.wikipediaLookupKeys("<NIL>").isEmpty)
    assert(CorpusJobs.wikipediaLookupKeys("NIL").isEmpty)
    assert(CorpusJobs.wikipediaLookupKeys("trailing/").isEmpty)
    assert(CorpusJobs.wikipediaLookupKeys("A_B").contains(("A B", None)))
    assert(CorpusJobs.wikipediaLookupKeys("x/y%20z").contains(("y z", Some("Y z"))))
  }

  test("pySlice matches executed CPython on 250 random out-of-range vectors") {
    val g = ujsonLite.parse(Source.fromInputStream(
      getClass.getResourceAsStream("/golden/pyslice.json"), "UTF-8").mkString)
    g.arr.foreach { c =>
      val (str, a, b) = (c("s").str, c("a").num.toInt, c("b").num.toInt)
      assert(CorpusJobs.pySlice(str, a, b) == c("out").str,
        s"pySlice(${str}, $a, $b)")
    }
  }
}
