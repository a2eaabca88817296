package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.sources.{BenchmarkReaders2, NifReader}

/** S4 reader tail (tsv/pubtator/refined/xml/tagme) vs goldens produced by
  * EXECUTING the reference readers (tools/gen_reader_fixtures.py →
  * golden/readers_tail.json), + the S3 NIF/OKE turtle-subset reader on
  * hand-verified fixtures. */
class ReadersTailSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/readers_tail.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  // must mirror tools/gen_reader_fixtures.py
  private val Title2Qid = Map(
    "Albert Einstein" -> "Q937", "Ulm" -> "Q3012", "Germany" -> "Q183",
    "United States" -> "Q30", "Berlin" -> "Q64")
  private val Wid2Title = Map(1001L -> "Albert Einstein", 1002L -> "Ulm", 1003L -> "Missing Title")

  private def tmp(content: String, suffix: String = ".txt"): String = {
    val f = Files.createTempFile("readers", suffix)
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  private case class GLabel(id: Int, begin: Int, end: Int, entityId: String,
      parent: Option[Int], children: Seq[Int])
  private case class GArticle(title: String, text: String, labels: Seq[GLabel])

  private def goldenArticles(reader: String): Seq[GArticle] =
    golden(reader)("articles").arr.map { a =>
      GArticle(a("title").str, a("text").str,
        a("labels").arr.map { l =>
          GLabel(l("label_id").num.toInt, l("begin").num.toInt, l("end").num.toInt,
            l("entity_id").str,
            if (l("parent").isNull) None else Some(l("parent").num.toInt),
            l("children").arr.map(_.num.toInt))
        })
    }

  private def toComparable(d: EvalDoc, title: String): GArticle =
    GArticle(title, d.text, d.labels.map(l =>
      GLabel(l.id, l.begin, l.end, l.entityId, l.parent, l.children.sorted)))

  test("tsv reader matches the executed reference (IOB spans, empty-line yields, trailing block)") {
    val g = goldenArticles("tsv")
    val got = BenchmarkReaders2.parseTsv(golden("tsv")("input").str, Title2Qid)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, w.title) === w, s"article ${d.url}")
    }
  }

  test("pubtator reader matches the executed reference (title+abstract text, MESH prefix hack)") {
    val g = goldenArticles("pubtator")
    val got = BenchmarkReaders2.parsePubtator(golden("pubtator")("input").str)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, d.url) === w, s"article ${d.url}") // url carries the title
    }
  }

  test("pubtator reader drops a last article without trailing blank line (reference quirk)") {
    val input = "9|t|T\n9|a|A\n" // no trailing blank line
    assert(BenchmarkReaders2.parsePubtator(input).isEmpty)
    assert(BenchmarkReaders2.parsePubtator(input + "\n").length === 1)
  }

  test("refined-jsonl reader matches the executed reference (nested labels, missing title)") {
    val g = goldenArticles("refined_jsonl")
    val got = BenchmarkReaders2.parseRefinedJsonl(golden("refined_jsonl")("input").str, Title2Qid)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, d.url) === w, s"article ${d.url}")
    }
  }

  test("xml reader (single labels file) matches the executed reference incl. negative lstrip spans") {
    val g = goldenArticles("xml")
    val texts = golden("xml")("texts")
    val textSeq = texts.node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
    val dict = BenchmarkReaders2.mentionDictFromXml(golden("xml")("labels_xml").str)
    val got = BenchmarkReaders2.xmlBenchmarkDocs(dict, textSeq, Title2Qid)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, d.url) === w, s"article ${d.url}")
    }
    // the reference emits NEGATIVE spans for annotations before the lstrip offset
    assert(got.head.labels.exists(_.begin < 0))
  }

  test("xml reader (directory labels) matches the executed reference") {
    val g = goldenArticles("xml_dir")
    val texts = golden("xml_dir")("texts")
    val textSeq = texts.node.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toSeq
    val xmls = golden("xml_dir")("labels_xmls")
    val xmlSeq = xmls.node.properties().asScala.toSeq.sortBy(_.getKey).map(_.getValue.asText())
    val dict = BenchmarkReaders2.mentionDictFromDirXml(xmlSeq)
    val got = BenchmarkReaders2.xmlBenchmarkDocs(dict, textSeq, Title2Qid)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, d.url) === w, s"article ${d.url}")
    }
  }

  test("tagme reader matches the executed reference incl. the pending-annotation drop quirk") {
    val g = goldenArticles("tagme")
    val got = BenchmarkReaders2.parseTagme(
      golden("tagme")("snippets").str, golden("tagme")("annotations").str, Wid2Title, Title2Qid)
    assert(got.length === g.length)
    got.zip(g).foreach { case (d, w) =>
      assert(toComparable(d, w.title) === w, s"article ${d.url}")
    }
    // the reference LOSES the pending (3, ulm) annotation when snippet
    // line 2 (no annotations) intervenes — article 3 keeps only "mention"
    assert(got(2).labels.map(_.entityId) === Seq(NO_MAPPING))
  }

  // ---------- NIF / OKE -------------------------------------------------------

  private val nifFixture =
    """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
      |@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
      |@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
      |
      |# parent context with empty text must be skipped (kore50 quirk)
      |<http://ex.org/parent> a nif:Context ;
      |    nif:isString "" .
      |
      |<http://ex.org/b-doc#char=0,27>
      |    a nif:String , nif:Context ;
      |    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
      |    nif:endIndex "27"^^xsd:nonNegativeInteger ;
      |    nif:isString "Albert Einstein was in Ulm."@en .
      |
      |<http://ex.org/b-doc#char=0,15>
      |    a nif:String , nif:Phrase ;
      |    nif:referenceContext <http://ex.org/b-doc#char=0,27> ;
      |    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
      |    nif:endIndex "15"^^xsd:nonNegativeInteger ;
      |    itsrdf:taIdentRef <http://dbpedia.org/resource/Albert_Einstein> .
      |
      |<http://ex.org/b-doc#char=23,26>
      |    a nif:Phrase ;
      |    nif:referenceContext <http://ex.org/b-doc#char=0,27> ;
      |    nif:beginIndex "23"^^xsd:nonNegativeInteger ;
      |    nif:endIndex "26"^^xsd:nonNegativeInteger ;
      |    itsrdf:taIdentRef <http://www.wikidata.org/entity/Q3012> .
      |
      |<http://ex.org/a-doc#char=0,20>
      |    a nif:Context ;
      |    nif:isString "He said \"hi\" in Ulm." .
      |
      |<http://ex.org/a-doc#char=16,19>
      |    a nif:Phrase ;
      |    nif:referenceContext <http://ex.org/a-doc#char=0,20> ;
      |    nif:beginIndex "16"^^xsd:nonNegativeInteger ;
      |    nif:endIndex "19"^^xsd:nonNegativeInteger ;
      |    itsrdf:taIdentRef <http://en.wikipedia.org/wiki/Ulm> .
      |
      |<http://ex.org/a-doc#char=0,2>
      |    a nif:Phrase ;
      |    nif:referenceContext <http://ex.org/a-doc#char=0,20> ;
      |    nif:beginIndex "0"^^xsd:nonNegativeInteger ;
      |    nif:endIndex "2"^^xsd:nonNegativeInteger .
      |""".stripMargin

  test("NIF reader: contexts sorted by URI, empty context skipped, phrases sorted, escapes handled") {
    val docs = NifReader.docsFromNif(nifFixture, Title2Qid)
    assert(docs.length === 2)
    // a-doc sorts before b-doc
    assert(docs(0).url === "http://ex.org/a-doc#char=0,20")
    assert(docs(0).text === "He said \"hi\" in Ulm.")
    // phrase without taIdentRef -> NIL; sorted by beginIndex
    assert(docs(0).labels.map(l => (l.begin, l.end, l.entityId)) ===
      Seq((0, 2, NIL), (16, 19, "Q3012")))
    assert(docs(1).text === "Albert Einstein was in Ulm.")
    assert(docs(1).labels.map(l => (l.begin, l.end, l.entityId)) ===
      Seq((0, 15, "Q937"), (23, 26, "Q3012")))
  }

  test("NIF reader: customKb keeps raw URIs") {
    val docs = NifReader.docsFromNif(nifFixture, Map.empty, customKb = true)
    assert(docs(1).labels.head.entityId === "http://dbpedia.org/resource/Albert_Einstein")
    assert(docs(0).labels.head.entityId === NIL) // no taIdentRef
  }

  private val okeFixture =
    """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
      |@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
      |@prefix owl: <http://www.w3.org/2002/07/owl#> .
      |
      |<http://ex.org/task#Einstein> owl:sameAs <http://dbpedia.org/resource/Albert_Einstein> .
      |
      |<http://ex.org/doc#char=0,27>
      |    a nif:Context ;
      |    nif:isString "Albert Einstein was in Ulm." .
      |
      |<http://ex.org/doc#char=0,15>
      |    a nif:Phrase ;
      |    nif:referenceContext <http://ex.org/doc#char=0,27> ;
      |    nif:beginIndex "0" ;
      |    nif:endIndex "15" ;
      |    itsrdf:taIdentRef <http://ex.org/task#Einstein> .
      |
      |<http://ex.org/doc#char=23,26>
      |    a nif:Phrase ;
      |    nif:referenceContext <http://ex.org/doc#char=0,27> ;
      |    nif:beginIndex "23" ;
      |    nif:endIndex "26" ;
      |    itsrdf:taIdentRef <http://ex.org/task#Ulm> .
      |""".stripMargin

  test("OKE reader: taIdentRef resolves through sameAs; unmapped stays NIL") {
    val docs = NifReader.docsFromNif(okeFixture, Title2Qid, oke = true)
    assert(docs.length === 1)
    assert(docs(0).labels.map(l => (l.begin, l.entityId)) ===
      Seq((0, "Q937"), (23, NIL)))
  }

  test("NIF readers run distributed via wholeTextFiles") {
    val dir = Files.createTempDirectory("nif").toString
    Files.write(java.nio.file.Paths.get(dir, "b.ttl"), nifFixture.getBytes(StandardCharsets.UTF_8))
    val docs = NifReader.nifBenchmark(spark, dir, Title2Qid).collect()
    assert(docs.length === 2)
    val tsvDocs = BenchmarkReaders2.tsvBenchmark(spark, tmp(golden("tsv")("input").str), Title2Qid).collect()
    assert(tsvDocs.length === goldenArticles("tsv").length)
    val pubDocs = BenchmarkReaders2.pubtatorBenchmark(spark, tmp(golden("pubtator")("input").str)).collect()
    assert(pubDocs.length === goldenArticles("pubtator").length)
    val refDocs = BenchmarkReaders2.refinedJsonlBenchmark(
      spark, tmp(golden("refined_jsonl")("input").str, ".jsonl"), Title2Qid).collect()
    assert(refDocs.length === goldenArticles("refined_jsonl").length)
  }
}
