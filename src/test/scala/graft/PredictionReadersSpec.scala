package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.CaseModel._
import graft.sources.{BenchmarkReader, PredictionReaders}

/** S5 prediction readers (ambiverse / EPGEL) vs goldens from the EXECUTED
  * reference (tools/gen_pred_fixtures.py → golden/pred_readers.json), and
  * the NIF prediction reader via the turtle-subset parser + text-prefix
  * attach. */
class PredictionReadersSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/pred_readers.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  private val Title2Qid = Map("Albert Einstein" -> "Q937", "Ulm" -> "Q3012", "Berlin" -> "Q64")

  private def fields(v: ujsonLite.Value): Map[String, ujsonLite.Value] =
    v.node.properties().asScala.map(e => e.getKey -> ujsonLite.Value(e.getValue)).toMap

  /** golden None entity → NIL (PredSpan ids are non-null). */
  private def wantArticles(reader: String): Seq[Seq[(Int, Int, String, Seq[String])]] =
    golden(reader)("articles").arr.map(_.arr.map { p =>
      (p("begin").num.toInt, p("end").num.toInt,
        if (p("entity_id").isNull) NIL else p("entity_id").str,
        p("candidates").arr.map(_.str).toSeq)
    }.toSeq)

  private def comparable(ps: Seq[PredSpan]): Seq[(Int, Int, String, Seq[String])] =
    ps.map(p => (p.begin, p.end, p.entityId, p.candidates.sorted)).sortBy(x => (x._1, x._2))

  test("ambiverse reader matches the executed reference (name-over-QID remap, NIL forms)") {
    val dir = Files.createTempDirectory("amb")
    fields(golden("ambiverse")("files")).foreach { case (name, content) =>
      Files.write(dir.resolve(name), content.str.getBytes(StandardCharsets.UTF_8))
    }
    val got = PredictionReaders.ambiversePredictions(spark, dir.toString, Title2Qid)
      .collect().sortBy(_._1).map(x => comparable(x._2)).toSeq
    assert(got === wantArticles("ambiverse"))
    // the remap quirk: match QID Q999 replaced by the name-derived Q937
    assert(got.head.head._3 === "Q937")
  }

  test("epgel reader matches the executed reference (index gaps, empty candidates -> NIL)") {
    val d = Files.createTempDirectory("epgel")
    Files.write(d.resolve("x_input.jsonl"),
      golden("epgel")("input").str.getBytes(StandardCharsets.UTF_8))
    Files.write(d.resolve("x_output.jsonl"),
      golden("epgel")("output").str.getBytes(StandardCharsets.UTF_8))
    val got = PredictionReaders.epgelPredictions(spark,
      d.resolve("x_output.jsonl").toString, d.resolve("x_input.jsonl").toString)
      .collect().sortBy(_._1).map(x => comparable(x._2)).toSeq
    assert(got === wantArticles("epgel"))
    assert(got(1).isEmpty) // article index 1 has no mentions
  }

  test("epgel line-count mismatch returns all articles empty (reference quirk)") {
    val got = PredictionReaders.parseEpgel(
      golden("epgel")("input").str, golden("epgel_mismatch")("output").str)
    assert(got.length === 3 && got.forall(_.isEmpty))
  }

  test("wexea reader matches the executed reference (reconstructed offsets, coref split)") {
    val files = fields(golden("wexea")("files"))
    val dir = Files.createTempDirectory("wexea")
    files.foreach { case (n, c) =>
      Files.write(dir.resolve(n), c.str.getBytes(StandardCharsets.UTF_8))
    }
    val got = PredictionReaders.wexeaPredictions(spark, dir.toString, Title2Qid)
      .collect().sortBy(_._1).map(x => comparable(x._2)).toSeq
    assert(got === wantArticles("wexea"))
    val gotCoref = PredictionReaders.wexeaPredictions(spark, dir.toString, Title2Qid, coref = true)
      .collect().sortBy(_._1).map(x => comparable(x._2)).toSeq
    assert(gotCoref === golden("wexea")("coref_articles").arr.map(_.arr.map { p =>
      (p("begin").num.toInt, p("end").num.toInt,
        if (p("entity_id").isNull) NIL else p("entity_id").str,
        p("candidates").arr.map(_.str).toSeq)
    }.toSeq))
  }

  test("wikifier reader matches the executed reference (page-id title repair, forced-wikipedia mapping)") {
    val dir = Files.createTempDirectory("wikifier")
    Files.write(dir.resolve("doc1.full.xml"),
      golden("wikifier")("xml").str.getBytes(StandardCharsets.UTF_8))
    Files.write(dir.resolve("ignored.partial.xml"),
      golden("wikifier")("xml").str.getBytes(StandardCharsets.UTF_8))
    val wid2title = Map(101L -> "Albert Einstein", 102L -> "Ulm", 103L -> "Sao Paulo",
      3658264L -> "Williams Lake Water Aerodrome")
    val t2q = Title2Qid ++ Map("Rio de Janeiro" -> "Q8678", "Sao Paulo" -> "Q174")
    val got = PredictionReaders.wikifierPredictions(spark, dir.toString, wid2title, t2q)
      .collect().sortBy(_._1).map(x => comparable(x._2)).toSeq
    assert(got.length === 1) // only *.full.xml files are read
    assert(got === wantArticles("wikifier"))
    // the '?'-repair path: S?o_Paulo repaired via page id 103 -> Q174
    assert(got.head.exists(_._3 == "Q174"))
  }

  test("NIF predictions attach to articles by text prefix") {
    import spark.implicits._
    val ttl =
      """@prefix nif: <http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#> .
        |@prefix itsrdf: <http://www.w3.org/2005/11/its/rdf#> .
        |<http://ex.org/d1> a nif:Context ; nif:isString "Albert Einstein was in Ulm." .
        |<http://ex.org/d1#p1> a nif:Phrase ;
        |  nif:referenceContext <http://ex.org/d1> ;
        |  nif:beginIndex "0" ; nif:endIndex "15" ;
        |  itsrdf:taIdentRef <http://www.wikidata.org/entity/Q937> .
        |""".stripMargin
    val predsWithText = PredictionReaders.nifPredictionsWithText(ttl, Title2Qid)
    assert(predsWithText.length === 1)
    val docs = Seq(
      EvalDoc("a", "Albert Einstein was in Ulm.", 0, 27, Nil, Nil),
      EvalDoc("b", "Unrelated text.", 0, 15, Nil, Nil)).toDS()
    val attached = BenchmarkReader.attachPredictionsByTextPrefix(
      docs, predsWithText.toDS()).collect().sortBy(_.url)
    assert(attached(0).predictions.map(p => (p.begin, p.end, p.entityId)) ===
      Seq((0, 15, "Q937")))
    assert(attached(1).predictions.isEmpty)
  }
}
