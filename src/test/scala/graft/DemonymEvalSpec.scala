package graft

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.eval.{CaseLogic, ErrorLabeler}
import graft.eval.CaseModel._
import graft.sources.MappingTables

/** End-to-end demonym evaluation path: a demonym TSV read by
  * MappingTables.demonyms feeds ErrorMeta, and the resulting
  * DISAMBIGUATION_DEMONYM_* labels match the EXECUTED reference
  * (tools/gen_demonym_fixtures.py → golden/demonym_eval.json) —
  * the round-1 gap where demonyms were only exercised via
  * spec-constructed sets. Round-2 extension: the same harness exercises
  * the METONYMY, RARE and PARTIAL_NAME disambiguation labels via a
  * crafted most-popular-candidates map, all executed-reference-golden. */
class DemonymEvalSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/demonym_eval.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  private def fields(v: ujsonLite.Value): Map[String, ujsonLite.Value] =
    v.node.properties().asScala.map(e => e.getKey -> ujsonLite.Value(e.getValue)).toMap

  private def docFrom(line: ujsonLite.Value): EvalDoc = {
    val text = line("text").str
    val labels = line("labels").arr.map { l =>
      GtLabel(
        l("id").num.toInt, l("span").arr(0).num.toInt, l("span").arr(1).num.toInt,
        l("entity_id").str,
        if (l.node.has("name")) l("name").str else "Unknown",
        if (l.node.has("parent") && !l("parent").isNull) Some(l("parent").num.toInt) else None,
        Nil, optionalFlag = false,
        if (l.node.has("type")) l("type").str.split('|').toSeq.filter(_.nonEmpty) else Nil,
        None, desc = false)
    }.toSeq
    val preds =
      if (!line.node.has("entity_mentions") || line("entity_mentions").isNull) Nil
      else line("entity_mentions").arr.map { m =>
        PredSpan(m("span").arr(0).num.toInt, m("span").arr(1).num.toInt, m("id").str,
          if (m.node.has("candidates")) m("candidates").arr.map(_.str).toSeq else Nil,
          if (m.node.has("linked_by")) m("linked_by").str else "")
      }.toSeq
    EvalDoc(line("title").str, text,
      line("evaluation_span").arr(0).num.toInt, line("evaluation_span").arr(1).num.toInt,
      labels, preds)
  }

  test("demonym file -> MappingTables.demonyms -> surface set matches the reference reader") {
    val tsv = golden("demonym_tsv").str
    val f = Files.createTempFile("demonyms", ".tsv")
    Files.write(f, tsv.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    val surfaces = MappingTables.demonyms(spark, f.toString)
      .collect().map(_.getString(0)).toSet
    val want = golden("demonym_surfaces").arr.map(_.str).toSet
    assert(surfaces === want) // incl. auto-plurals (Germans, Americans, Frenchs)
  }

  test("demonym-populated eval reproduces DISAMBIGUATION_DEMONYM_* labels of the executed reference") {
    val tsv = golden("demonym_tsv").str
    val f = Files.createTempFile("demonyms", ".tsv")
    Files.write(f, tsv.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    // the engine path: TSV scan -> demonym surface set -> ErrorMeta
    val surfaces = MappingTables.demonyms(spark, f.toString)
      .collect().map(_.getString(0)).toSet
    val typeDb = fields(golden("type_db")).map { case (k, v) => k -> v.arr.map(_.str).toSeq }
    val names = fields(golden("names")).map { case (k, v) => k -> v.str }
    val mostPopular = fields(golden("most_popular")).map { case (k, v) => k -> v.arr.map(_.str).toSet }
    val entityMeta = EntityMeta(typeDb, Set.empty, Set.empty, names)
    val errMeta = ErrorLabeler.ErrorMeta(
      demonyms = surfaces, mostPopularCandidates = mostPopular, types = typeDb)

    val articles = golden("articles").arr
    val goldenCases = golden("cases").arr
    var demonymLabelsChecked = 0
    articles.zip(goldenCases).zipWithIndex.foreach { case ((art, gcs), docIdx) =>
      val doc = docFrom(art)
      val ours = CaseLogic.generateCases(doc, entityMeta, errMeta)
        .map(c => (c.begin, c.end) -> c).toMap
      assert(ours.size == gcs.arr.size, s"doc $docIdx case count")
      gcs.arr.foreach { g =>
        val span = (g("span").arr(0).num.toInt, g("span").arr(1).num.toInt)
        val c = ours.getOrElse(span, fail(s"doc $docIdx: no case for $span"))
        Seq("IGNORED" -> c.errorsIgnored, "REQUIRED" -> c.errorsRequired).foreach {
          case (mode, oursLabels) =>
            val want = g("error_labels")(mode).arr.map(_.str).toSet
            assert(oursLabels.toSet === want,
              s"doc $docIdx $span [$mode]: got=${oursLabels.toSet} want=$want")
            demonymLabelsChecked += want.count(l => l.contains("DEMONYM") ||
              l.contains("METONYMY") || l.contains("RARE") || l.contains("PARTIAL_NAME"))
        }
      }
    }
    assert(demonymLabelsChecked >= 14,
      "fixture must exercise demonym/metonymy/rare/partial-name labels in both modes")
  }

  test("KbMetaLoader directory load reproduces the demonym/metonymy/rare goldens end-to-end") {
    // same goldens, but EVERY mapping flows through the COMPOSED loader
    // from a crafted small-data-files-layout directory — no hand-built
    // maps (the reference's linking_system.load_missing_mappings path).
    val dir = Files.createTempDirectory("kbmeta").toFile
    dir.deleteOnExit()
    def write(name: String, content: String): Unit = {
      val p = dir.toPath.resolve(name)
      Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      p.toFile.deleteOnExit()
    }
    write("qid_to_demonym.tsv", golden("demonym_tsv").str)
    write("entity_to_types.tsv",
      fields(golden("type_db")).toSeq.sortBy(_._1)
        .map { case (q, ts) => (q +: ts.arr.map(_.str)).mkString("\t") }
        .mkString("\n"))
    write("entity_to_name.tsv",
      fields(golden("names")).toSeq.sortBy(_._1)
        .map { case (q, n) => s"$q\t${n.str}" }.mkString("\n"))
    write("hyperlink_to_most_popular_candidates.tsv",
      fields(golden("most_popular")).toSeq.sortBy(_._1)
        .map { case (a, qs) => s"$a\t${qs.arr.map(_.str).mkString(",")}" }
        .mkString("\n"))

    val meta = graft.sources.KbMetaLoader.load(spark, dir.getPath)
    // loader-assembled metas equal the hand-built ones of the test above
    assert(meta.entityMeta.types ===
      fields(golden("type_db")).map { case (k, v) => k -> v.arr.map(_.str).toSeq })
    assert(meta.errorMeta.demonyms.nonEmpty && meta.errorMeta.mostPopularCandidates.nonEmpty)

    val articles = golden("articles").arr
    val goldenCases = golden("cases").arr
    articles.zip(goldenCases).zipWithIndex.foreach { case ((art, gcs), docIdx) =>
      val doc = docFrom(art)
      val ours = CaseLogic.generateCases(doc, meta.entityMeta, meta.errorMeta)
        .map(c => (c.begin, c.end) -> c).toMap
      gcs.arr.foreach { g =>
        val span = (g("span").arr(0).num.toInt, g("span").arr(1).num.toInt)
        val c = ours.getOrElse(span, fail(s"doc $docIdx: no case for $span"))
        Seq("IGNORED" -> c.errorsIgnored, "REQUIRED" -> c.errorsRequired).foreach {
          case (mode, oursLabels) =>
            val want = g("error_labels")(mode).arr.map(_.str).toSet
            assert(oursLabels.toSet === want,
              s"doc $docIdx $span [$mode] via loader: got=${oursLabels.toSet} want=$want")
        }
      }
    }
  }
}
