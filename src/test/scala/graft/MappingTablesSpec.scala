package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CustomMappings, KbMetaLoader, MappingTables, TypeAdjustments}

/** S7 mapping-table readers + F7 type adjustments vs goldens produced by
  * EXECUTING the reference (tools/gen_mapping_fixtures.py →
  * golden/mapping_tables.json). Every file-format quirk asserted here is
  * the reference's actual behavior, not an assumption. */
class MappingTablesSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark

  private val golden: ujsonLite.Value = {
    val p = getClass.getResourceAsStream("/golden/mapping_tables.json")
    ujsonLite.parse(new String(p.readAllBytes(), StandardCharsets.UTF_8))
  }

  private def fields(v: ujsonLite.Value): Map[String, ujsonLite.Value] =
    v.node.properties().asScala.map(e => e.getKey -> ujsonLite.Value(e.getValue)).toMap

  private def tmp(content: String): String = {
    val f: Path = Files.createTempFile("mapping", ".txt")
    Files.write(f, content.getBytes(StandardCharsets.UTF_8))
    f.toFile.deleteOnExit()
    f.toString
  }

  private def goldenAdjustments(v: ujsonLite.Value): TypeAdjustments.Adjustments =
    TypeAdjustments.Adjustments(
      fields(v("REPLACE_WITH")).map { case (k, x) => k -> x.str },
      fields(v("MINUS")).map { case (k, x) => k -> x.str })

  test("F7: adjustments file parse matches the executed reference") {
    val g = golden("adjustments_parse")
    val parsed = TypeAdjustments.parseFile(tmp(g("input").str))
    val want = goldenAdjustments(g("parsed"))
    assert(parsed.replaceWith === want.replaceWith)
    assert(parsed.minus === want.minus)
  }

  test("F7: adjusted_entity_types matches the executed reference on every case") {
    val g = golden("adjusted_entity_types")
    val adj = goldenAdjustments(g("adjustments"))
    val typeDb = fields(g("type_db")).map { case (k, v) => k -> v.arr.map(_.str) }
    val results = fields(g("results")).map { case (k, v) => k -> v.arr.map(_.str) }
    val other = g("other_label").str
    results.foreach { case (entity, want) =>
      val types = typeDb.get(entity)
      val got = types match {
        case Some(ts) => TypeAdjustments.adjust(ts.toSeq, adj)
        case None => Seq(other) // join-miss → [OTHER]
      }
      assert(got === want.toSeq, s"entity $entity (input ${types.getOrElse(Nil)})")
    }
    // includes the Python remove-during-iteration quirk:
    assert(results("e_remove_skips_next").toSeq === Seq("Q999", "Q215627"))
    // no-adjustments passthrough
    val plain = fields(g("results_no_adjustments")).map { case (k, v) => k -> v.arr.map(_.str) }
    plain.foreach { case (entity, want) =>
      val got = typeDb.get(entity).map(ts => TypeAdjustments.adjust(ts.toSeq, TypeAdjustments.Empty))
        .getOrElse(Seq(other))
      assert(got === want.toSeq, s"no-adjustments entity $entity")
    }
  }

  test("S7: whitelist types with REPLACE_WITH-left skip match the reference") {
    val g = golden("whitelist_with_adjustments")
    val adjG = golden("adjustments_parse")
    val adj = TypeAdjustments.parseFile(tmp(adjG("input").str))
    val path = tmp(g("whitelist_input").str)
    val got = MappingTables.whitelistTypes(spark, path, Some(adj))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = fields(g("types")).map { case (k, v) => k -> v.str }
    assert(got === want)
    val gotPlain = MappingTables.whitelistTypes(spark, path, None)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val wantPlain = fields(g("types_plain")).map { case (k, v) => k -> v.str }
    assert(gotPlain === wantPlain)
  }

  test("S7: demonyms reader matches the reference (plural expansion, append order, dup quirk)") {
    val g = golden("demonyms")
    val got = MappingTables.demonyms(spark, tmp(g("input").str))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val want = fields(g("mapping")).map { case (k, v) => k -> v.arr.map(_.str).toList }
    assert(got === want)
    // the duplicate-append quirk survives round-trip
    assert(got("Swedes") === List("Q34", "Q34"))
    assert(got.contains("Swedess"))
  }

  test("S7: languages reader matches the reference (last line wins)") {
    val g = golden("languages")
    val got = MappingTables.languages(spark, tmp(g("input").str))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = fields(g("mapping")).map { case (k, v) => k -> v.str }
    assert(got === want)
    assert(got("German") === "Q188000") // overwritten by the later line
  }

  test("S7: gender reader matches the reference token classification") {
    val g = golden("gender")
    val got = MappingTables.genderMapping(spark, tmp(g("input").str))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val want = fields(g("mapping")).map { case (k, v) => k -> v.str }
    assert(got === want)
    assert(got("Q3") === "FEMALE") // "transgender female"
    assert(got("Q5") === "MALE")   // "male organism"
  }

  test("S7: coreference-types reader matches the reference (';'-join, empty list)") {
    val g = golden("coref_types")
    val got = MappingTables.corefTypes(spark, tmp(g("input").str))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val want = fields(g("mapping")).map { case (k, v) => k -> v.arr.map(_.str).toList }
    assert(got === want)
    assert(got("Q3") === List("")) // "".split(";") -> [""]
  }

  test("S7: instance-of reader matches the reference (Q-filter, set semantics, restriction)") {
    val g = golden("instance_of")
    val path = tmp(g("input").str)
    val got = MappingTables.itemToQidSet(spark, path)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val want = fields(g("mapping")).map { case (k, v) => k -> v.arr.map(_.str).toList }
    assert(got === want)
    import spark.implicits._
    val relevant = Seq("Q76").toDF("key")
    val gotR = MappingTables.itemToQidSet(spark, path, Some(relevant))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    val wantR = fields(g("restricted")).map { case (k, v) => k -> v.arr.map(_.str).toList }
    assert(gotR === wantR)
  }

  test("S7: adjusted types table applies F7 over a types dimension") {
    import spark.implicits._
    val adjG = golden("adjustments_parse")
    val adj = TypeAdjustments.parseFile(tmp(adjG("input").str))
    val typeDb = Seq(
      ("e_replace", Seq("Q95074")),
      ("e_remove_skips_next", Seq("Q729", "Q999", "Q215627"))).toDF("entity_id", "types")
    val got = TypeAdjustments.adjustedTypesTable(typeDb, adj)
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("e_replace") === List("Q215627"))
    assert(got("e_remove_skips_next") === List("Q999", "Q215627"))
  }

  test("extract_custom_mappings: turtle -> three TSVs, loadable end-to-end by KbMetaLoader") {
    val ttl =
      """@prefix skos: <http://www.w3.org/2004/02/skos/core#> .
        |@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
        |@prefix ex: <http://example.org/> .
        |ex:e1 skos:prefLabel "Alpha Corp" ; rdfs:subClassOf ex:company .
        |ex:e2 skos:prefLabel "Beta" ; rdfs:subClassOf ex:company, ex:startup .
        |ex:company skos:prefLabel "Company" .
        |""".stripMargin
    val ex = CustomMappings.extract(ttl)
    val EX = "http://example.org/"
    assert(ex.entityToName.toMap ===
      Map(s"${EX}e1" -> "Alpha Corp", s"${EX}e2" -> "Beta", s"${EX}company" -> "Company"))
    assert(ex.entityToTypes.toMap ===
      Map(s"${EX}e1" -> Seq(s"${EX}company"),
        s"${EX}e2" -> Seq(s"${EX}company", s"${EX}startup")))
    // whitelist: a type with its own prefLabel keeps it, unnamed types -> OTHER
    assert(ex.whitelistTypes.toMap ===
      Map(s"${EX}company" -> "Company", s"${EX}startup" -> "OTHER"))

    val dir = java.nio.file.Files.createTempDirectory("custommap").toFile
    dir.deleteOnExit()
    CustomMappings.writeFiles(ex, dir.getPath)
    val meta = KbMetaLoader.load(spark, dir.getPath)
    assert(meta.entityMeta.name(s"${EX}e1") == "Alpha Corp")
    assert(meta.entityMeta.types(s"${EX}e2") === Seq(s"${EX}company", s"${EX}startup"))
    assert(meta.whitelist(s"${EX}startup") == "OTHER")
  }

  test("KbMetaLoader loads gender / coref-types / quantity / datetime files (reference semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("kbmeta2").toFile
    dir.deleteOnExit()
    def write(name: String, content: String): Unit = {
      val p = dir.toPath.resolve(name)
      java.nio.file.Files.write(p, content.getBytes(StandardCharsets.UTF_8))
      p.toFile.deleteOnExit()
    }
    write("qid_to_gender.tsv", "Q1\tfemale organism\nQ2\tmale\nQ3\ttrans woman\n")
    write("qid_to_coreference_types.tsv", "Q1\tperson;artist\nQ2\t\n")
    write("quantity.tsv", "Q11\nQ12\n")
    write("datetime.tsv", "Q21\n")
    val meta = KbMetaLoader.load(spark, dir.getPath)
    // gender tokenization: a "female" token wins, then "male"; otherwise OTHER
    assert(meta.gender === Map("Q1" -> "FEMALE", "Q2" -> "MALE", "Q3" -> "OTHER"))
    // empty coref value = Python "".split(";") = [""]
    assert(meta.corefTypes === Map("Q1" -> Seq("person", "artist"), "Q2" -> Seq("")))
    assert(meta.entityMeta.quantities === Set("Q11", "Q12"))
    assert(meta.entityMeta.datetimes === Set("Q21"))
    // determineType consults the quantity/datetime sets first
    assert(meta.entityMeta.determineType("Q11") == "QUANTITY")
    assert(meta.entityMeta.determineType("Q21") == "DATETIME")
  }
}
