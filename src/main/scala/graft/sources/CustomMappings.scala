package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** scripts/extract_custom_mappings.py:12-66 — build the custom-KB mapping
  * TSVs (entity_to_name.tsv, entity_to_types.tsv, whitelist_types.tsv)
  * from a custom knowledge base / ontology turtle file, using the same
  * self-contained turtle-subset parser the NIF readers use.
  *
  * DECLARED divergence: the reference iterates an rdflib Graph, whose
  * triple order is run-dependent (set-backed) — so its type-list order
  * and file row order are themselves nondeterministic. This port uses
  * DOCUMENT order (first occurrence wins for dict insertion, types append
  * in document order), which is what a deterministic triple store would
  * produce; all downstream consumers (KbMetaLoader, whitelist readers)
  * are order-insensitive.
  */
object CustomMappings {

  val DefaultNamePredicate = "http://www.w3.org/2004/02/skos/core#prefLabel"
  val DefaultTypePredicate = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

  final case class Extracted(
      entityToName: Seq[(String, String)],
      entityToTypes: Seq[(String, Seq[String])],
      whitelistTypes: Seq[(String, String)])

  def extract(
      turtle: String,
      namePredicate: String = DefaultNamePredicate,
      typePredicate: String = DefaultTypePredicate): Extracted = {
    val triples = NifReader.parseTurtle(turtle)
    val names = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val types = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    val allTypes = scala.collection.mutable.LinkedHashMap.empty[String, String]
    triples.foreach { t =>
      if (t.pred == namePredicate) names(t.subj) = t.obj
      else if (t.pred == typePredicate) {
        types(t.subj) = types.getOrElse(t.subj, Vector.empty) :+ t.obj
        if (!allTypes.contains(t.obj)) allTypes(t.obj) = ""
      }
    }
    // whitelist name resolution AFTER the sweep, like the reference's
    // second pass: the type's own prefLabel if any, else "OTHER"
    val whitelist = allTypes.keys.toSeq.map(t => t -> names.getOrElse(t, "OTHER"))
    Extracted(names.toSeq, types.toSeq.map { case (k, v) => k -> (v: Seq[String]) }, whitelist)
  }

  /** Write the three TSVs in the layout KbMetaLoader consumes. */
  def writeFiles(ex: Extracted, dir: String): Unit = {
    Files.createDirectories(Paths.get(dir))
    def write(name: String, lines: Seq[String]): Unit =
      Files.write(Paths.get(dir, name),
        lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
    write("entity_to_name.tsv", ex.entityToName.map { case (q, n) => s"$q\t$n" })
    write("entity_to_types.tsv",
      ex.entityToTypes.map { case (q, ts) => (q +: ts).mkString("\t") })
    write("whitelist_types.tsv", ex.whitelistTypes.map { case (t, n) => s"$t\t$n" })
  }
}
