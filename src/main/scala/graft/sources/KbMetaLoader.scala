package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.CaseModel.EntityMeta
import graft.eval.ErrorLabeler

/** Composed KB-dimension loader — the reference wires ~20 mapping files
  * into the linkers/evaluator through one composition
  * (linking_system.py:276-316 `load_missing_mappings` +
  * entity_database.py `load_*`); this is that composition for a TSV
  * directory, so a caller points the engine at dimension files and gets
  * the assembled evaluation metadata plus the alias dimension tables,
  * instead of hand-wiring every individual MappingTables reader.
  *
  * Files read (reference settings.py names; each OPTIONAL — an absent
  * file loads empty, like the reference's lazy per-mapping loads):
  *   entity_to_types.tsv        qid \t type1 \t type2 ...  (get_entity_types_mapping)
  *   entity_to_name.tsv         qid \t name                (custom names / qid_to_name)
  *   quantity.tsv, datetime.tsv one qid per line           (read_into_set)
  *   qid_to_demonym.tsv         qid \t demonym             (get_demonyms)
  *   qid_to_gender.tsv          qid \t gender label        (get_gender_mapping)
  *   qid_to_coreference_types.tsv  qid \t t1;t2            (get_coreference_types_mapping)
  *   hyperlink_to_most_popular_candidates.tsv  alias \t q1,q2
  *     (the reference's LMDB dim, as TSV; engine-built corpora use
  *      KbBuild.mostPopularCandidates instead)
  *   whitelist_types.tsv (+ type_adjustments.txt)          (read_whitelist_types)
  *
  * Dimension tables that a linker joins at corpus scale (most-popular
  * candidates, demonym surfaces) stay DataFrames; the per-entity metadata
  * the evaluator broadcasts (types/names/quantities/datetimes, demonym
  * surface set, most-popular map) is collected into EntityMeta/ErrorMeta —
  * dimension-sized by contract, exactly what the reference holds in RAM.
  */
object KbMetaLoader {

  final case class KbMeta(
      entityMeta: EntityMeta,
      errorMeta: ErrorLabeler.ErrorMeta,
      gender: Map[String, String],
      corefTypes: Map[String, Seq[String]],
      whitelist: Map[String, String],
      adjustments: TypeAdjustments.Adjustments,
      /** (link_text, candidates array<string>) — BaselineLinker-ready. */
      mostPopularCandidates: DataFrame,
      /** (demonym, entity_ids array<string>) in reference append order. */
      demonyms: DataFrame)

  private def existing(dir: String, name: String): Option[String] = {
    val f = new java.io.File(dir, name)
    if (f.isFile) Some(f.getPath) else None
  }

  /** qid \t type1 \t type2 ... — the reference keeps lst[1:] verbatim
    * (get_entity_types_mapping, entity_database_reader.py:308-316). */
  def entityTypes(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("value")
      .select(split(col("value"), "\t").as("parts"))
      // length = size(parts), NOT Int.MaxValue: interpreted Slice computes
      // startIdx + length as a raw int (wraps negative -> empty array), so
      // a MaxValue length silently drops every type row whenever a stage
      // falls back from codegen
      .select(
        element_at(col("parts"), 1).as("entity_id"),
        slice(col("parts"), lit(2), size(col("parts"))).as("types"))

  /** alias \t comma-joined candidate qids (the LMDB dim as TSV). */
  def mostPopularTsv(spark: SparkSession, path: String): DataFrame =
    MappingTables.tsv2(spark, path, "link_text", "cands_raw")
      .select(col("link_text"), split(col("cands_raw"), ",").as("candidates"))

  def load(spark: SparkSession, dir: String): KbMeta = {
    import spark.implicits._
    val empty = spark.emptyDataFrame

    val adjustments = existing(dir, "type_adjustments.txt")
      .map(TypeAdjustments.parseFile)
      .getOrElse(TypeAdjustments.Adjustments(Map.empty, Map.empty))

    val typesMap: Map[String, Seq[String]] =
      existing(dir, "entity_to_types.tsv").map { p =>
        entityTypes(spark, p).as[(String, Seq[String])].collect().toMap
      }.getOrElse(Map.empty)
    val namesMap: Map[String, String] =
      existing(dir, "entity_to_name.tsv").map { p =>
        MappingTables.tsv2(spark, p, "entity_id", "name")
          .as[(String, String)].collect().toMap
      }.getOrElse(Map.empty)
    def lineSet(name: String): Set[String] =
      existing(dir, name).map { p =>
        MappingTables.lineSet(spark, p).as[String].collect().toSet
      }.getOrElse(Set.empty)

    val demonymsOpt = existing(dir, "qid_to_demonym.tsv")
      .map(MappingTables.demonyms(spark, _))
    val mpOpt = existing(dir, "hyperlink_to_most_popular_candidates.tsv")
      .map(mostPopularTsv(spark, _))

    val genderMap: Map[String, String] =
      existing(dir, "qid_to_gender.tsv").map { p =>
        MappingTables.genderMapping(spark, p).as[(String, String)].collect().toMap
      }.getOrElse(Map.empty)
    val corefMap: Map[String, Seq[String]] =
      existing(dir, "qid_to_coreference_types.tsv").map { p =>
        MappingTables.corefTypes(spark, p).as[(String, Seq[String])].collect().toMap
      }.getOrElse(Map.empty)
    val whitelistMap: Map[String, String] =
      existing(dir, "whitelist_types.tsv").map { p =>
        MappingTables.whitelistTypes(spark, p, Some(adjustments))
          .as[(String, String)].collect().toMap
      }.getOrElse(Map.empty)

    val entityMeta = EntityMeta(
      types = typesMap,
      quantities = lineSet("quantity.tsv"),
      datetimes = lineSet("datetime.tsv"),
      names = namesMap)
    val errorMeta = ErrorLabeler.ErrorMeta(
      demonyms = demonymsOpt
        .map(_.select("demonym").as[String].collect().toSet)
        .getOrElse(Set.empty),
      mostPopularCandidates = mpOpt
        .map(_.as[(String, Seq[String])].collect()
          .map { case (k, v) => k -> v.toSet }.toMap)
        .getOrElse(Map.empty),
      types = typesMap)

    KbMeta(entityMeta, errorMeta, genderMap, corefMap, whitelistMap,
      adjustments, mpOpt.getOrElse(empty), demonymsOpt.getOrElse(empty))
  }
}
