package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — the reference's mapping-table scans and F7 type adjustments
  * (reference: src/elevant/helpers/entity_database_reader.py:26-221,
  * models/entity_database.py:137-168), re-expressed as Spark reads.
  *
  * Each reader returns a DataFrame dimension table (the engine's
  * LMDB-point-lookup → equi-join inversion); file quirks are preserved
  * exactly and golden-tested against the EXECUTED reference
  * (tools/gen_mapping_fixtures.py → golden/mapping_tables.json):
  *   - demonyms get an auto-generated plural key (demonym+"s"), appended in
  *     line order, including the duplicate when an explicit plural line
  *     collides with a generated one;
  *   - languages map language→qid with dict semantics (LAST line wins);
  *   - gender classifies by token: "female" beats "male" beats OTHER;
  *   - instance-of/subclass-of keep only values starting with "Q";
  *   - whitelist types skip rows whose qid is the LEFT side of a
  *     REPLACE_WITH adjustment.
  *
  * Scale: every reader is one narrow pass (+ one groupBy where the
  * reference builds a multimap). Where the reference relies on file order
  * (demonyms append order, languages last-wins) the line number is carried
  * via zipWithIndex so the result is deterministic under partitioning.
  */
object MappingTables {

  /** Raw lines with their file-order index: (line_no, value). */
  private def linesWithIndex(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (v, i) => (i, v) }.toDF("line_no", "value")
  }

  /** Generic strict 2-col TSV (key \t value), order-free.
    * (entity_database_reader.py's `line.strip('\n').split('\t')` pattern) */
  def tsv2(spark: SparkSession, path: String, keyCol: String, valCol: String): DataFrame =
    spark.read.textFile(path).toDF("value")
      .select(
        substring_index(col("value"), "\t", 1).as(keyCol),
        // everything after the first tab (reference split('\t') takes [1];
        // mapping files are strictly 2-col so this is exact)
        expr("substring(value, instr(value, '\t') + 1)").as(valCol))

  /** QID→gender (get_gender_mapping:96-110): tokenize the gender label;
    * "female" token → FEMALE, else "male" token → MALE, else OTHER. */
  def genderMapping(spark: SparkSession, path: String): DataFrame =
    tsv2(spark, path, "entity_id", "gender_label")
      .withColumn("tokens", split(col("gender_label"), " "))
      .select(col("entity_id"),
        when(array_contains(col("tokens"), "female"), "FEMALE")
          .when(array_contains(col("tokens"), "male"), "MALE")
          .otherwise("OTHER").as("gender"))

  /** QID→given name (read_human_names:112-118). */
  def humanNames(spark: SparkSession, path: String): DataFrame =
    tsv2(spark, path, "entity_id", "name")

  /** QID→coreference types, ";"-joined (get_coreference_types_mapping:
    * 120-128). An empty value yields a single-empty-string list, exactly
    * like Python's "".split(";"). */
  def corefTypes(spark: SparkSession, path: String): DataFrame =
    tsv2(spark, path, "entity_id", "types_raw")
      .select(col("entity_id"), split(col("types_raw"), ";").as("types"))

  /** token→count (get_unigram_counts:130-140; whitespace split). */
  def unigramCounts(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("value")
      .select(split(col("value"), "\\s+").as("parts"))
      .select(element_at(col("parts"), 1).as("token"),
        element_at(col("parts"), 2).cast("long").as("count"))

  /** demonym→[qids] (get_demonyms:142-156): each line (qid, demonym)
    * appends qid to BOTH demonyms[demonym] and demonyms[demonym+"s"], in
    * line order — including the duplicate that arises when an explicit
    * plural line collides with a generated plural. */
  def demonyms(spark: SparkSession, path: String): DataFrame = {
    val lines = linesWithIndex(spark, path)
      .select(col("line_no"),
        substring_index(col("value"), "\t", 1).as("entity_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("demonym"))
    lines
      .select(col("line_no"), col("entity_id"), col("demonym"))
      .unionByName(lines.select(col("line_no"), col("entity_id"),
        concat(col("demonym"), lit("s")).as("demonym")))
      .groupBy(col("demonym"))
      // append order = line order; sort the (line_no, qid) structs then strip
      .agg(transform(
        array_sort(collect_list(struct(col("line_no"), col("entity_id")))),
        s => s.getField("entity_id")).as("entity_ids"))
  }

  /** language→qid with dict overwrite semantics — LAST line wins
    * (get_languages:158-168). */
  def languages(spark: SparkSession, path: String): DataFrame =
    linesWithIndex(spark, path)
      .select(col("line_no"),
        substring_index(col("value"), "\t", 1).as("entity_id"),
        expr("substring(value, instr(value, '\t') + 1)").as("language"))
      .groupBy(col("language"))
      .agg(max_by(col("entity_id"), col("line_no")).as("entity_id"))

  /** Plain line set (read_into_set:197-203; quantity/datetime files). */
  def lineSet(spark: SparkSession, path: String): DataFrame =
    spark.read.textFile(path).toDF("value").select(col("value").as("item"))

  /** wikipedia_id→title (get_wikipedia_id2wikipedia_title_mapping:186-196). */
  def wikipediaIdToTitle(spark: SparkSession, path: String): DataFrame =
    tsv2(spark, path, "wikipedia_id_raw", "title")
      .select(col("wikipedia_id_raw").cast("long").as("wikipedia_id"), col("title"))

  /** key→{qid,...} (read_item_to_qid_set_mapping:221-233, used by
    * instance-of / subclass-of): only values starting with "Q" survive
    * (Wikidata "unknown value" blank nodes are dropped); set semantics.
    * `relevant` optionally restricts keys (the reference's
    * relevant_entities) — pushed as a semi-join, not a broadcast Map. */
  def itemToQidSet(spark: SparkSession, path: String, relevant: Option[DataFrame] = None): DataFrame = {
    val base = tsv2(spark, path, "key", "qid").where(col("qid").startsWith("Q"))
    val restricted = relevant match {
      case Some(r) => base.join(r.select(col(r.columns.head).as("key")), Seq("key"), "left_semi")
      case None => base
    }
    restricted.groupBy(col("key")).agg(sort_array(collect_set(col("qid"))).as("qids"))
  }

  /** QID→whitelist-type-name (read_whitelist_types:26-45). With
    * adjustments, rows whose qid is the LEFT side of a REPLACE_WITH rule
    * are skipped (those types are merged into their replacement). Empty
    * lines are skipped like the reference's `if line`. */
  def whitelistTypes(
      spark: SparkSession,
      path: String,
      adjustments: Option[TypeAdjustments.Adjustments] = None): DataFrame = {
    val rows = spark.read.textFile(path).toDF("value")
      .where(col("value") =!= "")
      .select(
        trim(substring_index(col("value"), "\t", 1)).as("entity_id"),
        trim(expr("substring(value, instr(value, '\t') + 1)")).as("name"))
    adjustments match {
      case Some(adj) if adj.replaceWith.nonEmpty =>
        rows.where(!col("entity_id").isin(adj.replaceWith.keys.toSeq: _*))
      case _ => rows
    }
  }
}

/** F7 — whitelist type adjustments (REPLACE_WITH / MINUS), reference:
  * models/entity_database.py:137-168 + helpers/entity_database_reader.py:
  * 48-65, data format small-data-files/type_adjustments.txt.
  *
  * `adjust` replicates the reference algorithm EXACTLY, including the
  * Python remove-during-iteration quirk: when a MINUS right-side type
  * arrives and several already-collected left-side types should be
  * removed, removing one shifts the list so the for-loop SKIPS the next
  * element (golden case e_remove_skips_next). Deliberately kept — parity
  * over "fixing" the reference.
  */
object TypeAdjustments {

  final case class Adjustments(replaceWith: Map[String, String], minus: Map[String, String]) {
    def isEmpty: Boolean = replaceWith.isEmpty && minus.isEmpty
  }

  val Empty: Adjustments = Adjustments(Map.empty, Map.empty)
  val OtherLabel = "OTHER" // GroundtruthLabel.OTHER (groundtruth_label.py:7)

  /** Parse the adjustments file ("T1 REL T2   # comment" lines; unknown
    * relations are skipped; later lines overwrite earlier ones per T1 —
    * dict semantics). The file is config-sized: driver-side parse. */
  def parse(lines: IterableOnce[String]): Adjustments = {
    var replace = Map.empty[String, String]
    var minus = Map.empty[String, String]
    lines.iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
      val payload = line.split("#")(0).trim
      payload.split("\\s+") match {
        case Array(t1, "REPLACE_WITH", t2) => replace += (t1 -> t2)
        case Array(t1, "MINUS", t2) => minus += (t1 -> t2)
        case _ => () // unknown relation: reference logs a warning and skips
      }
    }
    Adjustments(replace, minus)
  }

  def parseFile(path: String): Adjustments = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try parse(src.getLines()) finally src.close()
  }

  /** entity_database.py:143-168 adjusted_entity_types, minus the
    * entity-db lookup: apply REPLACE_WITH, then the MINUS suppression in
    * both directions, preserving first-seen order and the reference's
    * iteration quirk. */
  def adjust(types: Seq[String], adj: Adjustments): Seq[String] = {
    if (adj.isEmpty) return types
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    types.foreach { wt =>
      val adjusted = adj.replaceWith.getOrElse(wt, wt)
      // left of a minus-rule whose right side is already present: skip
      val skip = adj.minus.get(adjusted).exists(out.contains)
      if (!skip) {
        // right of a minus-rule: remove already-present left sides — with
        // Python's for-loop-removal skip (removal advances past the element
        // shifted into the removed slot)
        var i = 0
        while (i < out.length) {
          if (adj.minus.get(out(i)).contains(adjusted)) out.remove(i)
          i += 1
        }
        if (!out.contains(adjusted)) out += adjusted
      }
    }
    out.toSeq
  }

  /** get_entity_types semantics over a type dimension table: unknown
    * entities map to [OTHER] at lookup time (handled by the caller's
    * join-miss), known ones get adjusted types. One narrow map — scales. */
  def adjustedTypesTable(typeDb: DataFrame, adj: Adjustments): DataFrame = {
    val spark = typeDb.sparkSession
    val adjB = spark.sparkContext.broadcast(adj) // config-sized, genuinely tiny
    val adjustUdf = udf((ts: Seq[String]) => adjust(ts, adjB.value))
    typeDb.withColumn("types", adjustUdf(col("types")))
  }
}
