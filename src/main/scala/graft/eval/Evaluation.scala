package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.CaseLogic.{Ignored, Modes, Required}
import graft.eval.CaseModel._

/** The reference's evaluation as Catalyst aggregations: per-document case
  * generation in a narrow flatMap, then ONE groupBy over (mode, category)
  * replacing the reference's per-article counter mutation
  * (/root/reference/src/elevant/evaluation/evaluator.py:106-352). The
  * shuffle boundary sits exactly where the reference crosses from
  * per-article objects to global counters.
  */
object Evaluation {

  /** Generate all evaluation cases (distributed; per-url pure logic). */
  def cases(
      docs: Dataset[EvalDoc],
      meta: EntityMeta,
      errMeta: ErrorLabeler.ErrorMeta = ErrorLabeler.ErrorMeta(),
      containsUnknowns: Boolean = true): Dataset[EvalCase] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val metaB = spark.sparkContext.broadcast(meta)
    val errB = spark.sparkContext.broadcast(errMeta)
    docs.flatMap(d => CaseLogic.generateCases(d, metaB.value, errB.value, containsUnknowns))
  }

  /** factor-weighted error-label counts per mode (evaluator.py:196-204). */
  def errorCounts(cases: Dataset[EvalCase]): DataFrame = {
    val spark = cases.sparkSession
    import spark.implicits._
    cases.flatMap { c =>
      c.errorsIgnored.map(l => (Ignored, l, c.factor.toLong)) ++
        c.errorsRequired.map(l => (Required, l, c.factor.toLong))
    }.toDF("mode", "label", "n")
      .groupBy(col("mode"), col("label"))
      .agg(sum("n").as("errors"))
  }

  /** FP denominators (evaluator.py:134-148; tokenizer divergence per
    * SURVEY §7.4): words / lowercase words / non-lowercase words over the
    * evaluation span, summed over all documents. */
  def wordDenominators(docs: Dataset[EvalDoc]): (Long, Long, Long) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val row = docs.map { d =>
      val span = d.text.substring(
        math.max(0, d.evalBegin), math.min(d.text.length, d.evalEnd))
      val toks = graft.text.Extract.tokenize(span)
      val lower = toks.count(t => t.find(Character.isLetter).exists(Character.isLowerCase))
      (toks.size.toLong, lower.toLong, (toks.size - lower).toLong)
    }.toDF("w", "lw", "nlw")
      .agg(sum("w"), sum("lw"), sum("nlw")).head()
    def g(i: Int) = if (row.isNullAt(i)) 0L else row.getLong(i)
    (g(0), g(1), g(2))
  }

  /** evaluator.py:66-72: DATETIME/QUANTITY stripped, empty → OTHER. */
  def typeIds(types: Seq[String]): Seq[String] = {
    val t = types.filter(x => x != DATETIME && x != QUANTITY)
    if (t.isEmpty) Seq(OTHER) else t
  }

  /** Counter deltas per case: (mode, category, tp, fp, fn) — the exact
    * counting rules of evaluator.py:151-204 (TP/FN only for root labels;
    * FP only when factor != 0; coref cases excluded from NER and entity
    * types). */
  def counterRows(c: EvalCase, meta: EntityMeta): Seq[(String, String, Long, Long, Long)] = {
    val out = Seq.newBuilder[(String, String, Long, Long, Long)]
    val isRoot = c.gtParent.isEmpty
    Modes.foreach { mode =>
      val linking = if (mode == Ignored) c.linkingIgnored else c.linkingRequired
      val ner = if (mode == Ignored) c.nerIgnored else c.nerRequired
      // NER counts (non-coref only)
      if (!c.isCoreference) {
        if (ner.contains("TP") && c.labelId.isDefined && isRoot) out += ((mode, "ner", 1L, 0L, 0L))
        if (ner.contains("FN") && c.labelId.isDefined && isRoot) out += ((mode, "ner", 0L, 0L, 1L))
        if (ner.contains("FP") && c.factor != 0) out += ((mode, "ner", 0L, 1L, 0L))
      }
      val key = c.mentionType.toLowerCase
      if (linking.contains("TP") && c.labelId.isDefined && isRoot) {
        out += ((mode, "all", 1L, 0L, 0L))
        out += ((mode, key, 1L, 0L, 0L))
        if (c.isCoreference) out += ((mode, "coref", 1L, 0L, 0L))
        else typeIds(c.gtTypes).foreach(t => out += ((mode, "type:" + t, 1L, 0L, 0L)))
      }
      if (linking.contains("FN") && c.labelId.isDefined && isRoot) {
        out += ((mode, "all", 0L, 0L, 1L))
        out += ((mode, key, 0L, 0L, 1L))
        if (c.isCoreference) out += ((mode, "coref", 0L, 0L, 1L))
        else typeIds(c.gtTypes).foreach(t => out += ((mode, "type:" + t, 0L, 0L, 1L)))
      }
      if (linking.contains("FP") && c.factor != 0) {
        out += ((mode, "all", 0L, 1L, 0L))
        out += ((mode, key, 0L, 1L, 0L))
        if (c.isCoreference) out += ((mode, "coref", 0L, 1L, 0L))
        else {
          val predTypes = c.predEntityId.map(id => meta.types.getOrElse(id, Nil)).getOrElse(Nil)
          val ts = if (predTypes.isEmpty) Seq(OTHER) else typeIds(predTypes)
          ts.foreach(t => out += ((mode, "type:" + t, 0L, 1L, 0L)))
        }
      }
    }
    out.result()
  }

  /** Per-case counter deltas as a flat DataFrame(mode, category, tp, fp,
    * fn) — the pre-aggregation relation. Surfaced so Verify can dump it as
    * a parquet input and DuckDB can gate the aggregation below. */
  def counterRowsDf(cases: Dataset[EvalCase], meta: EntityMeta): DataFrame = {
    val spark = cases.sparkSession
    import spark.implicits._
    val metaB = spark.sparkContext.broadcast(meta)
    cases
      .flatMap(c => counterRows(c, metaB.value))
      .toDF("mode", "category", "tp", "fp", "fn")
  }

  /** The counter aggregation: DataFrame(mode, category, tp, fp, fn). */
  def counts(cases: Dataset[EvalCase], meta: EntityMeta): DataFrame =
    counterRowsDf(cases, meta)
      .groupBy(col("mode"), col("category"))
      .agg(sum("tp").as("tp"), sum("fp").as("fp"), sum("fn").as("fn"))

  final case class F1(tp: Long, fp: Long, fn: Long) {
    def precision: Double = if (tp + fp > 0) tp.toDouble / (tp + fp) else 0.0
    def recall: Double = if (tp + fn > 0) tp.toDouble / (tp + fn) else 0.0
    def f1: Double = {
      val (p, r) = (precision, recall)
      if (p + r > 0) 2 * p * r / (p + r) else 0.0
    }
    def groundTruth: Long = tp + fn
  }

  /** Collected counters → the reference's nested results shape
    * (evaluator.py:206-352): mention_types (ner moved to error_categories),
    * full error_categories (ner_fn / ner_fp / wrong_disambiguation /
    * other_errors / wrong_coreference with the reference's denominators),
    * synthesized "entity" rollup, entity_types. */
  def resultsJson(
      countsDf: DataFrame,
      errorCountsDf: Option[DataFrame] = None,
      denominators: (Long, Long, Long) = (0L, 0L, 0L),
      hasCandidates: Boolean = false): String = {
    val rows = countsDf.collect().map { r =>
      (r.getString(0), r.getString(1)) -> F1(r.getLong(2), r.getLong(3), r.getLong(4))
    }.toMap
    val errs: Map[(String, String), Long] = errorCountsDf
      .map(_.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap)
      .getOrElse(Map.empty)
    val (nWords, nLowercase, nNoLowercase) = denominators
    def get(mode: String, cat: String): F1 = rows.getOrElse((mode, cat), F1(0, 0, 0))
    def e(mode: String, label: String): Long = errs.getOrElse((mode, label), 0L)
    def f1Json(f: F1): String =
      s"""{"true_positives":${f.tp},"false_positives":${f.fp},"false_negatives":${f.fn},""" +
        s""""ground_truth":${f.groundTruth},"precision":${f.precision},"recall":${f.recall},"f1":${f.f1}}"""
    def et(errors: Long, total: Long): String = s"""{"errors":$errors,"total":$total}"""
    val mentionCats = Seq("all", "entity", "coref",
      "entity_named", "entity_non_named", "entity_unknown", "coref_nominal", "coref_pronominal")
    val entityCats = Seq("entity_named", "entity_non_named", "entity_unknown")
    val modesJson = Modes.map { mode =>
      val entity = entityCats.map(get(mode, _)).reduce((a, b) => F1(a.tp + b.tp, a.fp + b.fp, a.fn + b.fn))
      val mt = mentionCats.map { cat =>
        val f = if (cat == "entity") entity else get(mode, cat)
        s""""$cat":${f1Json(f)}"""
      }.mkString(",")
      val types = rows.keys.collect { case (m, c) if m == mode && c.startsWith("type:") => c }
        .toSeq.sorted
        .map(c => s""""${c.stripPrefix("type:")}":${f1Json(get(mode, c))}""")
        .mkString(",")

      val nerFn = Seq(
        "all" -> ("NER_FN", "AVOIDED_NER_FN"),
        "lowercased" -> ("NER_FN_LOWERCASED", "AVOIDED_NER_FN_LOWERCASED"),
        "partially_included" -> ("NER_FN_PARTIALLY_INCLUDED", "AVOIDED_NER_FN_PARTIALLY_INCLUDED"),
        "partial_overlap" -> ("NER_FN_PARTIAL_OVERLAP", "AVOIDED_NER_FN_PARTIAL_OVERLAP"),
        "other" -> ("NER_FN_OTHER", "AVOIDED_NER_FN_OTHER"))
        .map { case (k, (a, b)) => s""""$k":${et(e(mode, a), e(mode, a) + e(mode, b))}""" }
        .mkString(",")
      val nerFp = Seq(
        s""""all":${et(e(mode, "NER_FP"), nWords)}""",
        s""""lowercased":${et(e(mode, "NER_FP_LOWERCASED"), nLowercase)}""",
        s""""groundtruth_unknown":${et(e(mode, "NER_FP_GROUNDTRUTH_UNKNOWN"),
          e(mode, "NER_FP_GROUNDTRUTH_UNKNOWN") + e(mode, "AVOIDED_NER_FP_GROUNDTRUTH_UNKNOWN"))}""",
        s""""other":${et(e(mode, "NER_FP_OTHER"), nNoLowercase)}""",
        s""""wrong_span":${et(e(mode, "NER_FP_WRONG_SPAN"),
          e(mode, "NER_FP_WRONG_SPAN") + e(mode, "AVOIDED_NER_FP_WRONG_SPAN"))}""").mkString(",")
      val disamb = {
        val base = Seq(
          "all" -> ("DISAMBIGUATION_WRONG", "DISAMBIGUATION_CORRECT"),
          "demonym" -> ("DISAMBIGUATION_DEMONYM_WRONG", "DISAMBIGUATION_DEMONYM_CORRECT"),
          "metonymy" -> ("DISAMBIGUATION_METONYMY_WRONG", "DISAMBIGUATION_METONYMY_CORRECT"),
          "partial_name" -> ("DISAMBIGUATION_PARTIAL_NAME_WRONG", "DISAMBIGUATION_PARTIAL_NAME_CORRECT"),
          "rare" -> ("DISAMBIGUATION_RARE_WRONG", "DISAMBIGUATION_RARE_CORRECT"),
          "other" -> ("DISAMBIGUATION_OTHER_WRONG", "DISAMBIGUATION_OTHER_CORRECT"))
          .map { case (k, (w, c)) => s""""$k":${et(e(mode, w), e(mode, w) + e(mode, c))}""" }
        val cand =
          if (hasCandidates) Seq(
            s""""wrong_candidates":${et(e(mode, "DISAMBIGUATION_CANDIDATES_WRONG"),
              e(mode, "DISAMBIGUATION_CANDIDATES_WRONG") + e(mode, "DISAMBIGUATION_CANDIDATES_CORRECT"))}""",
            s""""multiple_candidates":${et(e(mode, "DISAMBIGUATION_MULTI_CANDIDATES_WRONG"),
              e(mode, "DISAMBIGUATION_MULTI_CANDIDATES_WRONG") + e(mode, "DISAMBIGUATION_MULTI_CANDIDATES_CORRECT"))}""")
          else Seq(""""wrong_candidates":null""", """"multiple_candidates":null""")
        (base ++ cand).mkString(",")
      }
      val corefGt = get(mode, "coref").groundTruth
      val coref = Seq(
        s""""undetected":${et(e(mode, "COREFERENCE_UNDETECTED"), corefGt)}""",
        s""""wrong_mention_referenced":${et(e(mode, "COREFERENCE_WRONG_MENTION_REFERENCED"),
          corefGt - e(mode, "COREFERENCE_UNDETECTED"))}""",
        s""""reference_wrongly_disambiguated":${et(e(mode, "COREFERENCE_REFERENCE_WRONGLY_DISAMBIGUATED"),
          corefGt - e(mode, "COREFERENCE_UNDETECTED") - e(mode, "COREFERENCE_WRONG_MENTION_REFERENCED"))}""",
        s""""false_detection":${e(mode, "COREFERENCE_FALSE_DETECTION")}""").mkString(",")
      val otherErrs =
        s""""hyperlink":${et(e(mode, "HYPERLINK_WRONG"),
          e(mode, "HYPERLINK_CORRECT") + e(mode, "HYPERLINK_WRONG"))}"""

      s""""$mode":{"mention_types":{$mt},""" +
        s""""error_categories":{"ner":${f1Json(get(mode, "ner"))},""" +
        s""""ner_fn":{$nerFn},"ner_fp":{$nerFp},""" +
        s""""wrong_disambiguation":{$disamb},""" +
        s""""other_errors":{$otherErrs},""" +
        s""""wrong_coreference":{$coref}},""" +
        s""""entity_types":{$types}}"""
    }.mkString(",")
    s"{$modesJson}"
  }

  /** Micro P/R/F1 of the "all" category for a mode — what the reference
    * prints by default (IGNORED = InKB, evaluator.py:354-364). */
  def microF1(countsDf: DataFrame, mode: String = Ignored): F1 = {
    val r = countsDf.where(col("mode") === mode && col("category") === "all").collect()
    if (r.isEmpty) F1(0, 0, 0) else F1(r(0).getLong(2), r(0).getLong(3), r(0).getLong(4))
  }

  /** End-to-end: docs → cases → counters → (results json, micro F1s). */
  def evaluate(docs: Dataset[EvalDoc], meta: EntityMeta): (Dataset[EvalCase], DataFrame) = {
    val cs = cases(docs, meta)
    (cs, counts(cs, meta))
  }
}
