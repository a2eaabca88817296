package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.eval.CaseLogic
import graft.eval.CaseModel._
import graft.synth.Synth
import graft.text.Extract

/** Fixture cross-check for the eval_cases hybrid oracle
  * (queries/EvalCasesOracle.scala).
  *
  * The synthetic corpus gives every mention a baseline prediction, so the
  * oracle's no-prediction FN branches (incl. the is_date filter and the
  * NER_FN_LOWERCASED sublabel), the partial-name wrong/correct split, and
  * the multi-candidate labels are DEAD at the driver's gate. This tool
  * hand-builds a document that exercises them, then writes BOTH sides:
  *
  *   - the three parquet inputs the oracle SQL consumes (er_mentions,
  *     aux_label_spans, kb_top_candidates) plus the resolved SQL text;
  *   - the ENGINE's case table for the same document
  *     (CaseLogic.generateCases with baseline-replayed predictions, the
  *     exact evalCases projection).
  *
  * tools/check_eval_cases_fixture.py replays the SQL over the inputs and
  * asserts row-set equality with the engine output — executed evidence
  * that the SQL branches match the Scala decision tables even where the
  * gate's data never reaches them. */
object EvalCasesFixture {

  final case class Ment(surface: String, entNum: Int, kb: Option[Seq[String]])

  def main(args: Array[String]): Unit = {
    val out = args(0)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ms = Seq(
      // TP, exact name, single candidate
      Ment(Synth.canonicalName(1), 1, Some(Seq("E1"))),
      // wrong pred + partial name (surface = first name only)
      Ment(Synth.firstName(2), 2, Some(Seq("E9"))),
      // wrong pred, multi candidates, gold IS a candidate (min picks E0)
      Ment(Synth.canonicalName(3), 3, Some(Seq("E0", "E3"))),
      // date surface: baseline DROPS it even though the alias exists
      Ment("12 March 1994", 4, Some(Seq("E4"))),
      // lowercase surface with NO kb alias: FN + NER_FN_LOWERCASED
      Ment("quiet zephyr", 5, None),
      // TP + partial name (first name only, correct single candidate)
      Ment(Synth.firstName(6), 6, Some(Seq("E6"))),
      // TP with multi candidates (min = gold)
      Ment(Synth.canonicalName(7), 7, Some(Seq("E7", "E8"))))

    // build the text: surfaces separated by " . " so word-boundary
    // expansion is the identity on every span — EXCEPT the leading
    // overlap pair below, which exercises the expanded-key fallback
    val sb = new StringBuilder
    // Two overlapping mentions inside ONE word "XXabcYY": m_ov1 = "XXab"
    // (has a kb alias -> raw prediction at (0,4)), m_ov2 = "abcYY" (no
    // alias -> no raw prediction). Both word-boundary-expand to the full
    // word, so m_ov2 must pick up m_ov1's prediction via the EXPANDED key
    // of the allPredictions dict (case_generator.py:93-101) — the
    // fallback path that is the identity everywhere else in this fixture
    // and dead in the synthetic corpus.
    sb.append("XXabcYY . ")
    val ovM = Seq(
      Ment("XXab", 8, Some(Seq("E8"))) -> (0, 4),
      Ment("abcYY", 9, None) -> (2, 7))
    val spans = ms.map { m =>
      val b = sb.length
      sb.append(m.surface)
      val e = sb.length
      sb.append(" . ")
      (b, e)
    }
    val text = sb.toString
    val url = "https://fixture.example/doc1"
    val allMs: Seq[(Ment, (Int, Int))] = ovM ++ ms.zip(spans)

    // ---- oracle inputs ----------------------------------------------------
    val mentionRows = allMs.zipWithIndex.map { case ((m, (b, e)), i) =>
      (url, i.toLong, b, e, m.surface, Extract.normalizeSurface(m.surface), s"E${m.entNum}")
    }
    mentionRows.toDF("url", "mention_id", "begin", "end", "surface", "norm_surface", "gold_entity")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/er_mentions")

    allMs.map { case (_, (b, e)) =>
      val (eb, ee) = Extract.wordBoundary(b, e, text)
      (url, b, e, eb, ee)
    }.toDF("url", "begin", "end", "exp_begin", "exp_end")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/aux_label_spans")

    allMs.flatMap { case (m, _) => m.kb.map(c =>
      (Extract.normalizeSurface(m.surface), c.sorted.mkString(","), 5L)) }
      .toDF("link_text", "candidates", "freq")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/kb_top_candidates")

    val outAbs = new java.io.File(out).getAbsolutePath
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$out/eval_cases.sql"),
      graft.queries.EvalCasesOracle.sql.replace("{OUT}", outAbs))

    // ---- engine side: benchmarkDocs + baseline-replay + generateCases ----
    val labels = allMs.zipWithIndex.map { case ((m, (b, e)), i) =>
      GtLabel(i, b, e, s"E${m.entNum}", Synth.canonicalName(m.entNum),
        None, Nil, optionalFlag = false, Nil, None, desc = false)
    }
    val preds = allMs.flatMap { case (m, (b, e)) =>
      m.kb match {
        case Some(cands) if !Extract.isDate(m.surface) =>
          Some(PredSpan(b, e, cands.min, cands, "Baseline"))
        case _ => None
      }
    }
    val doc = EvalDoc(url, text, 0, text.length, labels, preds,
      hyperlinks = labels.map(l => graft.model.Span(l.begin, l.end)))
    val cases = CaseLogic.generateCases(doc, EntityMeta.empty)
    cases.toDS().select(
      col("url"), col("begin"), col("end"), col("text"),
      col("factor"), col("mentionType"),
      concat_ws(",", col("linkingIgnored")).as("linking_ignored"),
      concat_ws(",", col("linkingRequired")).as("linking_required"),
      concat_ws(",", col("nerIgnored")).as("ner_ignored"),
      concat_ws(",", col("errorsIgnored")).as("errors_ignored"))
      .coalesce(1).write.mode("overwrite").parquet(s"$out/eval_cases_expected")

    println(s"[fixture] wrote $out (${cases.length} cases)")
    spark.stop()
  }
}
