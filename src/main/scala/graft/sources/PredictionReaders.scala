package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.eval.CaseModel._

/** S5 prediction-reader tail: ambiverse / EPGEL / NIF prediction files
  * (reference: src/elevant/prediction_readers/{ambiverse,epgel,nif}_
  * prediction_reader.py), golden-tested against the EXECUTED reference
  * (tools/gen_pred_fixtures.py → golden/pred_readers.json; the NIF
  * variant reuses the NifReader turtle subset — pynif is unavailable to
  * execute).
  *
  * Attachment contract matches the reference's AbstractPredictionReader:
  * ambiverse/EPGEL yield per-ARTICLE-ORDER prediction lists (zip with the
  * benchmark by index); NIF yields (text, predictions) pairs for the
  * text-prefix attach (BenchmarkReader.attachPredictionsByTextPrefix).
  *
  * The reference's `None` prediction entity (EPGEL with no candidates)
  * maps to NIL — our PredSpan carries non-null ids.
  */
object PredictionReaders {

  /** One ambiverse JSON result file → ordered PredSpans
    * (ambiverse_prediction_reader.py:19-56). Quirks kept: the entities[]
    * name→QID remap OVERRIDES the match QID (predicted QIDs are
    * mistrusted), null/empty entity → NIL, candidates = {entity}. */
  def parseAmbiverseFile(content: String, title2qid: Map[String, String]): Seq[PredSpan] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val j = mapper.readTree(content)
    val remap = scala.collection.mutable.Map.empty[String, String]
    if (j.has("entities") && j.get("entities").isArray) {
      j.get("entities").forEach { e =>
        val raw = e.get("id").asText()
        val entityId = raw.substring(raw.lastIndexOf('/') + 1)
        if (entityId != "null") {
          val fromName = QidMapper.getWikidataQid(e.get("name").asText(), title2qid)
          if (!isUnknownEntity(fromName)) remap(entityId) = fromName
        }
      }
    }
    val out = Seq.newBuilder[PredSpan]
    j.get("matches").forEach { m =>
      val start = m.get("charOffset").asInt()
      val end = start + m.get("charLength").asInt()
      val ent = m.get("entity")
      var entityId =
        if (ent == null || ent.isNull) NIL
        else {
          val raw = ent.get("id").asText()
          val id = raw.substring(raw.lastIndexOf('/') + 1)
          if (id.isEmpty) NIL else id
        }
      remap.get(entityId).foreach(mapped => entityId = mapped)
      out += PredSpan(start, end, entityId, Seq(entityId), "AMBIVERSE")
    }
    out.result()
  }

  /** Directory of per-article result files, sorted by filename → one
    * prediction list per article in order. */
  def ambiversePredictions(
      spark: SparkSession,
      dir: String,
      title2qid: Map[String, String] = Map.empty): Dataset[(Long, Seq[PredSpan])] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(dir)
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((_, content), idx) => (idx, parseAmbiverseFile(content, t2q.value)) }
      .toDS()
  }

  /** EPGEL paired input/output line files → per-article-index prediction
    * lists (epgel_prediction_reader.py:15-46). Quirks kept: article count
    * = last input line's article_index + 1 (intermediate indices without
    * mentions yield empty lists); a line-count mismatch between input and
    * output returns ALL articles empty (the reference logs an error and
    * skips the fill loop); entity = candidates[0] or NIL when empty. */
  def parseEpgel(inputContent: String, outputContent: String): Seq[Seq[PredSpan]] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val inLines = inputContent.split("\n").filter(_.nonEmpty)
    val outLines = outputContent.split("\n").filter(_.nonEmpty)
    if (inLines.isEmpty) return Nil
    val lastIdx = mapper.readTree(inLines.last).get("article_index").asInt()
    val perArticle = Array.fill(lastIdx + 1)(Vector.empty[PredSpan])
    if (inLines.length == outLines.length) {
      inLines.zip(outLines).foreach { case (inL, outL) =>
        val i = mapper.readTree(inL)
        val o = mapper.readTree(outL)
        val idx = i.get("article_index").asInt()
        val begin = i.get("mention_start").asInt()
        val end = i.get("mention_end").asInt()
        val cands = Seq.newBuilder[String]
        o.get("candidates").forEach(c => cands += c.asText())
        val candidates = cands.result()
        val entityId = candidates.headOption.getOrElse(NIL)
        // reference keys a dict by span: a duplicate span overwrites (last wins)
        perArticle(idx) = perArticle(idx).filterNot(p => p.begin == begin && p.end == end) :+
          PredSpan(begin, end, entityId, candidates, "EPGEL")
      }
    }
    perArticle.toSeq
  }

  def epgelPredictions(
      spark: SparkSession,
      outputPath: String,
      inputPath: String): Dataset[(Long, Seq[PredSpan])] = {
    import spark.implicits._
    // both files are read whole (line pairing is positional); benchmark-
    // scale inputs, one task
    val inC = spark.sparkContext.wholeTextFiles(inputPath).map(_._2).collect().mkString
    val outC = spark.sparkContext.wholeTextFiles(outputPath).map(_._2).collect().mkString
    parseEpgel(inC, outC).zipWithIndex
      .map { case (ps, i) => (i.toLong, ps) }.toDS()
  }

  /** NIF predictions: contexts sorted by URI, phrases by beginIndex →
    * (article text, predictions) pairs for the text-prefix attach
    * (nif_prediction_reader.py:21-49). */
  def nifPredictionsWithText(
      content: String,
      title2qid: Map[String, String] = Map.empty,
      customKb: Boolean = false): Seq[(String, Seq[PredSpan])] = {
    NifReader.docsFromNif(content, title2qid, customKb = customKb).map { d =>
      val preds = d.labels.map(l =>
        PredSpan(l.begin, l.end, l.entityId, Seq(l.entityId), "NIF_READER"))
      (d.text, preds)
    }
  }
}
