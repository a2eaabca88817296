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
      // the reference's `if match["entity"]` is Python truthiness: None AND
      // the empty dict {} both mean NIL — an {} entity must not NPE here
      var entityId =
        if (ent == null || ent.isNull || ent.get("id") == null || ent.get("id").isNull) NIL
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
    // Python readlines() semantics: blank INTERIOR lines count toward the
    // length comparison (a one-sided blank line makes the counts differ →
    // all-empty output, and a blank line reaching json parsing crashes the
    // reference just like it would crash here). Only the trailing
    // empty-after-final-newline artifact of split is dropped.
    def pyLines(s: String): Array[String] = {
      val parts = s.split("\n", -1)
      if (parts.nonEmpty && parts.last.isEmpty) parts.init else parts
    }
    val inLines = pyLines(inputContent)
    val outLines = pyLines(outputContent)
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
    // scale inputs, one task. Multi-file paths concatenate in sorted-path
    // order with a separating newline so the last line of one file never
    // glues to the first line of the next.
    def readWhole(path: String): String =
      spark.sparkContext.wholeTextFiles(path).collect().sortBy(_._1)
        .map(_._2.stripSuffix("\n")).mkString("\n")
    val inC = readWhole(inputPath)
    val outC = readWhole(outputPath)
    parseEpgel(inC, outC).zipWithIndex
      .map { case (ps, i) => (i.toLong, ps) }.toDS()
  }

  /** WEXEA markup-linked text → PredSpans with offsets in the
    * RECONSTRUCTED text (markup stripped), wexea_prediction_reader.py:
    * 23-57. Quirks kept: DISAMBIGUATION-typed links are skipped but still
    * replaced in the text (offsets shift); `coref` selects only/none of
    * the links whose type contains "coref"; an empty link target maps to
    * NIL; duplicate spans overwrite (dict semantics). */
  private val WexeaLinkRe = """\[\[([^\[]*?\|)?([^\[]*?)\|([^\[]*?[^\]])\]\]""".r

  def parseWexeaFile(
      content: String,
      title2qid: Map[String, String],
      coref: Boolean = false): Seq[PredSpan] = {
    var textPos = 0
    val text = new StringBuilder
    var preds = Vector.empty[PredSpan]
    WexeaLinkRe.findAllMatchIn(content).foreach { m =>
      val target = Option(m.group(1)).map(_.replaceAll("^\\|+|\\|+$", "")).orNull
      val linkText = m.group(2)
      val linkType = m.group(3)
      text.append(content.substring(textPos, m.start))
      val begin = text.length
      text.append(linkText)
      val end = text.length
      textPos = m.end
      if (!linkType.startsWith("DISAMBIGUATION")) {
        val entityId = QidMapper.getWikidataQid(if (target == null) "" else target, title2qid)
        val isCoref = linkType.contains("coref")
        if (coref == isCoref) {
          preds = preds.filterNot(p => p.begin == begin && p.end == end) :+
            PredSpan(begin, end, entityId, Seq(entityId), "WEXEA")
        }
      }
    }
    preds
  }

  def wexeaPredictions(
      spark: SparkSession,
      dir: String,
      title2qid: Map[String, String] = Map.empty,
      coref: Boolean = false): Dataset[(Long, Seq[PredSpan])] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(dir)
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((_, c), idx) => (idx, parseWexeaFile(c, t2q.value, coref)) }
      .toDS()
  }

  /** Wikifier XML results (wikifier_prediction_reader.py:16-103). Quirks
    * kept: titles with encoding-error "?" chars are repaired via the
    * Wikipedia page id UNLESS the id is the buggy 3658264 or unknown; the
    * KB is forced to WIKIPEDIA for the QID mapping (no Q-prefix
    * shortcut); every CANDIDATE title is repaired with the TOP
    * prediction's page id (the reference's copy-paste bug, preserved);
    * unknown candidates are dropped from the candidate set. */
  def parseWikifierFile(
      content: String,
      wid2title: Map[Long, String],
      title2qid: Map[String, String]): Seq[PredSpan] = {
    def correctTitle(title: String, wid: Long): String = {
      val byId = wid2title.get(wid).orNull
      if (title != byId && title.contains("?")) {
        if (wid != 3658264L && byId != null) byId else title
      } else title
    }
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance().newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    def firstText(el: org.w3c.dom.Element, tag: String): String = {
      val ns = el.getElementsByTagName(tag)
      if (ns.getLength == 0) null else ns.item(0).getTextContent
    }
    val entities = doc.getElementsByTagName("Entity")
    var preds = Vector.empty[PredSpan]
    var i = 0
    while (i < entities.getLength) {
      val el = entities.item(i).asInstanceOf[org.w3c.dom.Element]
      val begin = firstText(el, "EntityTextStart").trim.toInt
      val end = firstText(el, "EntityTextEnd").trim.toInt
      val top = el.getElementsByTagName("TopDisambiguation").item(0).asInstanceOf[org.w3c.dom.Element]
      val topWid = firstText(top, "WikiTitleID").trim.toLong
      val topTitle = correctTitle(firstText(top, "WikiTitle").replace("_", " "), topWid)
      val entityId = qidForWikipediaTitle(topTitle, title2qid)
      val cands = Seq.newBuilder[String]
      val candNodes = el.getElementsByTagName("Candidate")
      var c = 0
      while (c < candNodes.getLength) {
        val cel = candNodes.item(c).asInstanceOf[org.w3c.dom.Element]
        // reference bug kept: candidates are repaired with the TOP id
        val candTitle = correctTitle(firstText(cel, "WikiTitle").replace("_", " "), topWid)
        val candId = qidForWikipediaTitle(candTitle, title2qid)
        if (!isUnknownEntity(candId)) cands += candId
        c += 1
      }
      preds = preds.filterNot(p => p.begin == begin && p.end == end) :+
        PredSpan(begin, end, entityId, cands.result().distinct.sorted, "WIKIFIER")
      i += 1
    }
    preds
  }

  /** get_wikidata_qid with kb_name FORCED to WIKIPEDIA
    * (knowledge_base_mapper.py:57-121, else-branch only: no Q-prefix
    * shortcut; a title containing '/' keeps only its last segment,
    * exactly like the reference's rfind). */
  def qidForWikipediaTitle(title: String, title2qid: Map[String, String]): String = {
    if (title == null || title.isEmpty) return NIL
    if (Set("NIL", "<NIL>", "<unk_wid>", "<unk>", "<UNK>").contains(title)) return NIL
    val name0 = title.substring(title.lastIndexOf('/') + 1)
    if (name0.isEmpty) return NIL
    var name = if (name0 != title) graft.text.Extract.unquote(name0) else name0
    name = name.replace('_', ' ')
    name = name.filter(ch => !Character.isISOControl(ch) &&
      Character.getType(ch) != Character.FORMAT &&
      Character.getType(ch) != Character.LINE_SEPARATOR &&
      Character.getType(ch) != Character.PARAGRAPH_SEPARATOR)
    title2qid.getOrElse(name, NO_MAPPING)
  }

  def wikifierPredictions(
      spark: SparkSession,
      dir: String,
      wid2title: Map[Long, String] = Map.empty,
      title2qid: Map[String, String] = Map.empty): Dataset[(Long, Seq[PredSpan])] = {
    import spark.implicits._
    val w2t = spark.sparkContext.broadcast(wid2title)
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(dir + "/*.full.xml")
      .sortBy(_._1)
      .zipWithIndex()
      .map { case ((_, c), idx) => (idx, parseWikifierFile(c, w2t.value, t2q.value)) }
      .toDS()
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
