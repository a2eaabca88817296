package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.eval.CaseModel._

/** S4 benchmark-reader tail: tsv / pubtator / refined-jsonl / xml / tagme
  * (reference: src/elevant/benchmark_readers/{tsv,pubtator,refined_jsonl,
  * xml,tagme}_benchmark_reader.py), golden-tested against the EXECUTED
  * reference (tools/gen_reader_fixtures.py → golden/readers_tail.json).
  *
  * All five formats are sequential-state parses over small benchmark
  * files, so each file parses in one task via wholeTextFiles — the
  * corpus-scale inputs of this engine are the page/document tables, never
  * benchmarks. Reference quirks kept deliberately:
  *   - tsv: every empty line yields an article (even an empty one) and
  *     consumes an article id; a trailing unlabeled block still yields.
  *   - pubtator: an article is only emitted at a blank separator line — a
  *     file without a trailing blank line LOSES its last article; ids
  *     are the file's id strings; entity ids without ":" get the "MESH:"
  *     prefix.
  *   - xml: texts are lstripped and spans shifted by the offset, which
  *     can produce NEGATIVE spans for annotations before the text start.
  *   - tagme: mention spans come from `text.lower().find(mention)` —
  *     first occurrence, silently skipped if absent.
  */
object BenchmarkReaders2 {

  // ---------- tsv (tsv_benchmark_reader.py:22-90) -----------------------------

  def parseTsv(content: String, title2qid: Map[String, String]): Seq[EvalDoc] = {
    val docs = Seq.newBuilder[EvalDoc]
    var articleId = 0
    var labelId = 0
    val text = new StringBuilder
    var labels = Vector.empty[GtLabel]

    def create(): Unit = {
      // create_article strips the text; spans are NOT shifted (reference
      // builds token+" " so only a trailing space is ever stripped)
      val t = text.toString.trim
      docs += EvalDoc(s"tsv-$articleId", t, 0, t.length,
        NestedGt.assignParentChild(labels), Nil)
    }

    content.split("\n", -1).foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) {
        // reference: EVERY empty line yields (even an empty article)
        create()
        articleId += 1
        labelId = 0
        text.clear()
        labels = Vector.empty
      } else {
        val lst = line.split("\t", -1)
        val token = lst(0)
        val entityRef = if (lst.length > 1) lst(1) else ""
        val nerIob = if (lst.length > 2 && lst(2).nonEmpty) lst(2).charAt(0) else ' '
        val startIdx = text.length
        text.append(token).append(' ')
        val endIdx = text.length - 1
        if (nerIob == 'B') {
          val entityId = QidMapper.getWikidataQid(entityRef, title2qid)
          labels = labels :+ GtLabel(labelId, startIdx, endIdx, entityId, "Unknown",
            None, Nil, optionalFlag = false, Nil, None, desc = false)
          labelId += 1
        } else if (nerIob == 'I' && labels.nonEmpty) {
          labels = labels.init :+ labels.last.copy(end = endIdx)
        }
      }
    }
    if (text.nonEmpty) create()
    docs.result()
  }

  def tsvBenchmark(
      spark: SparkSession,
      path: String,
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseTsv(c, t2q.value) }.toDS()
  }

  // ---------- pubtator (pubtator_benchmark_reader.py:18-66) --------------------

  def parsePubtator(content: String): Seq[EvalDoc] = {
    val docs = Seq.newBuilder[EvalDoc]
    var lineCounter = 0
    var labelId = 0
    val text = new StringBuilder
    var title = ""
    var labels = Vector.empty[GtLabel]

    val parts = content.split("\n", -1)
    parts.zipWithIndex.foreach { case (line, idx) =>
      val isEofTail = idx == parts.length - 1 // unterminated tail, never == "\n"
      if (line.isEmpty && !isEofTail) {
        docs += EvalDoc(title, text.toString, 0, text.length,
          NestedGt.assignParentChild(labels), Nil)
        lineCounter = 0
        labelId = 0
        text.clear()
        labels = Vector.empty
        // title/article id NOT reset (reference quirk)
      } else if (!line.isEmpty) {
        if (lineCounter == 0) {
          val p = line.split("\\|", 3)
          title = p(2)
          text.append(title).append('\n')
        } else if (lineCounter == 1) {
          val p = line.split("\\|", 3)
          text.append(p(2))
        } else {
          val p = line.split("\t", -1)
          val (start, end) = (p(1).toInt, p(2).toInt)
          var entityId = p(5)
          // reference's "dirty hack": NCBI ids lack the MESH: prefix
          if (!entityId.contains(":")) entityId = "MESH:" + entityId
          labels = labels :+ GtLabel(labelId, start, end, entityId, "Unknown",
            None, Nil, optionalFlag = false, Nil, None, desc = false)
          labelId += 1
        }
        lineCounter += 1
      }
      // NOTE: no trailing yield — the reference only emits on "\n" lines
    }
    docs.result()
  }

  def pubtatorBenchmark(spark: SparkSession, path: String): Dataset[EvalDoc] = {
    import spark.implicits._
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parsePubtator(c) }.toDS()
  }

  // ---------- refined jsonl (refined_jsonl_benchmark_reader.py:23-66) ----------

  def parseRefinedJsonl(content: String, title2qid: Map[String, String]): Seq[EvalDoc] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    content.split("\n").filter(_.nonEmpty).map { line =>
      val j = mapper.readTree(line)
      val title = if (j.has("doc_title") && !j.get("doc_title").isNull) j.get("doc_title").asText() else ""
      val text = j.get("text").asText()
      var labelId = 0
      val labels = Vector.newBuilder[GtLabel]
      val ms = j.get("mentions")
      if (ms != null && ms.isArray) {
        ms.forEach { m =>
          val start = m.get("start").asInt()
          val len = m.get("length").asInt()
          val entityId = QidMapper.getWikidataQid(m.get("wiki_name").asText(), title2qid)
          labels += GtLabel(labelId, start, start + len, entityId, "Unknown",
            None, Nil, optionalFlag = false, Nil, None, desc = false)
          labelId += 1
        }
      }
      EvalDoc(title, text, 0, text.length, NestedGt.assignParentChild(labels.result()), Nil)
    }.toSeq
  }

  def refinedJsonlBenchmark(
      spark: SparkSession,
      path: String,
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, c) => parseRefinedJsonl(c, t2q.value) }.toDS()
  }

  // ---------- xml (xml_benchmark_reader.py:27-121) ------------------------------

  /** (docName → ordered mentions ((begin, end), wikiName | null)). */
  def mentionDictFromXml(xmlContent: String): Map[String, Seq[((Int, Int), String)]] = {
    val doc = parseXml(xmlContent)
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[((Int, Int), String)]]()
    foreachElement(doc.getDocumentElement) { el =>
      if (el.getTagName == "document") {
        val name = el.getAttribute("docName")
        var ms = Vector.empty[((Int, Int), String)]
        foreachElement(el) { ann =>
          if (ann.getTagName == "annotation") {
            var wiki: String = null
            var offset = 0
            var length = 0
            foreachElement(ann) { c =>
              c.getTagName match {
                case "wikiName" => wiki = Option(c.getTextContent).orNull
                case "offset" => offset = c.getTextContent.trim.toInt
                case "length" => length = c.getTextContent.trim.toInt
                case _ => ()
              }
            }
            ms = ms :+ ((offset, offset + length), wiki)
          }
        }
        out(name) = ms
      }
    }
    out.toMap
  }

  /** Directory variant (aquaint-style): elements in document order set the
    * state machine — ReferenceFileName starts a doc, Offset/Length define
    * the span used by the NEXT Annotation. */
  def mentionDictFromDirXml(xmlContents: Seq[String]): Map[String, Seq[((Int, Int), String)]] = {
    val out = scala.collection.mutable.LinkedHashMap[String, Vector[((Int, Int), String)]]()
    xmlContents.foreach { content =>
      val doc = parseXml(content)
      var current = ""
      var span = (-1, -1)
      foreachElement(doc.getDocumentElement) { el =>
        el.getTagName match {
          case "ReferenceFileName" =>
            current = el.getTextContent.trim
            out(current) = Vector.empty
          case "Offset" =>
            span = (el.getTextContent.trim.toInt, span._2)
          case "Length" =>
            span = (span._1, span._1 + el.getTextContent.trim.toInt)
          case "Annotation" =>
            var e = el.getTextContent.trim.stripPrefix("\"").stripSuffix("\"").replace("_", " ")
            e = e.replace("http://en.wikipedia.org/wiki/", "")
            if (e == "none" || e == "---") e = "NIL"
            out(current) = out(current) :+ ((span, e))
          case _ => ()
        }
      }
    }
    out.toMap
  }

  /** texts: (filename → content), iterated in SORTED filename order like
    * the reference's sorted(os.listdir(text_dir)). */
  def xmlBenchmarkDocs(
      mentionDict: Map[String, Seq[((Int, Int), String)]],
      texts: Seq[(String, String)],
      title2qid: Map[String, String]): Seq[EvalDoc] = {
    texts.sortBy(_._1).map { case (filename, rawText) =>
      val stripped = rawText.replaceAll("^\\s+", "") // lstrip
      val offset = rawText.length - stripped.length
      val wikiLabels = mentionDict.getOrElse(filename, Nil)
      var labelId = 0
      val labels = wikiLabels.sortBy(_._1._1).map { case ((b, e), wikiName) =>
        val entityId =
          if (wikiName != null && wikiName != "NIL") QidMapper.getWikidataQid(wikiName, title2qid)
          else NIL
        val l = GtLabel(labelId, b - offset, e - offset, entityId, "Unknown",
          None, Nil, optionalFlag = false, Nil, None, desc = false)
        labelId += 1
        l
      }
      EvalDoc(filename, stripped, 0, stripped.length,
        NestedGt.assignParentChild(labels), Nil)
    }
  }

  private def parseXml(content: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(content.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
  }

  /** Document-order traversal over all descendant elements. */
  private def foreachElement(root: org.w3c.dom.Element)(f: org.w3c.dom.Element => Unit): Unit = {
    val children = root.getChildNodes
    var i = 0
    while (i < children.getLength) {
      children.item(i) match {
        case el: org.w3c.dom.Element =>
          f(el)
          foreachElement(el)(f)
        case _ => ()
      }
      i += 1
    }
  }

  // ---------- tagme (tagme_benchmark_reader.py:23-105) ---------------------------

  /** Sequential co-iteration of the snippet and annotation files,
    * replicating the reference's lookahead state machine exactly (the
    * pending annotation survives across snippet lines until its article
    * id is reached; EOF keeps the last pending annotation live). */
  def parseTagme(
      snippets: String,
      annotations: String,
      wid2title: Map[Long, String],
      title2qid: Map[String, String]): Seq[EvalDoc] = {
    val docs = Seq.newBuilder[EvalDoc]
    val annLines = annotations.split("\n", -1).iterator
    var annEof = false
    var articleId = -1
    var mentionText = ""
    var wikipediaId = -1L
    var articleIdCounter = 0

    snippets.split("\n", -1).filter(_.nonEmpty).foreach { line =>
      val tab = line.indexOf('\t')
      val lineId = line.substring(0, tab).toInt
      val text = line.substring(tab + 1)
      var labelId = 0
      var labels = Vector.empty[GtLabel]
      var break = false
      while (!break) {
        if (articleId == lineId) {
          val mentionStart = text.toLowerCase.indexOf(mentionText)
          if (mentionStart > -1) {
            val span = (mentionStart, mentionStart + mentionText.length)
            val entityId = wid2title.get(wikipediaId) match {
              case None => NO_MAPPING // no Wikipedia title for this id
              case Some(t) => QidMapper.getWikidataQid(t, title2qid)
            }
            labels = labels :+ GtLabel(labelId, span._1, span._2, entityId, "Unknown",
              None, Nil, optionalFlag = false, Nil, None, desc = false)
            labelId += 1
          } // else: reference logs a warning and drops the mention
        }
        val next = if (annLines.hasNext) annLines.next() else ""
        if (next.isEmpty) { annEof = true; break = true }
        else {
          val p = next.split("\t", -1)
          articleId = p(0).toInt
          mentionText = p(1)
          wikipediaId = p(2).toLong
          if (articleId > lineId) break = true
        }
      }
      docs += EvalDoc(s"tagme-$articleIdCounter", text, 0, text.length,
        NestedGt.assignParentChild(labels), Nil)
      articleIdCounter += 1
    }
    val _ = annEof
    docs.result()
  }
}
