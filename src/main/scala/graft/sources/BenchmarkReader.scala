package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.eval.CaseModel._

/** Benchmark / prediction file sources (SURVEY §2.1 S1/S4/S5).
  *
  * All JSON reads use EXPLICIT schemas (never inference — schema drift on
  * a 100 TB corpus must fail loudly, and inference costs an extra pass).
  */
object BenchmarkReader {

  /** Schema of the reference's own benchmark JSONL (`ours` format, built by
    * /root/reference/src/elevant/models/article.py:40-59; observed at
    * benchmarks/kore50.benchmark.jsonl). */
  val ourJsonlSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("evaluation_span", ArrayType(IntegerType)),
    StructField("labels", ArrayType(StructType(Seq(
      StructField("id", IntegerType),
      StructField("span", ArrayType(IntegerType)),
      StructField("entity_id", StringType),
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("parent", IntegerType),
      StructField("children", ArrayType(IntegerType)),
      StructField("optional", BooleanType),
      StructField("desc", BooleanType),
      StructField("coref", BooleanType))))),
    // heterogeneous [[b, e], target] entries: StringType elements make the
    // Jackson parser capture each cell's raw JSON ("[113,122]" / "Landgrave")
    StructField("hyperlinks", ArrayType(ArrayType(StringType))),
    StructField("title_synonyms", ArrayType(ArrayType(IntegerType)))))

  /** Parse one raw hyperlink entry ["[b,e]", "target"] into a span. */
  private def hyperlinkSpan(entry: Seq[String]): Option[graft.model.Span] =
    entry.headOption.flatMap { cell =>
      val nums = cell.replaceAll("[^0-9,-]", "").split(',')
      if (nums.length >= 2)
        (nums(0).toIntOption, nums(1).toIntOption) match {
          case (Some(b), Some(e)) => Some(graft.model.Span(b, e))
          case _ => None
        }
      else None
    }

  /** S1 — read the reference's own JSONL benchmark format into EvalDocs. */
  def ourJsonl(spark: SparkSession, path: String): Dataset[EvalDoc] = {
    import spark.implicits._
    val raw = spark.read.schema(ourJsonlSchema).json(path)
    raw.select("id", "title", "text", "evaluation_span", "labels", "hyperlinks")
      .as[(Option[Long], Option[String], String, Option[Seq[Int]], Option[Seq[RawLabel]],
        Option[Seq[Seq[String]]])]
      .map { case (id, title, text, span, labels, links) =>
        val url = title.filter(_.nonEmpty).getOrElse("article-" + id.getOrElse(0L))
        val (b, e) = span match {
          case Some(Seq(x, y)) => (x, y)
          case _ => (0, text.length)
        }
        EvalDoc(url, text, b, e, labels.getOrElse(Nil).map(_.toGtLabel), Nil,
          hyperlinks = links.getOrElse(Nil).flatMap(hyperlinkSpan))
      }
  }

  final case class RawLabel(
      id: Option[Int], span: Seq[Int], entity_id: String, name: Option[String],
      `type`: Option[String], parent: Option[Int], children: Option[Seq[Int]],
      optional: Option[Boolean], desc: Option[Boolean], coref: Option[Boolean]) {
    def toGtLabel: GtLabel = GtLabel(
      id.getOrElse(0), span.head, span(1), entity_id,
      name.getOrElse("Unknown"),
      parent, children.getOrElse(Nil),
      optional.getOrElse(false),
      `type`.map(_.split('|').toSeq.filter(_.nonEmpty)).getOrElse(Nil),
      coref, desc.getOrElse(false))
  }

  /** Schema of linked-articles files (benchmark labels + a linker's
    * predictions in one line; written by the reference's
    * link_benchmark.py:63-79 via article.to_dict). */
  val linkedArticlesSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("evaluation_span", ArrayType(IntegerType)),
    StructField("labels", ArrayType(StructType(Seq(
      StructField("id", IntegerType),
      StructField("span", ArrayType(IntegerType)),
      StructField("entity_id", StringType),
      StructField("name", StringType),
      StructField("type", StringType),
      StructField("parent", IntegerType),
      StructField("children", ArrayType(IntegerType)),
      StructField("optional", BooleanType),
      StructField("desc", BooleanType),
      StructField("coref", BooleanType))))),
    StructField("entity_mentions", ArrayType(StructType(Seq(
      StructField("span", ArrayType(IntegerType)),
      StructField("id", StringType),
      StructField("recognized_by", StringType),
      StructField("linked_by", StringType),
      StructField("candidates", ArrayType(StringType)))))),
    StructField("hyperlinks", ArrayType(ArrayType(StringType)))))

  /** Read a reference linked-articles file: labels AND predictions. */
  def linkedArticles(spark: SparkSession, path: String): Dataset[EvalDoc] = {
    import spark.implicits._
    spark.read.schema(linkedArticlesSchema).json(path)
      .select("id", "title", "text", "evaluation_span", "labels", "entity_mentions",
        "hyperlinks")
      .as[(Option[Long], Option[String], String, Option[Seq[Int]], Option[Seq[RawLabel]],
        Option[Seq[(Seq[Int], String, Option[String], Option[String], Option[Seq[String]])]],
        Option[Seq[Seq[String]]])]
      .map { case (id, title, text, span, labels, mentions, links) =>
        val url = title.filter(_.nonEmpty).getOrElse("article-" + id.getOrElse(0L))
        val (b, e) = span match {
          case Some(Seq(x, y)) => (x, y)
          case _ => (0, text.length)
        }
        val preds = mentions.getOrElse(Nil).map { case (sp, ent, _, linkedBy, cands) =>
          PredSpan(sp.head, sp(1), ent, cands.getOrElse(Nil), linkedBy.getOrElse(""))
        }
        EvalDoc(url, text, b, e, labels.getOrElse(Nil).map(_.toGtLabel), preds,
          hyperlinks = links.getOrElse(Nil).flatMap(hyperlinkSpan))
      }
  }

  /** Schema of the simple-JSONL interchange format
    * (simple_jsonl_benchmark_reader.py:20-60). */
  val simpleJsonlSchema: StructType = StructType(Seq(
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("labels", ArrayType(StructType(Seq(
      StructField("start_char", IntegerType),
      StructField("end_char", IntegerType),
      StructField("entity_reference", StringType),
      StructField("coref", BooleanType)))))))

  /** S4 — simple-JSONL benchmark: URI references normalized to QIDs (F8),
    * nested parent/child structure derived by span containment (G1). */
  def simpleJsonl(
      spark: SparkSession,
      path: String,
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.read.schema(simpleJsonlSchema).json(path)
      .select("title", "text", "labels")
      .as[(Option[String], String, Option[Seq[(Option[Int], Option[Int], Option[String], Option[Boolean])]])]
      .rdd.zipWithIndex()
      .map { case ((title, text, rawLabels), idx) =>
        val labels = rawLabels.getOrElse(Nil).sortBy(_._1.getOrElse(0)).zipWithIndex.map {
          case ((b, e, ref, coref), i) =>
            val qid = QidMapper.getWikidataQid(ref.getOrElse(""), t2q.value)
            GtLabel(i, b.getOrElse(0), e.getOrElse(0), qid, "Unknown",
              None, Nil, optionalFlag = false, Nil, coref, desc = false)
        }
        val withNesting = NestedGt.assignParentChild(labels)
        EvalDoc(title.filter(_.nonEmpty).getOrElse("article-" + idx), text, 0, text.length,
          withNesting, Nil)
      }.toDS()
  }

  /** Schema of simple-JSONL prediction files
    * (simple_jsonl_prediction_reader.py:21-58). */
  val simplePredSchema: StructType = StructType(Seq(
    StructField("predictions", ArrayType(StructType(Seq(
      StructField("start_char", IntegerType),
      StructField("end_char", IntegerType),
      StructField("entity_reference", StringType),
      StructField("candidates", ArrayType(StringType))))))))

  /** J6 text-prefix mode — attach predictions to articles by joining on
    * the first 100 characters of the article text (the reference
    * literally keys predictions by `text[:100]`,
    * abstract_prediction_reader.py:104,119-130). predsWithText:
    * DataFrame(text STRING, preds ARRAY<PredSpan-struct>). Articles
    * without a prefix match keep empty predictions (reference returns {}
    * with a warning). */
  def attachPredictionsByTextPrefix(
      docs: Dataset[EvalDoc],
      predsWithText: Dataset[(String, Seq[PredSpan])],
      compareLength: Int = 100): Dataset[EvalDoc] = {
    import docs.sparkSession.implicits._
    // The reference builds a dict keyed by text[:100] line by line, so a
    // later line overwrites an earlier one with the same prefix (last
    // wins). dropDuplicates("prefix") keeps a partition-dependent row —
    // NOT deterministic — so pin the choice with zipWithIndex (file order)
    // + max_by(index): exactly the dict's last-wins pick.
    val keyedPreds = predsWithText.rdd.zipWithIndex()
      .map { case ((text, ps), idx) => (text.take(compareLength), ps, idx) }
      .toDF("prefix", "preds", "line_no")
      .groupBy(col("prefix"))
      .agg(org.apache.spark.sql.functions.max_by(col("preds"), col("line_no")).as("preds"))
      .as[(String, Seq[PredSpan])]
    val keyedDocs = docs.map(d => (d.text.take(compareLength), d))
    keyedDocs
      .joinWith(keyedPreds, keyedDocs("_1") === keyedPreds("prefix"), "left")
      .map { case ((_, doc), p) =>
        doc.copy(predictions = Option(p).map(_._2).getOrElse(Nil))
      }
  }

  /** S5 — order-based prediction attach: line i of the prediction file
    * belongs to article i (abstract_prediction_reader.py order mode) —
    * a zipWithIndex equality join. */
  def attachSimpleJsonlPredictions(
      spark: SparkSession,
      docs: Dataset[EvalDoc],
      path: String,
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    val preds = spark.read.schema(simplePredSchema).json(path)
      .select("predictions")
      .as[Option[Seq[(Option[Int], Option[Int], Option[String], Option[Seq[String]])]]]
      .rdd.zipWithIndex().map { case (raw, idx) =>
        val ps = raw.getOrElse(Nil).map { case (b, e, ref, cands) =>
          val qid = QidMapper.getWikidataQid(ref.getOrElse(""), t2q.value)
          val candidates = (Seq(qid) ++ cands.getOrElse(Nil)
            .map(c => QidMapper.getWikidataQid(c, t2q.value))
            .filter(c => !isUnknownEntity(c))).distinct
          PredSpan(b.getOrElse(0), e.getOrElse(0), qid, candidates, "simple-jsonl")
        }
        idx -> ps
      }.toDS().toDF("idx", "preds").as[(Long, Seq[PredSpan])]
    val docsIdx = docs.rdd.zipWithIndex().map(_.swap).toDS().toDF("idx", "doc")
      .as[(Long, EvalDoc)]
    docsIdx.joinWith(preds, docsIdx("idx") === preds("idx"), "left")
      .map { case ((_, doc), p) =>
        doc.copy(predictions = Option(p).map(_._2).getOrElse(Nil))
      }
  }
}

/** G1 — nested-label forest build by span containment (reference:
  * utils/nested_groundtruth_handler.py:7-30, incl. its quirk that a label
  * contained in several others keeps the LAST containing label as parent). */
object NestedGt {
  def assignParentChild(labels: Seq[GtLabel]): Seq[GtLabel] = {
    val parent = scala.collection.mutable.Map.empty[Int, Int]
    val children = scala.collection.mutable.Map.empty[Int, List[Int]].withDefaultValue(Nil)
    labels.zipWithIndex.foreach { case (l, i) =>
      labels.zipWithIndex.foreach { case (c, j) =>
        if (i != j && c.begin >= l.begin && c.end <= l.end) {
          parent(c.id) = l.id
          children(l.id) = children(l.id) :+ c.id
        }
      }
    }
    labels.map(l => l.copy(parent = parent.get(l.id), children = children(l.id)))
  }
}

/** F8 — entity URI → QID normalization (reference:
  * utils/knowledge_base_mapper.py:41-120). */
object QidMapper {
  private val NilRefs = Set("NIL", "<NIL>", "<unk_wid>", "<unk>", "<UNK>")

  def getWikidataQid(ref: String, title2qid: Map[String, String]): String = {
    if (ref == null || ref.isEmpty) return NIL
    if (NilRefs.contains(ref)) return NIL
    if (ref.contains("/notInWiki/")) return NIL
    val name0 = ref.substring(ref.lastIndexOf('/') + 1)
    if (name0.isEmpty) return NIL
    val isWikidata = ref.contains("wikidata.org/")
    val isWikipedia = ref.contains("wikipedia.org/")
    val isDbpedia = ref.contains("dbpedia.org/")
    val unidentified = !isWikidata && !isWikipedia && !isDbpedia
    // reference uses re.match (PREFIX match) — "Q123abc" passes too
    if (isWikidata || (unidentified && name0.matches("Q[0-9]+.*"))) return name0
    var name = if (name0 != ref) graft.text.Extract.unquote(name0) else name0
    name = name.replace('_', ' ')
    name = name.filter(c => !Character.isISOControl(c) &&
      Character.getType(c) != Character.FORMAT &&
      Character.getType(c) != Character.LINE_SEPARATOR &&
      Character.getType(c) != Character.PARAGRAPH_SEPARATOR)
    title2qid.getOrElse(name, NO_MAPPING)
  }
}

/** F6/F7 — whitelist-type filtering of labels and predictions
  * (reference: evaluate.py:85-115 incl. the parent-consistency rule:
  * child labels survive iff their parent survived; unknown-entity labels
  * always survive). */
object WhitelistFilter {
  def filterLabels(docs: Dataset[EvalDoc], whitelist: Set[String]): Dataset[EvalDoc] = {
    import docs.sparkSession.implicits._
    val wl = docs.sparkSession.sparkContext.broadcast(whitelist)
    docs.map { d =>
      val added = scala.collection.mutable.Set.empty[Int]
      val kept = d.labels
        .sortBy(l => (l.parent.isDefined, l.id)) // parents before children
        .filter { l =>
          val keep = (l.parent.isEmpty || added.contains(l.parent.get)) && (
            l.types.exists(wl.value.contains) || l.parent.isDefined ||
              isUnknownEntity(l.entityId))
          if (keep) added += l.id
          keep
        }
      d.copy(labels = kept)
    }
  }

  def filterPredictions(
      docs: Dataset[EvalDoc],
      entityTypes: Map[String, Seq[String]],
      whitelist: Set[String]): Dataset[EvalDoc] = {
    import docs.sparkSession.implicits._
    val et = docs.sparkSession.sparkContext.broadcast(entityTypes)
    val wl = docs.sparkSession.sparkContext.broadcast(whitelist)
    docs.map { d =>
      d.copy(predictions = d.predictions.filter(p =>
        et.value.getOrElse(p.entityId, Nil).exists(wl.value.contains)))
    }
  }
}
