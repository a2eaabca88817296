package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Hyperlink, Section, Span}
import graft.text.Extract

/** Corpus-family scans + the dump-derived mapping jobs of the reference's
  * peripheral scripts:
  *
  *   - `wikipediaArticles`: the extracted-dump JSONL corpus scan
  *     (wikipedia_corpus.py:9-16 / wikipedia_dump_reader.py:183-200) —
  *     one line {id,title,text,url} → markup extraction via Extract.
  *   - `newscrawlArticles`: the second corpus family
  *     (newscrawl_dump_reader.py:19-35) — id loses its dots, the title is
  *     "<date> - <first paragraph>" newline-stripped, text kept verbatim.
  *   - `idTitleMapping`: scripts/get_wikipedia_id_to_title_mapping.py:10-25
  *     — (id, title) sorted ascending by numeric id.
  *   - `abstractsMapping`: scripts/create_abstracts_mapping.py:14-50 —
  *     per-article abstract span (article.py:118-135 incl. the leading-
  *     coordinate filter), title → QID through the reference's
  *     get_wikidata_qid(WIKIPEDIA) normalization chain (slash-truncate,
  *     conditional unquote, underscores → spaces, unprintable strip) and
  *     link2id's variant/redirect fallback (entity_database.py:345-356),
  *     LAST article per QID winning like the reference's dict overwrite.
  *
  * All scans are one narrow map over the JSONL lines; the abstracts job
  * joins against the title2qid/redirects dimensions with NO broadcast
  * hint (corpus-derived, ~10^8 rows at full-wiki scale — AQE broadcasts
  * them when small) and resolves last-wins with one aggregation.
  */
object CorpusJobs {

  /** One corpus article — the union row of both families. */
  final case class CorpusArticle(
      id: String,
      title: String,
      text: String,
      url: String,
      hyperlinks: Seq[Hyperlink],
      titleSynonyms: Seq[Span],
      sections: Seq[Section])

  private val wikiSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("title", StringType),
    StructField("text", StringType),
    StructField("url", StringType)))

  private val newsSchema = StructType(Seq(
    StructField("id", StringType),
    StructField("date", StringType),
    StructField("text", StringType)))

  /** Extracted-Wikipedia-dump scan: markup → text + spans per line. */
  def wikipediaArticles(spark: SparkSession, path: String): Dataset[CorpusArticle] = {
    import spark.implicits._
    spark.read.schema(wikiSchema).json(path)
      .as[(Option[Long], Option[String], Option[String], Option[String])]
      .map { case (id, title, text, url) =>
        val ex = Extract.processExtractorText(text.getOrElse(""))
        CorpusArticle(id.map(_.toString).getOrElse(""), title.getOrElse(""),
          ex.text, url.getOrElse(""), ex.hyperlinks, ex.titleSynonyms, ex.sections)
      }
  }

  /** Newscrawl scan (newscrawl_dump_reader.py:19-35): no markup
    * extraction; id drops '.'; title = date + " - " + first paragraph
    * with newlines removed. */
  def newscrawlArticles(spark: SparkSession, path: String): Dataset[CorpusArticle] = {
    import spark.implicits._
    spark.read.schema(newsSchema).json(path)
      .as[(Option[String], Option[String], Option[String])]
      .map { case (id, date, text) =>
        val t = text.getOrElse("")
        val firstPara = { val i = t.indexOf("\n\n"); if (i < 0) t else t.substring(0, i) }
        val title = (date.getOrElse("") + " - " + firstPara).replace("\n", "")
        CorpusArticle(id.getOrElse("").replace(".", ""), title, t, "", Nil, Nil, Nil)
      }
  }

  /** get_wikipedia_id_to_title_mapping.py: (id, title), ascending numeric
    * id (the reference sorts the dict's int keys). Later duplicates of an
    * id overwrite earlier ones there; last-wins is replayed with max(ord). */
  def idTitleMapping(articles: Dataset[CorpusArticle]): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    articles.toDF().select(col("id").cast("long").as("id"), col("title"))
      .rdd.zipWithIndex()
      .map { case (r, ord) => (r.getLong(0), r.getString(1), ord) }
      .toDF("id", "title", "ord")
      .groupBy(col("id"))
      .agg(max(struct(col("ord"), col("title"))).as("m"))
      .select(col("id"), col("m.title").as("title"))
      .orderBy(col("id"))
  }

  // ---------- abstracts mapping ---------------------------------------------

  /** article.py:118-135 — abstract span within the first section,
    * including the leading-coordinate filter quirk (a first line shorter
    * than 60 chars containing '°'). Returns None when the article carries
    * no section data (the reference raises there; rows are dropped and
    * counted by the caller if needed). */
  /** CPython `s[a:b]`, exactly: NEGATIVE indices count from the end, then
    * both clamp to [0, len]; a >= b → "". Never throws. (An earlier
    * version clamped negatives to 0 — CPython-divergent for callers that
    * compute offsets; all executed-reference goldens exercise identical
    * behavior on the two since their indices are non-negative.) */
  def pySlice(s: String, a: Int, b: Int): String = {
    val n = s.length
    val lo = math.max(0, math.min(if (a < 0) a + n else a, n))
    val hi = math.max(0, math.min(if (b < 0) b + n else b, n))
    if (lo >= hi) "" else s.substring(lo, hi)
  }

  def abstractSpan(text: String, sections: Seq[Section]): Option[(Int, Int)] = {
    if (sections.isEmpty) return None
    val secBegin = sections.head.begin
    val secEnd = sections.head.end
    val firstSectionText = pySlice(text, secBegin, secEnd)
    // Python find returns -1 when absent → title_end = 1 (quirk preserved)
    val titleEnd = firstSectionText.indexOf("\n\n") + 2
    var abstractStart = titleEnd
    val abstractText = pySlice(text, abstractStart, secEnd)
    val firstNewline = abstractText.indexOf('\n')
    if (firstNewline > 0 && firstNewline < 60 &&
      abstractText.substring(0, firstNewline).contains('°') &&
      abstractText.length > firstNewline + 2)
      abstractStart = titleEnd + firstNewline + 1
    Some((abstractStart, secEnd))
  }

  /** CPython str.strip(): trims the python-isspace set (wider than Java
    * trim's <= ' ' rule — includes NBSP/NEL/etc., see
    * WriteArticles.pyIsSpace). */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && graft.pipeline.WriteArticles.pyIsSpace(s.charAt(a))) a += 1
    while (b > a && graft.pipeline.WriteArticles.pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** CPython str.isprintable(): false for C*, Zl, Zp and Zs-except-space. */
  def pyIsPrintable(cp: Int): Boolean = {
    if (cp == ' '.toInt) return true
    val t = Character.getType(cp)
    !(t == Character.CONTROL || t == Character.FORMAT ||
      t == Character.SURROGATE || t == Character.PRIVATE_USE ||
      t == Character.UNASSIGNED || t == Character.LINE_SEPARATOR ||
      t == Character.PARAGRAPH_SEPARATOR || t == Character.SPACE_SEPARATOR)
  }

  private def stripUnprintable(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (pyIsPrintable(cp)) sb.appendAll(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  private val NilForms = Set("NIL", "<NIL>", "<unk_wid>", "<unk>", "<UNK>")

  /** get_wikidata_qid(…, kb_name=WIKIPEDIA) minus the DB lookup: returns
    * the two link2id lookup keys (primary, capitalized-variant-or-null)
    * or None when the reference short-circuits to NIL. */
  def wikipediaLookupKeys(titleRef: String): Option[(String, Option[String])] = {
    if (titleRef == null || titleRef.isEmpty || NilForms.contains(titleRef)) return None
    val slash = titleRef.lastIndexOf('/')
    var name = titleRef.substring(slash + 1)
    if (name.isEmpty) return None
    if (name != titleRef) name = Extract.unquote(name) // unquote only URI parts
    name = stripUnprintable(name.replace('_', ' '))
    val variant =
      if (name.nonEmpty && Character.isLowerCase(name.codePointAt(0))) {
        val first = name.substring(0, Character.charCount(name.codePointAt(0)))
        Some(first.toUpperCase(java.util.Locale.ROOT) + name.substring(first.length))
      } else None
    Some((name, variant))
  }

  /** create_abstracts_mapping.py as one Spark job. `title2qid`
    * (title, qid) and `redirects` (from_title, to_title) are the engine's
    * mapping dims. Output: (qid, title, abstract) with newlines → spaces,
    * ordered by qid — exactly the reference's sorted TSV rows. Rows whose
    * title maps to no QID (the reference's mapping_errors) are dropped;
    * duplicate QIDs keep the LAST article in corpus order. */
  def abstractsMapping(
      articles: Dataset[CorpusArticle],
      title2qid: DataFrame,
      redirects: DataFrame): DataFrame = {
    val spark = articles.sparkSession
    import spark.implicits._
    val rows = articles.rdd.zipWithIndex().flatMap { case (a, ord) =>
      for {
        (b, e) <- abstractSpan(a.text, a.sections)
        (k1, k2) <- wikipediaLookupKeys(a.title)
      } yield (ord, a.title, pyStrip(pySlice(a.text, b, e)).replace("\n", " "),
        k1, k2.orNull)
    }.toDF("ord", "title", "abstract", "k1", "k2")

    // link2id: variant order is (k1 direct, k1 redirect, k2 direct,
    // k2 redirect) — four left joins, first non-null wins
    def dim(df: DataFrame, a: String, b: String) =
      df.select(col(df.columns(0)).as(a), col(df.columns(1)).as(b))
    val resolved = rows
      .join(dim(title2qid, "d1_t", "d1_q"), col("k1") === col("d1_t"), "left")
      .join(dim(redirects, "r1_f", "r1_t"), col("k1") === col("r1_f"), "left")
      .join(dim(title2qid, "dr1_t", "dr1_q"), col("r1_t") === col("dr1_t"), "left")
      .join(dim(title2qid, "d2_t", "d2_q"), col("k2") === col("d2_t"), "left")
      .join(dim(redirects, "r2_f", "r2_t"), col("k2") === col("r2_f"), "left")
      .join(dim(title2qid, "dr2_t", "dr2_q"), col("r2_t") === col("dr2_t"), "left")
      .withColumn("qid", coalesce(col("d1_q"), col("dr1_q"), col("d2_q"), col("dr2_q")))
      .where(col("qid").isNotNull)

    resolved
      .groupBy(col("qid"))
      .agg(max(struct(col("ord"), col("title"), col("abstract"))).as("m"))
      .select(col("qid"), col("m.title").as("title"), col("m.abstract").as("abstract"))
      .orderBy(col("qid"))
  }

  /** Fixture-scale TSV sink shared by the two mapping jobs. */
  def writeTsvLocal(df: DataFrame, path: String): Unit = {
    val lines = df.collect().map(_.toSeq.map {
      case null => ""
      case v => v.toString
    }.mkString("\t")).mkString("", "\n", "\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      lines.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }
}
