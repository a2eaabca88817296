package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.Dataset

import graft.eval.CaseModel._
import graft.model.{Hyperlink, Span}

/** The reference's `scripts/write_articles.py` as a distributed formatter:
  * articles (from any reader / the dump scan) → annotated text files in
  * the four external-linker input formats —
  *
  *   - Ambiverse (AIDA):  one `article_%05d.txt` per article
  *   - WEXEA:             title in filename + `[[target|orig]]` hyperlinks
  *   - Neural-EL (Gupta): one article per line, all whitespace → spaces
  *   - Wikifier:          ASCII only, non-ASCII codepoints → `_`
  *
  * Annotation modes mirror write_articles.py's mutually exclusive flags:
  * groundtruth labels / linked entities as `[QID:name|orig]`
  * (write_articles.py:72-127), NER groundtruth as `[[mention]]`
  * (:90-104), hyperlinks + bold-title spans as `[[target|orig]]`
  * (:129-165). Formatting quirks reproduced exactly (executed-reference
  * goldens in WriteArticlesSpec):
  *
  *   - labels splice in DESCENDING LABEL-ID order (GroundtruthLabel.__lt__
  *     compares ids, groundtruth_label.py:66-67), children included;
  *   - linked mentions splice in descending span order, unknown entities
  *     skipped, entity list in first-seen order OF THAT REVERSE WALK;
  *   - title spans drop when overlapping a hyperlink (WEXEA convention),
  *     combined splice ordered by ((begin,end),target) descending;
  *   - one-article-per-line replaces every CPython-`\s` char (which
  *     includes NBSP/NEL/FIGURE SPACE/NNBSP — wider than Java's
  *     isWhitespace) AFTER "\n"→" ";
  *   - --ascii keeps codepoints < 128 and maps each OTHER CODEPOINT (not
  *     UTF-16 unit — astral chars become ONE underscore) to `_`.
  *
  * The formatter itself is a map-side Dataset transform (one task per
  * partition, no shuffle — linear in corpus size, ready for the 100 TB
  * dump scan); only `writeLocal`, the benchmark-sized fixture sink,
  * collects, mirroring the reference's single-process writer.
  */
object WriteArticles {

  sealed trait Annotation
  case object Labels extends Annotation
  case object Links extends Annotation
  case object HyperlinksAnn extends Annotation
  case object Ner extends Annotation

  /** Formatter input — the union of the fields the four modes read.
    * Adapters: `fromDocs` (benchmark/linked-articles side, no hyperlink
    * targets) and page-side construction from `Extract` output (carries
    * targets + title synonyms for the WEXEA path). */
  /** `id` is the reference article id printed in the `--article_header`
    * line; `seq` is the iteration ordinal that names the output file
    * (write_articles.py keeps a separate article_num counter — the two
    * coincide for benchmark docs but diverge for dump articles). */
  final case class WArticle(
      id: Long,
      seq: Long,
      title: String,
      text: String,
      evalBegin: Int,
      evalEnd: Int,
      labels: Seq[GtLabel],
      mentions: Seq[PredSpan],
      hyperlinks: Seq[Hyperlink],
      titleSynonyms: Seq[Span])

  final case class Options(
      annotation: Option[Annotation] = None,
      evaluationSpan: Boolean = false,
      articleHeader: Boolean = false,
      oneArticlePerLine: Boolean = false,
      ascii: Boolean = false,
      titleInFilename: Boolean = false,
      printEntityList: Boolean = false)

  final case class FileOut(file_name: String, content: String)

  // ---------- pure helpers ---------------------------------------------------

  /** write_articles.py:47-48 — per CODEPOINT, ord < 128 kept, else '_'. */
  def replaceNonAscii(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (cp < 128) sb.append(cp.toChar) else sb.append('_')
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** CPython str.isspace() ⊇ Java isWhitespace: Java excludes the
    * non-breaking members (NBSP U+00A0, NEL U+0085, FIGURE SPACE U+2007,
    * NARROW NBSP U+202F) that Python's `\s` matches. */
  def pyIsSpace(c: Char): Boolean =
    Character.isWhitespace(c) || c == '\u00a0' || c == '\u0085' ||
      c == '\u2007' || c == '\u202f'

  private def subWhitespace(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      sb.append(if (pyIsSpace(c)) ' ' else c)
      i += 1
    }
    sb.toString
  }

  /** CPython `s[a:b]` — the one shared implementation lives in
    * CorpusJobs.pySlice. The annotation builders run over span-offset
    * arithmetic (`begin - offset` in evaluation-span mode), and a label
    * outside the evaluation span yields NEGATIVE indices: the reference's
    * slicing then produces defined (if odd) output where Java substring
    * would throw and kill the Spark task. */
  def pySliceAt(s: String, a: Int, b: Int): String =
    graft.sources.CorpusJobs.pySlice(s, a, b)

  private def splice(text: String, begin: Int, end: Int, repl: String): String =
    pySliceAt(text, 0, begin) + repl + pySliceAt(text, end, text.length)

  // ---------- annotation text builders (write_articles.py:52-165) ------------

  /** LABELS: every label (children included), descending id. Returns
    * (text, entity list). Reference builds the list as a Python set —
    * iteration order is hash-randomized there, so any order is conformant;
    * we emit first-seen order of the same reverse walk (deterministic). */
  def labeledText(
      a: WArticle,
      names: Map[String, String],
      offset: Int,
      text0: String): (String, Seq[String]) = {
    var text = text0
    val seen = scala.collection.mutable.LinkedHashSet[String]()
    for (l <- a.labels.sortBy(-_.id)) {
      val begin = l.begin - offset
      val end = l.end - offset
      val snippet = pySliceAt(text, begin, end)
      val name = names.getOrElse(l.entityId, "Unknown")
      text = splice(text, begin, end, s"[${l.entityId}:$name|$snippet]")
      seen += l.entityId
    }
    (text, seen.toSeq)
  }

  /** NER groundtruth: root, non-optional, known-entity labels only,
    * descending id, spliced as [[mention]]. */
  def nerText(a: WArticle, offset: Int, text0: String): String = {
    var text = text0
    for (l <- a.labels.sortBy(-_.id)) {
      if (l.parent.isEmpty && !l.isOptional && !isUnknownEntity(l.entityId)) {
        val begin = l.begin - offset
        val end = l.end - offset
        text = splice(text, begin, end, s"[[${pySliceAt(text, begin, end)}]]")
      }
    }
    text
  }

  /** LINKS: predicted mentions, descending span, unknown entities
    * skipped; entity list keeps FIRST-SEEN order of the reverse walk
    * (write_articles.py:107-127's insertion-counter dict). */
  def linkedText(
      a: WArticle,
      names: Map[String, String],
      offset: Int,
      text0: String): (String, Seq[String]) = {
    var text = text0
    val order = scala.collection.mutable.LinkedHashSet[String]()
    val sorted = a.mentions.sortBy(m => (m.begin, m.end))(
      Ordering.Tuple2(Ordering.Int.reverse, Ordering.Int.reverse))
    for (m <- sorted) {
      if (!isUnknownEntity(m.entityId)) {
        val begin = m.begin - offset
        val end = m.end - offset
        val snippet = pySliceAt(text, begin, end)
        val name = names.getOrElse(m.entityId, "Unknown")
        text = splice(text, begin, end, s"[${m.entityId}:$name|$snippet]")
        order += m.entityId
      }
    }
    (text, order.toSeq)
  }

  /** HYPERLINKS: bold-title spans join the hyperlink list unless they
    * overlap one (WEXEA convention, write_articles.py:129-146), then one
    * descending-((span),target) splice pass; [[target]] when the snippet
    * equals the target, [[target|snippet]] otherwise. Returns (text,
    * distinct targets — set in the reference, first-seen here). */
  def hyperlinkText(a: WArticle, offset: Int, text0: String): (String, Seq[String]) = {
    val sortedLinks = a.hyperlinks.sortBy(h => (h.begin, h.end, h.target))
    val titleSpans = a.titleSynonyms.filter { s =>
      // replicate the reference's scan: skip iff some hyperlink overlaps
      var skip = false
      var broke = false
      for (h <- sortedLinks if !broke) {
        skip = false
        if ((h.begin <= s.begin && s.begin < h.end) ||
          (s.begin <= h.begin && h.begin < s.end)) {
          skip = true; broke = true
        } else if (h.begin > s.end) broke = true
      }
      !skip
    }.map(s => Hyperlink(s.begin, s.end, a.title))

    val all = (a.hyperlinks ++ titleSpans).sortBy(h => (h.begin, h.end, h.target))(
      Ordering.Tuple3(Ordering.Int.reverse, Ordering.Int.reverse,
        Ordering.String.reverse))
    var text = text0
    val targets = scala.collection.mutable.LinkedHashSet[String]()
    for (h <- all) {
      val begin = h.begin - offset
      val end = h.end - offset
      val snippet = pySliceAt(text, begin, end)
      val repl =
        if (snippet == h.target) s"[[${h.target}]]" else s"[[${h.target}|$snippet]]"
      text = splice(text, begin, end, repl)
      targets += h.target
    }
    (text, targets.toSeq)
  }

  // ---------- per-article formatting (write_articles.py main, :199-263) ------

  /** One article → (file name, content). `names` is the entity-name
    * dimension (broadcast by `format`). */
  def render(a: WArticle, opts: Options, names: Map[String, String]): FileOut = {
    // evaluation-span pre-slice (only survives when annotation is None —
    // the annotated path re-slices from the raw text itself)
    var text = a.text
    if (opts.evaluationSpan) {
      val span = pySliceAt(a.text, a.evalBegin, a.evalEnd)
      text = if (span != a.text) span + "\n" else text
    }

    opts.annotation.foreach { ann =>
      val (offset, base) =
        if (opts.evaluationSpan) (a.evalBegin, pySliceAt(a.text, a.evalBegin, a.evalEnd))
        else (0, a.text)
      val (annotated, entities) = ann match {
        case Labels => labeledText(a, names, offset, base)
        case Links => linkedText(a, names, offset, base)
        case Ner => (nerText(a, offset, base), Nil)
        case HyperlinksAnn => hyperlinkText(a, offset, base)
      }
      text = annotated
      if (opts.printEntityList) {
        val sb = new StringBuilder(text)
        sb ++= "\nACTUAL ENTITIES\n"
        for (e <- entities) { sb ++= e; sb += '\n' }
        sb ++= "\nOTHER ENTITIES"
        text = sb.toString
      }
    }

    var separator = "\n"
    if (opts.oneArticlePerLine) {
      separator = ""
      text = subWhitespace(text.replace("\n", " "))
    }

    val sb = new StringBuilder
    if (opts.articleHeader) {
      val t = if (opts.ascii) replaceNonAscii(a.title) else a.title
      sb ++= s"***** $t (${a.id}) *****$separator"
    }
    sb ++= (if (opts.ascii) replaceNonAscii(text) else text)
    sb += '\n'

    val fileName = {
      val base = f"article_${a.seq}%05d"
      val withTitle =
        if (opts.titleInFilename)
          base + "_" + a.title.replace(" ", "_").replace("/", "_")
        else base
      withTitle + ".txt"
    }
    FileOut(fileName, sb.toString)
  }

  // ---------- Spark surfaces --------------------------------------------------

  /** Distributed formatter: one FileOut row per article. `names` rides
    * along in the closure (entity-name dims are broadcast-sized by
    * contract — the reference loads the whole mapping in one process). */
  def format(
      articles: Dataset[WArticle],
      opts: Options,
      names: Map[String, String] = Map.empty): Dataset[FileOut] = {
    val spark = articles.sparkSession
    import spark.implicits._
    val bNames = spark.sparkContext.broadcast(names)
    articles.map(a => render(a, opts, bNames.value))
  }

  /** EvalDoc adapter (benchmark/linked-articles side): ids 0..n-1 in url
    * order — same declared ordering divergence as AddBenchmark (EvalDoc
    * carries no source ids; every consumer here keys by url/title). */
  def fromDocs(docs: Dataset[EvalDoc]): Dataset[WArticle] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .orderBy(org.apache.spark.sql.functions.col("url"))
      .rdd
      .zipWithIndex()
      .map { case (d, i) =>
        WArticle(i, i, d.url, d.text, d.evalBegin, d.evalEnd, d.labels,
          d.predictions, d.hyperlinks.map(s => Hyperlink(s.begin, s.end, "")),
          Nil)
      }
      .toDS()
  }

  /** Fixture-scale sink: collect + write one file per article (or one
    * file with every line for `oneArticlePerLine`), exactly like the
    * reference's single process. Corpus-scale jobs keep the FileOut
    * Dataset and write partitioned. */
  def writeLocal(files: Dataset[FileOut], outDir: String, oneFile: Boolean): Seq[String] = {
    Files.createDirectories(Paths.get(outDir))
    // sort by the NUMERIC seq embedded in every name ("article_<digits>"
    // prefix, title suffix optional): plain lexicographic order breaks at
    // seq 100000 (the %05d padding stops at 6 digits, so "article_100000"
    // sorts before "article_99999") and the reference's oneFile output is
    // its sequential iteration order
    val rows = files.collect().sortBy { f =>
      val digits = f.file_name.stripPrefix("article_").takeWhile(_.isDigit)
      (if (digits.isEmpty) Long.MaxValue else digits.toLong, f.file_name)
    }
    if (oneFile) {
      val p = Paths.get(outDir, "articles.txt")
      Files.write(p, rows.map(_.content).mkString.getBytes(StandardCharsets.UTF_8))
      Seq(p.toString)
    } else {
      rows.map { f =>
        val p = Paths.get(outDir, f.file_name)
        Files.write(p, f.content.getBytes(StandardCharsets.UTF_8))
        p.toString
      }.toSeq
    }
  }
}
