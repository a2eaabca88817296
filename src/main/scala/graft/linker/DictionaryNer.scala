package graft.linker

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Page
import graft.text.Extract

/** Dictionary NER — the reference's maximum-matching tagger re-expressed
  * for Spark (SURVEY §2.6 T3/T4).
  *
  * Greedy longest-alias match (reference:
  * /root/reference/src/elevant/ner/maximum_matching_ner.py:107-123): scan
  * token positions left to right; at each position try the LONGEST token
  * window (up to maxTokens) whose normalized text is in the alias
  * dictionary; on a match consume the window (greedy, inherently
  * sequential per document — the reference's own `point_i += length-1`).
  *
  * The alias dictionary is a broadcast Set of normalized surfaces — the
  * replicated-KB pattern of link_text.py becomes a Spark broadcast. At
  * 100 TB the dictionary (tens of millions of aliases, a few GB hashed)
  * still broadcasts; beyond that the fallback is a token-window explode +
  * semi-join, which trades one shuffle for no driver memory.
  *
  * Overlap resolution (prior_linker.py:158-188): more tokens wins; ties
  * by higher link frequency, then by earlier start — a per-document
  * sorted sweep with an explicit total order for determinism.
  */
object DictionaryNer {

  final case class NerSpan(url: String, begin: Int, end: Int, surface: String, norm_surface: String)

  /** Token (begin, end) offsets of maximal letter/digit/'_'/''' runs. */
  def tokenSpans(text: String): IndexedSeq[(Int, Int)] = {
    val out = new ArrayBuffer[(Int, Int)]
    var i = 0
    val n = text.length
    def tok(c: Char) = Character.isLetterOrDigit(c) || c == '_' || c == '\''
    while (i < n) {
      if (tok(text.charAt(i))) {
        val start = i
        while (i < n && tok(text.charAt(i))) i += 1
        out += ((start, i))
      } else i += 1
    }
    out.toIndexedSeq
  }

  /** Greedy longest match over one document. */
  def greedyMatch(text: String, aliases: Set[String], maxTokens: Int = 4): Seq[(Int, Int)] = {
    val toks = tokenSpans(text)
    val out = new ArrayBuffer[(Int, Int)]
    var i = 0
    while (i < toks.length) {
      var matched = -1
      var len = math.min(maxTokens, toks.length - i)
      while (len >= 1 && matched < 0) {
        val b = toks(i)._1
        val e = toks(i + len - 1)._2
        if (aliases.contains(Extract.normalizeSurface(text.substring(b, e)))) matched = len
        else len -= 1
      }
      if (matched > 0) {
        out += ((toks(i)._1, toks(i + matched - 1)._2))
        i += matched // greedy consumption
      } else i += 1
    }
    out.toSeq
  }

  /** Distributed NER over pages: broadcast alias set, narrow flatMap. */
  def tag(pages: Dataset[Page], aliasSet: Set[String], maxTokens: Int = 4): Dataset[NerSpan] = {
    val spark = pages.sparkSession
    import spark.implicits._
    val aliasB = spark.sparkContext.broadcast(aliasSet)
    pages.flatMap { p =>
      val text = p.text
      greedyMatch(text, aliasB.value, maxTokens).map { case (b, e) =>
        NerSpan(p.url, b, e, text.substring(b, e), Extract.normalizeSurface(text.substring(b, e)))
      }
    }
  }

  /** "the X" strip post-processing (reference:
    * /root/reference/src/elevant/ner/ner_postprocessing.py:17-29). A span
    * whose text starts with lowercase "the " is ALWAYS stripped to its
    * tail — the reference's `or` binds the dictionary guard to the "The "
    * branch only; a span starting with "The " is stripped only when the
    * full text is NOT a known entity name but the 4-char tail IS
    * (`text[4:]`, spaces included, exactly as the reference looks it up).
    * The new span starts at the SECOND token (spaCy `Span(start+1)`):
    * begin advances past "the"/"The" and any whitespace, end and url are
    * unchanged. The reference attaches this to the spaCy pipeline; the
    * rule itself is a pure dictionary lookup, so here it is a narrow map
    * over the span Dataset with the known-name set broadcast (same
    * replicated-dictionary pattern as [[tag]]). */
  def stripLeadingThe(s: NerSpan, knownNames: Set[String]): NerSpan = {
    val t = s.surface
    val strip = t.startsWith("the ") ||
      (t.startsWith("The ") && !knownNames.contains(t) &&
        knownNames.contains(t.substring(4)))
    if (!strip) s
    else {
      var off = 3 // past "the"; then past the whitespace to the next token
      while (off < t.length && t.charAt(off).isWhitespace) off += 1
      val ns = t.substring(off)
      NerSpan(s.url, s.begin + off, s.end, ns, Extract.normalizeSurface(ns))
    }
  }

  /** Distributed form of [[stripLeadingThe]]: broadcast known-name set,
    * narrow map — composes after [[tag]] / before [[resolveOverlaps]]. */
  def withTheStripped(spans: Dataset[NerSpan], knownNames: Set[String]): Dataset[NerSpan] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val namesB = spark.sparkContext.broadcast(knownNames)
    spans.map(stripLeadingThe(_, namesB.value))
  }

  /** T4 — overlap resolution with total order: token count desc, link
    * frequency desc, begin asc. Per-url sweep (documents are small). */
  def resolveOverlaps(spans: Dataset[NerSpan], linkFreq: Map[String, Long]): Dataset[NerSpan] = {
    val spark = spans.sparkSession
    import spark.implicits._
    val freqB = spark.sparkContext.broadcast(linkFreq)
    spans.groupByKey(_.url).flatMapGroups { (_, it) =>
      val sorted = it.toSeq.sortBy(s => (s.begin, s.end))
      val kept = new ArrayBuffer[NerSpan]
      sorted.foreach { s =>
        kept.lastOption match {
          case Some(prev) if s.begin < prev.end =>
            // overlap: prefer more tokens, then higher freq, then earlier
            def tokens(x: NerSpan) = x.norm_surface.count(_ == ' ') + 1
            def freq(x: NerSpan) = freqB.value.getOrElse(x.norm_surface, 0L)
            val keepNew =
              tokens(s) > tokens(prev) ||
                (tokens(s) == tokens(prev) && freq(s) > freq(prev))
            if (keepNew) { kept.remove(kept.length - 1); kept += s }
          case _ => kept += s
        }
      }
      kept.iterator
    }
  }
}
