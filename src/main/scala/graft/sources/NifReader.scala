package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.eval.CaseModel._

/** S3 — NIF/RDF benchmark reader (reference:
  * src/elevant/benchmark_readers/nif_benchmark_reader.py:25-99 and
  * oke_benchmark_reader.py:37-118, which parse via pynif/rdflib).
  *
  * This is a self-contained TURTLE SUBSET parser covering what NIF
  * benchmark files actually use: @prefix directives, IRI refs, prefixed
  * names, plain/typed/lang-tagged literals (single- and triple-quoted,
  * with \-escapes), predicate lists (';'), object lists (','), the 'a'
  * keyword and comments. Blank nodes and collections are out of scope.
  *
  * Mapping semantics follow the reference exactly:
  *   - a CONTEXT is any subject with nif:isString; its text is that
  *     string; contexts sort by URI; empty-text contexts are skipped
  *     (kore50's parent context quirk).
  *   - a PHRASE is any subject with nif:referenceContext + begin/endIndex;
  *     phrases sort by beginIndex (the reference relies on rdflib's
  *     arbitrary graph order for equal beginIndex — here ties are pinned
  *     deterministically by (beginIndex, endIndex, taIdentRef); declared
  *     divergence: deterministic where the reference is unstable).
  *   - entity = QidMapper on taIdentRef (customKb: the raw URI).
  *   - OKE: taIdentRef resolves through the file's owl:sameAs map first;
  *     no sameAs entry → NIL (even when taIdentRef is present).
  */
object NifReader {

  private val NifPrefix = "http://persistence.uni-leipzig.org/nlp2rdf/ontologies/nif-core#"
  private val IsString = NifPrefix + "isString"
  private val BeginIndex = NifPrefix + "beginIndex"
  private val EndIndex = NifPrefix + "endIndex"
  private val ReferenceContext = NifPrefix + "referenceContext"
  private val TaIdentRef = "http://www.w3.org/2005/11/its/rdf#taIdentRef"
  private val SameAs = "http://www.w3.org/2002/07/owl#sameAs"

  final case class Triple(subj: String, pred: String, obj: String, objIsLiteral: Boolean)

  // ---------- tokenizer -------------------------------------------------------

  /** Parse a turtle-subset document into triples. */
  def parseTurtle(content: String): Seq[Triple] = {
    val toks = tokenize(content)
    val prefixes = scala.collection.mutable.Map[String, String]()
    val triples = Seq.newBuilder[Triple]
    var i = 0

    def resolve(t: Token): (String, Boolean) = t match {
      case Iri(v) => (v, false)
      case Prefixed(p, local) =>
        (prefixes.getOrElse(p,
          throw new IllegalArgumentException(s"undeclared prefix '$p:'")) + local, false)
      case Lit(v) => (v, true)
      case A => ("http://www.w3.org/1999/02/22-rdf-syntax-ns#type", false)
      case other => throw new IllegalArgumentException(s"unexpected token $other")
    }

    while (i < toks.length) {
      toks(i) match {
        case Directive("prefix") =>
          // @prefix name: <iri> .
          val Prefixed(name, "") = toks(i + 1): @unchecked
          val Iri(iri) = toks(i + 2): @unchecked
          prefixes(name) = iri
          i += 3
          if (i < toks.length && toks(i) == Dot) i += 1
        case Dot => i += 1
        case subjTok =>
          val (subj, _) = resolve(subjTok)
          i += 1
          var done = false
          while (!done && i < toks.length) {
            val (pred, _) = resolve(toks(i))
            i += 1
            var moreObjects = true
            while (moreObjects && i < toks.length) {
              val (obj, isLit) = resolve(toks(i))
              i += 1
              triples += Triple(subj, pred, obj, isLit)
              toks.lift(i) match {
                case Some(Comma) => i += 1
                case _ => moreObjects = false
              }
            }
            toks.lift(i) match {
              case Some(Semicolon) =>
                i += 1
                // a trailing ';' before '.' is legal turtle
                if (toks.lift(i).contains(Dot)) { i += 1; done = true }
              case Some(Dot) => i += 1; done = true
              case _ => done = true
            }
          }
      }
    }
    triples.result()
  }

  private sealed trait Token
  private case class Iri(v: String) extends Token
  private case class Prefixed(prefix: String, local: String) extends Token
  private case class Lit(v: String) extends Token
  private case class Directive(name: String) extends Token
  private case object Dot extends Token
  private case object Semicolon extends Token
  private case object Comma extends Token
  private case object A extends Token

  private def tokenize(content: String): Vector[Token] = {
    val out = Vector.newBuilder[Token]
    val n = content.length
    var i = 0
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    while (i < n) {
      val c = content.charAt(i)
      if (isWs(c)) i += 1
      else if (c == '#') { while (i < n && content.charAt(i) != '\n') i += 1 }
      else if (c == '<') {
        val end = content.indexOf('>', i)
        out += Iri(content.substring(i + 1, end))
        i = end + 1
      } else if (c == '"') {
        val (lit, next) = readString(content, i)
        var j = next
        // optional @lang or ^^datatype suffix — consumed, value kept plain
        if (j < n && content.charAt(j) == '@') {
          j += 1
          while (j < n && (content.charAt(j).isLetterOrDigit || content.charAt(j) == '-')) j += 1
        } else if (j + 1 < n && content.charAt(j) == '^' && content.charAt(j + 1) == '^') {
          j += 2
          if (j < n && content.charAt(j) == '<') j = content.indexOf('>', j) + 1
          else {
            while (j < n && !isWs(content.charAt(j)) && !";,.".contains(content.charAt(j))) j += 1
          }
        }
        out += Lit(lit)
        i = j
      } else if (c == '.' && (i + 1 >= n || !content.charAt(i + 1).isDigit)) { out += Dot; i += 1 }
      else if (c == ';') { out += Semicolon; i += 1 }
      else if (c == ',') { out += Comma; i += 1 }
      else if (c == '@') {
        var j = i + 1
        while (j < n && content.charAt(j).isLetter) j += 1
        out += Directive(content.substring(i + 1, j))
        i = j
      } else {
        // bare token: prefixed name, 'a', number, or boolean
        var j = i
        while (j < n && !isWs(content.charAt(j)) && !";,".contains(content.charAt(j)) &&
          content.charAt(j) != '"' && content.charAt(j) != '<' &&
          !(content.charAt(j) == '.' && (j + 1 >= n || isWs(content.charAt(j + 1)) ||
            content.charAt(j + 1) == '<' || content.charAt(j + 1) == '\n'))) j += 1
        val tok = content.substring(i, j)
        i = j
        if (tok == "a") out += A
        else if (tok.headOption.exists(ch => ch.isDigit || ch == '-' || ch == '+')) out += Lit(tok)
        else if (tok == "true" || tok == "false") out += Lit(tok)
        else {
          val colon = tok.indexOf(':')
          if (colon < 0) throw new IllegalArgumentException(s"cannot tokenize '$tok'")
          out += Prefixed(tok.substring(0, colon), tok.substring(colon + 1))
        }
      }
    }
    out.result()
  }

  /** Read a turtle string starting at `i` (single- or triple-quoted),
    * returning (unescaped value, index after the closing quote). */
  private def readString(s: String, i: Int): (String, Int) = {
    val triple = s.regionMatches(i, "\"\"\"", 0, 3)
    val quote = if (triple) "\"\"\"" else "\""
    var j = i + quote.length
    val sb = new StringBuilder
    while (!s.regionMatches(j, quote, 0, quote.length) ||
      (triple && s.regionMatches(j + 1, quote, 0, 3))) { // """" -> quote char then end
      val c = s.charAt(j)
      if (c == '\\') {
        s.charAt(j + 1) match {
          case 'n' => sb += '\n'; j += 2
          case 't' => sb += '\t'; j += 2
          case 'r' => sb += '\r'; j += 2
          case 'b' => sb += '\b'; j += 2
          case 'f' => sb += '\f'; j += 2
          case '"' => sb += '"'; j += 2
          case '\'' => sb += '\''; j += 2
          case '\\' => sb += '\\'; j += 2
          case 'u' =>
            sb += Integer.parseInt(s.substring(j + 2, j + 6), 16).toChar; j += 6
          case 'U' =>
            sb.appendAll(Character.toChars(Integer.parseInt(s.substring(j + 2, j + 10), 16))); j += 10
          case other => sb += other; j += 2
        }
      } else { sb += c; j += 1 }
    }
    (sb.toString, j + quote.length)
  }

  // ---------- NIF → EvalDocs ---------------------------------------------------

  /** Parse one NIF document's content into EvalDocs. Docs are identified
    * by their context URI (sorted); callers that need stable numeric ids
    * across files assign them after the sort. */
  def docsFromNif(
      content: String,
      title2qid: Map[String, String],
      customKb: Boolean = false,
      oke: Boolean = false): Seq[EvalDoc] = {
    val triples = parseTurtle(content)
    val bySubj = triples.groupBy(_.subj)
    val sameAs: Map[String, String] =
      if (oke) triples.filter(_.pred == SameAs).map(t => t.subj -> t.obj).toMap
      else Map.empty

    def prop(subj: String, pred: String): Option[String] =
      bySubj.getOrElse(subj, Nil).find(_.pred == pred).map(_.obj)

    // one pass grouping phrase subjects by their reference context — NOT a
    // rescan of every subject per context (O(contexts × subjects) blowup
    // on many-context files)
    val phrasesByContext: Map[String, Seq[String]] = bySubj.keys.toSeq
      .flatMap(s => prop(s, ReferenceContext).map(_ -> s))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    val contexts = bySubj.keys.filter(s => prop(s, IsString).isDefined).toSeq.sorted
    contexts.flatMap { ctxUri =>
      val text = prop(ctxUri, IsString).get
      if (text.isEmpty) None // kore50 parent-context quirk
      else {
        val phrases = phrasesByContext.getOrElse(ctxUri, Nil)
          .filter(s => prop(s, BeginIndex).isDefined && prop(s, EndIndex).isDefined)
          .map { s =>
            (prop(s, BeginIndex).get.toInt, prop(s, EndIndex).get.toInt,
              prop(s, TaIdentRef).orNull)
          }
          .sortBy { case (b, e, ref) => (b, e, Option(ref).getOrElse("")) }
        var labelId = 0
        val labels = phrases.map { case (b, e, taRef) =>
          val entityId =
            if (oke) {
              sameAs.get(taRef) match {
                case Some(mapped) => QidMapper.getWikidataQid(mapped, title2qid)
                case None => NIL // OKE: unmapped taIdentRef stays NIL
              }
            } else if (customKb) {
              if (taRef != null && taRef.nonEmpty) taRef else NIL
            } else QidMapper.getWikidataQid(if (taRef == null) "" else taRef, title2qid)
          val l = GtLabel(labelId, b, e, entityId, "Unknown",
            None, Nil, optionalFlag = false, Nil, None, desc = false)
          labelId += 1
          l
        }
        Some(EvalDoc(ctxUri, text, 0, text.length,
          NestedGt.assignParentChild(labels), Nil))
      }
    }
  }

  def nifBenchmark(
      spark: SparkSession,
      path: String,
      title2qid: Map[String, String] = Map.empty,
      customKb: Boolean = false): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(path)
      .sortBy(_._1) // reference iterates files in sorted order
      .flatMap { case (_, c) => docsFromNif(c, t2q.value, customKb = customKb) }
      .toDS()
  }

  def okeBenchmark(
      spark: SparkSession,
      path: String,
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    spark.sparkContext.wholeTextFiles(path)
      .sortBy(_._1)
      .flatMap { case (_, c) => docsFromNif(c, t2q.value, oke = true) }
      .toDS()
  }
}
