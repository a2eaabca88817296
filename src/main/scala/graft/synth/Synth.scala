package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.Page

/** Deterministic synthetic web-page corpus (FIXTURES.md §1-2).
  *
  * Every row is a pure function of (pageIndex, seed) — no RNG state, no
  * wall-clock — so the same table materializes identically at any
  * parallelism (seed precedent: the reference's fixed seed 42,
  * /root/reference/src/elevant/evaluation/benchmark_iterator.py:19).
  *
  * The pages carry WikiExtractor-style markup in `html` (the constructs
  * consumed by the reference's extractor: <a href>, <b>, Section::::
  * headers, "not really a tag" text) and the expected extraction output in
  * `text`, so tests can assert the byte-identical invariant
  * extractText(html).text == text per url.
  *
  * Entity layout: K entities with unique "First Last" names; mention
  * surfaces are deterministic variants (canonical / UPPERCASE / adjacent
  * transposition / char drop / char double — all mutations at string
  * position >= 2 of the last name, Jaro-Winkler-recoverable) plus a shared
  * "hot" alias to create the Zipfian skew block the north_star names.
  * Each mention sits in its own paragraph with 12 entity-vocabulary
  * context words + 2 stopwords, giving same-entity context Jaccard >= 0.7
  * and cross-entity ~ 0.
  */
object Synth {

  val HotAlias = "Global Syndicate"

  // -- deterministic hashing ------------------------------------------------
  def splitmix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def rnd(parts: Long*): Long =
    parts.foldLeft(0x5DEECE66DL)((a, b) => splitmix64(a ^ splitmix64(b)))
  /** uniform double in [0,1) */
  def unif(parts: Long*): Double = (rnd(parts: _*) >>> 11).toDouble / (1L << 53).toDouble

  // -- name pools -------------------------------------------------------------
  private val FirstA = Array("Ban", "Cel", "Dor", "Fen", "Gim", "Hul", "Jor", "Kav", "Lim", "Mon", "Nar", "Pol")
  private val FirstB = Array("ad", "eb", "ik", "or", "us")
  private val LastA = Array("kar", "lin", "mor", "ost", "pel", "qua", "rud", "sal", "tav", "urn", "vel", "wim", "zet")
  private val LastB = Array("berg", "feld", "stein", "holm", "wick", "thorp", "gaard", "strom")
  val MaxEntities: Int = FirstA.length * FirstB.length * LastA.length * LastB.length // 6240

  private val Stopwords = Array("the", "of", "and", "in", "a", "to", "was", "is")

  def firstName(e: Int): String = {
    val i = e % (FirstA.length * FirstB.length)
    FirstA(i % FirstA.length) + FirstB((i / FirstA.length) % FirstB.length)
  }
  def lastName(e: Int): String = {
    val j = e / (FirstA.length * FirstB.length)
    val s = LastA(j % LastA.length) + LastB((j / LastA.length) % LastB.length)
    s.substring(0, 1).toUpperCase + s.substring(1)
  }
  def canonicalName(e: Int): String = firstName(e) + " " + lastName(e)

  /** Mutations confined to position >= 2 of the last name, so the blocking
    * prefix (first 4 chars of first name + first 2 of last) is invariant. */
  private def mutateLast(last: String, kind: Int): String = {
    val n = last.length
    kind match {
      case 0 => // transpose chars n-3, n-2
        val a = last.toCharArray; val t = a(n - 3); a(n - 3) = a(n - 2); a(n - 2) = t
        new String(a)
      case 1 => last.substring(0, n - 2) + last.substring(n - 1) // drop char n-2
      case _ => last.substring(0, n - 1) + last.charAt(n - 1) + last.charAt(n - 1) // double final
    }
  }

  def hotEligible(e: Int): Boolean = e % 7 == 0

  /** Surface form for mention slot s of page p referring to entity e. */
  def surfaceFor(seed: Long, p: Long, s: Int, e: Int): String = {
    val roll = java.lang.Math.floorMod(rnd(seed, 17L, p, s.toLong), 20L).toInt
    if (roll >= 17 && hotEligible(e)) HotAlias
    else if (roll == 11 || roll == 12) canonicalName(e).toUpperCase
    else if (roll == 13 || roll == 14) firstName(e) + " " + mutateLast(lastName(e), 0)
    else if (roll == 15) firstName(e) + " " + mutateLast(lastName(e), 1)
    else if (roll == 16) firstName(e) + " " + mutateLast(lastName(e), 2)
    else canonicalName(e)
  }

  val VocabSize = 5000
  def entityVocab(seed: Long, e: Int): Array[String] =
    Array.tabulate(14)(k => "tok" + java.lang.Math.floorMod(rnd(seed, 23L, e.toLong, k.toLong), VocabSize.toLong))

  /** 13 distinct vocab words for one mention: a cyclic window into the
    * 14-word entity vocab, so any two mentions of the same entity share
    * >= 12 words — even with the 2 stopwords added to each paragraph the
    * pairwise context Jaccard stays >= 12/18 = 0.667 (above the 0.6
    * jaccard-only match threshold), while cross-entity Jaccard is ~0. */
  def mentionContextWords(seed: Long, e: Int, p: Long, s: Int): Array[String] = {
    val vocab = entityVocab(seed, e)
    val off = java.lang.Math.floorMod(rnd(seed, 29L, p, s.toLong), 14L).toInt
    Array.tabulate(13)(k => vocab((off + k) % 14))
  }

  def nEntities(nPages: Long): Int =
    math.max(16L, math.min(nPages / 4, (MaxEntities - 1).toLong)).toInt

  /** Zipf-ish rank pick: rank = floor(nEnt^u) - 1 concentrates mass on low
    * ranks (entity 0 is the hottest; P(rank r) ~ ln(1+1/(r+1))/ln(n)). */
  def pickEntity(seed: Long, p: Long, s: Int, nEnt: Int): Int = {
    val u = unif(seed, 31L, p, s.toLong)
    math.max(0, math.min(nEnt - 1, math.floor(math.exp(u * math.log(nEnt.toDouble))).toInt - 1))
  }

  final case class GenPage(
      url: String, warc_ts: Timestamp, html: Array[Byte], text: String, lang: String)

  /** Build one page: returns (html markup, expected extracted text). */
  def buildPage(seed: Long, p: Long, nEnt: Int, nDomains: Int): GenPage = {
    val mpp = 3 + java.lang.Math.floorMod(rnd(seed, 11L, p), 5L).toInt
    val html = new StringBuilder
    val text = new StringBuilder
    def emit(s: String): Unit = { html.append(s); text.append(s) }

    val firstEnt = pickEntity(seed, p, 0, nEnt)
    // first paragraph: bold title synonym (exercises <b> extraction)
    html.append("<b>").append(canonicalName(firstEnt)).append("</b>")
    text.append(canonicalName(firstEnt))
    emit(" is described on this page.")
    if (p % 7 == 0) emit(" Note that a < b > c holds here.") // not-a-tag guard
    var sectionDone = false
    var s = 0
    while (s < mpp) {
      if (p % 5 == 0 && s == 1 && !sectionDone) {
        html.append("\nSection::::Part ").append(s)
        sectionDone = true
      }
      emit("\n\n")
      val e = pickEntity(seed, p, s, nEnt)
      val ctx = mentionContextWords(seed, e, p, s)
      val surface = surfaceFor(seed, p, s, e)
      emit(ctx.take(6).mkString(" ") + " ")
      html.append("<a href=\"E").append(e).append("\">").append(surface).append("</a>")
      text.append(surface)
      emit(" " + ctx.drop(6).mkString(" "))
      val st1 = Stopwords(java.lang.Math.floorMod(rnd(seed, 37L, p, s.toLong), 8L).toInt)
      val st2 = Stopwords(java.lang.Math.floorMod(rnd(seed, 41L, p, s.toLong), 8L).toInt)
      emit(s" $st1 $st2.")
      // coreference fixture: a standalone pronoun paragraph referring to
      // the preceding mention (own paragraph so mention contexts stay
      // pronoun-free and the Jaccard bounds hold)
      if (java.lang.Math.floorMod(rnd(seed, 43L, p, s.toLong), 4L) == 0L)
        emit("\n\nHe returned to the scene.")
      s += 1
    }
    val url = s"https://d${p % nDomains}.example.org/p/$p"
    val ts = new Timestamp(1767225600000L + p * 1000L) // 2026-01-01T00:00:00Z + p sec
    val lang = if (p % 19 == 0) "de" else "en"
    GenPage(url, ts, html.toString.getBytes("UTF-8"), text.toString, lang)
  }

  /** The input pages table (BASELINE.json `input_hint` shape), distributed. */
  def pages(spark: SparkSession, nPages: Long, seed: Long = 42L, nDomains: Int = 50): Dataset[Page] = {
    import spark.implicits._
    val nEnt = nEntities(nPages)
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0, nPages, 1, parts).mapPartitions { it =>
      it.map { p =>
        val g = buildPage(seed, p, nEnt, nDomains)
        Page(g.url, g.warc_ts, g.html, g.text, g.lang)
      }
    }
  }

  /** KB dimension table: one row per entity (FIXTURES.md §2 `entities`). */
  final case class Entity(qid: String, name: String, first_name: String, last_name: String)
  def entities(spark: SparkSession, nPages: Long): Dataset[Entity] = {
    import spark.implicits._
    val nEnt = nEntities(nPages)
    spark.range(0, nEnt.toLong, 1, math.max(spark.sparkContext.defaultParallelism, 4)).map { e =>
      Entity("E" + e, canonicalName(e.toInt), firstName(e.toInt), lastName(e.toInt))
    }
  }
}
