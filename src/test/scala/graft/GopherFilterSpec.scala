package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.curate.GopherFilter
import graft.curate.GopherFilter.Thresholds

class GopherFilterSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], t: Thresholds = Thresholds()) = {
    val df = rows.map { case (id, text) => (id, text, text.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    GopherFilter.gopherFilter(df, t).collect()
      .map(r => r.getLong(0) -> r).toMap
  }

  private def flags(r: Row): (Boolean, Boolean, Boolean, Boolean, Boolean, Boolean) =
    (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
      r.getBoolean(6), r.getBoolean(7))

  test("each rule fails on its planted fixture and only there") {
    val okWords = (0 until 30).map(i => "word" + i) // distinct, len 5-6
    val good = okWords.mkString(" ")
    val short = "tiny doc here" // fails length
    // every token one char → mean word length < 3
    val thin = (0 until 30).map(_ => "a").mkString(" ")
    // one bigram repeated: "x y x y ..." → top bigram share ~ 1/2
    val biLoop = (0 until 15).flatMap(_ => Seq("xx", "yy")).mkString(" ") +
      " " + okWords.take(2).mkString(" ")
    // same 5-gram block repeated 6 times → duplicated-5-gram heavy
    val fiveLoop = (0 until 6).flatMap(_ => Seq("p1", "p2", "p3", "p4", "p5"))
      .mkString(" ")
    val got = run(Seq(1L -> good, 2L -> short, 3L -> thin, 4L -> biLoop, 5L -> fiveLoop))

    assert(flags(got(1L)) === ((true, true, true, true, true, true)), "good doc")
    assert(!got(2L).getBoolean(2) && !got(2L).getBoolean(7), "short fails length")
    assert(got(3L).getBoolean(2), "thin passes length")
    assert(!got(3L).getBoolean(3) && !got(3L).getBoolean(7), "thin fails word_len")
    assert(!got(4L).getBoolean(4) && !got(4L).getBoolean(7), "biLoop fails top_bigram")
    assert(!got(5L).getBoolean(6) && !got(5L).getBoolean(7), "fiveLoop fails dup_5gram")
  }

  test("cross-multiplication boundary is exact (frac == pct keeps; one more drops)") {
    // 100 bigrams total, top bigram exactly 20 occurrences → 20% == cap → keep
    // 21 occurrences → drop. Build text with controlled bigram counts:
    // "a b" repeated k times contributes interior bigrams too — instead
    // interleave unique separators: "a b u1 a b u2 ..." gives bigram
    // (a,b) k times among 3k-1 bigrams. Use thresholds to hit equality.
    def doc(k: Int, fill: Int) = {
      val rep = (0 until k).flatMap(i => Seq("a", "b", "u" + i))
      val uniq = (0 until fill).map(i => "v" + i)
      (rep ++ uniq).mkString(" ")
    }
    // k=7: bigram (a,b) ×7; tokens = 3*7+fill. Choose fill so n_bigrams = 35:
    // n_bigrams = n_tokens-1 = 20+fill = 35 → fill=15; 7/35 = 20% exactly.
    val atCap = doc(7, 15)
    // one more (a,b): append "a b" → n_tokens 37+2... use k=8, n_bigrams
    // = 24+fill-1; pick fill=15 → 38 bigrams, 8/38 > 20%.
    val overCap = doc(8, 15)
    val t = Thresholds(minTokens = 1, minMeanWordChars = 0, maxMeanWordChars = 100)
    val got = run(Seq(1L -> atCap, 2L -> overCap), t)
    assert(got(1L).getBoolean(4) && got(1L).getBoolean(7), "exactly 20% keeps")
    assert(!got(2L).getBoolean(4) && !got(2L).getBoolean(7), "over 20% drops")
  }

  test("degenerate docs: empty-ish text passes n-gram rules vacuously") {
    val t = Thresholds(minTokens = 0, minMeanWordChars = 0, maxMeanWordChars = 100)
    val got = run(Seq(1L -> "solo"), t)
    val (_, _, bi, tri, five, keep) = flags(got(1L))
    assert(bi && tri && five && keep, "no n-grams → vacuous pass")
  }

  // ---- character-fraction variant (round 6) --------------------------------

  /** Local reference for the char-mass counters (Java split semantics —
    * Spark's split(text, " ") keeps trailing empties like limit = -1). */
  private def refCharCounts(text: String): (Long, Long, Long) = {
    val toks = text.split(" ", -1).toSeq
    def ngrams(n: Int): Seq[String] =
      if (toks.length < n) Seq.empty else toks.sliding(n).map(_.mkString(" ")).toSeq
    // CODE POINTS, not UTF-16 units (ng.length): the engine convention
    // counts code points, and the two diverge on supplementary-plane text
    def cp(s: String): Long = s.codePointCount(0, s.length).toLong
    def topChars(n: Int): Long = {
      val g = ngrams(n).groupBy(identity)
      if (g.isEmpty) 0L else g.map { case (ng, occ) => occ.size.toLong * cp(ng) }.max
    }
    val dup5 = ngrams(5).groupBy(identity).collect {
      case (ng, occ) if occ.size > 1 => occ.size.toLong * cp(ng)
    }.sum
    (topChars(2), topChars(3), dup5)
  }

  test("char-mass counters match the local reference on randomized repeated texts (property)") {
    import org.apache.spark.sql.functions.col
    val rng = new scala.util.Random(606)
    val texts = (0 until 12).map { i =>
      val vocabBits = 1 + rng.nextInt(5)
      val words = (0 until (5 + rng.nextInt(120)))
        .map(_ => ("w" * (1 + rng.nextInt(9))) + rng.nextInt(1 << vocabBits))
      (i.toLong, words.mkString(" "))
    } ++ Seq((100L, ""), (101L, "solo"), (102L, "a b a b a b a b"))
    val cols = graft.text.TextAnalysis.repetitionCharColumns(col("text"))
    val got = cols.foldLeft(texts.toDF("doc_id", "text")) {
        case (d, (name, c)) => d.withColumn(name, c)
      }.collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    texts.foreach { case (id, text) =>
      assert(got(id) === refCharCounts(text), s"doc $id: '$text'")
    }
  }

  test("compiled repCounts equals the sorted-run fold expressions on randomized docs") {
    import org.apache.spark.sql.functions.col
    // the production path is the compiled one-pass UDF (HOF folds are
    // interpreted — ~100x slower per row); the folds remain as the
    // independent executable reference and must agree exactly
    val rng = new scala.util.Random(909)
    val texts = (0 until 10).map { i =>
      val words = (0 until (3 + rng.nextInt(80)))
        .map(_ => "w" + rng.nextInt(1 << (1 + rng.nextInt(4))))
      (i.toLong, words.mkString(" "))
    } ++ Seq((50L, ""), (51L, "a"), (52L, "a a a a a a"), (53L, "x  y  x  y"))
    val df = texts.toDF("doc_id", "text")
    def collectCols(cols: Seq[(String, org.apache.spark.sql.Column)]) =
      cols.foldLeft(df) { case (d, (n, c)) => d.withColumn(n, c) }
        .drop("text").collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(collectCols(graft.text.TextAnalysis.repetitionColumns(col("text"))) ===
      collectCols(graft.text.TextAnalysis.repetitionFoldColumns(col("text"))))
    assert(collectCols(graft.text.TextAnalysis.repetitionCharColumns(col("text"))) ===
      collectCols(graft.text.TextAnalysis.repetitionCharFoldColumns(col("text"))))
  }

  test("char fraction catches a long-word bigram the occurrence fraction misses") {
    // 6 occurrences of a 61-char bigram among 100 six-char fillers:
    // 6/111 bigram OCCURRENCES (5.4% < 20 → occurrence rule passes) but
    // 366/1071 of the CHARACTERS (34% > 20 → char rule drops) — the
    // published Gopher rule's unit is characters, and this is why
    val a = "x" * 30
    val b = "y" * 30
    val fillers = (0 until 100).map(i => f"fil$i%03d")
    val text = fillers.grouped(17).toSeq
      .flatMap(grp => grp ++ Seq(a, b)).mkString(" ")
    val df = Seq((1L, text, text.length.toLong)).toDF("doc_id", "text", "n_chars")
    val occ = GopherFilter.gopherFilter(df).collect().head
    val chf = GopherFilter.gopherFilterCharFrac(df).collect().head
    assert(occ.getBoolean(4) && occ.getBoolean(7),
      s"occurrence tier should keep: $occ")
    assert(!chf.getBoolean(4) && !chf.getBoolean(7),
      s"char tier should drop on top_bigram: $chf")
    // the two tiers agree on every other rule
    assert(Seq(2, 3, 5, 6).forall(i => occ.getBoolean(i) == chf.getBoolean(i)))
  }
}
