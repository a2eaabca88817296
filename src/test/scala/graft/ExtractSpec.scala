package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Extract

/** Byte-identical extraction invariant: graft.text.Extract vs golden
  * fixtures captured by EXECUTING the reference implementation
  * (tools/gen_fixtures.py runs
  * /root/reference/src/elevant/helpers/wikipedia_dump_reader.py's
  * _process_extractor_text and urllib.parse.unquote on edge-case inputs). */
class ExtractSpec extends AnyFunSuite {

  // minimal JSON reading without a JSON lib: fixtures are parsed via the
  // scala.util.parsing-free approach of using Spark's JSON reader in other
  // suites; here we use a tiny hand parser over the known fixture shape.
  private def loadJson(resource: String): ujsonLite.Value = {
    val s = Source.fromInputStream(getClass.getResourceAsStream(resource), "UTF-8").mkString
    ujsonLite.parse(s)
  }

  test("extraction matches the reference on all golden fixtures") {
    val arr = loadJson("/golden/extract.json").arr
    assert(arr.nonEmpty)
    arr.zipWithIndex.foreach { case (fix, i) =>
      val input = fix("input").str
      val got = Extract.processExtractorText(input)
      assert(got.text == fix("text").str, s"text mismatch on fixture $i: ${input.take(60)}")
      val wantLinks = fix("hyperlinks").arr.map { l =>
        (l.arr(0).arr(0).num.toInt, l.arr(0).arr(1).num.toInt, l.arr(1).str)
      }
      assert(got.hyperlinks.map(h => (h.begin, h.end, h.target)) == wantLinks.toSeq,
        s"hyperlinks mismatch on fixture $i")
      val wantSyns = fix("title_synonyms").arr.map(s => (s.arr(0).num.toInt, s.arr(1).num.toInt))
      assert(got.titleSynonyms.map(s => (s.begin, s.end)) == wantSyns.toSeq,
        s"title_synonyms mismatch on fixture $i")
      val wantSecs = fix("sections").arr.map { s =>
        (s.arr(0).arr(0).num.toInt, s.arr(0).arr(1).num.toInt, s.arr(1).str)
      }
      assert(got.sections.map(s => (s.begin, s.end, s.title)) == wantSecs.toSeq,
        s"sections mismatch on fixture $i")
    }
  }

  test("unquote matches urllib.parse.unquote on golden fixtures") {
    val arr = loadJson("/golden/unquote.json").arr
    arr.foreach { fix =>
      assert(Extract.unquote(fix("in").str) == fix("out").str, s"unquote(${fix("in").str})")
    }
  }

  test("word boundary matches the reference on golden fixtures (incl. its doctests)") {
    val arr = loadJson("/golden/word_boundary.json").arr
    arr.foreach { fix =>
      val got = Extract.wordBoundary(fix("begin").num.toInt, fix("end").num.toInt, fix("text").str)
      assert(got == ((fix("out").arr(0).num.toInt, fix("out").arr(1).num.toInt)),
        s"word_boundary(${fix("begin").num.toInt},${fix("end").num.toInt},'${fix("text").str}')")
    }
  }

  test("date regex full-match semantics (reference utils/dates.py)") {
    assert(Extract.isDate("January"))
    assert(Extract.isDate("12 March 1994"))
    assert(Extract.isDate("March 44"))
    assert(!Extract.isDate("in March"))
    assert(!Extract.isDate("March comes"))
    assert(!Extract.isDate("Marched"))
  }

  test("tokenizer basics") {
    assert(Extract.tokenize("Hello, world!  It's a_b-c.") == Seq("Hello", "world", "It's", "a_b", "c"))
    assert(Extract.tokenize("") == Seq())
  }

  test("normalizeSurface") {
    assert(Extract.normalizeSurface("  Jörn--Smith ") == "jörn smith")
    assert(Extract.normalizeSurface("GLOBAL Syndicate") == "global syndicate")
    assert(Extract.normalizeSurface("--") == "")
  }

  test("DateReAnchored (rlike form) has exact matches() whole-string semantics") {
    import graft.text.Extract
    val fixtures = Seq(
      "January", "12 March 1994", "March 1994", "5 May", "December 7",
      "the press", "xJanuary", "January x", "12 March extra", "",
      // the ^$-anchor trap: Java's $ matches before a trailing newline,
      // matches() does not — \A..\z must agree with matches()
      "January\n", "12 March 1994\n")
    val p = java.util.regex.Pattern.compile(Extract.DateReAnchored)
    fixtures.foreach { s =>
      assert(p.matcher(s).find() == Extract.isDate(s),
        s"rlike form diverges from isDate on ${s.replace("\n", "\\n")}")
    }
  }
}
