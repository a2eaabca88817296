package graft

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TypesMappings

/** Executed-reference goldens for the type-hierarchy mapping jobs
  * (tools/gen_types_fixtures.py runs the real AllTypesMappingCreator DFS
  * and extract_coreference_types state machine over a synthetic graph
  * with a diamond+shortcut, a 2-cycle, a deep chain and coarse types).
  * Line SETS are compared (the reference emits dict-insertion order; the
  * engine orders by qid — declared divergence, content identical). */
class TypesMappingsSpec extends AnyFunSuite {

  private lazy val golden: ujsonLite.Value = {
    val s = Source.fromInputStream(
      getClass.getResourceAsStream("/golden/types_mappings.json"), "UTF-8").mkString
    ujsonLite.parse(s)
  }

  private def pairsDf(v: ujsonLite.Value, c1: String, c2: String) = {
    val spark = SparkSessions.spark
    import spark.implicits._
    v.arr.map(p => (p.arr(0).str, p.arr(1).str)).toDF(c1, c2)
  }

  test("all-types lines match the reference DFS (min-depth closure)") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val sl = golden("sitelinks").arr.map(p => (p.arr(0).str, p.arr(1).num.toInt))
      .toDF("qid", "count")
    val inst = pairsDf(golden("instance_of"), "qid", "cls")
    val subs = pairsDf(golden("subclass_of"), "qid", "cls")
    val got = TypesMappings.allTypes(sl, inst, subs,
      minCount = golden("min_count").num.toInt)
      .select("line").collect().map(_.getString(0)).sorted
    assert(got.toSeq == golden("all_types_lines").arr.map(_.str).toSeq)
  }

  test("coreference types match the reference state machine") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val sl = golden("sitelinks").arr.map(p => (p.arr(0).str, p.arr(1).num.toInt))
      .toDF("qid", "count")
    val inst = pairsDf(golden("instance_of"), "qid", "cls")
    val subs = pairsDf(golden("subclass_of"), "qid", "cls")
    val allTypes = TypesMappings.allTypes(sl, inst, subs,
      minCount = golden("min_count").num.toInt)
    val coarse = golden("coarse").arr.map(_.str).toSet
    val got = TypesMappings.corefTypes(allTypes, coarse)
      .collect().map(r => r.getString(0) + "\t" + r.getString(1)).sorted
    assert(got.toSeq == golden("coref_lines").arr.map(_.str).toSeq)
  }

  test("closure terminates on cycles and keeps minimum depths") {
    val spark = SparkSessions.spark
    import spark.implicits._
    val edges = Seq(("A", "B"), ("B", "A"), ("A", "C"), ("C", "D"), ("A", "D"))
      .toDF("sub", "sup")
    val c = TypesMappings.typeClosure(edges).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getInt(2))).toMap
    assert(c(("A", "B")) == 1 && c(("B", "A")) == 1)
    assert(c(("A", "A")) == 2 && c(("B", "B")) == 2)
    assert(c(("A", "D")) == 1) // shortcut beats the A->C->D path
    assert(c(("B", "D")) == 2)
  }
}
