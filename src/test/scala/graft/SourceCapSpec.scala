package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.curate.SourceCap
import graft.synth.Synth

class SourceCapSpec extends AnyFunSuite {
  lazy val spark = SparkSessions.spark
  import spark.implicits._

  /** Local reference: per source, keep the n ids smallest under the
    * UNSIGNED splitmix64 order. */
  private def reference(rows: Seq[(Long, String)], n: Int): Map[Long, Boolean] = {
    rows.groupBy(_._2).flatMap { case (_, grp) =>
      val ranked = grp.map(_._1)
        .sortBy(id => Synth.splitmix64(id) ^ Long.MinValue)
      val kept = ranked.take(n).toSet
      grp.map { case (id, _) => id -> kept(id) }
    }
  }

  private def run(rows: Seq[(Long, String)], n: Int, parts: Int): Map[Long, Boolean] =
    SourceCap.sourceCap(rows.toDF("doc_id", "source").repartition(parts), n)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap

  test("matches the local reference on randomized skewed corpora (property)") {
    val rng = new scala.util.Random(20260817L)
    (1 to 5).foreach { trial =>
      // Zipf-ish skew: source s0 gets most docs, tail sources few
      val rows = (0 until 400).map { i =>
        val src = "s" + math.min(rng.nextInt(1 << (1 + rng.nextInt(5))), 9)
        (i.toLong * 7 + trial, src)
      }
      val n = 1 + rng.nextInt(6)
      assert(run(rows, n, parts = 7) === reference(rows, n),
        s"trial=$trial n=$n")
    }
  }

  test("exactly n kept per source on a mega-source; small sources keep all") {
    val rows = (0L until 5000L).map(i => (i, "mega")) ++
      Seq((9001L, "tiny"), (9002L, "tiny"))
    val got = SourceCap.sourceCap(rows.toDF("doc_id", "source").repartition(13), 8)
    val bySrc = got.groupBy("source")
      .agg(sum(when(col("kept"), 1).otherwise(0)).as("kept"),
        count(lit(1)).as("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(bySrc("mega") === ((8L, 5000L)))
    assert(bySrc("tiny") === ((2L, 2L)))
  }

  test("NULL sources form one group and survive to the output (null-safe join)") {
    val rows: Seq[(java.lang.Long, String)] =
      (0 until 12).map(i => (java.lang.Long.valueOf(i.toLong), null: String)) ++
        Seq((java.lang.Long.valueOf(100L), "s"), (java.lang.Long.valueOf(101L), "s"))
    val df = rows.toDF("doc_id", "source")
    val got = SourceCap.sourceCap(df.repartition(5), 4).collect()
      .map(r => r.getLong(0) -> (Option(r.getString(1)), r.getBoolean(2))).toMap
    assert(got.size === 14, s"rows dropped: ${got.size} of 14")
    val nullKept = got.collect { case (_, (None, true)) => 1 }.sum
    assert(nullKept === 4, s"null-source group capped wrong: $nullKept kept")
    assert(got(100L)._2 && got(101L)._2, "small named source keeps all")
  }

  test("a document delivered twice counts once against the cap") {
    val once = (0L until 10L).map(i => (i, "s"))
    val twice = once ++ once
    val got = SourceCap.sourceCap(twice.toDF("doc_id", "source").repartition(6), 4)
    assert(got.count() === 20, "one output row per input row")
    val keptDocs = got.where(col("kept")).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keptDocs.size === 4, s"duplicates ate cap slots: $keptDocs")
    // the kept set equals the single-delivery cap
    val wantDocs = SourceCap.sourceCap(once.toDF("doc_id", "source"), 4)
      .where(col("kept")).collect().map(_.getLong(0)).toSet
    assert(keptDocs === wantDocs)
  }

  test("an in-partition duplicate of the smallest-hash doc cannot eat a cap slot") {
    // round-6 advice: the partition-local fold used to let a re-delivered
    // (source, id) row occupy TWO top-n slots, evicting a legitimate keeper
    // (the earlier re-delivery test passed only because repartition
    // separated the copies). coalesce(1) forces both copies into one
    // partition; the duplicate targets the smallest-hash doc, the one the
    // fold holds longest.
    val ids = (0L until 6L)
    val smallest = ids.minBy(id => Synth.splitmix64(id) ^ Long.MinValue)
    val rows = ids.map((_, "s")) :+ ((smallest, "s"))
    val got = SourceCap.sourceCap(rows.toDF("doc_id", "source").coalesce(1), 3)
    val keptDocs = got.where(col("kept")).select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keptDocs.size === 3, s"duplicate ate a cap slot: kept $keptDocs")
    assert(keptDocs === reference(ids.map((_, "s")), 3).filter(_._2).keySet)
  }

  test("deterministic under parallelism: identical kept set at 1, 4, 17 partitions") {
    val rows = (0 until 300).map(i => (i.toLong, "s" + i % 11))
    val a = run(rows, 5, 1)
    assert(run(rows, 5, 4) === a)
    assert(run(rows, 5, 17) === a)
  }

  test("plan has no Window and no document-scale sort; partial combine bounds the shuffle") {
    val rows = (0L until 2000L).map(i => (i, "s" + i % 3))
    val df = SourceCap.sourceCap(rows.toDF("doc_id", "source").repartition(8), 8)
    df.collect() // force AQE final plan
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"window in source-cap plan:\n$plan")
    // the only sort allowed is inside the tiny per-source threshold
    // aggregation (array_sort over <= parts*n survivors), not a SortExec
    // over the document table
    assert(!plan.contains("SortExec"), s"document-scale sort in plan:\n$plan")
    // the REAL phase-1 stage emits at most parts*n rows per source —
    // the shuffle volume that replaces the window's document-scale sort
    val keyed = rows.toDF("doc_id", "source").repartition(8)
      .select(col("doc_id").as("id"), col("source"), col("doc_id").as("h"))
    val partials = SourceCap.partialKeep(keyed, 8).count()
    assert(partials <= 8L * 8 * 3, s"unbounded partial output: $partials rows")
  }
}
