package graft.tools

import org.apache.spark.sql.SparkSession

import graft.queries.{ErQueries, EvalQueries, Queries, TrainingDataQueries}

/** Floor probe for the round-4 official-bench regressions
  * (mm_media_stats 0.112→1.769 s, q10–q13, mm_frame_sample, dd_survivors
  * — verdict item 2). Times each suspect query PASSES times in one
  * session, twice over: first standalone (cold session), then again after
  * the ER + eval session memos are materialized (the state the bench
  * catalog runs them in). If the with-memo floors match the standalone
  * floors, the official-run numbers were first-touch/neighbor noise; a
  * raised with-memo floor would mean a real interaction (e.g. storage
  * pressure from the persisted memo blocks).
  */
object RegressionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val passes = sys.env.getOrElse("PROBE_PASSES", "4").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val suspects: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "mm_media_stats" -> (TrainingDataQueries.mmMediaStats(_, _)),
      "mm_frame_sample" -> (TrainingDataQueries.mmFrameSample(_, _)),
      "q10_exact_dup_docs" -> (Queries.q10ExactDupDocs(_, _)),
      "q11_quality_counters" -> (Queries.q11QualityCounters(_, _)),
      "q12_lang_dist" -> (Queries.q12LangDist(_, _)),
      "q13_sessions" -> (Queries.q13Sessions(_, _)),
      "dd_survivors" -> (TrainingDataQueries.ddSurvivors(_, _)))

    def timeAll(tag: String): Unit =
      suspects.foreach { case (name, fn) =>
        val ts = (1 to passes).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          val t = (System.nanoTime() - t0) / 1e9
          graft.dedup.Dedup.releaseSignatures()
          t
        }
        println(f"[probe] $tag $name floor=${ts.min}%.3f passes=" +
          ts.map(t => f"$t%.3f").mkString(","))
      }

    timeAll("standalone")
    // materialize the catalog's session memos, then re-time
    ErQueries.erClusters(spark, sfDir).count()
    ErQueries.erScoredPairs(spark, sfDir).count()
    EvalQueries.evalOracleCounts(spark, sfDir).count()
    EvalQueries.evalBaselineCounts(spark, sfDir).count()
    println("[probe] memos materialized")
    timeAll("with-memos")
    spark.stop()
  }
}
