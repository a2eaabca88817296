package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.er.{Blocking, Mentions, Scoring}
import graft.synth.Synth

/** Cost split of the scaling bench's timed region (Bench.erJob): the
  * pair self-join alone (count-only — Catalyst prunes the scoring
  * expressions) vs the full scored aggregate (the bench's agg), plus
  * single-expression variants. Identifies whether sec_lo is bound by
  * pair GENERATION (join machinery, row materialization) or by the
  * scoring expressions (jw/jaccard/lev). Cores via SPARK_GRAFT_CPUS
  * (default 2 = the lo level). */
object ScoreProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nPages = graft.queries.ErQueries.pageCountFor(sfDir) * 2
    val mentions = Mentions.fromPages(Synth.pages(spark, nPages)).cache()
    mentions.count()
    val keyed = Blocking.keyedWithAttrs(mentions, Blocking.Config()).cache()
    keyed.count()

    def time(tag: String)(f: => Unit): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[score] $tag%-28s $best%8.3f s")
    }

    val scored = Scoring.scoreFused(keyed)
    time("pairs count only") { scored.agg(count(lit(1))).head() }
    time("jw only") { scored.agg(count(lit(1)), sum(col("jw"))).head() }
    time("jaccard only") { scored.agg(count(lit(1)), sum(col("jaccard"))).head() }
    time("full bench agg") {
      scored.agg(
        count(lit(1)).as("n"),
        sum(col("is_match").cast("long")).as("n_match"),
        sum(col("jw")).as("s_jw"),
        sum(col("jaccard")).as("s_jac"),
        sum(col("lev").cast("long")).as("s_lev")).head()
    }
    spark.stop()
  }
}
