package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.er.{Blocking, Clustering, Mentions, Scoring}
import graft.synth.Synth

/** Benchmark harness. Prints ONE JSON line:
  *   {"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...,
  *    "scaling":{...}}
  *
  * Two parts:
  *   1. headline query timings at local[$SPARK_GRAFT_CPUS] (default 32);
  *   2. the BASELINE.json north_rule scaling evidence: the identical ER job
  *      (blocking → scoring → connected components) on the identical input
  *      at local[8] vs local[32]; throughput = scored candidate pairs /
  *      wall-clock second; efficiency = (thr_hi / thr_lo) / (cores_hi /
  *      cores_lo). No real cluster exists in this sandbox (BASELINE.md),
  *      so two parallelism levels in one JVM stand in for N vs 4N executors.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      // 8x cores: pair counts per block are Zipf-skewed, so coarse
      // partitions straggle; AQE coalesces the small ones back.
      .config("spark.sql.shuffle.partitions", (cores * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The scaling workload — the north_rule throughput unit is candidate
    * pairs scored per second, so the timed region is blocking + pair
    * generation + pairwise scoring (the embarrassingly parallel bulk that
    * dominates at 100 TB). The CC fixed-point loop is timed separately: its
    * round count depends on graph diameter, not data volume, and its
    * per-round scheduler latency would swamp a small-scale measurement.
    * Returns (scored pairs, scoring sec, cc sec). */
  private def erJob(spark: SparkSession, nPages: Long): (Long, Double, Double) = {
    val mentions = Mentions.fromPages(Synth.pages(spark, nPages)).cache()
    mentions.count() // materialize input outside the timed region

    // JIT/codegen warmup on a slice
    val warm = mentions.limit(2000).cache()
    warm.count()
    Scoring.scoreFused(Blocking.keyedWithAttrs(warm, Blocking.Config())).count()
    warm.unpersist()

    // timed region: scoring throughput. The aggregate references every
    // score column — a bare count() would let Catalyst prune the scoring
    // expressions away and time an empty join.
    val t0 = System.nanoTime()
    val keyed = Blocking.keyedWithAttrs(mentions, Blocking.Config())
    val scored = Scoring.scoreFused(keyed)
    val forced = scored.agg(
      count(lit(1)).as("n"),
      sum(col("is_match").cast("long")).as("n_match"),
      sum(col("jw")).as("s_jw"),
      sum(col("jaccard")).as("s_jac"),
      sum(col("lev").cast("long")).as("s_lev")).head()
    val nScored = forced.getLong(0)
    val scoreSec = (System.nanoTime() - t0) / 1e9

    // edge materialization + connected components (timed separately: the
    // CC round count depends on graph diameter, not volume)
    val t1 = System.nanoTime()
    val edges = scored.where(col("is_match")).select(col("a"), col("b")).distinct().cache()
    edges.count()
    val clusters = Clustering.assign(spark, mentions.select(col("mention_id").as("id")), edges)
    clusters.count()
    val ccSec = (System.nanoTime() - t1) / 1e9
    mentions.unpersist(); edges.unpersist()
    (nScored, scoreSec, ccSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    // --- part 1: headline queries --------------------------------------
    var spark = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    spark.stop()

    // --- part 2: scaling run (same job, same input, 8 vs 32 threads) ----
    val nPages = graft.queries.ErQueries.pageCountFor(sfDir)
    val coresLo = 8
    val coresHi = math.max(cpus, 32)
    spark = session(coresLo)
    val (pairsLo, secLo, ccLo) = erJob(spark, nPages)
    spark.stop()
    spark = session(coresHi)
    val (pairsHi, secHi, ccHi) = erJob(spark, nPages)
    spark.stop()
    val thrLo = pairsLo / secLo
    val thrHi = pairsHi / secHi
    val eff = (thrHi / thrLo) / (coresHi.toDouble / coresLo)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + secLo + secHi + ccLo + ccHi
    val scaling =
      s"""{"cores_lo":$coresLo,"cores_hi":$coresHi,"pairs":$pairsHi,""" +
        f""""sec_lo":$secLo%.3f,"sec_hi":$secHi%.3f,""" +
        f""""cc_sec_lo":$ccLo%.3f,"cc_sec_hi":$ccHi%.3f,""" +
        f""""pairs_per_sec_lo":$thrLo%.1f,"pairs_per_sec_hi":$thrHi%.1f,""" +
        f""""scaling_efficiency":$eff%.3f}"""
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","scaling":$scaling}""")
  }
}
