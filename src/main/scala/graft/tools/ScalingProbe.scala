package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.er.{Blocking, Mentions, Scoring}
import graft.synth.Synth

/** Ad-hoc scaling experiment: time each stage of the ER scoring job at a
  * given core count / partition multiplier / block cap. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    println("PROBE SPARK_HOME=" + sys.env.getOrElse("SPARK_HOME", "UNSET"))
    val cores = sys.env.getOrElse("PROBE_CORES", "32").toInt
    val mult = sys.env.getOrElse("PROBE_PART_MULT", "8").toInt
    val maxBlock = sys.env.getOrElse("PROBE_MAX_BLOCK", "512").toInt
    val nPages = sys.env.getOrElse("PROBE_PAGES", "10000").toLong
    val nExecutors = sys.env.get("PROBE_EXECUTORS").map(_.toInt)
    val master = nExecutors match {
      case Some(n) => s"local-cluster[$n," + sys.env.getOrElse("PROBE_EXEC_CORES", "4") + ",3072]"
      case None => s"local[$cores]"
    }
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", (cores * mult).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
    nExecutors.foreach { _ =>
      builder
        .config("spark.executor.memory", "2g")
        .config("spark.executor.extraClassPath",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath)
    }
    val spark = builder.getOrCreate()
    // task-time accounting: Σ executorRunTime vs wall distinguishes
    // contention (Σ grows with cores) from stragglers (Σ flat, wall long)
    val taskTime = new java.util.concurrent.atomic.AtomicLong(0)
    val maxTask = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (e.taskMetrics != null) {
          taskTime.addAndGet(e.taskMetrics.executorRunTime)
          maxTask.getAndUpdate(m => math.max(m, e.taskMetrics.executorRunTime))
        }
      }
    })
    spark.sparkContext.setLogLevel("WARN")

    val mentions = Mentions.fromPages(Synth.pages(spark, nPages)).cache()
    val nM = mentions.count()

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    val warm = mentions.limit(2000).cache(); warm.count()
    Scoring.scoreFused(Blocking.keyedWithAttrs(warm, Blocking.Config(maxBlock = maxBlock)))
      .agg(sum(col("jw"))).head()
    warm.unpersist()

    (1 to 2).foreach { round =>
      val keyed = Blocking.keyedWithAttrs(mentions, Blocking.Config(maxBlock = maxBlock))
      timed(s"round$round keyed-count")(keyed.count())
      val keyedC = keyed.cache(); keyedC.count()
      val scored = Scoring.scoreFused(keyedC)
      timed(s"round$round join-count-only")(scored.count())
      taskTime.set(0); maxTask.set(0)
      timed(s"round$round full-score") {
        scored.agg(count(lit(1)), sum(col("is_match").cast("long")), sum(col("jw")),
          sum(col("jaccard")), sum(col("lev").cast("long"))).head()
      }
      println(f"PROBE round$round task-time-sum: ${taskTime.get / 1000.0}%.1f s, max-task: ${maxTask.get / 1000.0}%.1f s")
      keyedC.unpersist()
    }
    println(s"PROBE mentions=$nM cores=$cores mult=$mult maxBlock=$maxBlock")
    spark.stop()
  }
}
