package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Per-JOB wall-clock trace for one catalog query: runs the query once
  * to warm session memos, then once more with a listener that prints
  * every Spark job's duration and call site — the measurement that
  * locates a multi-second query's cost among its eager actions
  * (localCheckpoints, counts, collects, the final count).
  * Usage: PROBE_QUERIES=name,... runMain graft.tools.JobTraceProbe */
object JobTraceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = sys.env.getOrElse("PROBE_QUERIES", "dd_survivors_full_incr").split(',').toSeq

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    @volatile var tracing = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (tracing) {
        val site = js.stageInfos.map(_.name).distinct.mkString(" | ").take(200)
        starts.put(js.jobId, (System.nanoTime(), site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (tracing) {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          println(f"[trace]   job ${je.jobId}%4d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $site")
        }
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm pass: memos + JIT
      fn(spark, sfDir).count()
      graft.dedup.Dedup.releaseSignatures()
      Thread.sleep(500)
      println(s"[trace] === $name (warm pass done, tracing second pass) ===")
      tracing = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val t = (System.nanoTime() - t0) / 1e9
      // let listener events drain
      Thread.sleep(1000)
      tracing = false
      graft.dedup.Dedup.releaseSignatures()
      println(f"[trace] === $name total ${t}%.3f s ===")
    }
    spark.stop()
  }
}
