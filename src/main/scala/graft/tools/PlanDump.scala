package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dump `.explain("formatted")` for catalog queries to files — the
  * round-7 optimization evidence (plans/r07/<query>_<tag>.txt). Usage:
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <tag> [name,name,...]
  * Queries are BUILT (not executed) — eager localCheckpoints inside
  * builders still run, so memoized session state matches the bench's
  * (queries are built in the bench's sorted order). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val tag = args(2)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(',').toSet) else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        (sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.forall(_.contains(name))) {
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
          val p = java.nio.file.Paths.get(outDir, s"${name}_$tag.txt")
          java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
          println(s"[plandump] wrote $p")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] $name FAILED: ${e.getMessage}")
        }
        graft.dedup.Dedup.releaseSignatures()
      }
    }
    spark.stop()
  }
}
