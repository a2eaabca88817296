package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Targeted Verify: dump only the named catalog queries (plus
  * oracle_sql.json) to outDir. The Spark-side counterpart of
  * tools/check_oracle_subset.py — together they make the per-round
  * sf0.1 scale-robustness replay of CHANGED oracles cheap instead of a
  * full catalog dump + full DuckDB suite.
  *
  * Usage: runMain graft.tools.DumpQuery SF_DIR OUT_DIR name [name...]
  * Queries that read `{OUT}` aux inputs need those aux dumps too — pass
  * the aux names explicitly (they are listed in SparkEntry.auxDumps). */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: DumpQuery SF_DIR OUT_DIR name [name...]")
    val sfDir = args(0); val outDir = args(1); val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val all = SparkEntry.queries ++ SparkEntry.auxDumps
    val unknown = names.filterNot(all.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    names.foreach { name =>
      all(name)(spark, sfDir).coalesce(1)
        .write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[dump] $name done")
      graft.dedup.Dedup.releaseSignatures()
    }
    def q(s: String): String = "\"" + graft.util.Json.esc(s) + "\""
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
