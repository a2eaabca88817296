package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val spark = session()
    dump(spark, sfDir, outDir, None)
    spark.stop()
  }

  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The ONE dump implementation behind both the full gate (names=None)
    * and graft.tools.DumpQuery's targeted replays — per-query behavior
    * (failure handling, signature release, `{OUT}` substitution) cannot
    * drift between the real gate and a targeted run. */
  private[graft] def dump(
      spark: SparkSession,
      sfDir: String,
      outDir: String,
      names: Option[Seq[String]]): Unit = {
    new java.io.File(outDir).mkdirs()
    val all = SparkEntry.queries ++ SparkEntry.auxDumps
    val selected: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] =
      names match {
        case Some(ns) =>
          val unknown = ns.filterNot(all.contains)
          require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
          ns.map(n => n -> all(n))
        case None => all.toSeq
      }
    selected.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        println(s"[verify] dumped $name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // dedup signature caches are per-dump scratch — release like Bench
      // does, or they accumulate across the ~60-dump session
      graft.dedup.Dedup.releaseSignatures()
    }
    def q(s: String): String = "\"" + graft.util.Json.esc(s) + "\""
    // `{OUT}` in oracle SQL resolves to this run's dump directory, so an
    // oracle can read the aux parquet inputs dumped above (absolute path:
    // the driver's DuckDB process need not share our cwd).
    val outAbs = new java.io.File(outDir).getAbsolutePath
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v.replace("{OUT}", outAbs))}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
  }
}
