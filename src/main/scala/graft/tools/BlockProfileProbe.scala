package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing probe for er_block_profile (bench regression triage): warm pass
  * then three timed passes over the session-shared mention table. */
object BlockProfileProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Unit = {
      val t0 = System.nanoTime()
      graft.queries.ErQueries.erBlockProfile(spark, dir).count()
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    once("warm")
    once("t1"); once("t2"); once("t3"); once("t4"); once("t5"); once("t6")
    spark.stop()
  }
}
