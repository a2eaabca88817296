package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timing probe for the eval_* catalog queries (round-3 verdict
  * item 3: eval_oracle_counts regressed 0.73 s → 6.53 s between official
  * rounds while its twin improved). Replicates Bench's discipline — warm
  * pass then min-of-2 — for just the eval family, printing each pass so
  * the warm/cold split is visible. */
object EvalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-eval-probe")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- Seq("eval_baseline_counts", "eval_cases", "eval_oracle_counts")) {
      val fn = graft.SparkEntry.queries(name)
      val times = (1 to 3).map { i =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"[probe] $name pass $i: $t%.3f s")
        t
      }
      println(f"[probe] $name min-of-2-after-warm: ${times.drop(1).min}%.3f s")
    }
    spark.stop()
  }
}
