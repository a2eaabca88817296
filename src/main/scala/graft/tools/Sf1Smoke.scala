package graft.tools

import org.apache.spark.sql.SparkSession

import graft.er.{Mentions, PairEval}
import graft.synth.Synth

/** sf1 smoke (round-4 verdict stretch item 9): the full ER pipeline —
  * mention extraction → blocking → fused scoring → connected components →
  * pairwise F1 — once at a 10× corpus (100 000 pages vs the sf0.1
  * catalog's 10 000), oracle-free; reports wall-clock, scored-pair
  * volume, peak cached storage, and F1, validating that the
  * memo/persist budget and the bounded-block plans hold an order of
  * magnitude above the bench scale. */
object Sf1Smoke {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("SMOKE_PAGES", "100000").toLong
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val mentions = Mentions.fromPages(Synth.pages(spark, nPages))
    val (scored, clusters, ev) = PairEval.runPipeline(spark, mentions)
    val wall = (System.nanoTime() - t0) / 1e9
    val nPairs = scored.count()
    val nClusters = clusters.select("cluster").distinct().count()
    val storageMb = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum / 1048576.0
    println(f"[sf1smoke] pages=$nPages pairs=$nPairs clusters=$nClusters " +
      f"wall=$wall%.1f s peak_storage_mb=$storageMb%.0f " +
      f"f1=${ev.f1}%.4f precision=${ev.precision}%.4f recall=${ev.recall}%.4f")
    spark.stop()
  }
}
