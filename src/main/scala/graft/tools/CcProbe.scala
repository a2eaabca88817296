package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.er.{Blocking, Clustering, Mentions, Scoring}
import graft.synth.Synth

/** Timing probe for the connected-components loop on the bench-scale
  * match-edge graph (the scaling harness's nPages corpus). */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val nPages = sys.env.getOrElse("PROBE_PAGES", "20000").toLong
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local[32]"))
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val mentions = Mentions.fromPages(Synth.pages(spark, nPages)).cache()
    println(s"[probe] mentions: ${mentions.count()}")
    val edges = Scoring.scoreFused(Blocking.keyedWithAttrs(mentions, Blocking.Config()))
      .where(col("is_match")).select(col("a"), col("b")).distinct().cache()
    println(s"[probe] match edges: ${edges.count()}")

    def once(name: String): Unit = {
      val t0 = System.nanoTime()
      val n = Clustering.assign(spark, mentions.select(col("mention_id").as("id")), edges).count()
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n ids)")
    }
    once("cc1"); once("cc2"); once("cc3")

    // edge-iteration cost split: the tuple-encoder path (what
    // localContract pays per edge) vs a raw InternalRow pass — the
    // round-7 question of whether an InternalRow contract pass is worth
    // a private-API surface
    def t(name: String)(f: => Long): Unit = {
      var best = Double.MaxValue
      (1 to 3).foreach { _ =>
        val t0 = System.nanoTime()
        val n = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        require(n != 0L)
      }
      println(f"[probe] $name: $best%.2f s")
    }
    import spark.implicits._
    t("tuple-encoder edge pass") {
      edges.select(col("a"), col("b")).as[(Long, Long)]
        .mapPartitions { it =>
          var acc = 0L; it.foreach { case (a, b) => acc ^= a + b }
          Iterator.single(acc | 1L)
        }.reduce(_ | _)
    }
    t("internal-row edge pass") {
      edges.select(col("a"), col("b")).queryExecution.toRdd
        .mapPartitions { it =>
          var acc = 0L; it.foreach { r => acc ^= r.getLong(0) + r.getLong(1) }
          Iterator.single(acc | 1L)
        }.reduce(_ | _)
    }
    spark.stop()
  }
}
