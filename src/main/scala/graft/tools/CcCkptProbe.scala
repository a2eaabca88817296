package graft.tools

import org.apache.spark.sql.SparkSession

import graft.er.Clustering

/** Replicates ClusteringSpec's checkpointed-CC sequence with diagnostics. */
object CcCkptProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val edges = (0L until 120L).map(i => (i, (i + 11) % 120)) ++ Seq((500L, 501L), (501L, 502L))
    val dir = java.nio.file.Files.createTempDirectory("cc_probe").toString
    val df = edges.toDF("a", "b")

    val partial = Clustering.connectedComponentsCheckpointed(spark, df, dir, maxIter = 1)
    println(s"[probe] partial: conv=${partial.converged} rounds=${partial.roundsComputed} from=${partial.resumedFromRound}")
    println("[probe] partial.clusters rows=" + partial.clusters.count())

    val resumed = Clustering.connectedComponentsCheckpointed(spark, df, dir, maxIter = 50)
    println(s"[probe] resumed: conv=${resumed.converged} rounds=${resumed.roundsComputed} from=${resumed.resumedFromRound}")
    try println("[probe] resumed.clusters rows=" + resumed.clusters.count())
    catch { case e: Exception => println("[probe] resumed collect FAILED: " + e.getMessage.take(300)) }

    try println("[probe] partial.clusters again rows=" + partial.clusters.count())
    catch { case e: Exception => println("[probe] partial re-collect FAILED: " + e.getMessage.take(300)) }
    spark.stop()
  }
}
