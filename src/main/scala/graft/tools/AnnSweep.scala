package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sim.Ann

/** Recall-vs-cost sweep for the approximate ANN tiers at sf0.1 (round-6
  * verdict item 7: the recorded operating point was low — IVF 54/100,
  * LSH 46/100 at sf0.01 — and no table existed for picking a better one).
  *
  * For each configuration: mean recall@5 over the catalog's fixed query
  * set (vec_id < 20) against the exact brute-force floor, plus the warm
  * wall (min-of-2) of the full index-build+search pipeline. Results go
  * into BASELINE.md's recall-vs-cost table. */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val k = graft.queries.TrainingDataQueries.AnnK
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val q = e.where(col("vec_id") < graft.queries.TrainingDataQueries.AnnQueryMax)
    val nQ = q.count()
    println(s"[sweep] corpus=${e.count()} queries=$nQ k=$k dir=$dir")
    val brute = Ann.bruteForceTopK(e, q, "vec_id", "embedding", k = k)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    brute.count()

    def measure(name: String)(build: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Double.MaxValue
      var recall = 0.0
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val approx = build
        val matched = Ann.recallCounts(approx, brute, k = k)
          .agg(sum(col("n_matched"))).head().getLong(0)
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
        recall = matched.toDouble / (nQ * k)
      }
      println(f"[sweep] $name%-28s recall@$k=$recall%.3f wall=$best%.2f s")
    }

    // IVF: nProbe sweep at the auto nLists (~sqrt(n)), plus a coarser grid
    Seq(2, 4, 8, 16, 24, 32).foreach { p =>
      measure(s"ivf nLists=auto nProbe=$p")(
        Ann.ivfTopK(spark, e, q, "vec_id", "embedding", k = k, nProbe = p))
    }
    // LSH: band-structure sweep (bandBits down = more, coarser bands =
    // higher recall; nBits up = more bands at same width)
    for ((nBits, bandBits) <- Seq((16, 4), (16, 2), (24, 4), (24, 3), (32, 4)))
      measure(s"lsh nBits=$nBits bandBits=$bandBits")(
        Ann.lshTopK(spark, e, q, "vec_id", "embedding", k = k,
          nBits = nBits, bandBits = bandBits))
    spark.stop()
  }
}
