package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shuffle-bytes evidence for the gram pre-hash option (round-6 verdict
  * item 8): runs dupNgramStats in both modes over a synthetic corpus of
  * LONG grams (the regime the option targets), asserts the outputs are
  * identical, and reports the measured shuffle write bytes per mode. */
object GramHashProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ~10% of docs pair-duplicate (id 20k with 20k+1) so the
    // verification pass is exercised while staying duplication-scale —
    // the low-dup regime the pre-hash option targets. Two vocabularies:
    //   - "templated": tokNNN-style tokens, the compressible extreme —
    //     lz4 shrinks the string shuffle ~4x and pre-hashing cannot win;
    //   - "high-entropy": 16-hex-char tokens (web-scale ids, hashes,
    //     urls), where strings do not compress and the 8-byte keys pay.
    // The probe reports BOTH so the option's regime boundary is honest.
    def docsWith(dupEvery: Int)(
        tokenOf: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      spark.range(60000).select(
        col("id").as("doc_id"),
        concat_ws(" ", (0 until 40).map(k =>
          tokenOf(xxhash64(when(pmod(col("id"), lit(dupEvery)) === 0, col("id") + 1)
            .otherwise(col("id")), lit(k)))): _*).as("text"))
        .localCheckpoint(true)
    val corpora = Seq(
      "templated-10%dup" ->
        docsWith(20)(h => concat(lit("tok"), pmod(h, lit(10000000)), lit("suffixpad"))),
      "high-entropy-10%dup" -> docsWith(20)(h => hex(h)),
      "high-entropy-1%dup" -> docsWith(200)(h => hex(h)))

    val shuffleBytes = new AtomicLong()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    corpora.foreach { case (name, docs) =>
      def run(preHash: Boolean): (Long, Array[(Long, Long, Long)]) = {
        shuffleBytes.set(0L)
        val out = graft.curate.Decontam
          .dupNgramStats(docs, "doc_id", "text", n = 8, preHash = preHash)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
          .sortBy(_._1)
        Thread.sleep(1000) // listener drain
        (shuffleBytes.get(), out)
      }
      val (bytesStr, outStr) = run(preHash = false)
      val (bytesHash, outHash) = run(preHash = true)
      require(outStr.sameElements(outHash),
        s"$name: pre-hashed dupNgramStats diverged from the string-keyed path")
      println(f"[gramhash] $name%-20s string-keyed ${bytesStr / 1048576.0}%7.1f MB | " +
        f"pre-hashed ${bytesHash / 1048576.0}%7.1f MB | " +
        f"ratio ${bytesStr.toDouble / math.max(1L, bytesHash)}%.2fx " +
        s"(outputs identical, ${outStr.length} docs)")
    }
    spark.stop()
  }
}
