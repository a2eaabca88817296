package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.er.{Blocking, Mentions}
import graft.synth.Synth

object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "256")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val mentions = Mentions.fromPages(Synth.pages(spark, 30000)).cache()
    val keyed = Blocking.keyedWithAttrs(mentions, Blocking.Config()).cache()
    val perKey = keyed.groupBy("bkey").agg(count(lit(1)).as("n"))
      .withColumn("pairs", col("n") * (col("n") - 1) / 2)
    println("=== top 12 buckets by pairs ===")
    perKey.orderBy(col("pairs").desc).limit(12).collect()
      .foreach(r => println(s"SKEW ${r.getString(0).take(40)} n=${r.getLong(1)} pairs=${r.get(2)}"))
    println("=== pairs per shuffle partition (256): top 8 ===")
    perKey.withColumn("part", pmod(hash(col("bkey")), lit(256)))
      .groupBy("part").agg(sum("pairs").as("pairs"))
      .orderBy(col("pairs").desc).limit(8).collect()
      .foreach(r => println(s"SKEW part=${r.getInt(0)} pairs=${r.get(1)}"))
    val total = perKey.agg(sum("pairs")).head().get(0)
    println(s"SKEW total_pairs=$total")
    spark.stop()
  }
}
