package graft.tools

import org.apache.spark.sql.SparkSession

/** Driver-contract smoke: SparkEntry.entry must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"ENTRYSMOKE rows=${rows.length} first=${rows.headOption.getOrElse("none")}")
    spark.stop()
  }
}
