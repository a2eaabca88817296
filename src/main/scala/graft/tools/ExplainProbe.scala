package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.queries.ErQueries.erBlockProfile(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    println("[probe] ReusedExchange count: " + "ReusedExchange".r.findAllIn(plan).length)
    println("[probe] HashAggregate count: " + "HashAggregate".r.findAllIn(plan).length)
    println("[probe] scans of mentions flatMap: " + "SerializeFromObject".r.findAllIn(plan).length)
    spark.stop()
  }
}
