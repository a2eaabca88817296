package graft.tools

import org.apache.spark.sql.SparkSession

import graft.eval.CaseModel._

/** Ad-hoc end-to-end drive of the text-prefix prediction attach (J6). */
object J6Drive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val docs = graft.sources.BenchmarkReader.ourJsonl(spark,
      "/root/reference/benchmarks/kore50.benchmark.jsonl")
    val linked = graft.sources.BenchmarkReader.linkedArticles(spark,
      "/root/reference/evaluation-results/baseline/baseline.kore50.linked_articles.jsonl")
    val predsWithText = linked.map(d => (d.text, d.predictions))
    val attached = graft.sources.BenchmarkReader.attachPredictionsByTextPrefix(docs, predsWithText)
    val n = attached.filter(_.predictions.nonEmpty).count()
    println(s"J6DRIVE attached_articles_with_preds=$n of ${docs.count()}")
    val counts = graft.eval.Evaluation.counts(
      graft.eval.Evaluation.cases(attached, EntityMeta.empty), EntityMeta.empty)
    val f = graft.eval.Evaluation.microF1(counts, "IGNORED")
    println(f"J6DRIVE prefix-attached baseline kore50 micro F1=${f.f1}%.4f (golden 0.3258)")
    spark.stop()
  }
}
