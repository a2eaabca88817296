package graft
import graft.eval.CaseLogic
import graft.eval.CaseModel._
import scala.jdk.CollectionConverters._
object MtDiff {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/reference/evaluation-results/baseline/baseline.aida-conll-test"
    val docs = graft.sources.BenchmarkReader.linkedArticles(spark, s"$base.linked_articles.jsonl").collect()
    val goldenLines = scala.io.Source.fromFile(s"$base.eval_cases.jsonl", "UTF-8").getLines().toSeq
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    // build meta like the spec
    val dts = Set.newBuilder[String]; val qts = Set.newBuilder[String]; val nms = Map.newBuilder[String,String]
    goldenLines.foreach { line => om.readTree(line).elements().asScala.foreach { c =>
      val pe = c.get("predicted_entity")
      if (pe != null && !pe.isNull) {
        val id = pe.get("entity_id").asText()
        val t = if (pe.has("type") && !pe.get("type").isNull) pe.get("type").asText() else ""
        if (t == "DATETIME") dts += id else if (t == "QUANTITY") qts += id
        if (pe.has("name") && !pe.get("name").isNull && pe.get("name").asText() != "Unknown") nms += id -> pe.get("name").asText()
      }
    }}
    val meta = EntityMeta(Map.empty, qts.result(), dts.result(), nms.result())
    val diffs = scala.collection.mutable.Map.empty[(String,String), Int]
    docs.zip(goldenLines).zipWithIndex.foreach { case ((doc, gl), di) =>
      val ours = CaseLogic.generateCases(doc, meta)
        .map(c => (c.begin, c.end, c.gtEntityId.getOrElse("")) -> c).toMap
      om.readTree(gl).elements().asScala.foreach { g =>
        val gGt = if (g.has("true_entity") && !g.get("true_entity").isNull) g.get("true_entity").get("entity_id").asText() else ""
        val key = (g.get("span").get(0).asInt(), g.get("span").get(1).asInt(), gGt)
        val want = if (g.has("mention_type")) g.get("mention_type").asText() else "?"
        ours.get(key).foreach { c =>
          if (c.mentionType != want) {
            diffs((c.mentionType, want)) = diffs.getOrElse((c.mentionType, want), 0) + 1
            if (diffs.values.sum <= 5)
              println(s"doc $di $key: ours=${c.mentionType} want=$want pred=${c.predEntityId} text='" + g.get("text").asText() + "'")
          }
        }
      }
    }
    println("DIFF HISTO: " + diffs.toSeq.sortBy(-_._2).mkString(", "))
    spark.stop()
  }
}
