package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.eval.CaseModel._

/** S2 — AIDA-CoNLL IOB TSV benchmark reader (reference:
  * /root/reference/src/elevant/benchmark_readers/aida_conll_benchmark_reader.py:20-132).
  * Token accumulation is sequential per file, so the parse runs per-file
  * via wholeTextFiles (one task per file; benchmark files are small — the
  * corpus-scale inputs are the page tables, not benchmarks). Semantics
  * ported: tokens joined with single spaces; `B` rows with entity "null"
  * continue the previous label; `--NME--` → NIL; label span excludes the
  * trailing space; dev/test splits select article index ranges
  * 946-1161 / 1162-1392; nested labels get parent/child ids by span
  * containment. */
object AidaConllReader {

  def parseFile(content: String, title2qid: Map[String, String]): Seq[EvalDoc] = {
    val docs = Seq.newBuilder[EvalDoc]
    var text = new StringBuilder
    var labels = Seq.newBuilder[GtLabel]
    var labelId = 0
    var spanStart = 0
    var entityId: String = null
    var articleIdx = 0

    def flushLabel(): Unit = {
      if (entityId != null) {
        labels += GtLabel(labelId, spanStart, text.length - 1, entityId, "Unknown",
          None, Nil, optionalFlag = false, Nil, None, desc = false)
        labelId += 1
        entityId = null
      }
    }
    def flushArticle(): Unit = {
      if (text.nonEmpty) {
        flushLabel()
        val t = text.substring(0, text.length - 1) // strip trailing space
        docs += EvalDoc(s"aida-$articleIdx", t, 0, t.length,
          NestedGt.assignParentChild(labels.result()), Nil)
        articleIdx += 1
      }
      text = new StringBuilder
      labels = Seq.newBuilder[GtLabel]
      labelId = 0
      spanStart = 0
      entityId = null
    }

    content.split("\n", -1).foreach { raw =>
      val lst = raw.trim.split("\t", -1)
      val token = lst(0)
      if (token.startsWith("-DOCSTART-")) flushArticle()
      else if (token.nonEmpty) {
        if (lst.length > 1 && lst(1) != "O") {
          val iob = lst(1)
          val entityName = if (lst.length > 3) lst(3) else "null"
          if (iob == "B" && entityName != "null") {
            val id =
              if (entityName == "--NME--") NIL
              else QidMapper.getWikidataQid(if (lst.length > 4) lst(4) else "", title2qid)
            flushLabel()
            spanStart = text.length
            entityId = id
          }
        } else flushLabel()
        text.append(token).append(' ')
      }
    }
    flushArticle()
    docs.result()
  }

  /** split: "train" (0-945), "dev" (946-1161), "test" (1162-1392), or
    * "all". */
  def read(
      spark: SparkSession,
      path: String,
      split: String = "all",
      title2qid: Map[String, String] = Map.empty): Dataset[EvalDoc] = {
    import spark.implicits._
    val t2q = spark.sparkContext.broadcast(title2qid)
    val range: (Int, Int) = split match {
      case "train" => (0, 945)
      case "dev" => (946, 1161)
      case "test" => (1162, 1392)
      case _ => (0, Int.MaxValue)
    }
    spark.sparkContext.wholeTextFiles(path)
      .flatMap { case (_, content) => parseFile(content, t2q.value).zipWithIndex }
      .filter { case (_, i) => i >= range._1 && i <= range._2 }
      .map(_._1)
      .toDS()
  }
}
