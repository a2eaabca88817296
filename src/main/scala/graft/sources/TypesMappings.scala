package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The type-hierarchy mapping jobs (scripts/create_all_types_mapping.py,
  * create_coreference_types_mapping.py — their portable file-processing
  * halves; the SPARQL fetches feeding them are network-bound and out of
  * scope by declared divergence).
  *
  * all-types: per relevant entity, every transitive superclass with its
  * MINIMUM depth (direct instance-of/subclass-of types at 0). The
  * reference's per-entity DFS with branch-local seen-sets
  * (create_all_types_mapping.py:21-50) computes exactly min-depth
  * reachability, so the engine runs ONE BFS over the class graph instead
  * of |entities| DFS walks: an iterative frontier join at CLASS-graph
  * scale (bounded by the type hierarchy, tiny next to the entity table),
  * then a single entity→closure join. Cycles in the subclass graph
  * terminate naturally (a left-anti keeps only first-reached pairs).
  *
  * coreference-types: the reference's per-LINE state machine over the
  * all-types TSV (create_coreference_types_mapping.py:13-50) — break
  * past min(max_level, 3), coarse hits lower max_level, the
  * highest_level-2 window — ported verbatim as a map-side function.
  */
object TypesMappings {

  /** BFS min-depth closure over (sub, sup) edges → (start, cls, depth>=1).
    * Frontier-only extension: each round joins just the newly-reached
    * pairs against the edge list, left-anti against the ACCUMULATED
    * closure so a pair is kept at its FIRST (= minimum) depth. Only the
    * per-round FRONTIER is localCheckpointed — the closure is a lazy
    * union over those already-materialized frontiers, so round k does
    * NOT re-copy the pairs found in rounds 1..k-1 (the previous
    * closure-per-round checkpoint paid O(depth × |closure|) copy work).
    * A hierarchy deeper than maxIter logs a loud warning instead of
    * silently truncating. */
  def typeClosure(subclassOf: DataFrame, maxIter: Int = 64): DataFrame = {
    val edges = subclassOf.select(
      col(subclassOf.columns(0)).as("e_sub"), col(subclassOf.columns(1)).as("e_sup"))
      .distinct().persist()
    edges.count()
    var frontier = edges.select(col("e_sub").as("start"), col("e_sup").as("cls"),
      lit(1).as("depth")).localCheckpoint()
    val frontiers = scala.collection.mutable.ArrayBuffer[DataFrame](frontier)
    def closureSoFar: DataFrame = frontiers.reduce(_ union _)
    var iter = 1
    while (iter < maxIter && !frontier.isEmpty) {
      val ext = frontier.join(edges, frontier("cls") === edges("e_sub"))
        .select(frontier("start"), edges("e_sup").as("cls"),
          (frontier("depth") + 1).as("depth"))
        .groupBy(col("start"), col("cls")).agg(min(col("depth")).as("depth"))
      frontier = ext.join(closureSoFar, Seq("start", "cls"), "left_anti").localCheckpoint()
      if (!frontier.isEmpty) frontiers += frontier
      iter += 1
    }
    if (iter >= maxIter && !frontier.isEmpty)
      System.err.println(
        s"[TypesMappings] WARNING: type closure truncated at depth $maxIter " +
          "with a non-empty frontier — results are incomplete; raise maxIter")
    edges.unpersist()
    closureSoFar
  }

  /** create_all_types_mapping.py main: sitelink-filtered entities, direct
    * types = instance-of ∪ the entity's own subclass-of entries (depth 0),
    * plus every transitive superclass at min depth. Returns
    * (qid, types: array<struct<depth,cls>> sorted by (depth, cls),
    * line: the reference's TSV line). Inputs are two-column DataFrames;
    * no broadcast hints — the dims are corpus-scale, AQE decides. */
  def allTypes(
      sitelinks: DataFrame,
      instanceOf: DataFrame,
      subclassOf: DataFrame,
      minCount: Int = 2): DataFrame = {
    val spark = sitelinks.sparkSession
    import spark.implicits._
    val relevant = sitelinks
      .select(col(sitelinks.columns(0)).as("qid"),
        col(sitelinks.columns(1)).cast("long").as("n"))
      .where(col("n") >= minCount).select("qid")
    val inst = instanceOf
      .select(col(instanceOf.columns(0)).as("qid"), col(instanceOf.columns(1)).as("cls"))
      .join(relevant, Seq("qid"), "left_semi")
    val subs = subclassOf
      .select(col(subclassOf.columns(0)).as("qid"), col(subclassOf.columns(1)).as("cls"))
    // the reference iterates instance-of KEYS: only those entities emit
    val universe = inst.select("qid").distinct()
    val direct = inst.union(subs.join(universe, Seq("qid"), "left_semi")).distinct()
      .withColumn("depth", lit(0))
    val closure = typeClosure(subclassOf)
    val fromClosure = direct
      .join(closure, direct("cls") === closure("start"))
      .select(direct("qid"), closure("cls"), closure("depth"))
    val all = direct.select("qid", "cls", "depth").union(fromClosure)
      .groupBy(col("qid"), col("cls")).agg(min(col("depth")).as("depth"))
    all
      .groupBy(col("qid"))
      .agg(sort_array(collect_list(struct(col("depth"), col("cls")))).as("types"))
      .as[(String, Seq[(Int, String)])]
      .map { case (qid, types) =>
        (qid, types, qid + types.map { case (d, c) => s"\t$d:$c" }.mkString)
      }
      .toDF("qid", "types", "line")
      .orderBy(col("qid"))
  }

  /** One all-types line → the coreference type list, or None when the
    * line has no type columns. Verbatim port of the reference loop
    * (including the continue on >2-colon cells and the append-after-
    * bookkeeping order). */
  def corefTypesForLine(line: String, coarse: Set[String]): Option[(String, Seq[String])] = {
    val lst = line.stripSuffix("\n").split("\t", -1)
    if (lst.length < 2) return None
    val entityId = lst(0)
    val highestLevel = lst.last.split(":")(0).toInt
    var maxLevel = highestLevel
    var coarseFound = false
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var broke = false
    for (el <- lst.drop(1) if !broke) {
      val parts = el.split(":", -1)
      if (parts.length <= 2) {
        val level = parts(0).toInt
        val typeId = parts(1)
        if (level > math.min(maxLevel, 3)) broke = true
        else {
          if (coarse.contains(typeId)) {
            coarseFound = true
            maxLevel = level
          } else if (!coarseFound && level > highestLevel - 2) {
            maxLevel = level
          }
          out += typeId
        }
      }
    }
    if (out.isEmpty) None else Some((entityId, out.toSeq))
  }

  /** create_coreference_types_mapping.py over the all-types table:
    * (qid, types ';'-joined) — one map, no shuffle. */
  def corefTypes(allTypesDf: DataFrame, coarse: Set[String]): DataFrame = {
    val spark = allTypesDf.sparkSession
    import spark.implicits._
    val bCoarse = spark.sparkContext.broadcast(coarse)
    allTypesDf.select(col("line")).as[String]
      .flatMap(l => corefTypesForLine(l, bCoarse.value))
      .map { case (qid, types) => (qid, types.mkString(";")) }
      .toDF("qid", "coref_types")
  }
}
