package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Transitive clustering: connected components over match edges as an
  * iterative DataFrame loop (SURVEY.md §2.8 G6).
  *
  * Implements the alternating large-star / small-star contraction of
  * Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14)
  * — O(log n) rounds, each round two shuffles (a groupBy-min and a join),
  * fully relational (no collect_list, so a giant component never
  * materializes a giant row). Lineage is cut with localCheckpoint every
  * round (the loop would otherwise stack exponentially growing plans).
  *
  * Deterministic: cluster id = smallest mention_id of the component, so the
  * output is invariant under partitioning — a north_rule requirement.
  */
object Clustering {

  /** edges: DataFrame(a BIGINT, b BIGINT), undirected, a != b assumed.
    * Returns DataFrame(id BIGINT, cluster BIGINT) for every id appearing in
    * an edge. Nodes with no edges are absent (callers union singletons). */
  def connectedComponents(spark: SparkSession, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    var e = edges
      .select(col("a").cast("long"), col("b").cast("long"))
      .where(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)

    // Right-size the loop's shuffle width to the graph: the star-contraction
    // rounds run O(log n) small jobs, and a width tuned for the scoring
    // stage (thousands of partitions) would turn each round into a storm of
    // empty micro-tasks. ~100k edges per partition, capped at the session
    // parallelism.
    val nEdges = e.count()
    val parts = math.max(1L, math.min(
      spark.sparkContext.defaultParallelism.toLong, nEdges / 100000L + 1)).toInt
    val prevShufflePartitions = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      connectedComponentsLoop(e, maxIter)
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShufflePartitions)
    }
  }

  private def connectedComponentsLoop(edges0: DataFrame, maxIter: Int): DataFrame = {
    var e = edges0

    var converged = false
    var iter = 0
    var prevSig: (Long, Long) = (-1L, -1L)
    while (!converged && iter < maxIter) {
      // ---- large-star: for each node u, hang strictly-larger neighbors on
      //      m = min(N(u) ∪ {u})
      val both = e.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e.select(col("b").as("u"), col("a").as("v")))
      val mins = both.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      val ls = both
        .join(mins, Seq("u"))
        .where(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .distinct()

      // ---- small-star: orient edges high→low, hang all small neighbors
      //      (and the node itself) on the minimum
      val dir = ls.select(greatest(col("a"), col("b")).as("u"), least(col("a"), col("b")).as("v"))
      val mins2 = dir.groupBy("u").agg(min(col("v")).as("m"))
      val ss = dir
        .join(mins2, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("a"), col("m").as("b"))
        .unionAll(mins2.select(col("u").as("a"), col("m").as("b")))
        .distinct()
        // LAZY checkpoint: the signature aggregation below is the action
        // that materializes it — one job per round instead of two (the
        // round count is diameter-bound, so per-round scheduler latency is
        // the dominant cost on small graphs)
        .localCheckpoint(false)

      // convergence: stable (count, xor-hash) signature of the edge set
      // (bit_xor, not sum: ANSI mode would overflow a sum of 64-bit hashes)
      val sigRow = ss.agg(
        count(lit(1)).as("n"),
        coalesce(expr("bit_xor(xxhash64(a, b))"), lit(0L)).as("h")).head()
      val sig = (sigRow.getLong(0), sigRow.getLong(1))
      converged = sig == prevSig
      prevSig = sig
      e = ss
      iter += 1
    }

    // In the converged star forest every edge is (member, center) with
    // center = component minimum; each node's cluster = min over its edges,
    // centers map to themselves.
    val members = e.select(col("a").as("id"), col("b").as("cluster"))
    val centers = e.select(col("b").as("id"), col("b").as("cluster"))
    members.unionAll(centers)
      .groupBy("id")
      .agg(min("cluster").as("cluster"))
  }

  /** Cluster assignment for every mention id in `ids` (singletons become
    * their own cluster). ids: DataFrame(id BIGINT). */
  def assign(spark: SparkSession, ids: DataFrame, matchEdges: DataFrame): DataFrame = {
    val cc = connectedComponents(spark, matchEdges)
    ids.select(col("id"))
      .join(cc, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
  }
}
