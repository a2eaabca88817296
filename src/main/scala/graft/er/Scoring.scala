package graft.er

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Mention

/** Pairwise scoring (SURVEY.md §2.4 J8): Jaro-Winkler + Levenshtein on the
  * normalized mention strings, token-Jaccard on the paragraph context sets.
  *
  * Plan shape: candidate pairs (ids only, already deduplicated) are joined
  * twice against the mention table to pull attributes; Jaccard and the
  * match rule are built-in column expressions (codegen'd); Jaro-Winkler is
  * the one scalar UDF (a pure, allocation-light function — candidate for a
  * codegen Expression later). Levenshtein uses the Spark built-in.
  */
object Scoring {

  final case class Config(
      jwThreshold: Double = 0.92,
      scoreThreshold: Double = 0.80,
      jaccardOnlyThreshold: Double = 0.60,
      wJw: Double = 0.6,
      wJaccard: Double = 0.4)

  /** Standard Jaro-Winkler similarity (public algorithm; Winkler prefix
    * boost p=0.1 over at most 4 chars). */
  def jaroWinkler(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val matchDist = math.max(math.max(len1, len2) / 2 - 1, 0)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var matches = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - matchDist)
      val hi = math.min(len2 - 1, i + matchDist)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; matches += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val transpositions = t / 2
    val jaro = (matches.toDouble / len1 + matches.toDouble / len2 +
      (matches - transpositions).toDouble / matches) / 3.0
    var prefix = 0
    val maxPrefix = math.min(4, math.min(len1, len2))
    while (prefix < maxPrefix && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  /** Fused blocking+scoring plan — the scale path. Input is
    * Blocking.keyedWithAttrs output; the self-join on the (sub-bucketed)
    * block key is the ONLY shuffle of pair-scale data, and the scored pairs
    * are produced map-side after it (no pair-id dedupe shuffle, no
    * attribute re-join). A pair reachable through k block keys is scored k
    * times (~1.3x CPU on the synthetic corpus) — at web scale duplicate
    * CPU is far cheaper than an extra 10^12-row shuffle. Consumers that
    * need the deduplicated pair universe (the eval gate) apply
    * dropDuplicates("a","b") — all duplicate rows are bit-identical, so
    * the choice is deterministic. */
  def scoreFused(keyed: DataFrame, cfg: Config = Config()): DataFrame = {
    // Explicit co-partitioning with a FIXED width: the join's cost is its
    // OUTPUT (pairs), which AQE cannot see — left to adaptive coalescing,
    // the ~MB-sized keyed input collapses into a couple of partitions and
    // the quadratic pair generation lands in one straggler task. A
    // user-specified repartition is exempt from AQE coalescing.
    val parts = keyed.sparkSession.sessionState.conf.numShufflePartitions
    val l = keyed.select(col("bkey"), col("id").as("a"), col("ns").as("ns_a"),
      col("ctx").as("ctx_a"), col("gold").as("gold_a"))
      .repartition(parts, col("bkey"))
    val r = keyed.select(col("bkey"), col("id").as("b"), col("ns").as("ns_b"),
      col("ctx").as("ctx_b"), col("gold").as("gold_b"))
      .repartition(parts, col("bkey"))
    scoreColumns(
      l.join(r, Seq("bkey")).where(col("a") < col("b")), cfg)
      .select("a", "b", "gold_a", "gold_b", "jw", "lev", "jaccard", "score", "is_match")
  }

  private def scoreColumns(df: DataFrame, cfg: Config): DataFrame =
    df.withColumn("jw", graft.functions.JaroWinklerExpr.jaro_winkler(col("ns_a"), col("ns_b")))
      // native merge-based Jaccard over the SORTED context arrays —
      // array_intersect/array_union allocate per row and turn the 32-thread
      // hot loop GC-bound (see ARCHITECTURE.md scale notes). Long-hash
      // signatures (fused path) and string arrays (legacy path) both work.
      .withColumn(
        "jaccard", {
          import org.apache.spark.sql.types.{ArrayType, LongType}
          df.schema("ctx_a").dataType match {
            case ArrayType(LongType, _) =>
              graft.functions.SortedLongJaccardExpr.sorted_long_jaccard(col("ctx_a"), col("ctx_b"))
            case _ =>
              graft.functions.SortedJaccardExpr.sorted_jaccard(col("ctx_a"), col("ctx_b"))
          }
        })
      .withColumn("score", lit(cfg.wJw) * col("jw") + lit(cfg.wJaccard) * col("jaccard"))
      .withColumn(
        "is_match",
        (col("jw") >= cfg.jwThreshold && col("score") >= cfg.scoreThreshold) ||
          col("jaccard") >= cfg.jaccardOnlyThreshold)
      // levenshtein is informational (not part of the match rule) —
      // computed for match candidates only; -1 elsewhere (evaluated AFTER
      // is_match so non-matches skip it). FastLevenshteinExpr, not the
      // built-in: matched pairs are overwhelmingly identical or
      // near-identical surfaces, and the built-in's full two-array DP on
      // them dominated the scaling bench's scored aggregate (equality +
      // prefix/suffix trim return the identical distances)
      .withColumn(
        "lev",
        when(col("is_match"),
          graft.functions.FastLevenshteinExpr.fast_levenshtein(col("ns_a"), col("ns_b")))
          .otherwise(lit(-1)))

  /** Score candidate pairs. `pairs` has columns (a, b) of mention ids. */
  def scorePairs(mentions: Dataset[Mention], pairs: DataFrame, cfg: Config = Config()): DataFrame = {
    val attrs = mentions
      .toDF()
      .select(col("mention_id"), col("norm_surface"), col("context"), col("gold_entity"))
    val left = attrs
      .withColumnRenamed("mention_id", "a")
      .withColumnRenamed("norm_surface", "ns_a")
      .withColumnRenamed("context", "ctx_a")
      .withColumnRenamed("gold_entity", "gold_a")
    val right = attrs
      .withColumnRenamed("mention_id", "b")
      .withColumnRenamed("norm_surface", "ns_b")
      .withColumnRenamed("context", "ctx_b")
      .withColumnRenamed("gold_entity", "gold_b")
    scoreColumns(pairs.join(left, Seq("a")).join(right, Seq("b")), cfg)
      .select("a", "b", "gold_a", "gold_b", "jw", "lev", "jaccard", "score", "is_match")
  }
}
