package graft.er

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.model.Mention

/** Candidate blocking (SURVEY.md §2.4 J1/J9, north_star: "normalized-mention
  * + URL-domain + MinHash-LSH keys materialized as salted, repartitioned
  * Datasets").
  *
  * Each mention emits a small set of blocking keys; candidate pairs are the
  * within-block id pairs. Skew discipline (§4.3):
  *   1. block sizes are profiled first (one cheap count aggregation);
  *   2. blocks larger than `maxBlock` are deterministically sub-bucketed
  *      (`key#bucket`, bucket = hash(id) mod ceil(size/maxBlock)) — this
  *      caps the per-block pair count at ~maxBlock²/2 instead of silently
  *      dropping hot keys, and the dropped cross-bucket pairs are excluded
  *      from the labeled-pair universe (pairs-completeness tradeoff, logged
  *      in the stage metrics, never silent);
  *   3. the pair self-join runs on the sub-bucketed key, so AQE's skew-join
  *      split sees bounded partitions.
  */
object Blocking {

  final case class Config(
      useSurfaceKey: Boolean = true,
      usePrefixKey: Boolean = true,
      useDomainKey: Boolean = false, // off by default: domain blocks are huge; enable with a tight cap
      useMinhashKey: Boolean = true,
      minhashHashes: Int = 8,
      minhashBandRows: Int = 2,
      maxBlock: Int = 512)

  /** Prefix key: first 4 chars of the first token + first 2 of the second —
    * invariant under the tail-of-word typo class that pair scoring is meant
    * to recover (edit distance 1-2 past position 2). */
  def prefixKey(norm: String): String = {
    val sp = norm.indexOf(' ')
    if (sp < 0) "p:" + norm.take(4)
    else "p:" + norm.take(math.min(4, sp)) + ":" + norm.substring(sp + 1).take(2)
  }

  /** Deterministic minhash over a token set. Hash family h_i(x) =
    * splitmix64(seed_i ^ token64); tokens hashed once, min per function. */
  def minhashSig(tokens: Seq[String], nHashes: Int): Array[Long] = {
    val sig = Array.fill(nHashes)(Long.MaxValue)
    tokens.foreach { t =>
      var th = 0x7A3C9B1DL
      var i = 0
      while (i < t.length) { th = graft.synth.Synth.splitmix64(th ^ t.charAt(i).toLong); i += 1 }
      var k = 0
      while (k < nHashes) {
        val h = graft.synth.Synth.splitmix64(th ^ (0xABCDEF01L * (k + 1)))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
    }
    sig
  }

  def bandKeys(tokens: Seq[String], nHashes: Int, bandRows: Int): Seq[String] = {
    if (tokens.isEmpty) return Nil
    val sig = minhashSig(tokens, nHashes)
    sig.grouped(bandRows).zipWithIndex.map { case (band, b) =>
      val h = band.foldLeft(0x13579BDFL)((a, v) => graft.synth.Synth.splitmix64(a ^ v))
      "m" + b + ":" + java.lang.Long.toHexString(h)
    }.toSeq
  }

  def keysFor(m: Mention, cfg: Config): Seq[String] = {
    val b = Seq.newBuilder[String]
    if (cfg.useSurfaceKey && m.norm_surface.nonEmpty) b += ("s:" + m.norm_surface)
    if (cfg.usePrefixKey && m.norm_surface.nonEmpty) b += prefixKey(m.norm_surface)
    if (cfg.useDomainKey) b += ("d:" + m.domain)
    if (cfg.useMinhashKey) b ++= bandKeys(m.context, cfg.minhashHashes, cfg.minhashBandRows)
    b.result().distinct
  }

  /** (key, id) exploded table — the blocking relation. */
  def keyed(mentions: Dataset[Mention], cfg: Config): DataFrame = {
    import mentions.sparkSession.implicits._
    mentions.flatMap(m => keysFor(m, cfg).map(k => (k, m.mention_id))).toDF("key", "id")
  }

  /** Candidate pairs (a < b), deduplicated across keys. Oversized blocks are
    * sub-bucketed deterministically before the self-join. */
  def candidatePairs(mentions: Dataset[Mention], cfg: Config = Config()): DataFrame = {
    val k = keyed(mentions, cfg)
    // bucket = hash(id) mod ceil(size / maxBlock); key#bucket for hot blocks.
    // Only the OVERSIZED keys (block_size > maxBlock) are joined back — the
    // skew tail, small in practice (worst case n_rows/maxBlock entries, so
    // still linear in an adversarial all-hot corpus: the broadcast() hint is
    // a pragmatic bet on real key distributions, and AQE would be the
    // fallback if a corpus ever breaks it); the full
    // one-row-per-distinct-key table would grow linearly with the corpus and
    // must never be broadcast.
    val hot = k.groupBy("key").agg(count("*").as("block_size"))
      .where(col("block_size") > cfg.maxBlock)
    val withBucket = k
      .join(broadcast(hot), Seq("key"), "left")
      .withColumn("nb",
        coalesce(ceil(col("block_size") / lit(cfg.maxBlock)).cast("int"), lit(1)))
      .withColumn(
        "bkey",
        when(col("nb") <= 1, col("key"))
          .otherwise(concat(col("key"), lit("#"),
            // salted by the block key: an unsalted hash(id) splits the same
            // pair identically in EVERY oversized block with equal nb,
            // losing it from the candidate universe even when another
            // shared key could recover it (round-5 review; same discipline
            // as Dedup.capBuckets)
            pmod(xxhash64(col("id"), col("key")), col("nb")))))
      .select(col("bkey"), col("id"))
    val a = withBucket.select(col("bkey"), col("id").as("a"))
    val b = withBucket.select(col("bkey"), col("id").as("b"))
    a.join(b, Seq("bkey"))
      .where(col("a") < col("b"))
      .select(col("a"), col("b"))
      .distinct()
  }

  /** (bkey, id, norm_surface, context, gold_entity) — the blocking relation
    * carrying scoring attributes, oversized blocks sub-bucketed. This is
    * the input of the fused scoring path (Scoring.scoreFused): one shuffle
    * co-partitions mentions by block key; everything downstream is
    * map-side. Only the OVERSIZED-key rows (block_size > maxBlock) are
    * broadcast back — the skew tail, small in practice (worst case
    * n_rows/maxBlock entries) — while every other key defaults to nb=1
    * map-side via the left join's null. Broadcasting the FULL
    * one-row-per-distinct-key table (as v1 did) grows linearly with
    * mention count and OOMs at web scale. */
  def keyedWithAttrs(mentions: Dataset[Mention], cfg: Config): DataFrame = {
    import mentions.sparkSession.implicits._
    // context tokens travel as SORTED 64-bit hashes: the pair-scale join is
    // memory-bandwidth bound, and hashes cut row bytes ~3x vs string
    // arrays (Jaccard over them via SortedLongJaccardExpr is exact modulo
    // 64-bit collisions)
    val k = mentions.flatMap { m =>
      val ctxHashes = m.context.map(graft.dedup.Dedup.hashString).toArray.sorted
      keysFor(m, cfg).map(key => (key, m.mention_id, m.norm_surface, ctxHashes, m.gold_entity))
    }.toDF("key", "id", "ns", "ctx", "gold")
    val hot = k.groupBy("key").agg(count("*").as("block_size"))
      .where(col("block_size") > cfg.maxBlock)
    k.join(broadcast(hot), Seq("key"), "left")
      .withColumn("nb",
        coalesce(ceil(col("block_size") / lit(cfg.maxBlock)).cast("int"), lit(1)))
      .withColumn(
        "bkey",
        when(col("nb") <= 1, col("key"))
          .otherwise(concat(col("key"), lit("#"),
            // salted by the block key: an unsalted hash(id) splits the same
            // pair identically in EVERY oversized block with equal nb,
            // losing it from the candidate universe even when another
            // shared key could recover it (round-5 review; same discipline
            // as Dedup.capBuckets)
            pmod(xxhash64(col("id"), col("key")), col("nb")))))
      .select(col("bkey"), col("id"), col("ns"), col("ctx"), col("gold"))
  }

  /** Block-size profile — the metrics surface for the skew invariant
    * (max block size after bucketing must be <= maxBlock).
    *
    * Integer-exact by construction (DuckDB-gated): p99 is the DISCRETE
    * 99th percentile — the smallest block size s such that >= ceil(0.99 *
    * n_blocks) blocks are <= s — computed over the tiny distinct-size
    * histogram (cardinality <= number of distinct block sizes) with a
    * bounded non-equi self-join, NOT a partition-less global window and
    * NOT percentile_approx (whose sketch boundaries no other engine
    * reproduces). */
  def blockProfile(mentions: Dataset[Mention], cfg: Config = Config()): DataFrame = {
    // ONE pass over the corpus-scale keyed relation: block sizes → the
    // distinct-size histogram, materialized once (lazy localCheckpoint)
    // so the downstream branches (totals, the cumulative self-join, p99)
    // reuse it. Without this the executed plan showed zero ReusedExchange
    // — the keying + groupBy chain (the only corpus-scale stage) ran once
    // per branch. The histogram is bounded by sqrt(2 * n_mentions)
    // distinct sizes — tiny at any corpus scale. localCheckpoint, not
    // persist(): checkpointed RDD blocks are reclaimed by the
    // ContextCleaner when the plan becomes unreachable, whereas a
    // cacheManager persist would pin one session-lifetime entry per
    // distinct (mentions, cfg) input with no release point in this
    // single-expression API.
    val g = keyed(mentions, cfg)
      .groupBy("key")
      .agg(count("*").as("block_size"))
      .groupBy("block_size")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val tot = g.agg(
      coalesce(sum(col("c")), lit(0L)).as("n_blocks"),
      max(col("block_size")).as("max_block"),
      sum(expr("block_size * (block_size - 1) div 2 * c")).as("naive_pairs"))
    val cum = g.as("g1")
      .join(g.as("g2"), col("g2.block_size") <= col("g1.block_size"))
      .groupBy(col("g1.block_size").as("bs"))
      .agg(sum(col("g2.c")).as("cc"))
    val p99 = cum.crossJoin(broadcast(tot.select(col("n_blocks").as("nb"))))
      .where(col("cc") >= expr("(99 * nb + 99) div 100"))
      .agg(min(col("bs")).as("p99_block"))
    tot.crossJoin(broadcast(p99))
      .select(col("n_blocks"), col("max_block"), col("p99_block"), col("naive_pairs"))
  }
}
