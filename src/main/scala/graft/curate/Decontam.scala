package graft.curate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination + corpus-level n-gram duplication metrics —
  * the two n-gram-overlap operators a training-data pipeline runs after
  * document-level dedup (GPT-3 appendix C / The Pile / RefinedWeb
  * practice, implemented from the published descriptions):
  *
  *   - [[decontaminate]]: flag training documents sharing any token
  *     n-gram with an evaluation/benchmark document set, so benchmark
  *     text cannot leak into training data.
  *   - [[dupNgramStats]]: per-document count of token n-grams that also
  *     occur in ANOTHER document — the inter-document duplication
  *     fraction used to tune fuzzy-dedup thresholds.
  *
  * Both compare grams as exact STRINGS, never pre-hashed: hashing is a
  * deployment-side optimization that can only introduce false-positive
  * collisions, so the semantic contract (and the DuckDB oracle) is
  * defined on the grams themselves.
  *
  * Scale shape: the gram explode is map-side (token volume, no shuffle);
  * decontamination joins it against the DISTINCT eval gram set (eval
  * sets are tiny next to a training corpus — AQE broadcasts the
  * aggregated side from runtime stats; no forced broadcast, since here
  * the eval slice is corpus-derived), and the duplication metric is one
  * gram-hash shuffle (partial map-side aggregation) followed by an
  * id-scale rollup. Nothing touches a pair space.
  */
object Decontam {

  /** Token n-grams of a space-tokenized text column as strings
    * (space-rejoined). Documents shorter than `n` tokens contribute no
    * grams. The CASE guard matters: Spark's `sequence(a, b)` DESCENDS
    * when a > b, so an unguarded `sequence(0, size - n)` on a short doc
    * would fabricate grams from negative slice indices instead of
    * yielding an empty list. */
  def tokenNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    val toks = split(text, " ")
    when(size(toks) < n, expr("CAST(array() AS array<string>)"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - lit(n)),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
  }

  /** One row per (doc, distinct gram): the relation both operators
    * consume. Per-doc dedup is MAP-SIDE (array_distinct before the
    * explode) — the former post-explode dropDuplicates("doc_id","gram")
    * was a full token-volume shuffle for a purely doc-local property
    * (round-7: one corpus-scale Exchange removed from every consumer;
    * identical rows, since distinct-within-doc is exactly what the
    * (doc_id, gram) dedup computed). */
  private[graft] def docGrams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("doc_id"),
      explode(array_distinct(tokenNgrams(col(textCol), n))).as("gram"))

  /** Per-TRAINING-document contamination against an eval document set:
    * (doc_id, n_hit_grams, contaminated) where n_hit_grams counts the
    * doc's distinct n-grams that occur anywhere in the eval set. Only
    * training (non-eval) documents are emitted — the eval set is the
    * reference, not a curation target. `isEval` must be a deterministic
    * predicate over `df`'s columns (the catalog uses doc_id % 20 = 7 as
    * its synthetic benchmark slice). */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 8): DataFrame = {
    val tagged = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      isEval.as("is_eval"))
    // per-doc distinct grams MAP-SIDE (the docGrams rule: array_distinct
    // before the explode — no token-volume dedup shuffle); is_eval rides
    // the explode (functionally dependent on doc_id)
    val grams = tagged.select(col("doc_id"), col("is_eval"),
      explode(array_distinct(tokenNgrams(col("text"), n))).as("gram"))
    val evalGrams = grams.where(col("is_eval")).select("gram").distinct()
    // left_semi ≡ the former inner join against the DISTINCT eval gram
    // set (multiplicity 1), minus the join-output materialization; the
    // aggregated eval side is broadcast by AQE from runtime stats (eval
    // sets ≪ training corpus — the documented premise)
    val hits = grams.where(!col("is_eval"))
      .join(evalGrams, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit_grams"))
    tagged.where(!col("is_eval")).select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hit_grams"), lit(0L)).as("n_hit_grams"),
        (coalesce(col("n_hit_grams"), lit(0L)) > 0).as("contaminated"))
  }

  /** Per-document inter-document n-gram duplication:
    * (doc_id, n_grams, n_dup_grams) over DISTINCT grams per doc, where a
    * gram is "dup" when it occurs in at least one OTHER document
    * (occurrences inside the same doc don't count — that is
    * intra-document repetition, the Gopher counters' job). Callers
    * derive the duplicate fraction n_dup_grams / n_grams; docs shorter
    * than `n` tokens emit (0, 0). */
  def dupNgramStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, preHash: Boolean = false): DataFrame = {
    if (preHash)
      return dupNgramStatsPreHashed(df, idCol, textCol, n)
    val grams = docGrams(df, idCol, textCol, n)
    // gram frequency across docs = distinct-doc count per gram (the
    // docGrams dedup makes count(*) exactly that); map-side partial agg,
    // one gram-hash shuffle
    val freq = grams.groupBy("gram").agg(count(lit(1)).as("gf"))
    statsOver(df.select(col(idCol).as("doc_id")), grams, freq)
  }

  /** `preHash = true` (round-6 verdict item 8): the frequency shuffle
    * carries xxhash64 KEYS instead of raw gram strings (~8 bytes vs
    * ~50+ on long grams), and exactness is restored by a STRING
    * verification pass over just the collision-candidate keys (hash
    * keys seen >= 2 times — a gram is dup iff its STRING count is
    * >= 2, so a cross-gram hash collision can never flip a verdict:
    * candidates are verified per (hash, gram), and a doc's dup grams
    * are counted through a semi-join on the verified dup set, which is
    * duplication-scale and broadcast by AQE). Output is bit-identical
    * to the string-keyed path; opt-in because the win is shuffle BYTES
    * (a deployment-scale concern the toy bench cannot see — the
    * GramHashProbe tool reports the measured ratio). */
  private def dupNgramStatsPreHashed(df: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val grams = docGrams(df, idCol, textCol, n)
    val hashed = grams.select(col("doc_id"), col("gram"),
      xxhash64(col("gram")).as("gh"))
    // hash-only frequency shuffle: 8-byte keys, no strings
    val cand = hashed.groupBy("gh").agg(count(lit(1)).as("ghf"))
      .where(col("ghf") > 1).select("gh")
    // the candidate semi MUST be an explicit broadcast: left to the
    // planner, the big side's shuffle-map output (every gram string) is
    // written before AQE can convert the join, defeating the option's
    // whole point (measured: the hash path shuffled MORE than the
    // string path). The broadcast is guarded by an exact count — a
    // duplication-heavy corpus (many repeated keys) falls back to the
    // string-keyed path, where it belongs anyway: its verification pass
    // would be corpus-scale
    val nCand = cand.count()
    if (nCand > 10000000L) {
      System.err.println(
        s"[graft.curate.Decontam] preHash: $nCand candidate keys exceed the " +
          "broadcast budget (duplication-heavy corpus) — using the " +
          "string-keyed path")
      return dupNgramStats(df, idCol, textCol, n, preHash = false)
    }
    val candRows = hashed.join(broadcast(cand), Seq("gh"), "left_semi")
    // string verification: a key is a TRUE dup gram iff one string
    // under it repeats (a cross-gram collision never flips a verdict)
    val verifiedDup = candRows
      .groupBy("gh", "gram").agg(count(lit(1)).as("gf"))
      .where(col("gf") > 1)
      .select("gh", "gram")
    val perDoc = candRows
      .join(verifiedDup, Seq("gh", "gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_dup_grams"))
    // n_grams is doc-local (distinct grams per doc) — no shuffle at all
    val totals = df.select(col(idCol).as("doc_id"),
      size(array_distinct(tokenNgrams(col(textCol), n))).cast("bigint").as("n_grams"))
    totals.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
  }

  /** The (doc_id, n_grams, n_dup_grams) rollup shared by the one-shot
    * query and the index bootstrap — ONE copy of the dup rule, so the
    * two can never drift apart silently. */
  private def statsOver(ids: DataFrame, grams: DataFrame,
      freq: DataFrame): DataFrame = {
    val perDoc = grams.join(freq, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("gf") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    ids.join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
  }

  // ---------- incremental maintenance ----------------------------------------

  /** The standing state behind [[dupNgramStatsIncremental]] — the
    * maintenance-family shape (Dedup.SurvivorIndex discipline: persist
    * all frames, parameters carried so drifted folds fail loudly):
    *   - `grams` (doc_id, gram): the distinct doc-gram relation at rest
    *     (token-volume; at deployment stored partitioned by gram so a
    *     fold's flipped-gram semi-join is a pruned read);
    *   - `freq` (gram, gf): distinct-doc count per gram;
    *   - `stats` (doc_id, n_grams, n_dup_grams): the standing answer.
    * Dup status is MONOTONE — gram frequencies only grow as the corpus
    * appends, so a fold only ever flips grams from unique to dup, never
    * back. That monotonicity is what makes the fold batch-scale: only
    * grams the batch touches can change anything. */
  final case class DupNgramIndex(
      grams: DataFrame,
      freq: DataFrame,
      stats: DataFrame,
      n: Int) {
    /** Every frame a caller should persist/unpersist as a unit. */
    def frames: Seq[DataFrame] = Seq(grams, freq, stats)
  }

  /** Bootstrap the standing n-gram duplication index (one-time; every
    * later increment goes through [[dupNgramStatsIncremental]]). */
  def buildDupNgramIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, cache: DataFrame => DataFrame = identity): DupNgramIndex = {
    val grams = cache(docGrams(df, idCol, textCol, n))
    val freq = cache(grams.groupBy("gram").agg(count(lit(1)).as("gf")))
    val stats = cache(statsOver(df.select(col(idCol).as("doc_id")), grams, freq))
    DupNgramIndex(grams, freq, stats, n)
  }

  /** Fold a batch of NEW documents into the standing index and return
    * the refreshed (doc_id, n_grams, n_dup_grams) table over the union —
    * equal to [[dupNgramStats]] over the union exactly, without
    * re-counting the standing corpus:
    *   - batch grams (batch-scale) join the TOUCHED union frequencies
    *     (standing gf + batch delta — no corpus re-count);
    *   - a standing doc's stats change ONLY when one of its unique grams
    *     (standing gf = 1) gains a batch occurrence — the flipped-gram
    *     set is batch-derived, so the standing holders are reached
    *     through a broadcast semi-join (a pruned partition read when
    *     `grams` is stored gram-partitioned; batch ≪ corpus premise).
    * Like the survivor folds, the full table is re-emitted (output
    * contract: one row per doc); at 10^12 docs partition the rewrite by
    * touched ranges. */
  def dupNgramStatsIncremental(idx: DupNgramIndex, batch: DataFrame,
      idCol: String, textCol: String): DataFrame =
    dupNgramStatsIncrementalFrom(idx, batch.select(col(idCol).as("doc_id")),
      docGrams(batch, idCol, textCol, idx.n).localCheckpoint(true))

  /** The fold body over an ALREADY-materialized batch gram relation —
    * shared with [[foldDupNgramIndex]] so a streaming commit pays the
    * gram explode once, not once per state part. `bGrams` must be the
    * checkpointed/persisted `docGrams` of the batch. */
  private def dupNgramStatsIncrementalFrom(idx: DupNgramIndex,
      bIds: DataFrame, bGrams: DataFrame): DataFrame =
    dupNgramStatsIncrementalPieces(idx, bIds, bGrams)._1

  /** (full refreshed stats, CHANGED stats rows): a standing doc's row
    * changes ONLY when it holds a flipped gram (inc > 0) — the changed
    * set is therefore batch-scale (batch rows + flip holders), the
    * relation a touched-range state writer persists per fold (round-7). */
  private def dupNgramStatsIncrementalPieces(idx: DupNgramIndex,
      bIds: DataFrame, bGrams: DataFrame): (DataFrame, DataFrame) = {
    val delta = bGrams.groupBy("gram").agg(count(lit(1)).as("dgf"))
    // touched grams' union freq; localCheckpoint: feeds batch stats +
    // the flip detection
    val touched = delta.join(idx.freq, Seq("gram"), "left")
      .select(col("gram"),
        (coalesce(col("gf"), lit(0L)) + col("dgf")).as("ugf"),
        coalesce(col("gf"), lit(0L)).as("sgf"))
      .localCheckpoint(true)
    val bStats = bGrams.join(touched, Seq("gram"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("ugf") > 1, 1L).otherwise(0L)).as("n_dup_grams"))
    val bAll = bIds
      .join(bStats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams"))
    // unique standing grams the batch just made dup: their (single)
    // standing holders gain one dup gram each
    val flips = touched.where(col("sgf") === 1 && col("ugf") > 1)
      .select("gram")
    val holders = idx.grams.join(broadcast(flips), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("inc"))
    val sStats = idx.stats.join(holders, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        (col("n_dup_grams") + coalesce(col("inc"), lit(0L))).as("n_dup_grams"))
    // changed standing rows = exactly the flip holders (inner join —
    // every other standing row is bit-unchanged by monotonicity)
    val sChanged = idx.stats.join(holders, Seq("doc_id"))
      .select(col("doc_id"), col("n_grams"),
        (col("n_dup_grams") + col("inc")).as("n_dup_grams"))
    (sStats.unionByName(bAll), sChanged.unionByName(bAll))
  }

  /** Span-level decontamination (the GPT-3-appendix removal unit: cut
    * the overlapping window, keep the rest of the document): per
    * TRAINING doc, the maximal merged token spans covered by grams that
    * occur in the eval set. A hit at gram position p covers tokens
    * [p, p+n-1]; two hit windows merge when they overlap OR touch
    * (next start ≤ prev start + n), so emitted spans are disjoint with
    * at least one clean token between them. Output
    * (doc_id, span_start, span_end), token indices 0-based inclusive;
    * clean docs emit no rows.
    *
    * Scale shape: the position explode is map-side; hit volume is
    * contamination-scale; the island merge runs in a window PARTITIONED
    * BY doc (bounded by per-doc gram count, never corpus-wide). */
  def contaminatedSpans(df: DataFrame, idCol: String, textCol: String,
      isEval: Column, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tagged = df.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      isEval.as("is_eval"))
    // posexplode emits (pos, col); only the value column needs a rename
    val grams = tagged.select(col("doc_id"), col("is_eval"),
      posexplode(tokenNgrams(col("text"), n)))
      .withColumnRenamed("col", "gram")
    val evalGrams = grams.where(col("is_eval")).select("gram").distinct()
    // left_semi ≡ inner against the DISTINCT eval set (decontaminate's
    // argument); keeps the position rows single-sided
    val hits = grams.where(!col("is_eval")).join(evalGrams, Seq("gram"), "left_semi")
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    hits
      // first row per doc: lag is NULL → condition NULL → otherwise(0),
      // the same three-valued arithmetic the DuckDB replay evaluates
      .withColumn("brk",
        when(col("pos") > lag(col("pos"), 1).over(w) + lit(n.toLong), lit(1L))
          .otherwise(lit(0L)))
      .withColumn("grp", sum(col("brk"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "grp")
      .agg(min("pos").as("span_start"),
        (max("pos") + lit(n.toLong - 1)).as("span_end"))
      .select("doc_id", "span_start", "span_end")
  }

  /** [[foldDupNgramIndex]]'s result plus the two BATCH-SCALE relations a
    * delta state writer persists instead of the corpus-scale rewrites:
    * `batchGrams` (the grams the fold appends — the grams relation is
    * append-only) and `changedStats` (batch rows + flip holders — every
    * other stats row is unchanged by monotonicity). */
  final case class DupNgramFold(
      index: DupNgramIndex, batchGrams: DataFrame, changedStats: DataFrame)

  /** The refreshed index AFTER folding `batch` — what a streaming sink
    * persists as the next version: grams unioned, frequencies merged
    * from the batch delta (touched grams only change), stats = the
    * incremental fold's output. */
  def foldDupNgramIndex(idx: DupNgramIndex, batch: DataFrame,
      idCol: String, textCol: String): DupNgramIndex =
    foldDupNgramIndexDelta(idx, batch, idCol, textCol).index

  /** The fold with its delta relations exposed (round-7 state-at-rest
    * shape). */
  def foldDupNgramIndexDelta(idx: DupNgramIndex, batch: DataFrame,
      idCol: String, textCol: String): DupNgramFold = {
    // ONE gram explode per fold: the checkpointed relation feeds all
    // three refreshed parts (grams union, freq merge, stats fold)
    val bGrams = docGrams(batch, idCol, textCol, idx.n).localCheckpoint(true)
    val freq2 = idx.freq
      .join(bGrams.groupBy("gram").agg(count(lit(1)).as("dgf")),
        Seq("gram"), "full_outer")
      .select(col("gram"),
        (coalesce(col("gf"), lit(0L)) + coalesce(col("dgf"), lit(0L))).as("gf"))
    val (full, changed) = dupNgramStatsIncrementalPieces(idx,
      batch.select(col(idCol).as("doc_id")), bGrams)
    DupNgramFold(
      DupNgramIndex(idx.grams.unionByName(bGrams), freq2, full, idx.n),
      bGrams, changed)
  }
}
