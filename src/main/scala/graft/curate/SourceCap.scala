package graft.curate

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.synth.Synth

/** Per-source document caps — the C4/Gopher/RefinedWeb-style curation rule
  * "keep at most N documents per domain", with `source` playing the domain
  * role. Membership is deterministic: documents are ranked inside each
  * source by the unsigned order of `splitmix64(doc_id)` (a bijection on
  * Long, so ranks are total and tie-free for distinct ids) and the N
  * smallest are kept. Reranking by hash rather than position makes the
  * kept set stable under re-crawls that merely reorder or append rows.
  *
  * Scale shape: the obvious plan — `row_number() OVER (PARTITION BY
  * source ORDER BY hash)` — externally sorts every document of every
  * source and straggles on mega-domains. This instead computes only the
  * per-source *threshold* (the N-th smallest hash) with bounded state:
  * a per-partition fold keeps the N smallest (hash, id) pairs per source
  * seen in that partition (≤ N entries per (partition, source) — the
  * hand-written map-side partial combine), a source-cardinality shuffle
  * merges the ≤ partitions×N survivors per source, and a join tags every
  * document `kept = hash ≤ threshold`. No document-scale sort, no window,
  * shuffle volume ∝ distinct sources. The threshold join carries NO
  * broadcast hint (the audit rule for corpus-derived tables: source
  * cardinality grows with the corpus): AQE broadcasts it from runtime
  * stats while it fits and falls back to a source-scale hash join beyond
  * that — never a document-scale sort either way.
  *
  * The same partials also power the streaming twin
  * ([[graft.streaming.Streaming.streamingSourceCap]]): the current
  * top-N-per-source (id, source, h) table IS the bounded maintenance
  * state — an evicted document can never re-enter (hashes only get
  * smaller), so folding each micro-batch's partials into the standing
  * state reproduces the batch result exactly. */
object SourceCap extends Serializable {

  /** Sign-flipped splitmix64, so SIGNED Long comparisons give the
    * UNSIGNED order of the raw hash — the order the DuckDB oracle's
    * HUGEINT replay uses. */
  private[graft] def capKey(id: Long): Long =
    Synth.splitmix64(id) ^ Long.MinValue

  private val capKeyUdf = udf(capKey _)

  /** (id, source, h) projection of a document table — the input shape of
    * the partial fold and the streaming state. */
  private[graft] def keyed(
      docs: DataFrame, idCol: String, srcCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("id"),
      col(srcCol).as("source"),
      capKeyUdf(col(idCol).cast("long")).as("h"))

  /** (id, source, kept) for every input row; at most `n` kept per source
    * (all of them when a source has ≤ n documents). */
  def sourceCap(
      docs: DataFrame,
      n: Int,
      idCol: String = "doc_id",
      srcCol: String = "source"): DataFrame = {
    require(n > 0, s"cap must be positive, got $n")
    val spark = docs.sparkSession
    import spark.implicits._

    val k = keyed(docs, idCol, srcCol)
    // merge the ≤ partitions×n survivors per source; threshold = n-th
    // smallest overall (= max survivor when the source has ≤ n docs).
    // dropDuplicates: a document delivered twice (re-crawl!) must count
    // ONCE against the cap — h is a bijection of id, so (source, h)
    // identifies the document; the relation is tiny (≤ partitions×n per
    // source), never document-scale
    val thresholds = partialKeep(k, n)
      .dropDuplicates("source", "h")
      .groupBy($"source")
      .agg(array_sort(collect_list($"h")).as("hs"))
      .select(
        $"source",
        element_at($"hs", least(lit(n), size($"hs"))).as("thr"))

    // null-safe equality: a NULL source is one group (matching the
    // groupBy above and SQL PARTITION BY semantics) — a plain equi-join
    // would silently drop every NULL-source row from the output
    k.join(thresholds, k("source") <=> thresholds("source"))
      .select(
        k("id").as(idCol),
        k("source").as(srcCol),
        (k("h") <= thresholds("thr")).as("kept"))
  }

  /** Phase 1: the bounded partial combine — the n smallest (h, id) pairs
    * per source per partition, as an (id, source, h) frame
    * (`private[graft]` so the spec can assert its output is
    * ≤ partitions × n rows per source). */
  private[graft] def partialKeep(keyed: DataFrame, n: Int): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed
      .select($"source", $"h", $"id").as[(String, Long, Long)]
      .mapPartitions { it =>
        val hs = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        val ids = scala.collection.mutable.HashMap.empty[String, Array[Long]]
        val len = scala.collection.mutable.HashMap.empty[String, Int]
        it.foreach { case (src, h, id) =>
          val ha = hs.getOrElseUpdate(src, Array.fill(n)(Long.MaxValue))
          val ia = ids.getOrElseUpdate(src, Array.fill(n)(0L))
          val m = len.getOrElse(src, 0)
          // in-fold dedup: h is a bijection of id, so an equal h among the
          // held slots is the SAME (source, id) row re-delivered (re-crawl)
          // — without this it would occupy a second top-n slot, evicting a
          // legitimate keeper, and the merged threshold could land on the
          // (n+1)-th hash (over-keep). A previously EVICTED duplicate can
          // never re-enter either: eviction means n hashes < h are held,
          // so the replace test below already rejects it. O(n) scan, same
          // cost as the worst-slot scan.
          var dup = false
          var j = 0
          while (j < m && !dup) { if (ha(j) == h) dup = true; j += 1 }
          if (!dup) {
            if (m < n) { ha(m) = h; ia(m) = id; len(src) = m + 1 }
            else {
              // replace the current worst if h beats it (n is small; O(n) scan)
              var worst = 0; var i = 1
              while (i < n) { if (ha(i) > ha(worst)) worst = i; i += 1 }
              if (h < ha(worst)) { ha(worst) = h; ia(worst) = id }
            }
          }
        }
        hs.keysIterator.toArray.iterator.flatMap { src =>
          val m = len(src); val ha = hs(src); val ia = ids(src)
          (0 until m).iterator.map(i => (src, ha(i), ia(i)))
        }
      }
      .toDF("source", "h", "id")
      .select(col("id"), col("source"), col("h"))
  }

  /** Exact global top-n per source over a SMALL (id, source, h) relation
    * (merged partials or streaming state — ≤ waves×partitions×n rows per
    * source, never document-scale). Tie-free by the splitmix bijection;
    * (h, id) ordering pins determinism even against duplicated ids. */
  private[graft] def topNPerSource(rows: DataFrame, n: Int): DataFrame =
    // a re-delivered document (same (source, id) row arriving again in a
    // later streaming batch) must not fill a second cap slot and evict a
    // legitimate keeper — dedup before ranking (tiny relation)
    rows.dropDuplicates("source", "id")
      .groupBy(col("source"))
      .agg(slice(array_sort(collect_list(struct(col("h"), col("id")))), 1, n).as("top"))
      .select(col("source"), explode(col("top")).as("t"))
      .select(col("t.id").as("id"), col("source"), col("t.h").as("h"))
}
