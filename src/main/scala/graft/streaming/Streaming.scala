package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{Mention, Page}

/** Structured Streaming extensions (SURVEY §1.3: the reference is pure
  * batch; incremental ingest of new WARC/page partitions is the natural
  * web-scale extension).
  *
  *   - pageMentionStream: readStream over the pages table → the same
  *     narrow extraction flatMap as the batch path (identical semantics,
  *     one code path — Mentions.fromPages works on streaming Datasets
  *     because it is a pure flatMap).
  *   - eventWindowCounts: watermarked sliding-window aggregation over the
  *     events table (late data dropped after the watermark).
  */
object Streaming {

  val pageSchema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("warc_ts", TimestampType),
    StructField("html", BinaryType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  /** Streaming mention extraction over a parquet directory of pages. */
  def pageMentionStream(spark: SparkSession, pagesDir: String): DataFrame = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(pageSchema)
      .option("maxFilesPerTrigger", "4")
      .parquet(pagesDir)
      .as[Page]
    graft.er.Mentions.fromPages(pages).toDF()
  }

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  /** Watermarked tumbling-window counts per event type. */
  def eventWindowCounts(spark: SparkSession, eventsDir: String): DataFrame = {
    spark.readStream
      .schema(eventSchema)
      .parquet(eventsDir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"), col("event_type"), col("n"), col("total"))
  }

  final case class DedupDecision(
      content_hash: String, doc_id: Long, is_first: Boolean, seen_count: Long, survivor_id: Long)

  /** Streaming EXACT DEDUP with custom state (flatMapGroupsWithState):
    * each content hash keeps (survivor doc id, seen count) in the state
    * store; every arriving doc emits a decision row — `is_first` marks
    * the canonical survivor, duplicates carry the running count and the
    * survivor id. The streaming twin of Dedup.exactGroups: keys partition
    * the state across executors, so state scales with distinct hashes.
    * Survivor semantics: the MIN doc id of the FIRST micro-batch in which
    * the hash appears (rows within a batch carry no order guarantee, so
    * they are sorted by id for determinism — matching exactGroups'
    * keep-min rule batch-locally); later batches are duplicates by
    * definition of event order. */
  def streamingExactDedup(docs: org.apache.spark.sql.Dataset[(String, Long)]): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    docs
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        (hash: String, rows: Iterator[(String, Long)], state: GroupState[(Long, Long)]) => {
          var (survivorId, count) = state.getOption.getOrElse((Long.MaxValue, 0L))
          val out = Seq.newBuilder[DedupDecision]
          rows.toSeq.sortBy(_._2).foreach { case (_, docId) =>
            count += 1
            val isFirst = count == 1L
            if (isFirst) survivorId = docId
            out += DedupDecision(hash, docId, isFirst, count, survivorId)
          }
          state.update((survivorId, count))
          out.result().iterator
        })
      .toDF()
  }

  /** Streaming NEAR-DUP candidate pairs — the stateful twin of
    * Dedup.minhashPairs: each doc's minhash signature is banded
    * (graft.dedup.Dedup.minhash over char shingles, same hash family as
    * the batch path), the stream is keyed by band bucket, and each bucket
    * keeps its most recent `maxPerBucket` (id, signature) rows in the
    * state store. An arriving doc is verified (full-signature agreement
    * ratio, the batch path's unbiased Jaccard estimate) against the
    * bucket's state — so near-dups are found ACROSS micro-batches, not
    * just within one.
    *
    * Scale shape: state is bounded along BOTH axes — per bucket
    * (`maxPerBucket` FIFO recency window, the standard streaming tradeoff
    * vs the batch tier's full history) and across buckets (buckets idle
    * for `idleBucketTtl` processing time are expired from the state
    * store: mostly-unique text mints ~nBands fresh buckets per doc, so
    * without a TTL total state would grow linearly with every doc ever
    * seen). Buckets partition the state across executors. A pair sharing
    * several bands is emitted once per agreeing band — downstream
    * consumers drop duplicates (keeping the emission unique inside the
    * operator would need cross-bucket state).
    *
    * Output: (id_a, id_b, est_jaccard) with id_a < id_b. */
  def streamingMinhashPairs(
      docs: org.apache.spark.sql.Dataset[(Long, String)],
      shingleK: Int = 5,
      nHashes: Int = 64,
      rowsPerBand: Int = 8,
      minJaccard: Double = 0.5,
      maxPerBucket: Int = 64,
      idleBucketTtl: String = "30 minutes"): DataFrame = {
    import docs.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import graft.dedup.Dedup
    val nBands = nHashes / rowsPerBand
    val banded = docs.flatMap { case (id, text) =>
      val sig = Dedup.minhash(Dedup.charShingles(text, shingleK), nHashes)
      (0 until nBands).map { b =>
        val band = java.util.Arrays.copyOfRange(sig, b * rowsPerBand, (b + 1) * rowsPerBand)
        val h = band.foldLeft(0x13579BDFL)((a, v) => graft.synth.Synth.splitmix64(a ^ v))
        (b + ":" + java.lang.Long.toHexString(h), id, sig)
      }
    }
    // idleBucketTtl = "" disables the processing-time timeout: a pending
    // 30-minute timeout keeps the query's trigger loop alive, which makes
    // bounded test harnesses built on processAllAvailable() wait on it —
    // production streams should keep the TTL, or total state grows with
    // every doc ever seen
    val timeoutConf =
      if (idleBucketTtl.isEmpty) GroupStateTimeout.NoTimeout()
      else GroupStateTimeout.ProcessingTimeTimeout()
    banded
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: String, rows: Iterator[(String, Long, Array[Long])],
         state: GroupState[List[(Long, Array[Long])]]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var pool = state.getOption.getOrElse(Nil)
            val out = Seq.newBuilder[(Long, Long, Double)]
            // batch-local determinism: process in ascending id order
            rows.toSeq.sortBy(_._2).foreach { case (_, id, sig) =>
              if (!pool.exists(_._1 == id)) {
                pool.foreach { case (oid, osig) =>
                  var agree = 0
                  var i = 0
                  while (i < sig.length) { if (sig(i) == osig(i)) agree += 1; i += 1 }
                  val est = agree.toDouble / sig.length
                  if (est >= minJaccard) {
                    out += (if (id < oid) (id, oid, est) else (oid, id, est))
                  }
                }
                pool = ((id, sig) :: pool).take(maxPerBucket) // FIFO recency window
              }
            }
            state.update(pool)
            if (idleBucketTtl.nonEmpty) state.setTimeoutDuration(idleBucketTtl)
            out.result().iterator
          }
        })
      .toDF("id_a", "id_b", "est_jaccard")
  }

  val counterRowSchema: StructType = StructType(Seq(
    StructField("mode", StringType),
    StructField("category", StringType),
    StructField("tp", LongType),
    StructField("fp", LongType),
    StructField("fn", LongType)))

  /** Streaming evaluation counters: the batch eval pipeline's per-case
    * counter rows (mode, category, tp, fp, fn — the same relation the
    * aux_*_counter_rows dumps carry) aggregated INCREMENTALLY as linked
    * articles stream in. Running totals per (mode, category) in update
    * mode — the streaming twin of the A9 counter aggregation, so a
    * dashboard can watch P/R/F1 converge while a corpus-scale linking
    * run is still in flight. State is one row per (mode, category):
    * bounded by the category vocabulary, independent of corpus size. */
  def streamingEvalCounts(counterRows: DataFrame): DataFrame =
    counterRows
      .groupBy(col("mode"), col("category"))
      .agg(sum(col("tp")).as("tp"), sum(col("fp")).as("fp"), sum(col("fn")).as("fn"))
}
