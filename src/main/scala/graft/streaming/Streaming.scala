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

  /** Streaming CLUSTER MAINTENANCE — the streaming twin of G7
    * ([[graft.er.Clustering.incrementalClusters]]): match edges stream in
    * (e.g. from [[streamingMinhashPairs]] or a streaming scorer) and every
    * micro-batch is folded into a standing (id, cluster) assignment kept
    * as Parquet state-at-rest under `stateDir`.
    *
    * Why foreachBatch and not the state store: connected components is a
    * global fixpoint, not a per-key fold — `mapGroupsWithState` cannot
    * express a merge that spans keys, so the engine-sanctioned shape is a
    * micro-batch sink that runs the batch-scale contracted CC and
    * rewrites the assignment via incrementalClusters' two narrow passes.
    *
    * Exactness and recovery:
    *   - After every batch the standing assignment equals batch CC over
    *     ALL edges seen so far (induction over incrementalClusters'
    *     min-label proof; StreamingSpec checks two-wave == batch).
    *   - Versions are keyed by Structured Streaming's `batchId`, so a
    *     replayed batch (crash between sink commit and offset-log commit)
    *     is detected via the `_LATEST` pointer and skipped — the fold is
    *     also idempotent by CC semantics (already-merged edges collapse to
    *     self-loops), so even a missed skip cannot corrupt state.
    *   - `_LATEST` is temp-file + rename (same protocol as the CC round
    *     manifests); a crash before the pointer delete leaves `_LATEST` on
    *     the previous version (which is why that dir is retained and only
    *     OLDER ones are pruned), and a crash between the delete and the
    *     rename is recovered by readLatest's fallback scan over the
    *     per-version `_GRAFT_COMMITTED` markers — no crash window loses
    *     state (StreamingSpec "recovers from a missing _LATEST pointer").
    *
    * Scale shape: per micro-batch cost = batch-scale CC + one narrow read
    * + one narrow write of the node-scale assignment (the broadcast-probe
    * relabel — no wide exchange at assignment scale, see PlanAuditSpec).
    * The full rewrite per batch is the compaction tradeoff: at 10^12
    * nodes, amortize by lengthening the trigger interval, or partition the
    * assignment by id range and rewrite only touched ranges (the standard
    * refinement; not needed at this catalog's scale). */
  def streamingClusters(
      edges: DataFrame,
      stateDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldClusterBatch(batch.toDF(), stateDir, batchId))
      .start()

  /** Versioned Parquet state-at-rest shared by the streaming maintenance
    * sinks (cluster and source-cap folds): batchId-keyed version dirs, an
    * atomic `_LATEST` pointer (temp file + rename, the CC-manifest
    * protocol), previous version retained as the recovery target for a
    * crash before the pointer rename, older versions pruned. One
    * implementation so the commit protocol cannot drift between sinks. */
  private[graft] final class VersionedState(spark: SparkSession, stateDir: String) {
    import org.apache.hadoop.fs.Path
    private val fs =
      new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    private val root = fs.makeQualified(new Path(stateDir))
    private val latestPath = new Path(root, "_LATEST")

    def versionPath(v: Long): String = new Path(root, f"v_$v%012d").toString

    /** Per-version commit marker, written AFTER the Parquet version lands
      * and BEFORE the pointer swap: a version dir without it is an
      * in-flight write and never a recovery target. Underscore-prefixed so
      * Spark's file index skips it (the CC `_MANIFEST` rule). Our own
      * marker, not Spark's `_SUCCESS` — that one is config-dependent
      * (mapreduce …marksuccessfuljobs) and lands mid-commit. */
    private def markerPath(v: Long) = new Path(new Path(versionPath(v)), "_GRAFT_COMMITTED")

    def readLatest(): Option[Long] = {
      val viaPointer =
        try {
          val in = fs.open(latestPath)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          Some(txt.trim.toLong)
        } catch { case _: Exception => None }
      // No pointer: either a fresh dir (no versions → None) or a crash
      // landed between the pointer delete and the rename in commit() —
      // fall back to the newest COMPLETE (marker-carrying) version instead
      // of silently restarting from empty state, which would make the next
      // fold treat its batch as the first one and prune every retained
      // version (total state loss).
      viaPointer.orElse {
        try {
          if (!fs.exists(root)) None
          else {
            val committed = fs.listStatus(root).flatMap { st =>
              val n = st.getPath.getName
              if (st.isDirectory && n.startsWith("v_"))
                scala.util.Try(n.drop(2).toLong).toOption
                  .filter(v => fs.exists(markerPath(v)))
              else None
            }
            if (committed.isEmpty) None else Some(committed.max)
          }
        } catch { case _: Exception => None }
      }
    }

    def read(v: Long): DataFrame = spark.read.parquet(versionPath(v))

    /** Latest committed state, or an empty frame of `schema` before the
      * first commit. */
    def current(schema: StructType): DataFrame = readLatest() match {
      case Some(v) => read(v)
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

    /** Write `df` as version `batchId` (+ commit marker), advance
      * `_LATEST`, prune versions older than the previous one. The pointer
      * swap is delete + rename — not atomic on its own, which is why
      * readLatest() recovers from the marker scan when the pointer is
      * missing: every crash window leaves either the old pointer (version
      * re-foldable / skippable) or a marker-complete newest version. */
    def commit(batchId: Long, df: DataFrame, prev: Option[Long]): Unit = {
      df.write.mode("overwrite").parquet(versionPath(batchId))
      sealCommit(batchId, prev)
    }

    /** Multi-relation version: each part lands as a SUBDIR of the
      * version dir, the marker seals them all together, so a crash
      * mid-write can never expose half a version (a version dir without
      * the marker is never a recovery target). */
    def commitParts(batchId: Long, parts: Seq[(String, DataFrame)],
        prev: Option[Long]): Unit = {
      parts.foreach { case (name, df) =>
        df.write.mode("overwrite")
          .parquet(new Path(new Path(versionPath(batchId)), name).toString)
      }
      sealCommit(batchId, prev)
    }

    def readPart(v: Long, name: String): DataFrame =
      spark.read.parquet(new Path(new Path(versionPath(v)), name).toString)

    /** Marker + pointer swap + prune — the shared tail of both commit
      * shapes. */
    private def sealCommit(batchId: Long, prev: Option[Long]): Unit = {
      val mk = fs.create(markerPath(batchId), true)
      try mk.write("ok".getBytes("UTF-8")) finally mk.close()
      val tmp = new Path(root, "_LATEST.tmp")
      val out = fs.create(tmp, true)
      try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
      fs.delete(latestPath, false)
      if (!fs.rename(tmp, latestPath))
        throw new java.io.IOException(s"rename failed for $latestPath")
      val keep = Set(batchId) ++ prev
      fs.listStatus(root).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.startsWith("v_") && !keep.contains(n.drop(2).toLong))
          fs.delete(st.getPath, true)
      }
    }
  }

  /** One G7 fold: apply a micro-batch of (a, b) match edges to the
    * standing assignment under `stateDir`. Public so a batch backfill job
    * can reuse the exact streaming commit protocol. */
  def foldClusterBatch(batch: DataFrame, stateDir: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val vs = new VersionedState(spark, stateDir)
    val prev = vs.readLatest()
    // replayed or out-of-order batch: already folded — reading and
    // overwriting the SAME version dir would race, so skip instead
    if (prev.exists(_ >= batchId)) return
    val e = batch.select(col("a").cast("long"), col("b").cast("long"))
    if (e.isEmpty) return
    val updated = prev match {
      case None =>
        // first batch: plain batch CC; the id universe is the batch's own
        // endpoints (the standing universe grows with each batch's edges)
        graft.er.Clustering.assign(
          spark, e.select(explode(array(col("a"), col("b"))).as("id")).distinct(), e)
      case Some(v) =>
        graft.er.Clustering.incrementalClusters(spark, vs.read(v), e)
    }
    vs.commit(batchId, updated, prev)
  }

  /** The standing assignment a [[streamingClusters]] query has built so
    * far (empty two-column frame before the first fold). */
  def currentClusters(spark: SparkSession, stateDir: String): DataFrame =
    new VersionedState(spark, stateDir).current(
      StructType(Seq(StructField("id", LongType), StructField("cluster", LongType))))

  /** Streaming PER-SOURCE CAP MAINTENANCE — the streaming twin of
    * [[graft.curate.SourceCap.sourceCap]]: documents stream in and every
    * micro-batch folds into the standing kept-set state (the current
    * top-N (id, source, h) per source, ≤ N rows per source — the bounded
    * state IS the kept table).
    *
    * Exactness: an evicted document can never re-enter (per-source hashes
    * only get smaller as documents arrive), so top-N(state ∪ batch
    * partials) = top-N over all documents seen — StreamingSpec checks
    * two-wave == batch sourceCap. Same versioned commit protocol as the
    * cluster sink (replay-safe; fold also idempotent: re-merging rows
    * already in state changes nothing).
    *
    * Scale shape: per micro-batch cost = one narrow partial pass over the
    * batch + a source-cardinality merge with state — never a
    * document-scale sort or shuffle. */
  def streamingSourceCap(
      docs: DataFrame,
      n: Int,
      stateDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      srcCol: String = "source"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldSourceCapBatch(batch.toDF(), n, stateDir, batchId, idCol, srcCol))
      .start()

  /** One source-cap fold: merge a micro-batch of documents into the
    * standing kept-set under `stateDir`. Public for batch backfill. */
  def foldSourceCapBatch(
      batch: DataFrame,
      n: Int,
      stateDir: String,
      batchId: Long,
      idCol: String = "doc_id",
      srcCol: String = "source"): Unit = {
    val spark = batch.sparkSession
    val vs = new VersionedState(spark, stateDir)
    val prev = vs.readLatest()
    if (prev.exists(_ >= batchId)) return
    if (batch.isEmpty) return
    val partial = graft.curate.SourceCap.partialKeep(
      graft.curate.SourceCap.keyed(batch, idCol, srcCol), n)
    val merged = prev match {
      case None => partial
      case Some(v) => vs.read(v).unionByName(partial)
    }
    vs.commit(batchId, graft.curate.SourceCap.topNPerSource(merged, n), prev)
  }

  /** The kept set a [[streamingSourceCap]] query has built so far:
    * (id, source, h), at most n rows per source (empty before the first
    * fold). */
  def currentSourceCap(spark: SparkSession, stateDir: String): DataFrame =
    new VersionedState(spark, stateDir).current(
      StructType(Seq(
        StructField("id", LongType),
        StructField("source", StringType),
        StructField("h", LongType))))

  /** Streaming dup-ngram maintenance (the dc_dup_ngrams_incr fold as a
    * foreachBatch sink): documents stream in; each micro-batch folds into
    * the standing gram-frequency index (grams / freq / stats — one
    * multi-part version per batch, sealed atomically by the shared
    * marker, so a crash can never expose half an index). Dup flips are
    * monotone, so the fold touches only batch-carried grams. */
  def streamingDupNgrams(
      docs: DataFrame,
      n: Int,
      stateDir: String,
      checkpointDir: String,
      idCol: String = "doc_id",
      textCol: String = "text"): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldDupNgramBatch(batch.toDF(), n, stateDir, batchId, idCol, textCol))
      .start()

  /** One dup-ngram fold: merge a micro-batch of documents into the
    * standing index under `stateDir`. Public for batch backfill. */
  def foldDupNgramBatch(
      batch: DataFrame,
      n: Int,
      stateDir: String,
      batchId: Long,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    val spark = batch.sparkSession
    val vs = new VersionedState(spark, stateDir)
    val prev = vs.readLatest()
    if (prev.exists(_ >= batchId)) return
    if (batch.isEmpty) return
    val next = prev match {
      case None =>
        graft.curate.Decontam.buildDupNgramIndex(batch, idCol, textCol, n)
      case Some(v) =>
        // parameter drift must fail loudly (the SurvivorIndex rule):
        // folding 13-gram deltas into an 8-gram standing index would
        // silently corrupt every count, so the state carries its n
        val storedN = vs.readPart(v, "meta").head().getLong(0)
        require(storedN == n,
          s"dup-ngram state at $stateDir was built with n=$storedN but this " +
            s"fold runs with n=$n — a mismatched fold corrupts the index")
        graft.curate.Decontam.foldDupNgramIndex(
          graft.curate.Decontam.DupNgramIndex(
            vs.readPart(v, "grams"), vs.readPart(v, "freq"),
            vs.readPart(v, "stats"), n),
          batch, idCol, textCol)
    }
    vs.commitParts(batchId,
      Seq("grams" -> next.grams, "freq" -> next.freq, "stats" -> next.stats,
        "meta" -> spark.range(1).select(lit(n.toLong).as("n"))),
      prev)
  }

  /** The (doc_id, n_grams, n_dup_grams) table a [[streamingDupNgrams]]
    * query has built so far (empty before the first fold). */
  def currentDupNgrams(spark: SparkSession, stateDir: String): DataFrame = {
    val vs = new VersionedState(spark, stateDir)
    vs.readLatest() match {
      case Some(v) => vs.readPart(v, "stats")
      case None =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(
            StructField("doc_id", LongType),
            StructField("n_grams", LongType),
            StructField("n_dup_grams", LongType))))
    }
  }

  /** Streaming IVF maintenance (the ann_ivf_incr fold as a foreachBatch
    * sink): vectors stream in; the FIRST micro-batch trains the
    * centroids (the bootstrap — a deployment would usually seed the
    * state with a batch-built index instead), every later batch assigns
    * against the frozen centroids and appends. State parts per version:
    * "assigned" (cell, nbr_id, cv) + "centroids" (c, v) — sealed
    * together by the shared marker.
    *
    * CAVEAT: appends are batch-boundary-insensitive, TRAINING is not —
    * the centroids freeze on exactly the rows of micro-batch 0, so what
    * lands in that batch (source trigger config, e.g. a file-source's
    * maxFilesPerTrigger) decides the training set. Bootstrap from a
    * batch-built index when that matters. */
  def streamingIvf(
      vecs: DataFrame,
      stateDir: String,
      checkpointDir: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): org.apache.spark.sql.streaming.StreamingQuery =
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        foldIvfBatch(batch.toDF(), stateDir, batchId, idCol, vecCol))
      .start()

  private def centroidsDf(spark: SparkSession,
      cents: Array[Array[Double]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (v, c) => (c, v.toSeq) }.toSeq.toDF("c", "v")
  }

  /** One IVF fold: train on the first batch, frozen-centroid append on
    * every later one. Public for batch backfill. */
  def foldIvfBatch(
      batch: DataFrame,
      stateDir: String,
      batchId: Long,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val spark = batch.sparkSession
    val vs = new VersionedState(spark, stateDir)
    val prev = vs.readLatest()
    if (prev.exists(_ >= batchId)) return
    if (batch.isEmpty) return
    def commit(next: graft.sim.Ann.IvfIndex): Unit =
      vs.commitParts(batchId,
        Seq("assigned" -> next.assigned,
          "centroids" -> centroidsDf(spark, next.centroids.value)),
        prev)
    prev match {
      case None =>
        commit(graft.sim.Ann.buildIvfIndex(spark, batch, idCol, vecCol))
        // only the bootstrap registers persistSig scratch (ivfAssign);
        // release it here, NOT on every batch — an unconditional global
        // release could unpersist another job's registered scratch on
        // this thread mid-flight
        graft.dedup.Dedup.releaseSignatures()
      case Some(v) =>
        commit(graft.sim.Ann.ivfAppend(spark, readIvfIndex(spark, vs, v),
          batch, idCol, vecCol))
    }
  }

  private def readIvfIndex(spark: SparkSession, vs: VersionedState,
      v: Long): graft.sim.Ann.IvfIndex = {
    val cents = vs.readPart(v, "centroids")
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1).map(_._2)
    graft.sim.Ann.IvfIndex(vs.readPart(v, "assigned"),
      spark.sparkContext.broadcast(cents))
  }

  /** The standing IVF index a [[streamingIvf]] query has built so far
    * (None before the first fold); search it with Ann.ivfSearchIndex. */
  def currentIvfIndex(spark: SparkSession, stateDir: String): Option[graft.sim.Ann.IvfIndex] = {
    val vs = new VersionedState(spark, stateDir)
    vs.readLatest().map(readIvfIndex(spark, vs, _))
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
