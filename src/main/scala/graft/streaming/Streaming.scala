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
}
