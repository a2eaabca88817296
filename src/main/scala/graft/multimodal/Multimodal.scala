package graft.multimodal

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.synth.Synth.splitmix64

/** Multimodal column plumbing: image/audio/video as opaque BINARY columns
  * with typed metadata, decoded/feature-extracted in batch-shaped
  * partition passes.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * container): blobs use a deterministic synthetic container format
  * ("GRFT" magic + type + dims + payload) and `decodeStub` parses exactly
  * that. Everything around the stub is real and tested: the schema, the
  * binary column handling, the mapPartitions batch shape (the Scala
  * analogue of mapInPandas — one iterator pass per partition, no
  * per-row session setup), partition-preserving narrow execution, and the
  * downstream feature/aggregation plumbing.
  */
object Multimodal {

  val Magic = "GRFT"
  val TypeImage: Byte = 1
  val TypeAudio: Byte = 2
  val TypeVideo: Byte = 3

  final case class MediaRow(media_id: Long, kind: String, blob: Array[Byte])
  final case class Decoded(
      media_id: Long,
      kind: String,
      width: Int,
      height: Int,
      frames: Int,
      payload_bytes: Int,
      mean_intensity: Double,
      ok: Boolean)

  /** Build one synthetic blob: GRFT | type | w | h | frames | payload. */
  def makeBlob(kind: Byte, w: Int, h: Int, frames: Int, seed: Long): Array[Byte] = {
    val payloadLen = math.min(w * h, 4096) * math.max(frames, 1)
    val buf = ByteBuffer.allocate(4 + 1 + 4 + 4 + 4 + payloadLen)
    buf.put(Magic.getBytes(StandardCharsets.US_ASCII))
    buf.put(kind)
    buf.putInt(w); buf.putInt(h); buf.putInt(frames)
    var i = 0
    var s = seed
    while (i < payloadLen) { s = splitmix64(s); buf.put((s & 0xFF).toByte); i += 1 }
    buf.array()
  }

  /** Deterministic synthetic media table. */
  def syntheticMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, math.max(spark.sparkContext.defaultParallelism, 4)).map { i =>
      val kindByte = (java.lang.Math.floorMod(splitmix64(seed ^ i), 3L) + 1).toByte
      val kind = kindByte match {
        case TypeImage => "image"; case TypeAudio => "audio"; case _ => "video"
      }
      val w = 16 + java.lang.Math.floorMod(splitmix64(seed ^ (i * 3 + 1)), 48L).toInt
      val h = 16 + java.lang.Math.floorMod(splitmix64(seed ^ (i * 3 + 2)), 48L).toInt
      val frames = if (kindByte == TypeVideo) 4 + (i % 8).toInt else 1
      MediaRow(i, kind, makeBlob(kindByte, w, h, frames, seed ^ i))
    }
  }

  /** STUB decoder — parses the synthetic container. A real deployment
    * swaps this single function for an actual codec call; the Spark-side
    * plumbing is unchanged. */
  def decodeStub(blob: Array[Byte]): Option[(Byte, Int, Int, Int, Array[Byte])] = {
    if (blob == null || blob.length < 17) return None
    if (new String(blob, 0, 4, StandardCharsets.US_ASCII) != Magic) return None
    val buf = ByteBuffer.wrap(blob)
    buf.position(4)
    val kind = buf.get()
    val w = buf.getInt; val h = buf.getInt; val frames = buf.getInt
    val payload = new Array[Byte](blob.length - 17)
    buf.get(payload)
    Some((kind, w, h, frames, payload))
  }

  /** Batch decode + feature extraction: one mapPartitions pass (the
    * mapInPandas batch shape — per-partition setup happens once, rows
    * stream through). Malformed blobs survive as ok=false rows instead of
    * failing the job. */
  def decodeAndFeatures(media: Dataset[MediaRow]): Dataset[Decoded] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "codec init" would go here (once, not per row)
      it.map { row =>
        decodeStub(row.blob) match {
          case Some((_, w, h, frames, payload)) =>
            var sum = 0L
            var i = 0
            while (i < payload.length) { sum += (payload(i) & 0xFF); i += 1 }
            val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
            Decoded(row.media_id, row.kind, w, h, frames, payload.length, mean, ok = true)
          case None =>
            Decoded(row.media_id, row.kind, -1, -1, -1, 0, 0.0, ok = false)
        }
      }
    }
  }

  /** Frame sampling for video blobs: every `stride`-th frame re-emitted as
    * its own row (media_id, frame_idx, frame_bytes) — the explode-shaped
    * step a video pipeline feeds to a per-frame model. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media.flatMap { row =>
      decodeStub(row.blob) match {
        case Some((TypeVideo, w, h, frames, payload)) if frames > 0 =>
          val frameLen = payload.length / frames
          (0 until frames by stride).map { f =>
            val bytes = java.util.Arrays.copyOfRange(payload, f * frameLen, (f + 1) * frameLen)
            (row.media_id, f, w, h, bytes.length, bytes)
          }
        case _ => Nil
      }
    }.toDF("media_id", "frame_idx", "width", "height", "frame_bytes", "frame")
  }

  /** Metadata rollup over the decoded table. */
  def mediaStats(decoded: Dataset[Decoded]): DataFrame =
    decoded.toDF()
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(col("payload_bytes").cast("long")).as("total_bytes"),
        avg(col("mean_intensity")).as("avg_intensity"))
}
