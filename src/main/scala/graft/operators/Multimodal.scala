package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * BINARY columns with typed metadata, and run batched per-partition
  * decode/feature-extraction.
  *
  * The decode itself is a clearly-marked deterministic STUB (the container
  * has no codec libraries): it computes a byte histogram and fakes
  * "frame sampling" as fixed-stride offsets. Everything around it — schema,
  * Dataset encoders, partition batching, feature array shape — is the real
  * Spark plumbing a production decoder would drop into (swap `decodeStub`
  * for an FFI call; the `mapPartitions` boundary amortizes per-batch model
  * or codec initialization exactly like `mapInPandas` batches do).
  */
object Multimodal {
  val FrameStride = 64

  case class MediaMeta(n_bytes: Long, n_distinct_bytes: Int, n_frames: Int)
  case class DecodedDoc(
      id: Long,
      n_bytes: Long,
      n_distinct_bytes: Int,
      n_frames: Int,
      features: Array[Float])

  /** STUB decoder — deterministic fake standing in for image/audio decode.
    * Real implementation would parse the container format here. */
  private def decodeStub(payload: Array[Byte]): (MediaMeta, Array[Float]) = {
    val hist = new Array[Int](256)
    payload.foreach(b => hist(b & 0xff) += 1)
    val distinct = hist.count(_ > 0)
    val nFrames = payload.length / FrameStride + 1
    // fake "embedding": 16 coarse histogram buckets, L1-normalized
    val feat = new Array[Float](16)
    var i = 0
    while (i < 256) { feat(i / 16) += hist(i); i += 1 }
    val total = math.max(1.0f, payload.length.toFloat)
    (0 until 16).foreach(j => feat(j) /= total)
    (MediaMeta(payload.length, distinct, nFrames), feat)
  }

  /** Batched decode over (id BIGINT, payload BINARY). Partition-parallel;
    * one task per input split, no shuffle. */
  def decode(df: DataFrame, idCol: String, payloadCol: String): Dataset[DecodedDoc] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init hook (a real decoder would set up codecs here)
        it.map { case (id, payload) =>
          val (meta, feat) = decodeStub(payload)
          DecodedDoc(id, meta.n_bytes, meta.n_distinct_bytes, meta.n_frames, feat)
        }
      }
  }

  /** STUB resize — deterministic stand-in for image resize: nearest-
    * neighbour sample of the payload onto a w*h byte grid (a real decoder
    * would produce pixel data here; the Spark-side shape — fixed-size
    * BINARY output per row, batched per partition — is the real contract). */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (payload.isEmpty) return out
    var i = 0
    while (i < out.length) {
      out(i) = payload((i.toLong * payload.length / out.length).toInt)
      i += 1
    }
    out
  }

  /** Batched resize over (id, payload) — (id, thumb BINARY(w*h)). */
  def resize(df: DataFrame, idCol: String, payloadCol: String,
      w: Int = 16, h: Int = 16): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, p) => (id, resizeStub(p, w, h)) })
      .toDF("id", "thumb")
  }

  /** Frame sampling metadata only (cheap path; still batched). */
  def frameMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    decode(df, idCol, payloadCol)
      .toDF()
      .select(col("id"), col("n_bytes"), col("n_distinct_bytes"), col("n_frames"))
}
