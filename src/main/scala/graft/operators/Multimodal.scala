package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a partition-batched feature-extraction pass.
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration shape —
  * is real and tested; the decode kernel is a clearly-marked deterministic
  * STUB (image/audio codecs are not in this container). On a real cluster
  * the stub body is replaced by the codec call; nothing else changes.
  *
  * Scale: `mapPartitions` keeps decode per-executor and batch-shaped (no
  * per-row task overhead, no driver involvement); binary payloads never
  * shuffle — features (small) do.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, blob: Array[Byte])

  /** Extracted features: fixed-width vector + frame metadata. */
  final case class MediaFeature(doc_id: Long, media_type: String,
                                n_bytes: Long, n_frames: Int,
                                feature: Array[Float])

  /** Build a media table from the documents fixture: text bytes stand in
    * for the opaque payload; media_type cycles deterministically.
    */
  def fakeMediaTable(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
      col(idCol).as("doc_id"),
      element_at(lit(Array("image", "audio", "video")), (col(idCol) % 3 + 1).cast("int"))
        .as("media_type"),
      col(textCol).cast("binary").as("blob"))
      .as[MediaRow]
  }

  // ── STUB decode kernel ────────────────────────────────────────────────
  // Real implementation would call an image/audio codec here (not available
  // in this container). This deterministic fake preserves the exact batch
  // shape, signature and output schema of the real kernel.
  private def stubDecode(blob: Array[Byte]): Array[Float] = {
    val feat = new Array[Float](8)
    var i = 0
    while (i < blob.length) {
      feat(i % 8) += (blob(i) & 0xff) / 255.0f
      i += 1
    }
    feat
  }

  /** Feature extraction over partition-sized batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val frames = (r.blob.length / 256) + 1
        MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong, frames,
          stubDecode(r.blob))
      }
    }
  }

  /** One sampled frame: parent id + frame index + the frame's bytes. */
  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: treat the payload as fixed-width frames and keep every
    * `stride`-th one — the video-keyframe pattern. One row in, few rows out
    * (a flatMap over partition batches); payload bytes stay on the executor
    * that read them, only sampled frames flow downstream.
    */
  def sampleFrames(media: Dataset[MediaRow], frameBytes: Int = 256,
                   stride: Int = 4): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val nFrames = (r.blob.length + frameBytes - 1) / frameBytes
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameBytes
          val until = math.min(from + frameBytes, r.blob.length)
          MediaFrame(r.doc_id, f, java.util.Arrays.copyOfRange(r.blob, from, until))
        }
      }
    }
  }

  // ── STUB resize kernel ────────────────────────────────────────────────
  // Real implementation would decode + bilinear-resample (codec not in this
  // container). The deterministic fake: stride-sample the payload down to
  // `targetBytes`, preserving the real kernel's contract (same row count,
  // bounded payload, metadata updated).
  private def stubResize(blob: Array[Byte], targetBytes: Int): Array[Byte] =
    if (blob.length <= targetBytes) blob
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = blob((i.toLong * blob.length / targetBytes).toInt)
        i += 1
      }
      out
    }

  /** Payload resize/downsample pass — row-preserving, batch-shaped. */
  def resize(media: Dataset[MediaRow], targetBytes: Int = 1024): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map(r => r.copy(blob = stubResize(r.blob, targetBytes)))
    }
  }
}
