package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus a partition-batched feature-extraction pass.
  *
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK and parses
  * PNG/BMP/GIF/JPEG with no external package, so image payloads yield
  * true width/height/pixel statistics. The deterministic STUB kernel
  * remains only for payloads ImageIO cannot parse — audio and video,
  * whose codecs genuinely are not in this container; on a real cluster
  * the stub body is replaced by the codec call, nothing else changes.
  *
  * Scale: `mapPartitions` keeps decode per-executor and batch-shaped (no
  * per-row task overhead, no driver involvement); binary payloads never
  * shuffle — features (small) do.
  */
object Multimodal {

  // ImageIO defaults to a disk-backed read cache; decode in memory on
  // executors instead (payloads are already partition-local byte arrays)
  ImageIO.setUseCache(false)

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

  /** REAL image decode (JDK ImageIO: PNG/BMP/GIF/JPEG). None when the
    * payload is not a decodable image — callers fall back to the stub.
    */
  private[operators] def decodeImage(blob: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(blob)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** 8-dim feature from REAL pixels: per-channel mean and stddev of
    * R/G/B in [0,1], plus log-scaled width/height. One deterministic
    * row-major pixel scan per image.
    */
  /** One row-major pixel scan: per-channel sums and sums of squares of
    * R/G/B in [0,1] — the shared kernel behind [[imageFeature]] and
    * [[imageMeta]], so the two can never drift (e.g. a future alpha or
    * color-space fix lands in both).
    */
  private def channelSums(img: BufferedImage): (Double, Double, Double, Double, Double, Double) = {
    val w = img.getWidth
    val h = img.getHeight
    var sr, sg, sb, sr2, sg2, sb2 = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = img.getRGB(x, y)
        val r = ((p >> 16) & 0xff) / 255.0
        val g = ((p >> 8) & 0xff) / 255.0
        val b = (p & 0xff) / 255.0
        sr += r; sg += g; sb += b
        sr2 += r * r; sg2 += g * g; sb2 += b * b
        x += 1
      }
      y += 1
    }
    (sr, sg, sb, sr2, sg2, sb2)
  }

  private[operators] def imageFeature(img: BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val (sr, sg, sb, sr2, sg2, sb2) = channelSums(img)
    val n = w.toDouble * h
    def mean(s: Double) = s / n
    def std(s: Double, s2: Double) = math.sqrt(math.max(0.0, s2 / n - (s / n) * (s / n)))
    Array(mean(sr).toFloat, mean(sg).toFloat, mean(sb).toFloat,
      std(sr, sr2).toFloat, std(sg, sg2).toFloat, std(sb, sb2).toFloat,
      math.log1p(w.toDouble).toFloat, math.log1p(h.toDouble).toFloat)
  }

  /** Decoded image metadata: true dimensions + channel means. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
                             n_pixels: Long, mean_r: Double, mean_g: Double,
                             mean_b: Double)

  /** Real image metadata extraction: image-typed rows whose payload
    * ImageIO parses yield true dimensions and channel means; audio/video
    * rows never pay a decode attempt (same media_type gate as
    * [[extractFeatures]]) and undecodable image rows are dropped.
    * Batch-shaped — payload bytes never leave the partition that read
    * them.
    */
  def imageMeta(media: Dataset[MediaRow]): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = if (r.media_type == "image") decodeImage(r.blob) else None
        decoded.map { img =>
          val w = img.getWidth; val h = img.getHeight
          val (sr, sg, sb, _, _, _) = channelSums(img)
          val n = w.toDouble * h
          ImageMeta(r.doc_id, w, h, w.toLong * h, sr / n, sg / n, sb / n)
        }
      }
    }
  }

  // ── STUB decode kernel (audio/video ONLY) ─────────────────────────────
  // Real implementation would call an audio/video codec here (not available
  // in this container). This deterministic fake preserves the exact batch
  // shape, signature and output schema of the real kernel. Image payloads
  // never reach it — they decode for real via ImageIO above.
  private def stubDecode(blob: Array[Byte]): Array[Float] = {
    val feat = new Array[Float](8)
    var i = 0
    while (i < blob.length) {
      feat(i % 8) += (blob(i) & 0xff) / 255.0f
      i += 1
    }
    feat
  }

  /** Feature extraction over partition-sized batches: image payloads that
    * ImageIO parses get REAL pixel-statistic features (one frame — a
    * still); everything else takes the documented audio/video stub.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val decoded = if (r.media_type == "image") decodeImage(r.blob) else None
        decoded match {
          case Some(img) =>
            MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong, 1,
              imageFeature(img))
          case None =>
            val frames = (r.blob.length / 256) + 1
            MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong, frames,
              stubDecode(r.blob))
        }
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
