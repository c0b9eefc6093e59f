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
  * true width/height/pixel statistics. AUDIO decode is REAL for WAV/PCM:
  * `javax.sound.sampled.AudioSystem` (also pure JDK) parses WAV headers
  * and 8/16-bit PCM frames, yielding true sample-rate/channel/duration/
  * RMS statistics. The deterministic STUB kernel remains only for
  * payloads neither parser accepts — compressed audio codecs and video,
  * which genuinely are not in this container; on a real cluster the stub
  * body is replaced by the codec call, nothing else changes.
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

  /** Decoded WAV statistics from one sample scan: format facts plus
    * mean/RMS/peak/zero-crossing-rate of normalized samples in [-1,1] —
    * the shared kernel behind [[audioMeta]] and the audio branch of
    * [[extractFeatures]] (the [[channelSums]] precedent: one kernel, two
    * surfaces, no drift). ZCR is over the interleaved stream (a cheap
    * spectral proxy; per-channel separation isn't worth a second scan).
    */
  final case class WavStats(sampleRate: Double, channels: Int, bits: Int,
                            nFrames: Long, durationSec: Double,
                            mean: Double, rms: Double, peak: Double, zcr: Double)

  /** REAL audio decode (JDK javax.sound.sampled): WAV headers + 8/16-bit
    * PCM frames. None when the payload is not an uncompressed WAV —
    * callers fall back to the stub (compressed codecs aren't in the JDK).
    */
  private[operators] def decodeWavStats(blob: Array[Byte]): Option[WavStats] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if ((!signed && !unsigned) || (bits != 8 && bits != 16)) None
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val nSamples = bytes.length / bytesPerSample
          if (nSamples == 0) None
          else {
            var sum = 0.0; var sum2 = 0.0; var peak = 0.0
            var crossings = 0L; var prevSign = 0
            var i = 0
            while (i < nSamples) {
              val off = i * bytesPerSample
              val v =
                if (bits == 8) {
                  // 8-bit WAV is unsigned by convention; trust the header
                  (if (signed) bytes(off).toInt else (bytes(off) & 0xff) - 128) / 128.0
                } else {
                  val raw =
                    if (fmt.isBigEndian) ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
                    else ((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)
                  (if (signed) raw.toShort.toInt else raw - 32768) / 32768.0
                }
              sum += v; sum2 += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              val sign = if (v > 0) 1 else if (v < 0) -1 else 0
              if (sign != 0) {
                if (prevSign != 0 && sign != prevSign) crossings += 1
                prevSign = sign
              }
              i += 1
            }
            val nFrames = bytes.length.toLong / fmt.getFrameSize
            Some(WavStats(fmt.getSampleRate.toDouble, fmt.getChannels, bits,
              nFrames, nFrames / fmt.getFrameRate.toDouble,
              sum / nSamples, math.sqrt(sum2 / nSamples), peak,
              crossings.toDouble / math.max(1L, nSamples - 1L)))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Deterministic WAV synthesis: 16-bit signed little-endian mono PCM
    * square wave (±amplitude, flipping every `period` frames) in a WAV
    * container — the encoder half of the decode ROUND-TRIP gate (q105):
    * synthesized WAVs pipe through [[audioMeta]]'s real decoder and the
    * decoded facts are checked against their closed-form values. The
    * defaults keep every decoded value IEEE-exact: amplitude/32768 is a
    * dyadic rational, and an `nFrames` divisible by 2·period gives equal
    * +/- halves (mean exactly 0, RMS exactly amplitude/32768).
    */
  def syntheticWav(amplitude: Int, nFrames: Int, period: Int = 10,
                   sampleRate: Float = 8000f): Array[Byte] = {
    require(amplitude >= 0 && amplitude <= Short.MaxValue,
      s"amplitude out of [0, 32767]: $amplitude")
    require(nFrames > 0 && period > 0, s"nFrames/period must be positive: $nFrames/$period")
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val v = if ((i / period) % 2 == 0) amplitude else -amplitude
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** Decoded audio metadata: true format facts + RMS loudness. */
  final case class AudioMeta(doc_id: Long, sample_rate: Double, channels: Int,
                             n_frames: Long, duration_sec: Double, rms: Double)

  /** Real audio metadata extraction — the [[imageMeta]] twin: audio-typed
    * rows whose payload parses as WAV/PCM yield true sample-rate/
    * channels/frames/duration/RMS; non-audio rows never pay a decode
    * attempt and undecodable audio rows are dropped. Batch-shaped —
    * payload bytes never leave the partition that read them.
    */
  def audioMeta(media: Dataset[MediaRow]): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = if (r.media_type == "audio") decodeWavStats(r.blob) else None
        decoded.map(w => AudioMeta(r.doc_id, w.sampleRate, w.channels,
          w.nFrames, w.durationSec, w.rms))
      }
    }
  }

  /** Normalized mono samples from a WAV blob (mixing channels down by
    * taking channel 0) — the sample-access twin of [[decodeWavStats]]'s
    * streaming pass, for kernels that need the waveform (spectral
    * analysis). Bounded by the payload the partition already holds.
    */
  private[operators] def decodeWavSamples(blob: Array[Byte]): Option[(Array[Double], Double)] = {
    import javax.sound.sampled.{AudioFormat, AudioSystem}
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(blob))
      try {
        val fmt = in.getFormat
        val signed = fmt.getEncoding == AudioFormat.Encoding.PCM_SIGNED
        val unsigned = fmt.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED
        val bits = fmt.getSampleSizeInBits
        if ((!signed && !unsigned) || (bits != 8 && bits != 16)) None
        else {
          val bytes = in.readAllBytes()
          val bytesPerSample = bits / 8
          val frameSize = fmt.getFrameSize
          val nFrames = bytes.length / frameSize
          if (nFrames == 0) None
          else {
            val out = new Array[Double](nFrames)
            var i = 0
            while (i < nFrames) {
              val off = i * frameSize // channel 0 of each frame
              out(i) =
                if (bits == 8) {
                  (if (signed) bytes(off).toInt else (bytes(off) & 0xff) - 128) / 128.0
                } else {
                  val raw =
                    if (fmt.isBigEndian) ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
                    else ((bytes(off + 1) & 0xff) << 8) | (bytes(off) & 0xff)
                  (if (signed) raw.toShort.toInt else raw - 32768) / 32768.0
                }
              i += 1
            }
            Some((out, fmt.getSampleRate.toDouble))
          }
        }
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Goertzel power of `samples` at `freq` (Hz) — the single-bin DFT
    * magnitude², O(n) per candidate frequency, no FFT library needed.
    */
  private[operators] def goertzelPower(samples: Array[Double], freq: Double,
                                       sampleRate: Double): Double = {
    val w = 2.0 * math.Pi * freq / sampleRate
    val coeff = 2.0 * math.cos(w)
    var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
    var i = 0
    while (i < samples.length) {
      s0 = samples(i) + coeff * s1 - s2
      s2 = s1; s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** Per-row spectral peak: dominant frequency (Hz). */
  final case class AudioSpectral(doc_id: Long, n_frames: Long, dominant_hz: Double)

  /** REAL spectral analysis: for each audio row, the candidate frequency
    * with the highest Goertzel power — tone/DTMF detection, synthetic-
    * audio QA, dominant-pitch bucketing, all without an FFT dependency.
    * Candidates are caller-chosen (spectral peaks only make sense
    * against a hypothesis set; a full spectrogram would be `mapInPandas`
    * territory). Ties break to the LOWEST candidate — a total order.
    * Batch-shaped like [[audioMeta]]: payload bytes never leave the
    * partition that read them; cost is O(frames × candidates) per row.
    */
  def audioDominantFrequency(media: Dataset[MediaRow],
                             candidatesHz: Seq[Double]): Dataset[AudioSpectral] = {
    require(candidatesHz.nonEmpty, "need at least one candidate frequency")
    val cands = candidatesHz.toArray
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = if (r.media_type == "audio") decodeWavSamples(r.blob) else None
        decoded.map { case (samples, rate) =>
          var best = 0; var bestP = Double.NegativeInfinity
          var i = 0
          while (i < cands.length) {
            val p = goertzelPower(samples, cands(i), rate)
            if (p > bestP || (p == bestP && cands(i) < cands(best))) {
              best = i; bestP = p
            }
            i += 1
          }
          AudioSpectral(r.doc_id, samples.length.toLong, cands(best))
        }
      }
    }
  }

  /** 8-dim feature from REAL samples: [mean, rms, peak, zcr,
    * log1p(frames), log1p(rate), channels, bits].
    */
  private[operators] def audioFeature(w: WavStats): Array[Float] =
    Array(w.mean.toFloat, w.rms.toFloat, w.peak.toFloat, w.zcr.toFloat,
      math.log1p(w.nFrames.toDouble).toFloat, math.log1p(w.sampleRate).toFloat,
      w.channels.toFloat, w.bits.toFloat)

  /** 64-bit perceptual AUDIO fingerprint — the [[aHash64]] twin for
    * waveforms: the decoded samples split into 64 equal time segments,
    * bit s = 1 iff segment s's energy (Σ sample², channel 0) exceeds the
    * MEAN segment energy. Amplitude-scaling invariant (both sides of the
    * comparison scale by the same factor), container-invariant (operates
    * on decoded samples), and one bit flips when one segment's loudness
    * regime flips — so near-identical recordings land within a small
    * Hamming distance and [[hammingNearDups]] applies unchanged.
    *
    * Closed form on tone-burst fixtures ([[syntheticToneBurstWav]]): a
    * loud/silent segment pattern with 0–63 loud segments fingerprints to
    * EXACTLY its pattern bits (loud energy > mean unless everything is
    * loud; silence is never above a positive mean), and the all-loud
    * pattern (−1L) is the one degenerate input — excluded by fixtures,
    * like syntheticBlockImage's all-bright pattern.
    */
  private[operators] def audioFingerprint64(samples: Array[Double]): Option[Long] = {
    val n = samples.length
    if (n < 64) None
    else {
      val seg = n / 64
      val energies = new Array[Double](64)
      var s = 0
      while (s < 64) {
        var e = 0.0
        var i = s * seg
        val end = i + seg // trailing n % 64 samples are ignored uniformly
        while (i < end) { e += samples(i) * samples(i); i += 1 }
        energies(s) = e
        s += 1
      }
      var total = 0.0
      s = 0
      while (s < 64) { total += energies(s); s += 1 }
      val mean = total / 64.0
      var fp = 0L
      s = 0
      while (s < 64) {
        if (energies(s) > mean) fp |= (1L << s)
        s += 1
      }
      Some(fp)
    }
  }

  /** Per-row decoded audio fingerprint: `(doc_id, afp)`. */
  final case class AudioFingerprint(doc_id: Long, afp: Long)

  /** REAL audio fingerprints for a media table — audio-typed rows whose
    * payload decodes as WAV/PCM and carries ≥ 64 frames yield their
    * [[audioFingerprint64]]; everything else drops. Batch-shaped like
    * [[audioMeta]]: waveforms collapse to one long on the scan
    * executors, payload bytes never shuffle.
    */
  def audioFingerprints(media: Dataset[MediaRow]): Dataset[AudioFingerprint] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = if (r.media_type == "audio") decodeWavSamples(r.blob) else None
        decoded.flatMap { case (samples, _) =>
          audioFingerprint64(samples).map(AudioFingerprint(r.doc_id, _))
        }
      }
    }
  }

  /** Audio perceptual near-dup: decode → fingerprint → the SAME
    * pigeonhole Hamming machinery as [[imageNearDups]] — re-encoded,
    * re-scaled, or lightly edited recordings pair up; emits
    * `(doc_a, doc_b, hamming)`, `doc_a < doc_b`.
    */
  def audioNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingNearDups(audioFingerprints(media).toDF(), "doc_id", "afp", maxHamming)

  /** Deterministic tone-burst WAV: 64 segments of `segFrames` frames;
    * segment s carries a ±`amplitude` square wave (period 4) when bit s
    * of `pattern` is set, silence otherwise; `flipSegment` inverts one
    * segment's regime. The encoder half of the audio-fingerprint
    * round-trip gate: [[audioFingerprint64]] over the DECODED samples
    * recovers `pattern` exactly (see its closed form), and a one-segment
    * flip lands at Hamming distance EXACTLY 1.
    */
  def syntheticToneBurstWav(pattern: Long, flipSegment: Int = -1,
                            segFrames: Int = 80, amplitude: Int = 8192,
                            sampleRate: Float = 8000f): Array[Byte] = {
    require(segFrames >= 4, s"segFrames must be >= 4: $segFrames")
    require(amplitude > 0 && amplitude <= Short.MaxValue,
      s"amplitude out of (0, 32767]: $amplitude")
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val nFrames = 64 * segFrames
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      val s = i / segFrames
      val loud = (((pattern >>> s) & 1L) == 1L) ^ (s == flipSegment)
      val v = if (!loud) 0 else if ((i / 4) % 2 == 0) amplitude else -amplitude
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(pcm), fmt, nFrames.toLong),
      AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  // ── STUB decode kernel (compressed audio / video ONLY) ────────────────
  // Real implementation would call a codec here (not available in this
  // container). This deterministic fake preserves the exact batch shape,
  // signature and output schema of the real kernel. Image payloads never
  // reach it (ImageIO above); WAV/PCM audio payloads never reach it
  // (javax.sound.sampled above).
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
    * still); audio payloads that parse as WAV/PCM get REAL sample-
    * statistic features (true frame count); everything else takes the
    * documented compressed-audio/video stub.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        def stub = {
          val frames = (r.blob.length / 256) + 1
          MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong, frames,
            stubDecode(r.blob))
        }
        r.media_type match {
          case "image" => decodeImage(r.blob) match {
            case Some(img) =>
              MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong, 1,
                imageFeature(img))
            case None => stub
          }
          case "audio" => decodeWavStats(r.blob) match {
            case Some(w) =>
              MediaFeature(r.doc_id, r.media_type, r.blob.length.toLong,
                math.min(w.nFrames, Int.MaxValue.toLong).toInt, audioFeature(w))
            case None => stub
          }
          case _ => stub
        }
      }
    }
  }

  /** Decoded GIF frame sequence — REAL multi-frame decode, pure JDK: the
    * ImageIO GIF reader enumerates and rasterizes every frame of an
    * animated GIF (`getNumImages(true)` + per-index `read`). Frames are
    * returned AS STORED (no disposal/compositing pass — deterministic,
    * and exact for the full-frame GIFs a synthetic pipeline writes).
    * None when the payload is not a GIF.
    */
  private[operators] def decodeGifFrames(blob: Array[Byte]): Option[Vector[BufferedImage]] =
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(blob))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          if (!reader.getFormatName.equalsIgnoreCase("gif")) None
          else {
            reader.setInput(iis, false, true)
            try {
              val n = reader.getNumImages(true)
              Some((0 until n).map(reader.read).toVector)
            } finally reader.dispose()
          }
        }
      } finally iis.close()
    } catch { case _: Exception => None }

  /** Per-frame metadata from REAL animated-GIF decode: `(doc_id,
    * frame_idx, width, height, mean_lum)` for every `stride`-th stored
    * frame, `mean_lum` the frame's mean of (r+g+b)/3 rounded 6 dp — the
    * video-keyframe statistics pass, realized on the one multi-frame
    * container the JDK decodes codec-free. Non-GIF payloads emit
    * nothing (callers route compressed video to the documented stub
    * path). Partition-batched; payload bytes never leave their executor.
    */
  final case class GifFrameMeta(doc_id: Long, frame_idx: Int, width: Int,
                                height: Int, mean_lum: Double)
  def gifFrameMeta(media: Dataset[MediaRow], stride: Int = 1): Dataset[GifFrameMeta] = {
    require(stride >= 1, s"stride must be >= 1: $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeGifFrames(r.blob).toSeq.flatMap { frames =>
          (0 until frames.size by stride).map { i =>
            val img = frames(i)
            val (sr, sg, sb, _, _, _) = channelSums(img)
            val n = img.getWidth.toDouble * img.getHeight
            val mean = BigDecimal((sr + sg + sb) / (3.0 * n))
              .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            GifFrameMeta(r.doc_id, i, img.getWidth, img.getHeight, mean)
          }
        }
      }
    }
  }

  /** Deterministic animated-GIF fixture: `nFrames` solid frames of
    * `width`×`height`, frame `i` filled with gray `grayOf(i)` — written
    * with the JDK's own GIF sequence writer, so [[gifFrameMeta]] decodes
    * true values with a closed-form oracle (a solid gray v frame's mean
    * luminance is exactly v: the GIF palette stores ≤256 distinct colors
    * losslessly).
    */
  def syntheticGif(nFrames: Int, width: Int, height: Int,
                   grayOf: Int => Int): Array[Byte] = {
    require(nFrames >= 1 && width >= 1 && height >= 1)
    val out = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    (0 until nFrames).foreach { i =>
      val g = grayOf(i) & 0xff
      val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
      val rgb = (g << 16) | (g << 8) | g
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) { img.setRGB(x, y, rgb); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  // ── Perceptual image hashing (aHash/dHash) + Hamming near-dup join ──

  /** Block-averaged Rec.601 luma grid `gw`×`gh`, row-major: cell
    * `(bx, by)` is the mean luma of pixel block `[bx·w/gw, (bx+1)·w/gw)
    * × [by·h/gh, (by+1)·h/gh)` — integer block edges, so the downsample
    * is deterministic for any image size (a cell that maps to zero
    * pixels on a tiny image reads 0). This is the classic perceptual-
    * hash preprocessing: resolution, aspect ratio, and high-frequency
    * detail are averaged away before thresholding.
    */
  private def lumaGrid(img: BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Double](gw * gh)
    var by = 0
    while (by < gh) {
      val y0 = by * h / gh; val y1 = (by + 1) * h / gh
      var bx = 0
      while (bx < gw) {
        val x0 = bx * w / gw; val x1 = (bx + 1) * w / gw
        var s = 0.0; var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val p = img.getRGB(x, y)
            s += 0.299 * ((p >> 16) & 0xff) + 0.587 * ((p >> 8) & 0xff) +
              0.114 * (p & 0xff)
            n += 1; x += 1
          }
          y += 1
        }
        out(by * gw + bx) = if (n == 0) 0.0 else s / n
        bx += 1
      }
      by += 1
    }
    out
  }

  /** 64-bit AVERAGE hash: 8×8 luma grid, bit `by·8+bx` set iff its cell
    * is STRICTLY above the grid mean. Robust to resize/re-encode (the
    * grid averages detail away); a solid or two-level image recovers its
    * block pattern exactly, which is what gives the q157 fixture its
    * closed-form oracle.
    */
  private[operators] def aHash64(img: BufferedImage): Long = {
    val g = lumaGrid(img, 8, 8)
    var s = 0.0; var i = 0
    while (i < 64) { s += g(i); i += 1 }
    val mean = s / 64.0
    var hash = 0L; i = 0
    while (i < 64) { if (g(i) > mean) hash |= 1L << i; i += 1 }
    hash
  }

  /** 64-bit DIFFERENCE hash: 9×8 luma grid, bit `by·8+bx` set iff cell
    * `(bx, by)` is strictly brighter than its right neighbor — a
    * horizontal-gradient sign map, immune to global brightness shifts
    * (aHash's mean threshold moves under gamma changes; dHash compares
    * neighbors, so a constant offset cancels).
    */
  private[operators] def dHash64(img: BufferedImage): Long = {
    val g = lumaGrid(img, 9, 8)
    var hash = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (g(by * 9 + bx) > g(by * 9 + bx + 1)) hash |= 1L << (by * 8 + bx)
        bx += 1
      }
      by += 1
    }
    hash
  }

  /** Perceptual hashes of every decodable image row: `(doc_id, ahash,
    * dhash)`. Same decode gate as [[imageMeta]] (non-image rows never
    * pay a decode attempt, undecodable images drop); partition-batched,
    * payload bytes never leave the executor that read them — only two
    * longs per image flow downstream, which is the whole point at
    * 100 TB of pixels.
    */
  final case class ImageHashes(doc_id: Long, ahash: Long, dhash: Long)
  def imageHashes(media: Dataset[MediaRow]): Dataset[ImageHashes] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val decoded = if (r.media_type == "image") decodeImage(r.blob) else None
        decoded.map(img => ImageHashes(r.doc_id, aHash64(img), dHash64(img)))
      }
    }
  }

  /** Hamming near-dup join over a 64-bit hash column — the pigeonhole
    * band trick ([[graft.operators.Dedup.simhashNearDups]] on 60 bits):
    * split the hash into `maxHamming + 1` disjoint chunks; two hashes
    * within `maxHamming` MUST agree on at least one whole chunk, so the
    * chunk-value equi-join has perfect recall and `bit_count(xor)`
    * verifies candidates exactly. Emits `(doc_a, doc_b, hamming)` with
    * `doc_a < doc_b`.
    *
    * 100 TB shape: hash-table-sized self-join on integer chunk keys —
    * never all-pairs, no cartesian; candidates per image are bounded by
    * chunk-bucket occupancy (64/(maxHamming+1) ≥ 12 bits per chunk at
    * the default keeps buckets sparse on perceptually-diverse corpora;
    * a corpus of near-identical images IS one giant duplicate class and
    * belongs to the megacluster guard regardless of hash).
    */
  def hammingNearDups(hashes: DataFrame, idCol: String, hashCol: String,
                      maxHamming: Int = 3): DataFrame = {
    require(maxHamming >= 1 && maxHamming <= 15,
      s"maxHamming out of [1,15]: $maxHamming")
    val chunks = maxHamming + 1
    val bits = 64 / chunks
    val chunkStructs = (0 until chunks).map { c =>
      val width = if (c == chunks - 1) 64 - c * bits else bits
      struct(lit(c).as("ck"),
        shiftright(col("__h"), c * bits).bitwiseAND(lit((1L << width) - 1)).as("cv"))
    }
    // the hash table feeds BOTH sides of the self-join; materialize it
    // once (localCheckpoint — the connectedComponents precedent) so the
    // upstream pipeline does not run twice. When that pipeline is a real
    // image decode the duplicate evaluation IS the query cost (q157
    // measured 2.8 s → 1.6 s); the checkpointed table is (id, hash)
    // rows — executor-storage-cheap at any scale — and its blocks free
    // when the result frame is garbage-collected.
    val h = hashes
      .select(col(idCol).as("__id"), col(hashCol).as("__h"))
      .localCheckpoint()
    val banded = h
      .select(col("__id"), col("__h"), explode(array(chunkStructs: _*)).as("__c"))
      .select(col("__id"), col("__h"), col("__c.ck").as("ck"), col("__c.cv").as("cv"))
    val a = banded.select(col("__id").as("doc_a"), col("__h").as("__ha"),
      col("ck"), col("cv"))
    val b = banded.select(col("__id").as("doc_b"), col("__h").as("__hb"),
      col("ck"), col("cv"))
    a.join(b, Seq("ck", "cv"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .distinct()
  }

  /** Image perceptual near-dup: decode → aHash → pigeonhole Hamming
    * join. The end-to-end operator a multimodal curation pipeline runs
    * ("drop re-encoded/resized copies of the same picture"): pixels
    * collapse to one long per image on the executor that read them, and
    * only the hash table shuffles.
    */
  def imageNearDups(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame =
    hammingNearDups(imageHashes(media).toDF(), "doc_id", "ahash", maxHamming)

  /** End-to-end image dedup: decode → aHash → Hamming pairs → connected
    * components → keep the min-id survivor per perceptual cluster. One
    * row per DECODABLE image: `(doc_id, status, winner_id)` with status
    * `kept` / `dropped_near` — the [[graft.operators.Dedup.dedupAudit]]
    * contract, so a multimodal curation pipeline reads both audits with
    * one schema.
    *
    * 100 TB shape: pixels collapse to hashes on the scan executors; the
    * pair graph is the pigeonhole equi-join; components ride the
    * size-adaptive CC (driver union-find under 4M edges, RDD fixpoint
    * above); the final attribution is one node-sized left join.
    */
  def imageDedup(media: Dataset[MediaRow], maxHamming: Int = 3): DataFrame = {
    // decode ONCE: the hash table feeds pair generation AND the final
    // attribution join (hammingNearDups re-checkpoints its projection,
    // which then reads this materialized table, not the decoder)
    val hashes = imageHashes(media).toDF().localCheckpoint()
    val comp = graft.operators.Dedup.connectedComponents(
      hammingNearDups(hashes, "doc_id", "ahash", maxHamming)
        .select("doc_a", "doc_b"))
    hashes.select(col("doc_id"))
      .join(comp.select(col("node").as("doc_id"), col("component")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("component").isNotNull && col("component") =!= col("doc_id"),
          lit("dropped_near")).otherwise(lit("kept")).as("status"),
        coalesce(col("component"), col("doc_id")).as("winner_id"))
  }

  /** SplitMix64 finalizer — a BIJECTION on Long (distinct ids can never
    * collide to one pattern), used by the image fixtures to give every
    * doc a unique well-mixed 64-bit block pattern.
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic two-level block-image fixture, PNG-encoded (lossless
    * — the JDK round-trips it exactly): an 8×8 grid of `blockPx`-pixel
    * solid blocks, block `i` bright (200) iff bit `i` of `pattern` is
    * set, else dark (50); `flipBlock` toggles one block. Because every
    * block sits far from the two-level mean, [[aHash64]] recovers the
    * block pattern exactly and a one-block flip lands at Hamming
    * distance EXACTLY 1 — the closed form behind q157's oracle. (The
    * one degenerate input — an all-bright pattern, whose flip moves the
    * mean above every other block — is excluded by the fixture mapping
    * below, not by this function.)
    */
  def syntheticBlockImage(pattern: Long, flipBlock: Int = -1,
                          blockPx: Int = 4): Array[Byte] = {
    require(blockPx >= 1, s"blockPx must be >= 1: $blockPx")
    val side = 8 * blockPx
    val img = new BufferedImage(side, side, BufferedImage.TYPE_INT_RGB)
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val idx = by * 8 + bx
        val bright = ((pattern >>> idx) & 1L) == 1L
        val g = if (bright ^ (idx == flipBlock)) 200 else 50
        val rgb = (g << 16) | (g << 8) | g
        var y = by * blockPx
        while (y < (by + 1) * blockPx) {
          var x = bx * blockPx
          while (x < (bx + 1) * blockPx) { img.setRGB(x, y, rgb); x += 1 }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
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
