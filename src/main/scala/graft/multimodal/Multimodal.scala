package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (builder brief): image/audio/video travel
  * as opaque `binary` columns with typed metadata; decode / feature
  * extraction runs per-partition in bounded batches.
  *
  * The IMAGE path is real: the JDK ships `javax.imageio`
  * (PNG/JPEG/GIF/BMP header probe, pixel decode) so [[ImageCodec]]
  * needs no external libraries. The AUDIO path is real too:
  * `javax.sound.sampled` reads WAV/AIFF/AU containers and PCM samples
  * ([[AudioCodec]]). Frame sampling is real for the JDK-decodable
  * animation container (animated GIF via the same ImageIO readers),
  * for raw MJPEG streams ([[MjpegCodec]]), and — at the container
  * level — for MP4: [[Mp4Codec]] walks the real ISO-BMFF box tree and
  * sample tables (mux and demux), so mp4 metadata, frame counts, and
  * per-frame encoded bytes are all real; only PIXEL decode of
  * non-JPEG codec payloads (avc1/hevc/vp9 — no JDK codec) still goes
  * through `StubCodec`, the deterministic fake standing in for a
  * JNI/FFI decoder. Payloads no reader claims (including the
  * text-derived fixtures) fall back to the stub as well, so the
  * plumbing behaves identically for every kind.
  *
  * Scale notes: `mapPartitions` keeps one codec instance per task (the
  * expensive init happens once per partition, not per row) and streams
  * the iterator — no partition-sized materialization. Binary payloads
  * stay off the shuffle path: metadata is extracted first, heavy columns
  * are dropped before any wide operation.
  */
/** The ONE even-sampling index formula shared by every frame sampler
  * (GIF, MJPEG, MP4, Matroska): `n` evenly-spaced distinct indices into
  * `k` source frames — `floor(k*i/n)` for i in [0, n). Empty for a
  * non-positive request or an empty source, so every codec declines
  * `n <= 0` gracefully instead of dividing by it, and the cross-
  * container parity oracle (q125) rests on all paths sampling the
  * exact same source indices by construction. */
private[multimodal] object FrameSampling {
  def indices(k: Int, n: Int): Seq[Int] =
    if (n <= 0 || k <= 0) Seq.empty
    else (0 until n).map(i => (k.toLong * i / n).toInt).distinct
}

/** Deterministic synthetic media fixtures — the frame generators the
  * container oracles (q124/q125) and specs share, so the "same frames
  * into both muxers" premise is true by construction instead of by
  * four drifting copies of the BufferedImage boilerplate. */
object MediaFixtures {
  /** A solid-gray `w`×`h` JPEG at the given 0-255 level, encoded by the
    * JDK's own writer (deterministic for fixed inputs). */
  def solidJpeg(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setColor(new java.awt.Color(level, level, level))
      g.fillRect(0, 0, w, h)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }
}

object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      header_hex: String,
      format: String, // decoded format name, or "stub" on the fake path
      width: Int, // images; 0 for audio
      height: Int,
      sample_rate: Int, // audio; 0 for images/stub
      channels: Int,
      n_frames: Long,
      features: Array[Float])

  /** Deterministic fake decoder: byte-derived pseudo-metadata, for
    * payloads with no JDK codec (audio/video, synthetic fixtures). A
    * real deployment swaps this object for an FFI codec; the Spark
    * plumbing around it is unchanged. */
  object StubCodec {
    def decode(payload: Array[Byte]): (Int, Int, Array[Float]) = {
      val n = payload.length
      val width = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(payload(0)))
      val height = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(payload(1)))
      val features = Array.tabulate(8) { i =>
        if (n == 0) 0f
        else payload(i % n).toFloat / 127f
      }
      (width, height, features)
    }
  }

  /** Real image decode via `javax.imageio` — JDK-only, nothing external.
    * PNG/JPEG/GIF/BMP width/height/format come from the actual headers
    * and pixels from the actual decoder. */
  object ImageCodec {
    /** Decode a payload some ImageIO reader claims:
      * (formatName, image); None for non-image bytes. */
    def decode(payload: Array[Byte]): Option[(String, java.awt.image.BufferedImage)] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              Option(r.read(0)).map(img => (r.getFormatName.toLowerCase, img))
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None } // truncated/corrupt payload

    /** 8-bin luminance histogram, normalized — a real, deterministic
      * content feature from the decoded pixels. */
    def luminanceHistogram(img: java.awt.image.BufferedImage,
                           bins: Int = 8): Array[Float] = {
      val counts = new Array[Long](bins)
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          counts(math.min(bins - 1, lum * bins / 256)) += 1
          x += 1
        }
        y += 1
      }
      val total = math.max(1L, img.getWidth.toLong * img.getHeight)
      counts.map(c => c.toFloat / total)
    }

    /** Decode `n` evenly-sampled frames from a MULTI-frame payload —
      * animated GIF is the JDK-decodable case (the same `javax.imageio`
      * reader used for stills exposes the frame sequence via
      * `getNumImages`/`read(i)`). One reader open per payload; only the
      * sampled frame indices are decoded, never the whole animation —
      * the access pattern a video sampler needs at scale. Sampled
      * indices are distinct (`k*i/n`), so a 4-frame GIF sampled at
      * n=8 yields 4 rows, not 8 duplicates. Each frame re-encodes as
      * PNG bytes; frames of animations with patch-composition disposal
      * return the raw decoded patch (honest decoder output, not a
      * compositor). None for payloads no reader claims. */
    def sampleFrames(payload: Array[Byte], n: Int): Option[Seq[(Int, Array[Byte])]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) None
          else {
            val r = readers.next()
            try {
              r.setInput(iis)
              val k = r.getNumImages(true)
              if (k <= 0) None
              else Some(FrameSampling.indices(k, n).map { i =>
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(r.read(i), "png", bos)
                  (i, bos.toByteArray)
                })
            } finally r.dispose()
          }
        } finally iis.close()
      } catch { case _: Exception => None }

    /** Scale to (w, h) and re-encode as PNG bytes. */
    def resizePng(img: java.awt.image.BufferedImage, w: Int, h: Int): Array[Byte] = {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = out.createGraphics()
      try g.drawImage(img, 0, 0, w, h, null)
      finally g.dispose()
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      bos.toByteArray
    }
  }

  /** Real VIDEO-stream frame sampling for raw MJPEG — the concatenated
    * JPEG stream IP cameras and many capture pipelines emit — with pure
    * JDK machinery: SOI/EOI marker scan to index frame boundaries
    * (cheap, no decode), then `javax.imageio` decodes ONLY the sampled
    * frames. mp4/webm stay stubbed (their codecs aren't in the JDK);
    * this is the real sampled-decode access pattern on a real video
    * stream format. Known honest limitation: an embedded EOI inside an
    * APPn thumbnail would split a frame early. */
  object MjpegCodec {

    /** (start, end-exclusive) byte ranges of each JPEG frame: a frame
      * runs from an FFD8 FF start-of-image to its FFD9 end-of-image.
      * Empty unless the payload begins with SOI. */
    def frameIndex(payload: Array[Byte]): IndexedSeq[(Int, Int)] = {
      val out = scala.collection.immutable.IndexedSeq.newBuilder[(Int, Int)]
      var p = 0
      def isSoi(i: Int) = i + 2 < payload.length &&
        payload(i) == 0xFF.toByte && payload(i + 1) == 0xD8.toByte &&
        payload(i + 2) == 0xFF.toByte
      while (isSoi(p)) {
        var q = p + 2
        var end = -1
        while (end < 0 && q + 1 < payload.length) {
          if (payload(q) == 0xFF.toByte && payload(q + 1) == 0xD9.toByte)
            end = q + 2
          q += 1
        }
        if (end < 0) return out.result() // truncated tail frame: drop
        out += ((p, end))
        p = end
      }
      out.result()
    }

    /** Evenly-sampled distinct frame indices of a ≥2-frame MJPEG
      * stream, each decoded and re-encoded as PNG (same contract as the
      * GIF path). None for anything else — a single JPEG is an image,
      * not a stream, and belongs to [[ImageCodec]]. */
    def sampleFrames(payload: Array[Byte], n: Int): Option[Seq[(Int, Array[Byte])]] = {
      val idx = frameIndex(payload)
      if (idx.length < 2) None
      else try Some(FrameSampling.indices(idx.length, n).map { i =>
          val (s, e) = idx(i)
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(payload.slice(s, e)))
          if (img == null) throw new java.io.IOException(s"frame $i undecodable")
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          (i, bos.toByteArray)
        })
      catch { case _: Exception => None }
    }
  }

  /** Real audio decode via `javax.sound.sampled` — JDK-only. WAV/AIFF/AU
    * header metadata (sample rate, channels, frame count) comes from the
    * actual container headers, and the amplitude histogram from the
    * actual PCM samples. */
  object AudioCodec {
    /** (containerType, format, frameLength) for payloads a JDK audio
      * reader claims; None for non-audio bytes. */
    def decode(payload: Array[Byte])
        : Option[(String, javax.sound.sampled.AudioFormat, Long)] =
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        Some((aff.getType.toString.toLowerCase, aff.getFormat,
          aff.getFrameLength.toLong))
      } catch { case _: Exception => None }

    /** 8-bin histogram of absolute 16-bit PCM amplitude, normalized —
      * a real, deterministic content feature from the decoded samples.
      * Non-16-bit payloads fall back to an all-zero vector (the JDK
      * decodes them; binning other sample widths isn't needed here). */
    def amplitudeHistogram(payload: Array[Byte], bins: Int = 8): Array[Float] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return new Array[Float](bins)
        val bytes = in.readAllBytes()
        val big = fmt.isBigEndian
        val counts = new Array[Long](bins)
        var i = 0
        while (i + 1 < bytes.length) {
          val s =
            if (big) ((bytes(i) << 8) | (bytes(i + 1) & 0xff)).toShort
            else ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort
          val a = math.abs(s.toInt)
          counts(math.min(bins - 1, a * bins / 32768)) += 1
          i += 2
        }
        val total = math.max(1L, counts.sum)
        counts.map(c => c.toFloat / total)
      } finally in.close()
    }
  }

  /** Decode + featurize each media row, one codec per partition: real
    * MJPEG stream metadata (marker-indexed frame count + one decoded
    * frame) for ≥2-frame video streams, real ImageIO metadata +
    * luminance histogram for decodable images, real javax.sound
    * metadata + amplitude histogram for decodable audio, real ISO-BMFF
    * demux (tkhd dims, stsz frame count, sample-size signature) for
    * MP4 containers, the stub for everything else (webm — no JDK
    * parser). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (expensive, once)
      rows.map { r =>
        val headerHex = r.payload.take(4).map("%02X".format(_)).mkString
        // MJPEG first (see sampleFrames): a ≥2-frame stream is VIDEO —
        // frame count from the marker index, dims + histogram from a
        // single decoded frame, never the whole stream
        val mjpeg = MjpegCodec.frameIndex(r.payload)
        val mjpegImg = if (mjpeg.length < 2) None
          else Option(javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(
              r.payload.slice(mjpeg.head._1, mjpeg.head._2))))
        mjpegImg match {
          case Some(img) =>
            MediaFeatures(r.media_id, r.kind, r.payload.length, headerHex,
              "mjpeg", img.getWidth, img.getHeight, 0, 0, mjpeg.length.toLong,
              ImageCodec.luminanceHistogram(img))
          case None => ImageCodec.decode(r.payload) match {
            case Some((fmt, img)) =>
              MediaFeatures(r.media_id, r.kind, r.payload.length, headerHex,
                fmt, img.getWidth, img.getHeight, 0, 0, 0L,
                ImageCodec.luminanceHistogram(img))
            case None => AudioCodec.decode(r.payload) match {
              case Some((fmt, af, frames)) =>
                MediaFeatures(r.media_id, r.kind, r.payload.length, headerHex,
                  fmt, 0, 0, af.getSampleRate.toInt, af.getChannels, frames,
                  AudioCodec.amplitudeHistogram(r.payload))
              case None => Mp4Codec.parse(r.payload) match {
                // real ISO-BMFF demux: metadata + sample table without
                // any codec — dims from tkhd, frame count from stsz,
                // features from the encoded-sample-size signature
                case Some(meta) if meta.tracks.nonEmpty =>
                  val tr = meta.video.orElse(meta.tracks.headOption).get
                  MediaFeatures(r.media_id, r.kind, r.payload.length,
                    headerHex, "mp4/" + tr.codec.trim, tr.width, tr.height,
                    if (tr.handler == "soun") tr.timescale.toInt else 0, 0,
                    tr.sampleSizes.length.toLong,
                    Mp4Codec.sampleSizeHistogram(tr.sampleSizes))
                case _ => EbmlCodec.parse(r.payload) match {
                  // real EBML walk: matroska/webm DocType, track dims,
                  // video SimpleBlock count — still no codec needed
                  case Some(meta) if meta.tracks.nonEmpty =>
                    val tr = meta.video.orElse(meta.tracks.headOption).get
                    MediaFeatures(r.media_id, r.kind, r.payload.length,
                      headerHex, meta.docType + "/" + tr.codecId,
                      tr.width, tr.height,
                      if (tr.trackType == 2L) tr.sampleRate.toInt else 0,
                      tr.channels, meta.nVideoBlocks,
                      new Array[Float](8))
                  case _ =>
                    val (w, h, feats) = StubCodec.decode(r.payload)
                    MediaFeatures(r.media_id, r.kind, r.payload.length,
                      headerHex, "stub", w, h, 0, 0, 0L, feats)
                }
              }
            }
          }
        }
      }
    }
  }

  /** Resize stage: decodable images are REALLY rescaled and re-encoded
    * as PNG (ImageIO + a headless BufferedImage render); other payloads
    * pass through with stub dims. The Spark contract — binary in,
    * (binary, new dims) out, partition-local batches, payload never
    * shuffled — is identical on both paths. */
  case class ResizedMedia(media_id: Long, kind: String, width: Int,
      height: Int, payload: Array[Byte])

  def resize(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        ImageCodec.decode(r.payload) match {
          case Some((_, img)) =>
            val scale = math.min(1.0,
              maxDim.toDouble / math.max(img.getWidth, img.getHeight))
            val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
              math.max(1, (img.getHeight * scale).toInt))
            ResizedMedia(r.media_id, r.kind, w, h,
              ImageCodec.resizePng(img, w, h))
          case None =>
            val (w0, h0, _) = StubCodec.decode(r.payload)
            val scale = math.min(1.0, maxDim.toDouble / math.max(w0, h0))
            ResizedMedia(r.media_id, r.kind,
              math.max(1, (w0 * scale).toInt), math.max(1, (h0 * scale).toInt),
              r.payload)
        }
      }
    }
  }

  /** Frame sampling: REAL decoded frames for payloads the JDK can
    * claim — raw MJPEG video streams (SOI/EOI-indexed, only sampled
    * frames decoded) and animated GIF (evenly-sampled distinct frame
    * indices), each re-encoded as PNG with `offset` = source frame
    * index; REAL demuxed frames for MP4 (`offset` = the sample's true
    * mdat byte offset, payload = its encoded bytes — a decodable JPEG
    * for 'jpeg' tracks) and Matroska/webm (`offset` = the SimpleBlock
    * frame's true byte position, payload = its encoded bytes); and the
    * deterministic byte-offset stub only for payloads NO parser claims
    * (there `offset` is a byte position and the payload a 16-byte
    * slice, standing in for an FFI decoder). One
    * output row per sampled frame either way — the UDTF batch shape an
    * ffmpeg-backed sampler would use, and only sampled frames are ever
    * decoded (never the whole animation). */
  case class Frame(media_id: Long, frame_no: Int, offset: Long,
      frame_payload: Array[Byte])

  def sampleFrames(media: Dataset[MediaRow], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      // MJPEG first: ImageIO's JPEG reader would claim the stream and
      // silently see only its first frame
      MjpegCodec.sampleFrames(r.payload, n)
        .orElse(ImageCodec.sampleFrames(r.payload, n)) match {
        case Some(frames) =>
          frames.zipWithIndex.map { case ((srcIdx, png), i) =>
            Frame(r.media_id, i, srcIdx.toLong, png)
          }
        case None => Mp4Codec.sampleFrames(r.payload, n)
          // real container demux (MP4 sample table, then Matroska
          // SimpleBlocks): each sampled frame's true byte offset +
          // encoded bytes (a complete JPEG for jpeg/V_MJPEG tracks;
          // the codec payload otherwise)
          .orElse(EbmlCodec.sampleFrames(r.payload, n)) match {
          case Some(frames) =>
            frames.zipWithIndex.map { case ((off, bytes), i) =>
              Frame(r.media_id, i, off, bytes)
            }
          case None =>
            val len = math.max(1, r.payload.length)
            (0 until n).map { i =>
              val off = (len.toLong * i) / n
              Frame(r.media_id, i, off,
                r.payload.slice(off.toInt, math.min(len, off.toInt + 16)))
            }
        }
      }
    }
  }

  /** Metadata-only projection that never deserializes the payload past
    * length/prefix — the cheap path for filtering before decode. */
  def metadata(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol),
      length(col(payloadCol)).as("n_bytes"),
      upper(hex(expr(s"substring($payloadCol, 1, 4)"))).as("header_hex"))

  /** Build a fake media table from documents (text bytes as payload) —
    * the container has no real images; plumbing-shape parity only. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id").as("media_id"), lit("image").as("kind"),
      col("text").cast("binary").as("payload")).as[MediaRow]
  }
}
