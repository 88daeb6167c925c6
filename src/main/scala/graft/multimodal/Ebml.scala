package graft.multimodal

/** Matroska / webm container support with pure JDK byte machinery — the
  * EBML sibling of [[Mp4Codec]].
  *
  * What is REAL here: EBML varint decoding (IDs keep their length
  * marker, sizes strip it, all-ones means unknown/to-end), the element
  * walk (EBML header → DocType; Segment → Info{TimecodeScale, Duration}
  * / Tracks{TrackEntry{TrackNumber, TrackType, CodecID,
  * Video{PixelWidth, PixelHeight}, Audio{SamplingFrequency, Channels}}}
  * / Cluster{SimpleBlock}), and frame extraction: each un-laced
  * SimpleBlock of the video track yields its payload bytes at their
  * true file offset. For `V_MJPEG` tracks (Motion-JPEG in Matroska — a
  * real registered codec id) every extracted frame is a complete JPEG
  * that `javax.imageio` decodes, so mux → demux → decode runs with zero
  * stubs, exactly like the MP4 'jpeg' path. Pixel decode of V_VP8/V_VP9
  * /V_MPEG4 payloads is the one thing that still needs an external
  * codec.
  *
  * [[EbmlCodec.mux]] writes a minimal valid single-video-track
  * Matroska file (EBML header, Segment with Info/Tracks/one Cluster of
  * keyframe SimpleBlocks) from pre-encoded frames. Both directions are
  * per-payload and map-only.
  */
object EbmlCodec {

  case class MkvTrack(number: Long, trackType: Long, codecId: String,
      width: Int, height: Int, sampleRate: Double, channels: Int)

  case class MkvMeta(docType: String, timecodeScale: Long,
      durationTicks: Double, tracks: Seq[MkvTrack], nVideoBlocks: Long) {
    def video: Option[MkvTrack] = tracks.find(_.trackType == 1L)
    def audio: Option[MkvTrack] = tracks.find(_.trackType == 2L)
  }

  /** Leading-zero count of an EBML varint's first byte → total length;
    * 0 for an invalid (0x00) lead byte. */
  private def vintLen(b0: Int): Int = {
    var mask = 0x80
    var len = 1
    while (mask != 0 && (b0 & mask) == 0) { mask >>= 1; len += 1 }
    if (mask == 0) 0 else len
  }

  /** (idValueIncludingMarker, bytesConsumed); (-1, 0) on malformed. */
  private def readId(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) return (-1L, 0)
    val len = vintLen(b(p) & 0xff)
    if (len == 0 || len > 4 || p + len > b.length) return (-1L, 0)
    var v = 0L
    var i = 0
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    (v, len)
  }

  /** (sizeWithMarkerStripped, bytesConsumed); size == -1 encodes the
    * spec's unknown-size (all value bits set); (-2, 0) on malformed. */
  private def readSize(b: Array[Byte], p: Int): (Long, Int) = {
    if (p >= b.length) return (-2L, 0)
    val len = vintLen(b(p) & 0xff)
    if (len == 0 || len > 8 || p + len > b.length) return (-2L, 0)
    var v = (b(p) & 0xffL) & ((1L << (8 - len)) - 1)
    var i = 1
    while (i < len) { v = (v << 8) | (b(p + i) & 0xffL); i += 1 }
    val allOnes = (1L << (7 * len)) - 1
    (if (v == allOnes) -1L else v, len)
  }

  /** (id, dataStart, dataEnd) of each child element in [start, end);
    * unknown-size elements run to the region end; stops at the first
    * malformed header. */
  private def elements(b: Array[Byte], start: Int, end: Int): Seq[(Long, Int, Int)] = {
    val out = Seq.newBuilder[(Long, Int, Int)]
    var p = start
    var done = false
    while (!done && p < end) {
      val (id, idLen) = readId(b, p)
      val (size, szLen) = if (idLen == 0) (-2L, 0) else readSize(b, p + idLen)
      if (idLen == 0 || szLen == 0) done = true
      else {
        val ds = p + idLen + szLen
        val de = if (size == -1L) end.toLong else ds.toLong + size
        if (size < -1L || de > end || de < ds) done = true
        else { out += ((id, ds, de.toInt)); p = de.toInt }
      }
    }
    out.result()
  }

  private def uint(b: Array[Byte], s: Int, e: Int): Long = {
    var v = 0L
    var i = s
    while (i < e) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  private def float(b: Array[Byte], s: Int, e: Int): Double = (e - s) match {
    case 4 => java.lang.Float.intBitsToFloat(uint(b, s, e).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uint(b, s, e))
    case _ => 0.0
  }

  private def str(b: Array[Byte], s: Int, e: Int): String =
    new String(b, s, e - s, "ISO-8859-1").takeWhile(_ != '\u0000')

  private val IdEbml = 0x1A45DFA3L
  private val IdDocType = 0x4282L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549A966L
  private val IdTimecodeScale = 0x2AD7B1L
  private val IdDuration = 0x4489L
  private val IdTracks = 0x1654AE6BL
  private val IdTrackEntry = 0xAEL
  private val IdTrackNumber = 0xD7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdVideo = 0xE0L
  private val IdPixelWidth = 0xB0L
  private val IdPixelHeight = 0xBAL
  private val IdAudio = 0xE1L
  private val IdSamplingFrequency = 0xB5L
  private val IdChannels = 0x9FL
  private val IdCluster = 0x1F43B675L
  private val IdSimpleBlock = 0xA3L

  /** Parse container metadata. None unless the payload opens with a
    * well-formed EBML header followed by a Segment. */
  def parse(b: Array[Byte]): Option[MkvMeta] =
    parseImpl(b, collectRanges = false).map(_._1)

  /** The single walk behind both [[parse]] and [[sampleFrames]]:
    * metadata plus (only when `collectRanges` — the metadata-only path
    * must not allocate a tuple per block) the un-laced video-track
    * frame ranges collected in the same Cluster pass. `nVideoBlocks`
    * still counts EVERY video-track SimpleBlock, laced or not, either
    * way, so sampling a payload never scans it twice and metadata
    * extraction never pays for frame ranges it discards. */
  private def parseImpl(b: Array[Byte], collectRanges: Boolean)
      : Option[(MkvMeta, IndexedSeq[(Int, Int)])] =
    try {
      val top = elements(b, 0, b.length)
      val header = top.collectFirst { case (IdEbml, s, e) => (s, e) }
      val segment = top.collectFirst { case (IdSegment, s, e) => (s, e) }
      (header, segment) match {
        case (Some((hs, he)), Some((ss, se))) =>
          val docType = elements(b, hs, he).collectFirst {
            case (IdDocType, ds, de) => str(b, ds, de)
          }.getOrElse("matroska")
          val seg = elements(b, ss, se)
          val (scale, dur) = seg.collectFirst { case (IdInfo, is, ie) =>
            val info = elements(b, is, ie)
            (info.collectFirst { case (IdTimecodeScale, x, y) => uint(b, x, y) }
              .getOrElse(1000000L),
              info.collectFirst { case (IdDuration, x, y) => float(b, x, y) }
                .getOrElse(0.0))
          }.getOrElse((1000000L, 0.0))
          val tracks = seg.collectFirst { case (IdTracks, ts, te) =>
            elements(b, ts, te).collect { case (IdTrackEntry, es, ee) =>
              val en = elements(b, es, ee)
              val (w, h) = en.collectFirst { case (IdVideo, vs, ve) =>
                val v = elements(b, vs, ve)
                (v.collectFirst { case (IdPixelWidth, x, y) => uint(b, x, y).toInt }.getOrElse(0),
                  v.collectFirst { case (IdPixelHeight, x, y) => uint(b, x, y).toInt }.getOrElse(0))
              }.getOrElse((0, 0))
              val (sr, ch) = en.collectFirst { case (IdAudio, as, ae) =>
                val a = elements(b, as, ae)
                (a.collectFirst { case (IdSamplingFrequency, x, y) => float(b, x, y) }.getOrElse(0.0),
                  a.collectFirst { case (IdChannels, x, y) => uint(b, x, y).toInt }.getOrElse(0))
              }.getOrElse((0.0, 0))
              MkvTrack(
                en.collectFirst { case (IdTrackNumber, x, y) => uint(b, x, y) }.getOrElse(0L),
                en.collectFirst { case (IdTrackType, x, y) => uint(b, x, y) }.getOrElse(0L),
                en.collectFirst { case (IdCodecId, x, y) => str(b, x, y) }.getOrElse("?"),
                w, h, sr, ch)
            }
          }.getOrElse(Seq.empty)
          val videoNo = tracks.find(_.trackType == 1L).map(_.number)
          var nBlocks = 0L
          val ranges = IndexedSeq.newBuilder[(Int, Int)]
          videoNo.foreach { no =>
            seg.foreach {
              case (IdCluster, cs, ce) =>
                elements(b, cs, ce).foreach {
                  case (IdSimpleBlock, bs, be) if blockTrack(b, bs, be) == no =>
                    nBlocks += 1
                    if (collectRanges) blockFrame(b, bs, be).foreach(ranges += _)
                  case _ => ()
                }
              case _ => ()
            }
          }
          Some((MkvMeta(docType, scale, dur, tracks, nBlocks), ranges.result()))
        case _ => None
      }
    } catch { case _: Exception => None }

  /** Track number of a SimpleBlock (its leading EBML varint). */
  private def blockTrack(b: Array[Byte], s: Int, e: Int): Long =
    if (s >= e) -1L else readSize(b, s) match { case (v, _) => v }

  /** Frame-data (start, end) inside an un-laced SimpleBlock: varint
    * track + int16 timecode + flags byte, then the single frame. None
    * for laced blocks (lacing bits 0x06 set). */
  private def blockFrame(b: Array[Byte], s: Int, e: Int): Option[(Int, Int)] = {
    val (_, tLen) = readSize(b, s)
    val fs = s + tLen + 3
    if (tLen == 0 || fs > e) None
    else if (((b(s + tLen + 2) & 0x06)) != 0) None // laced: decline
    else Some((fs, e))
  }

  /** `n` evenly-sampled distinct video frames as (fileByteOffset,
    * frameBytes) — for V_MJPEG each is a decodable JPEG. None when
    * there is no video track or no un-laced blocks. */
  def sampleFrames(payload: Array[Byte], n: Int): Option[Seq[(Long, Array[Byte])]] =
    parseImpl(payload, collectRanges = true).flatMap { case (meta, ranges) =>
      if (meta.video.isEmpty || ranges.isEmpty) None
      else Some(FrameSampling.indices(ranges.length, n).map { i =>
        val (fs, fe) = ranges(i)
        (fs.toLong, payload.slice(fs, fe))
      })
    }

  // ------------------------------------------------------------- muxer

  /** Minimal-length EBML size varint (marker included); lengths whose
    * all-ones pattern would read as unknown-size are bumped one byte. */
  private def encSize(v: Long): Array[Byte] = {
    require(v >= 0, s"EBML size must be non-negative, got $v")
    var len = 1
    while (len <= 8 && (v > (1L << (7 * len)) - 2)) len += 1 // -2: avoid all-ones
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out(0) = (out(0) | (0x80 >> (len - 1))).toByte
    out
  }

  private def encId(id: Long): Array[Byte] = {
    val len = if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
              else if (id <= 0xffffffL) 3 else 4
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = id
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def el(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    encId(id) ++ encSize(body.length.toLong) ++ body
  }

  private def uintBytes(v: Long): Array[Byte] = {
    if (v == 0) return Array(0.toByte)
    var len = 8
    while (len > 1 && (v >>> ((len - 1) * 8)) == 0) len -= 1
    val out = new Array[Byte](len)
    var i = len - 1
    var rest = v
    while (i >= 0) { out(i) = (rest & 0xff).toByte; rest >>= 8; i -= 1 }
    out
  }

  private def doubleBytes(v: Double): Array[Byte] = {
    val bits = java.lang.Double.doubleToLongBits(v)
    (0 until 8).map(i => ((bits >> ((7 - i) * 8)) & 0xff).toByte).toArray
  }

  /** Mux pre-encoded frames into a minimal valid single-video-track
    * Matroska file. `codecId` defaults to V_MJPEG (frames are complete
    * JPEGs, no transcode). One keyframe SimpleBlock per frame;
    * TimecodeScale is fixed at 1e6 (ns per tick = 1 ms) and Duration
    * is `frames/fps` in those ticks. Blocks are grouped into Clusters
    * so every SimpleBlock's RELATIVE timecode fits its signed-16-bit
    * field: a new Cluster (with its own absolute Timecode element)
    * starts whenever `frameTick - clusterBase` would exceed 32767 —
    * streams longer than ~32.7 s stay timestamp-correct for real
    * demuxers instead of silently wrapping negative. */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
          fps: Int = 25, codecId: String = "V_MJPEG"): Array[Byte] = {
    require(frames.nonEmpty, "mux needs at least one frame")
    val header = el(IdEbml,
      el(0x4286L, uintBytes(1)), // EBMLVersion
      el(0x42F7L, uintBytes(1)), // EBMLReadVersion
      el(0x42F2L, uintBytes(4)), // EBMLMaxIDLength
      el(0x42F3L, uintBytes(8)), // EBMLMaxSizeLength
      el(IdDocType, "matroska".getBytes("ISO-8859-1")),
      el(0x4287L, uintBytes(2)), // DocTypeVersion
      el(0x4285L, uintBytes(2))) // DocTypeReadVersion
    val info = el(IdInfo,
      el(IdTimecodeScale, uintBytes(1000000L)),
      el(IdDuration, doubleBytes(frames.length.toDouble * 1000 / fps)))
    val tracks = el(IdTracks,
      el(IdTrackEntry,
        el(IdTrackNumber, uintBytes(1)),
        el(0x73C5L, uintBytes(1)), // TrackUID
        el(IdTrackType, uintBytes(1)), // video
        el(IdCodecId, codecId.getBytes("ISO-8859-1")),
        el(IdVideo,
          el(IdPixelWidth, uintBytes(width.toLong)),
          el(IdPixelHeight, uintBytes(height.toLong)))))
    // group frames into clusters whose relative timecodes fit int16
    val ticks = frames.indices.map(i => i.toLong * 1000 / fps)
    val clusters = Seq.newBuilder[Array[Byte]]
    var s = 0
    while (s < frames.length) {
      val base = ticks(s)
      var e = s + 1
      while (e < frames.length && ticks(e) - base <= 32767L) e += 1
      val blocks = (s until e).map { i =>
        // SimpleBlock: track varint (1 → 0x81), int16 relative
        // timecode, flags 0x80 (keyframe, no lacing), then the frame
        val rel = (ticks(i) - base).toInt
        el(IdSimpleBlock,
          Array(0x81.toByte, (rel >> 8).toByte, (rel & 0xff).toByte,
            0x80.toByte),
          frames(i))
      }
      clusters += el(IdCluster,
        (el(0xE7L, uintBytes(base)) +: blocks): _*) // abs Timecode, blocks
      s = e
    }
    header ++ el(IdSegment,
      (Seq(info, tracks) ++ clusters.result()): _*)
  }
}
