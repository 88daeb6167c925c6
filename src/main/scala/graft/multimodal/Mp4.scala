package graft.multimodal

/** ISO base-media (MP4) container support with pure JDK byte machinery —
  * no codec library.
  *
  * What is REAL here: the box-tree walk (ftyp/moov/trak/mdia/minf/stbl),
  * movie + track header metadata (timescale, duration, track dims,
  * handler), the sample-description fourcc, and the full sample-table
  * resolution (stsz sizes × stsc chunk runs × stco/co64 chunk offsets →
  * per-sample byte ranges). That is everything a demuxer does before the
  * codec: [[Mp4Codec.sampleFrames]] returns the actual encoded sample
  * bytes at their actual mdat offsets, decoding nothing. For 'jpeg'
  * tracks (Motion-JPEG in MP4 — the no-transcode mux of an MJPEG
  * stream) each extracted sample is itself a complete JPEG, so
  * `javax.imageio` turns them into pixels and the whole
  * mux → demux → decode path runs with zero stubs. Pixel decode of
  * avc1/hevc/vp9 samples is the one thing that still needs an external
  * codec.
  *
  * [[Mp4Codec.mux]] is the inverse: it writes a minimal valid
  * single-video-track MP4 (ftyp, mdat, moov with the full stbl) from
  * pre-encoded frame bytes — container assembly without transcoding,
  * the cheap path for normalizing raw MJPEG capture streams into a
  * seekable container at ingest time. Scale shape: both directions are
  * per-payload, map-only; nothing here touches Spark state.
  *
  * Reference analog: the reference treats media as opaque blobs; this
  * implements the builder brief's multimodal column contract (decode /
  * feature-extract / frame-sample over binary columns).
  */
object Mp4Codec {

  /** One parsed track: handler ('vide'/'soun'), sample-entry fourcc,
    * tkhd display dims (16.16 fixed → int), mdhd media timescale /
    * duration, and the resolved per-sample byte layout. */
  case class Mp4Track(handler: String, codec: String, width: Int,
      height: Int, timescale: Long, duration: Long,
      sampleOffsets: IndexedSeq[Long], sampleSizes: IndexedSeq[Long])

  case class Mp4Meta(brand: String, timescale: Long, duration: Long,
      tracks: Seq[Mp4Track]) {
    def video: Option[Mp4Track] = tracks.find(_.handler == "vide")
    def audio: Option[Mp4Track] = tracks.find(_.handler == "soun")
  }

  private def u32(b: Array[Byte], p: Int): Long =
    ((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
      ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL)

  private def u64(b: Array[Byte], p: Int): Long =
    (u32(b, p) << 32) | u32(b, p + 4)

  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, "ISO-8859-1")

  /** (type, payloadStart, payloadEnd) of each box in [start, end);
    * stops at the first malformed header (truncated payloads parse as
    * far as they go). Handles 64-bit largesize and size==0 (to-end). */
  private def boxes(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var p = start
    var done = false
    while (!done && p + 8 <= end) {
      val size0 = u32(b, p)
      val typ = fourcc(b, p + 4)
      val (hdr, size) =
        if (size0 == 1 && p + 16 <= end) (16L, u64(b, p + 8))
        else if (size0 == 0) (8L, (end - p).toLong)
        else (8L, size0)
      if (size < hdr || p + size > end) done = true
      else {
        out += ((typ, p + hdr.toInt, p + size.toInt))
        p += size.toInt
      }
    }
    out.result()
  }

  /** Parse container metadata + sample tables. None unless the payload
    * opens with a well-formed ftyp and carries a moov. Any structural
    * corruption short-circuits to None — callers fall through to the
    * next codec in the probe chain. */
  def parse(b: Array[Byte]): Option[Mp4Meta] =
    try {
      val top = boxes(b, 0, b.length)
      val brand = top.collectFirst {
        case ("ftyp", s, e) if e - s >= 4 => fourcc(b, s)
      }
      val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
      (brand, moov) match {
        case (Some(br), Some((ms, me))) =>
          val mv = boxes(b, ms, me)
          val (ts, dur) = mv.collectFirst { case ("mvhd", s, _) =>
            if ((b(s) & 0xff) == 1) (u32(b, s + 20), u64(b, s + 24))
            else (u32(b, s + 12), u32(b, s + 16))
          }.getOrElse((0L, 0L))
          Some(Mp4Meta(br, ts, dur,
            mv.collect { case ("trak", s, e) => parseTrak(b, s, e) }.flatten))
        case _ => None
      }
    } catch { case _: Exception => None }

  private def parseTrak(b: Array[Byte], s: Int, e: Int): Option[Mp4Track] = {
    val tk = boxes(b, s, e)
    // tkhd: after version/flags + times + track_id + reserved + duration
    // come reserved(8) layer(2) alternate(2) volume(2) reserved(2)
    // matrix(36), then width/height as 16.16 fixed point
    val dims = tk.collectFirst { case ("tkhd", ts, te) =>
      val afterDur = if ((b(ts) & 0xff) == 1) ts + 4 + 8 + 8 + 4 + 4 + 8
                     else ts + 4 + 4 + 4 + 4 + 4 + 4
      val wOff = afterDur + 8 + 2 + 2 + 2 + 2 + 36
      if (wOff + 8 > te) (0, 0)
      else ((u32(b, wOff) >> 16).toInt, (u32(b, wOff + 4) >> 16).toInt)
    }
    tk.collectFirst { case ("mdia", ms, me) => (ms, me) }.flatMap {
      case (ms, me) =>
        val md = boxes(b, ms, me)
        val handler = md.collectFirst { case ("hdlr", hs, he) if he - hs >= 12 =>
          fourcc(b, hs + 8)
        }.getOrElse("????")
        val (mts, mdur) = md.collectFirst { case ("mdhd", hs, _) =>
          if ((b(hs) & 0xff) == 1) (u32(b, hs + 20), u64(b, hs + 24))
          else (u32(b, hs + 12), u32(b, hs + 16))
        }.getOrElse((0L, 0L))
        for {
          (is, ie) <- md.collectFirst { case ("minf", x, y) => (x, y) }
          (ss, se) <- boxes(b, is, ie).collectFirst { case ("stbl", x, y) => (x, y) }
        } yield {
          val st = boxes(b, ss, se)
          // stsd payload: version/flags(4) entry_count(4), then the first
          // sample entry: size(4) format(4cc)
          val codec = st.collectFirst {
            case ("stsd", x, y) if y - x >= 16 => fourcc(b, x + 12)
          }.getOrElse("????")
          val sizes: IndexedSeq[Long] = st.collectFirst { case ("stsz", x, _) =>
            val fixed = u32(b, x + 4)
            val cnt = u32(b, x + 8).toInt
            if (fixed != 0) IndexedSeq.fill(cnt)(fixed)
            else (0 until cnt).map(i => u32(b, x + 12 + 4 * i)): IndexedSeq[Long]
          }.getOrElse(IndexedSeq.empty)
          val chunkOffs: IndexedSeq[Long] = st.collectFirst {
            case ("stco", x, _) =>
              (0 until u32(b, x + 4).toInt).map(i => u32(b, x + 8 + 4 * i)): IndexedSeq[Long]
            case ("co64", x, _) =>
              (0 until u32(b, x + 4).toInt).map(i => u64(b, x + 8 + 8 * i)): IndexedSeq[Long]
          }.getOrElse(IndexedSeq.empty)
          // stsc runs: (first_chunk 1-based, samples_per_chunk); expand
          // to a per-chunk count, then lay samples out cumulatively
          val stsc: IndexedSeq[(Long, Long)] = st.collectFirst { case ("stsc", x, _) =>
            (0 until u32(b, x + 4).toInt)
              .map(i => (u32(b, x + 8 + 12 * i), u32(b, x + 12 + 12 * i))): IndexedSeq[(Long, Long)]
          }.getOrElse(IndexedSeq.empty)
          val offs = IndexedSeq.newBuilder[Long]
          var run = 0
          var si = 0
          var c = 0
          while (c < chunkOffs.length && si < sizes.length && stsc.nonEmpty) {
            while (run + 1 < stsc.length && stsc(run + 1)._1 <= c + 1) run += 1
            var within = 0L
            var k = 0L
            while (k < stsc(run)._2 && si < sizes.length) {
              offs += chunkOffs(c) + within
              within += sizes(si)
              si += 1
              k += 1
            }
            c += 1
          }
          Mp4Track(handler, codec, dims.map(_._1).getOrElse(0),
            dims.map(_._2).getOrElse(0), mts, mdur, offs.result(), sizes)
        }
    }
  }

  /** The sampled-demux access pattern on the real sample table: `n`
    * evenly-spaced distinct video samples as (mdatByteOffset,
    * encodedSampleBytes). No decode — for a 'jpeg' track the bytes ARE
    * a decodable image; for avc1 etc. they are the codec payload an FFI
    * decoder would take. None when there is no video track or the
    * sample table is empty/out-of-bounds. */
  def sampleFrames(payload: Array[Byte], n: Int): Option[Seq[(Long, Array[Byte])]] =
    parse(payload).flatMap(_.video)
      .filter(t => t.sampleOffsets.nonEmpty &&
        t.sampleOffsets.length == t.sampleSizes.length)
      .map { t =>
        val k = t.sampleOffsets.length
        FrameSampling.indices(k, n).map { i =>
          val off = t.sampleOffsets(i)
          // a corrupt/hostile stco|co64 offset outside the payload must
          // DECLINE (empty frame → the forall below), never wrap toInt
          // and silently return bytes from the wrong place
          if (off < 0 || off >= payload.length) (off, Array.emptyByteArray)
          else {
            val end = math.min(payload.length.toLong, off + t.sampleSizes(i))
            (off, payload.slice(off.toInt, end.toInt))
          }
        }
      }
      .filter(_.forall(_._2.nonEmpty))

  /** Normalized histogram of encoded-sample sizes — a real, deterministic
    * container-level content feature (keyframe cadence / complexity
    * signature) computed without any decode. */
  def sampleSizeHistogram(sizes: Seq[Long], bins: Int = 8): Array[Float] = {
    if (sizes.isEmpty) return new Array[Float](bins)
    val mx = math.max(1L, sizes.max)
    val counts = new Array[Long](bins)
    sizes.foreach(s => counts(math.min(bins - 1, (s * bins / (mx + 1)).toInt)) += 1)
    counts.map(_.toFloat / sizes.length)
  }

  // ------------------------------------------------------------- muxer

  private def be32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def box(typ: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ typ.getBytes("ISO-8859-1") ++ body
  }

  private def fixed1616(v: Int): Array[Byte] = be32(v.toLong << 16)

  /** Mux pre-encoded frames (one sample each, e.g. JPEGs from an MJPEG
    * stream) into a minimal valid single-track video MP4: ftyp + mdat +
    * moov{mvhd, trak{tkhd, mdia{mdhd, hdlr(vide), minf{vmhd, dinf,
    * stbl{stsd(fourcc), stts, stsc, stsz, stco}}}}}. One chunk per
    * sample keeps the chunk map trivial and the layout append-friendly.
    * `fps` drives the timescale (ticks = frames, timescale = fps). */
  def mux(frames: Seq[Array[Byte]], width: Int, height: Int,
          fps: Int = 25, codec: String = "jpeg"): Array[Byte] = {
    require(frames.nonEmpty, "mux needs at least one frame")
    require(codec.length == 4, s"codec must be a fourcc, got '$codec'")
    val ftyp = box("ftyp", "isom".getBytes("ISO-8859-1"), be32(512),
      "isomiso2".getBytes("ISO-8859-1"))
    val mdatBody = frames.flatten.toArray
    val mdat = box("mdat", mdatBody)
    val firstSample = ftyp.length + mdat.length - mdatBody.length
    val offsets = frames.scanLeft(firstSample.toLong)(_ + _.length).init
    val nf = frames.length.toLong
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(fps), be32(nf),
      fixed1616(1) /* rate */, be16(0x0100) ++ be16(0) /* volume+res */,
      new Array[Byte](8) /* reserved */,
      // identity matrix: 0x00010000 on the diagonal, 0x40000000 last
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      new Array[Byte](24) /* pre_defined */, be32(2) /* next track */)
    val tkhd = box("tkhd", be32(7) /* v0 + enabled|in-movie|in-preview */,
      be32(0), be32(0), be32(1) /* track_id */, be32(0), be32(nf),
      new Array[Byte](8), be16(0) ++ be16(0) /* layer+alternate */,
      be16(0) ++ be16(0) /* volume+reserved */,
      be32(0x00010000L), be32(0), be32(0), be32(0), be32(0x00010000L),
      be32(0), be32(0), be32(0), be32(0x40000000L),
      fixed1616(width), fixed1616(height))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(fps), be32(nf),
      be16(0x55c4) /* und */ ++ be16(0))
    val hdlr = box("hdlr", be32(0), be32(0),
      "vide".getBytes("ISO-8859-1"), new Array[Byte](12),
      "graft ".getBytes("ISO-8859-1"))
    // VisualSampleEntry: reserved(6) data_ref_idx(2) pre_defined(16)
    // width(2) height(2) h/v resolution(4+4) reserved(4) frame_count(2)
    // compressorname(32) depth(2) pre_defined(2)
    val entry = box(codec, new Array[Byte](6), be16(1),
      new Array[Byte](16), be16(width), be16(height),
      be32(0x00480000L), be32(0x00480000L), be32(0), be16(1),
      new Array[Byte](32), be16(24), be16(-1 & 0xffff))
    val stsd = box("stsd", be32(0), be32(1), entry)
    val stts = box("stts", be32(0), be32(1), be32(nf), be32(1))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(1), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(nf),
      frames.flatMap(f => be32(f.length.toLong)).toArray)
    val stco = box("stco", be32(0), be32(nf),
      offsets.flatMap(be32).toArray)
    val dref = box("dref", be32(0), be32(1),
      box("url ", be32(1) /* self-contained flag */))
    val minf = box("minf",
      box("vmhd", be32(1), new Array[Byte](8)),
      box("dinf", dref),
      box("stbl", stsd, stts, stsc, stsz, stco))
    val moov = box("moov", mvhd,
      box("trak", tkhd, box("mdia", mdhd, hdlr, minf)))
    ftyp ++ mdat ++ moov
  }
}
