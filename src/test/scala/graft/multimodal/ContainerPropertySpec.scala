package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Model-based checks for the container codecs (seeded trials, same
  * style as CurationPropertySpec): the demux of a mux must return the
  * muxed frames byte-identically, for ARBITRARY frame bytes — the
  * sample-table / SimpleBlock machinery is codec-agnostic, so the
  * round-trip law must not depend on the payloads being JPEGs. Pure
  * byte-level tests: no SparkSession needed.
  */
class ContainerPropertySpec extends AnyFunSuite {

  private def randomFrames(rnd: Random): Seq[Array[Byte]] = {
    val n = 1 + rnd.nextInt(20)
    Seq.fill(n) {
      val len = 1 + rnd.nextInt(300)
      val b = new Array[Byte](len)
      rnd.nextBytes(b)
      b
    }
  }

  test("MP4: demux(mux(frames)) == frames for arbitrary byte frames") {
    val rnd = new Random(41)
    for (trial <- 1 to 25) {
      val frames = randomFrames(rnd)
      val w = 1 + rnd.nextInt(2000)
      val h = 1 + rnd.nextInt(2000)
      val fps = 1 + rnd.nextInt(60)
      val mp4 = Mp4Codec.mux(frames, w, h, fps)
      val meta = Mp4Codec.parse(mp4)
        .getOrElse(fail(s"trial $trial: mux output must parse"))
      assert(meta.timescale == fps && meta.duration == frames.length)
      val v = meta.video.getOrElse(fail(s"trial $trial: video track lost"))
      assert(v.width == w && v.height == h)
      assert(v.sampleSizes.map(_.toInt) == frames.map(_.length))
      val out = Mp4Codec.sampleFrames(mp4, frames.length)
        .getOrElse(fail(s"trial $trial: demux declined"))
      assert(out.map(_._2.toSeq) == frames.map(_.toSeq),
        s"trial $trial: frame bytes must round-trip")
      // offsets point at the true positions inside the payload
      assert(out.forall { case (off, bytes) =>
        mp4.slice(off.toInt, off.toInt + bytes.length).sameElements(bytes)
      })
    }
  }

  test("Matroska: demux(mux(frames)) == frames for arbitrary byte frames") {
    val rnd = new Random(42)
    for (trial <- 1 to 25) {
      val frames = randomFrames(rnd)
      val w = 1 + rnd.nextInt(2000)
      val h = 1 + rnd.nextInt(2000)
      val fps = 1 + rnd.nextInt(60)
      val mkv = EbmlCodec.mux(frames, w, h, fps)
      val meta = EbmlCodec.parse(mkv)
        .getOrElse(fail(s"trial $trial: mux output must parse"))
      assert(meta.docType == "matroska" && meta.nVideoBlocks == frames.length)
      val v = meta.video.getOrElse(fail(s"trial $trial: video track lost"))
      assert(v.width == w && v.height == h)
      val out = EbmlCodec.sampleFrames(mkv, frames.length)
        .getOrElse(fail(s"trial $trial: demux declined"))
      assert(out.map(_._2.toSeq) == frames.map(_.toSeq),
        s"trial $trial: frame bytes must round-trip")
      assert(out.forall { case (off, bytes) =>
        mkv.slice(off.toInt, off.toInt + bytes.length).sameElements(bytes)
      })
    }
  }

  test("both containers sample the same source frames at any n") {
    val rnd = new Random(43)
    val frames = randomFrames(rnd)
    val mp4 = Mp4Codec.mux(frames, 64, 64, 10)
    val mkv = EbmlCodec.mux(frames, 64, 64, 10)
    for (n <- 1 to frames.length + 3) {
      val a = Mp4Codec.sampleFrames(mp4, n).get.map(_._2.toSeq)
      val b = EbmlCodec.sampleFrames(mkv, n).get.map(_._2.toSeq)
      assert(a == b, s"n=$n: the evenly-spaced sample sets must agree")
    }
  }

  test("long Matroska streams keep every SimpleBlock timecode in int16 range") {
    // 40 s at 25 fps crosses the 32767 ms relative-timecode ceiling: the
    // muxer must roll to a new Cluster (with its own absolute Timecode)
    // instead of wrapping the int16 field negative
    val frames = (0 until 1000).map(i => Array((i % 256).toByte))
    val mkv = EbmlCodec.mux(frames, 8, 8, fps = 25)
    val meta = EbmlCodec.parse(mkv).getOrElse(fail("long mux must parse"))
    assert(meta.nVideoBlocks == 1000L)
    val out = EbmlCodec.sampleFrames(mkv, 1000).getOrElse(fail("demux declined"))
    assert(out.map(_._2.toSeq) == frames.map(_.toSeq))
    // walk every SimpleBlock and check its relative timecode is non-negative
    // and its cluster base + relative reproduces i*1000/fps exactly
    var absSeen = Vector.empty[Long]
    def els(b: Array[Byte], s: Int, e: Int): Seq[(Long, Int, Int)] = {
      // tiny local EBML walker mirroring the codec's (ids keep marker)
      val out = Seq.newBuilder[(Long, Int, Int)]
      var p = s
      var ok = true
      while (ok && p < e) {
        def vlen(x: Int) = { var m = 0x80; var l = 1
          while (m != 0 && (x & m) == 0) { m >>= 1; l += 1 }; if (m == 0) 0 else l }
        val il = vlen(b(p) & 0xff)
        var id = 0L; for (k <- 0 until il) id = (id << 8) | (b(p + k) & 0xffL)
        val sl = vlen(b(p + il) & 0xff)
        var sz = (b(p + il) & 0xffL) & ((1L << (8 - sl)) - 1)
        for (k <- 1 until sl) sz = (sz << 8) | (b(p + il + k) & 0xffL)
        val ds = p + il + sl
        if (il == 0 || sl == 0 || ds + sz > e) ok = false
        else { out += ((id, ds, (ds + sz).toInt)); p = (ds + sz).toInt }
      }
      out.result()
    }
    val seg = els(mkv, 0, mkv.length).collectFirst { case (0x18538067L, s, e) => (s, e) }.get
    val clusters = els(mkv, seg._1, seg._2).collect { case (0x1F43B675L, s, e) => (s, e) }
    assert(clusters.length > 1, "a 40 s stream must span multiple clusters")
    for ((cs, ce) <- clusters) {
      val kids = els(mkv, cs, ce)
      val base = kids.collectFirst { case (0xE7L, s, e) =>
        var v = 0L; for (k <- s until e) v = (v << 8) | (mkv(k) & 0xffL); v }.get
      kids.foreach {
        case (0xA3L, bs, _) =>
          val rel = ((mkv(bs + 1) & 0xff) << 8) | (mkv(bs + 2) & 0xff)
          assert(rel >= 0 && rel <= 32767, s"relative timecode $rel out of range")
          absSeen :+= (base + rel)
        case _ => ()
      }
    }
    assert(absSeen == frames.indices.map(i => i.toLong * 1000 / 25).toVector,
      "absolute timestamps must be exact and monotonic across clusters")
  }

  test("sampleFrames with n <= 0 declines gracefully in every codec") {
    val frames = Seq.fill(3)(Array.fill(20)(7.toByte))
    val mp4 = Mp4Codec.mux(frames, 8, 8, 10)
    val mkv = EbmlCodec.mux(frames, 8, 8, 10)
    for (n <- Seq(0, -1)) {
      assert(Mp4Codec.sampleFrames(mp4, n).forall(_.isEmpty))
      assert(EbmlCodec.sampleFrames(mkv, n).forall(_.isEmpty))
    }
  }

  test("hostile stco offsets decline instead of returning wrong bytes") {
    val frames = Seq.fill(2)(Array.fill(16)(3.toByte))
    val mp4 = Mp4Codec.mux(frames, 8, 8, 10)
    // find the stco box and overwrite its first chunk offset with a
    // value beyond the payload (high bit set: would wrap toInt negative)
    val idx = {
      val pat = "stco".getBytes("ISO-8859-1")
      (0 until mp4.length - 4).find(i => pat.indices.forall(j => mp4(i + j) == pat(j)))
    }.getOrElse(fail("stco box not found"))
    val c = mp4.clone()
    val off0 = idx + 4 + 4 + 4 // version/flags + entry_count, then entry 0
    c(off0) = 0x80.toByte; c(off0 + 1) = 0; c(off0 + 2) = 0; c(off0 + 3) = 0
    assert(Mp4Codec.sampleFrames(c, 2).isEmpty,
      "an out-of-payload sample offset must decline the whole demux")
  }

  test("truncation at every prefix length never throws, only declines or parses") {
    val rnd = new Random(44)
    val frames = Seq.fill(3)(Array.fill(40)(rnd.nextInt(256).toByte))
    val mp4 = Mp4Codec.mux(frames, 8, 8, 10)
    val mkv = EbmlCodec.mux(frames, 8, 8, 10)
    // every prefix parses to Some or None — no exception escapes, the
    // contract the per-partition probe chain relies on
    for (len <- 0 to mp4.length) Mp4Codec.parse(mp4.take(len))
    for (len <- 0 to mkv.length) EbmlCodec.parse(mkv.take(len))
    // corrupting any single byte of the metadata regions likewise
    for (i <- 0 until math.min(200, mp4.length)) {
      val c = mp4.clone(); c(i) = (c(i) ^ 0x5a).toByte
      Mp4Codec.parse(c)
    }
    for (i <- 0 until math.min(200, mkv.length)) {
      val c = mkv.clone(); c(i) = (c(i) ^ 0x5a).toByte
      EbmlCodec.parse(c)
    }
  }
}
