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
