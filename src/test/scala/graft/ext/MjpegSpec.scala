package graft.ext

import org.scalatest.funsuite.AnyFunSuite

/** MJPEG family: baseline-JPEG encode→decode round-trips (bit-exact by the
  * constant-block construction), AVI demux, restart markers, edge crop,
  * and quick totality probes (the structure-aware fuzz lives in
  * CodecFuzzSpec). Pure JVM — no Spark session needed. */
class MjpegSpec extends AnyFunSuite {

  private def bv(bx: Int, by: Int): Int = (31 * bx + 57 * by + 5) % 256

  test("jpeg round-trip: constant blocks decode bit-exactly") {
    val bytes = Mjpeg.synthJpegGrayBlocks(24, 16, bv)
    val f = Mjpeg.decodeJpegGray(bytes).getOrElse(fail("decode returned None"))
    assert(f.w == 24 && f.h == 16)
    for (y <- 0 until 16; x <- 0 until 24)
      assert(f.luma(x, y) == bv(x / 8, y / 8),
        s"pixel ($x,$y) = ${f.luma(x, y)}, want ${bv(x / 8, y / 8)}")
  }

  test("jpeg DC prediction: extreme and repeated values round-trip") {
    // 0 and 255 hit the widest DC categories; equal neighbors hit diff=0
    val vals = Array(0, 255, 255, 0, 128, 128, 1, 254)
    val bytes = Mjpeg.synthJpegGrayBlocks(64, 8, (bx, _) => vals(bx))
    val f = Mjpeg.decodeJpegGray(bytes).getOrElse(fail("decode returned None"))
    for (bx <- 0 until 8; x <- 0 until 8; y <- 0 until 8)
      assert(f.luma(bx * 8 + x, y) == vals(bx))
  }

  test("jpeg restart markers: DRI + RSTn reset DC prediction") {
    val bytes = Mjpeg.synthJpegGrayBlocks(48, 16, bv, restartEvery = 3)
    assert(bytes.sliding(2).exists(p =>
      (p(0) & 0xFF) == 0xFF && (p(1) & 0xFF) >= 0xD0 && (p(1) & 0xFF) <= 0xD7),
      "synth must actually emit restart markers")
    val f = Mjpeg.decodeJpegGray(bytes).getOrElse(fail("decode returned None"))
    for (y <- 0 until 16; x <- 0 until 48)
      assert(f.luma(x, y) == bv(x / 8, y / 8))
  }

  test("jpeg edge crop: non-multiple-of-8 dims keep the partial blocks") {
    // doctor the SOF0 dims of a 16x16 stream down to 13x11: the entropy
    // data still carries 2x2 full blocks, the decoder must crop
    val bytes = Mjpeg.synthJpegGrayBlocks(16, 16, bv)
    var i = 2
    var sof = -1
    while (sof < 0 && i + 1 < bytes.length) {
      if ((bytes(i) & 0xFF) == 0xFF && (bytes(i + 1) & 0xFF) == 0xC0) sof = i
      i += 1
    }
    assert(sof > 0, "SOF0 not found")
    val body = sof + 4 // marker(2) + len(2)
    bytes(body + 1) = 0; bytes(body + 2) = 11 // h = 11
    bytes(body + 3) = 0; bytes(body + 4) = 13 // w = 13
    val f = Mjpeg.decodeJpegGray(bytes).getOrElse(fail("decode returned None"))
    assert(f.w == 13 && f.h == 11)
    for (y <- 0 until 11; x <- 0 until 13)
      assert(f.luma(x, y) == bv(x / 8, y / 8))
  }

  test("avi round-trip: demux returns every frame in order, decodable") {
    val frames = (0 until 5).map(fno =>
      Mjpeg.synthJpegGrayBlocks(16, 16, (bx, by) => (fno * 40 + bx + 2 * by) % 256))
    val avi = Mjpeg.synthAviMjpeg(frames, 16, 16)
    val got = Mjpeg.aviFrames(avi).getOrElse(fail("demux returned None"))
    assert(got.length == 5)
    got.zipWithIndex.foreach { case (fb, fno) =>
      assert(java.util.Arrays.equals(fb, frames(fno)), s"frame $fno bytes differ")
      val f = Mjpeg.decodeJpegGray(fb).getOrElse(fail(s"frame $fno undecodable"))
      assert(f.luma(0, 0) == (fno * 40) % 256)
    }
  }

  test("totality: malformed payloads quarantine as None, never throw") {
    val good = Mjpeg.synthJpegGrayBlocks(16, 16, bv)
    assert(Mjpeg.decodeJpegGray(null).isEmpty)
    assert(Mjpeg.decodeJpegGray(Array.emptyByteArray).isEmpty)
    assert(Mjpeg.decodeJpegGray(good.take(20)).isEmpty, "truncated header")
    assert(Mjpeg.decodeJpegGray(good.dropRight(8)).isEmpty, "truncated scan")
    assert(Mjpeg.decodeJpegGray("not a jpeg".getBytes).isEmpty)
    val avi = Mjpeg.synthAviMjpeg(Seq(good), 16, 16)
    assert(Mjpeg.aviFrames(null).isEmpty)
    assert(Mjpeg.aviFrames(avi.take(11)).isEmpty)
    assert(Mjpeg.aviFrames("RIFFxxxxWAVE".getBytes).isEmpty, "wrong form type")
    // lying RIFF size: dword near 2^31 must reject, not wrap
    val lying = avi.clone()
    lying(4) = 0xFF.toByte; lying(5) = 0xFF.toByte
    lying(6) = 0xFF.toByte; lying(7) = 0x7F.toByte
    assert(Mjpeg.aviFrames(lying).isEmpty)
    // a color/progressive stream (SOF2 instead of SOF0) quarantines
    val prog = good.clone()
    var i = 2
    while (i + 1 < prog.length) {
      if ((prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0)
        prog(i + 1) = 0xC2.toByte
      i += 1
    }
    assert(Mjpeg.decodeJpegGray(prog).isEmpty)
  }
}
