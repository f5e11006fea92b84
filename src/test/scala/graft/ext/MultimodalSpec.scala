package graft.ext

import graft.SparkSpec
import Multimodal._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def mediaRow(id: Long, kind: String, size: Int): MediaRow =
    MediaRow(id, kind, Array.tabulate(size)(i => ((i * 31 + id) % 256).toByte),
      "stub", 0, 0, 16000, 0L)

  private lazy val media = Seq(
    mediaRow(1, "image", 1000), mediaRow(2, "video", 2048),
    mediaRow(3, "audio", 512), mediaRow(4, "video", 700)
  ).toDS()

  test("decode is deterministic, projects blob away, keeps typed features") {
    val out = decode(media).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out.forall(d => d.width >= 64 && d.height >= 64))
    assert(out.forall(_.features.length == 8))
    assert(out.forall(d => math.abs(d.features.sum - 1.0) < 1e-9),
      "features are an L1-normalized histogram")
    // deterministic: second run identical
    val again = decode(media).collect().sortBy(_.media_id)
    assert(out.map(_.features.toSeq).toSeq == again.map(_.features.toSeq).toSeq)
  }

  test("frame sampling explodes only video rows, stepping everyN") {
    val frames = sampleFrames(media, everyN = 2).collect()
    assert(frames.map(_.media_id).toSet == Set(2L, 4L))
    // video 2: 2048 bytes → 8 frames → sampled 0,2,4,6
    assert(frames.filter(_.media_id == 2L).map(_.frame_no).sorted.toSeq == Seq(0, 2, 4, 6))
    assert(frames.forall(_.frame_bytes.nonEmpty))
  }

  test("resize touches only images and updates metadata") {
    val out = resize(media, 128, 128).collect().sortBy(_.media_id)
    val img = out.find(_.media_id == 1L).get
    assert(img.width == 128 && img.height == 128)
    assert(out.find(_.media_id == 3L).get.width == 0, "audio untouched")
  }

  test("size-aware repartition sizes from plan statistics, not a data scan") {
    val df = media.toDF()
    val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = repartitionBySize(df, targetBytes = (statBytes / 2).toLong)
    // target = half the estimated size → 2 partitions; all rows retained
    assert(parts.rdd.getNumPartitions == 2)
    assert(parts.count() == 4)
    // sizing must not inject an extra aggregate/scan into the plan: the
    // repartition output is the input plan + exactly one exchange
    val plan = parts.queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("aggregate"), s"unexpected aggregate in:\n$plan")
  }

  test("pipeline plan reads the media table exactly once") {
    val out = multimodalQuery(spark, sf("sf0.001"))
    val leaves = out.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 1, s"expected a single scan, got: $leaves")
  }

  test("WAV codec: synth → real RIFF parse round trip, hand-checked vector") {
    // hand-checkable 4-sample file: step 1000, phase 0, rate 8000
    // samples: ((k*1000) mod 65536) - 32768 = -32768, -31768, -30768, -29768
    val bytes = Codecs.synthWav(8000, 4, 1000, 0)
    val w = Codecs.decodeWav(bytes).get
    assert(w.channels == 1 && w.sampleRate == 8000 && w.bits == 16)
    assert(w.nSamples == 4 && w.durationMs == 0L) // 4/8000 s → 0 ms (int div)
    assert(w.peak == 32768)
    val expectSq = Seq(-32768L, -31768L, -30768L, -29768L).map(s => s * s).sum
    val expectRms = math.floor(math.sqrt(expectSq.toDouble / 4) * 1e6 + 0.5).toLong
    assert(w.rmsQ6 == expectRms, s"${w.rmsQ6} vs $expectRms")
    // chunk WALKING, not fixed offsets: splice a LIST chunk between fmt
    // and data (real encoders do this) — parse must skip it
    val listChunk = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++
      "INFO".getBytes("US-ASCII")
    val spliced = bytes.slice(0, 36) ++ listChunk ++ bytes.slice(36, bytes.length)
    // fix the RIFF size field (+12)
    spliced(4) = ((bytes.length - 8 + 12) & 0xFF).toByte
    val w2 = Codecs.decodeWav(spliced).get
    assert(w2 == w, "a LIST chunk between fmt and data must not move the data parse")
    // malformed inputs quarantine as None, never throw
    assert(Codecs.decodeWav(null).isEmpty)
    assert(Codecs.decodeWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(Codecs.decodeWav("RIFFxxxxWAVE".getBytes ++ new Array[Byte](40)).isEmpty)
    assert(Codecs.decodeWav(bytes.take(40)).isEmpty, "truncated data chunk")
  }

  test("BMP codec: both row origins, stride padding, corner lumas") {
    // 3x2 bottom-up: stride = 12 (9 data + 3 pad) — decode must skip pad
    val up = Codecs.decodeBmp(Codecs.synthBmp(3, 2, 7L, topDown = false)).get
    val dn = Codecs.decodeBmp(Codecs.synthBmp(3, 2, 7L, topDown = true)).get
    // channel sums are pixel-order-invariant: identical across origins
    assert((up.sumR, up.sumG, up.sumB) == (dn.sumR, dn.sumG, dn.sumB))
    // corner lumas are origin-SENSITIVE probes: also identical because
    // both encodings represent the SAME image (x=0,y=0 is the top-left)
    assert(up.firstLuma == dn.firstLuma && up.lastLuma == dn.lastLuma,
      "top-down and bottom-up encodings of one image must decode identically")
    // hand check pixel (0,0) of id=7: b=(0+0+7)%256=7, g=14, r=21
    val expectFirst = (299 * 21 + 587 * 14 + 114 * 7) / 1000
    assert(up.firstLuma == expectFirst, s"${up.firstLuma} vs $expectFirst")
    // and pixel (2,1): b=(10+3+7)=20, g=(14+11+14)=39, r=(26+17+21)=64
    val expectLast = (299 * 64 + 587 * 39 + 114 * 20) / 1000
    assert(up.lastLuma == expectLast, s"${up.lastLuma} vs $expectLast")
    assert(up.width == 3 && up.height == 2)
    assert(up.sumR == (0 until 2).flatMap(y => (0 until 3).map(x =>
      (13 * x + 17 * y + 21) % 256)).sum)
    // malformed inputs quarantine
    assert(Codecs.decodeBmp(null).isEmpty)
    assert(Codecs.decodeBmp(new Array[Byte](54)).isEmpty) // no BM magic
    val trunc = Codecs.synthBmp(8, 8, 1L, topDown = false).take(80)
    assert(Codecs.decodeBmp(trunc).isEmpty, "pixel data shorter than stride*h")
  }

  test("PNG codec: inflate + all five filters + multi-IDAT, agrees with BMP probes") {
    // the synth filters row y as type y mod 5 — an 8x7 image exercises
    // None/Sub/Up/Average/Paeth, and the stream is split over two IDATs
    val bytes = Codecs.synthPng(8, 7, 42L)
    val pi = Codecs.decodePng(bytes).get
    assert(pi.width == 8 && pi.height == 7)
    // analytic expectations (same formulas as the synth gradient)
    def px(x: Int, y: Int) = ((11 * x + 23 * y + 42) % 256,
      (19 * x + 5 * y + 84) % 256, (3 * x + 29 * y + 210) % 256)
    val all = for { y <- 0 until 7; x <- 0 until 8 } yield px(x, y)
    assert(pi.sumR == all.map(_._1).sum && pi.sumG == all.map(_._2).sum &&
      pi.sumB == all.map(_._3).sum, "unfiltered pixels must match the gradient")
    val (r0, g0, b0) = px(0, 0)
    assert(pi.firstLuma == (299 * r0 + 587 * g0 + 114 * b0) / 1000)
    val (r1, g1, b1) = px(7, 6)
    assert(pi.lastLuma == (299 * r1 + 587 * g1 + 114 * b1) / 1000)
    // 1x1 corner case (only filter row 0; left/up all zero)
    val tiny = Codecs.decodePng(Codecs.synthPng(1, 1, 3L)).get
    assert(tiny.width == 1 && tiny.height == 1 &&
      tiny.firstLuma == tiny.lastLuma)
    // malformed inputs quarantine as None, never throw
    assert(Codecs.decodePng(null).isEmpty)
    assert(Codecs.decodePng(bytes.take(30)).isEmpty, "truncated chunk list")
    assert(Codecs.decodePng(bytes.updated(1, 'Q'.toByte)).isEmpty, "bad signature")
    val corrupt = bytes.clone() // flip a byte INSIDE the deflate stream
    corrupt(50) = (corrupt(50) ^ 0x5A).toByte
    assert(Codecs.decodePng(corrupt).isEmpty ||
      Codecs.decodePng(corrupt).get != pi,
      "a corrupted deflate stream must not silently decode to the original")
    // a hostile header declaring w=h=1e6 ((stride+1)*h overflows Int)
    // must quarantine as None, not throw NegativeArraySizeException —
    // one crafted blob in a 100 TB media table must not kill the task
    val bomb = Codecs.synthPng(2, 2, 1L)
    def be32w(v: Int, at: Int): Unit = {
      bomb(at) = (v >>> 24).toByte; bomb(at + 1) = (v >>> 16).toByte
      bomb(at + 2) = (v >>> 8).toByte; bomb(at + 3) = v.toByte
    }
    be32w(1000000, 16); be32w(1000000, 20) // IHDR w, h (CRC now wrong: moot)
    assert(Codecs.decodePng(bomb).isEmpty, "decompression-bomb header quarantines")
    // and a plausible-but-oversized claim (no Int overflow, but far past
    // what the IDAT bytes could ever inflate to) also quarantines
    be32w(5000, 16); be32w(5000, 20)
    assert(Codecs.decodePng(bomb).isEmpty, "oversized-vs-idat claim quarantines")
  }

  test("codec property: 120 random dims round-trip exactly in both formats") {
    // every stride-padding class (w mod 4), tiny and oblong shapes, and
    // the BMP/PNG pair must agree pixel-for-pixel on the same gradient:
    // two independent encoders + two independent parsers, one truth
    val rnd = new scala.util.Random(777L)
    for (i <- 0 until 120) {
      val w = 1 + rnd.nextInt(24)
      val h = 1 + rnd.nextInt(17)
      val id = rnd.nextLong(1000000L)
      val bi = Codecs.decodeBmp(Codecs.synthBmp(w, h, id, topDown = i % 2 == 0)).get
      assert(bi.width == w && bi.height == h, s"case $i: ${w}x$h id=$id")
      // analytic BMP sums
      val px = for { y <- 0 until h; x <- 0 until w } yield
        ((13L * x + 17 * y + 3 * id) % 256, (7L * x + 11 * y + 2 * id) % 256,
          (5L * x + 3 * y + id) % 256)
      assert(bi.sumR == px.map(_._1).sum && bi.sumG == px.map(_._2).sum &&
        bi.sumB == px.map(_._3).sum, s"case $i BMP sums: ${w}x$h id=$id")
      val pi = Codecs.decodePng(Codecs.synthPng(w, h, id)).get
      assert(pi.width == w && pi.height == h, s"case $i PNG: ${w}x$h id=$id")
      // resize round-trip stays in range and keeps dims for identity scale
      val same = Codecs.decodeBmp(
        Codecs.resizeNearestToBmp(Codecs.synthBmp(w, h, id, false), w, h).get).get
      assert((same.sumR, same.sumG, same.sumB) == (bi.sumR, bi.sumG, bi.sumB),
        s"case $i: identity resize must be lossless")
    }
  }

  test("audio framing: fixed windows, short final frame, exact energies") {
    // 5 samples, frameLen 2 → frames of 2, 2, 1
    val bytes = Codecs.synthWav(8000, 5, 1000, 0)
    val frames = Codecs.wavFrames(bytes, frameLen = 2).get
    assert(frames.map(f => (f.frameNo, f.nSamples)) ==
      Vector((0, 2), (1, 2), (2, 1)), s"got $frames")
    // samples: -32768, -31768, -30768, -29768, -28768
    assert(frames(0).sumAbs == 32768L + 31768L && frames(0).peak == 32768)
    assert(frames(2).sumAbs == 28768L && frames(2).peak == 28768)
    // a frame length covering everything yields one frame = whole-file stats
    val whole = Codecs.wavFrames(bytes, frameLen = 100).get
    assert(whole.size == 1 && whole(0).sumAbs == frames.map(_.sumAbs).sum)
    // malformed input → None
    assert(Codecs.wavFrames(Array[Byte](1, 2), 160).isEmpty)
  }

  test("µ-law codec: canonical G.711 vectors, format-7 dispatch in the RIFF parser") {
    // canonical ulaw2linear table endpoints (CCITT G.711)
    assert(Codecs.ulaw2linear(0x00.toByte) == -32124)
    assert(Codecs.ulaw2linear(0x80.toByte) == 32124)
    assert(Codecs.ulaw2linear(0xFF.toByte) == 0)
    assert(Codecs.ulaw2linear(0x7F.toByte) == 0)
    // full-byte-range WAV round trip through the parser
    val bytes = Codecs.synthWavUlaw(8000, 256, 1, 0) // every code once
    val w = Codecs.decodeWav(bytes).get
    assert(w.bits == 8 && w.channels == 1 && w.sampleRate == 8000)
    assert(w.nSamples == 256 && w.peak == 32124,
      s"all 256 codes include the extremes: $w")
    val expect = (0 until 256).map(c => Codecs.ulaw2linear(c.toByte))
    val rms = math.floor(math.sqrt(
      expect.map(s => s.toLong * s).sum.toDouble / 256) * 1e6 + 0.5).toLong
    assert(w.rmsQ6 == rms)
    // an unsupported format (e.g. 3 = IEEE float) quarantines
    val bad = bytes.clone(); bad(20) = 3
    assert(Codecs.decodeWav(bad).isEmpty)
  }

  test("real resize: nearest-neighbor mapping, format sniff, BMP re-encode round trip") {
    // 8x4 PNG → 4x2: sx = x*8/4 = 2x, sy = y*4/2 = 2y — every output
    // pixel is the even-coordinate source pixel
    val png = Codecs.synthPng(8, 4, 9L)
    val out = Codecs.resizeNearestToBmp(png, 4, 2).get
    val bi = Codecs.decodeBmp(out).get
    assert(bi.width == 4 && bi.height == 2)
    def src(x: Int, y: Int) = ((11 * x + 23 * y + 9) % 256,
      (19 * x + 5 * y + 18) % 256, (3 * x + 29 * y + 45) % 256)
    val picked = for { y <- 0 until 2; x <- 0 until 4 } yield src(2 * x, 2 * y)
    assert(bi.sumR == picked.map(_._1).sum && bi.sumG == picked.map(_._2).sum &&
      bi.sumB == picked.map(_._3).sum, "resize must sample src=(dst*srcDim)/dstDim")
    // upscale works too (repeats pixels), and BMP input sniffs
    val bmp = Codecs.synthBmp(2, 2, 5L, topDown = false)
    val up = Codecs.decodeBmp(Codecs.resizeNearestToBmp(bmp, 4, 4).get).get
    assert(up.width == 4 && up.height == 4)
    assert(up.firstLuma == Codecs.decodeBmp(bmp).get.firstLuma,
      "upscale keeps the corner pixel")
    // undecodable bytes → None (and Multimodal.resize passes the row through)
    assert(Codecs.resizeNearestToBmp(Array[Byte](1, 2, 3), 4, 4).isEmpty)
    import spark.implicits._
    val rows = Seq(
      MediaRow(1L, "image", png, "png", 8, 4, 0, 0L),
      MediaRow(2L, "image", Array[Byte](9, 9), "png", 0, 0, 0, 0L)).toDS()
    val resized = Multimodal.resize(rows, 4, 2).collect().sortBy(_.media_id)
    assert(resized(0).format == "bmp" && resized(0).width == 4)
    assert(resized(1).bytes.toSeq == Seq[Byte](9, 9),
      "undecodable payload passes through untouched")
  }

  test("decode dispatches wav/bmp to the real codecs and quarantines corrupt blobs") {
    val rows = Seq(
      MediaRow(1L, "audio", Codecs.synthWav(8000, 100, 7, 0), "wav", 0, 0, 8000, 0L),
      MediaRow(2L, "image", Codecs.synthBmp(4, 4, 2L, topDown = false), "bmp", 0, 0, 0, 0L),
      MediaRow(3L, "audio", Array[Byte](1, 2, 3, 4), "wav", 0, 0, 8000, 0L), // corrupt
      MediaRow(4L, "image", mediaRow(4, "image", 300).bytes, "stub", 0, 0, 0, 0L)
    ).toDS()
    val out = decode(rows).collect().sortBy(_.media_id)
    assert(out.map(_.media_id).toSeq == Seq(1L, 2L, 4L),
      "corrupt wav row quarantined; stub path intact")
    assert(out(0).n_frames == 100, "wav maps nSamples into n_frames")
    assert(out(1).width == 4 && out(1).height == 4)
  }

  test("pipeline query over fixture-derived media returns per-kind stats") {
    val out = multimodalQuery(spark, sf("sf0.001"))
    val rows = out.collect()
    assert(rows.map(_.getAs[String]("kind")).toSet == Set("image", "audio", "video"))
    assert(rows.map(_.getAs[Long]("n_media")).sum == 500L)
  }
}
