package graft.ext

/** REAL pure-JVM motion-JPEG video support — the last multimodal stub
  * (video frame extraction, `Multimodal.StubCodec.frame`) replaced by an
  * actual demux + decode path, same pattern r12 used for PNG/WAV/BMP:
  *
  *  - AVI (RIFF) demuxer: chunk-walk to `LIST movi`, collect the `00dc`/
  *    `00db` video chunks — one encoded JPEG per frame (the MJPEG-in-AVI
  *    layout, a RIFF container exactly like WAV's).
  *  - Baseline JPEG decoder (ITU T.81 sequential DCT, grayscale profile):
  *    marker parse (DQT/SOF0/DHT/SOS), canonical Huffman decode with byte
  *    un-stuffing and restart-marker handling, DC prediction, dequantize,
  *    2-D IDCT, level shift — the complete published pipeline.
  *
  * Both are TOTAL (`Option`): malformed bytes — truncated chunks, lying
  * lengths, unsupported profiles, corrupt entropy streams, hostile
  * dimensions — quarantine as None, never a task-killing throw (one bad
  * blob in a 100 TB media table must not fail the job). Dimension and
  * chunk bounds arithmetic is done in Long before any allocation.
  *
  * The companion synthesizer emits frames built from CONSTANT 8×8 blocks
  * with quantizer 8: the forward DCT of a flat block has only the DC
  * coefficient 8·(v−128), which quantizes to exactly v−128 — so the decode
  * is bit-exact and the SparkEntry gate's DuckDB oracle can recompute
  * every frame's pixel stats ANALYTICALLY from the block-value formula
  * without seeing a byte, while the decoder still runs the full generic
  * Huffman/dequant/IDCT machinery. (Lossy-quantized AC content would
  * round-trip approximately and be unverifiable by an exact oracle; the
  * decoder handles it, the fixtures don't emit it.)
  *
  * Reference behavior: dataworks treats media as opaque payloads on the
  * stream path; this family is part of the sanctioned LLM-pipeline
  * extension (BASELINE.json). Tables and algorithm from the public JPEG
  * spec (ITU T.81, Annex K example tables) and the RIFF/AVI format docs. */
object Mjpeg {

  // ------------------------------------------------------------ JPEG tables

  /** Annex K.3.1 standard luminance DC Huffman table. */
  private val DcBits =
    Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0) // 1-indexed
  private val DcVals = (0 to 11).map(_.toByte).toArray

  /** Annex K.3.2 standard luminance AC Huffman table. */
  private val AcBits =
    Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA).map(_.toByte)

  /** Zig-zag scan order: position k in the scan → raster index. */
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the (mincode, maxcode, valptr) form of
    * T.81 §F.2.2.3 — built from the DHT BITS/HUFFVAL lists. */
  private final class Huff(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr: Array[Int] = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += bits(l)
        k += bits(l)
        maxCode(l) = if (bits(l) > 0) code - 1 else -1
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int = vals(valPtr(len) + code - minCode(len)) & 0xFF
  }

  private val DcHuff = new Huff(DcBits, DcVals)
  private val AcHuff = new Huff(AcBits, AcVals)

  // ------------------------------------------------------------ bit reader

  /** Entropy-coded-segment bit reader with 0xFF00 un-stuffing. Returns -1
    * on exhaustion or an unexpected marker (callers quarantine). */
  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def readBit(): Int = {
      if (nbits == 0) {
        if (pos >= bytes.length) return -1
        var b = bytes(pos) & 0xFF
        pos += 1
        if (b == 0xFF) {
          if (pos >= bytes.length) return -1
          val m = bytes(pos) & 0xFF
          pos += 1
          if (m != 0x00) return -1 // a real marker mid-entropy: corrupt
          b = 0xFF // stuffed literal FF
        }
        acc = b; nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    /** Consume a restart marker at an interval boundary (T.81 §F.2.1.3.1):
      * drop the partial byte, expect FFD0..FFD7 in the raw stream. */
    def consumeRestart(): Boolean = {
      nbits = 0
      if (pos + 1 >= bytes.length) return false
      if ((bytes(pos) & 0xFF) != 0xFF) return false
      val m = bytes(pos + 1) & 0xFF
      if (m < 0xD0 || m > 0xD7) return false
      pos += 2
      true
    }
    def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = readBit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decodeHuff(t: Huff): Int = {
      var code = readBit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l) && code >= t.minCode(l))
          return t.value(l, code)
        val b = readBit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1 // code longer than 16 bits: corrupt
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value. */
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ------------------------------------------------------------ decoder

  /** Decoded grayscale frame: dimensions + the pixel buffer (row-major). */
  final case class GrayFrame(w: Int, h: Int, px: Array[Int]) {
    def luma(x: Int, y: Int): Int = px(y * w + x)
    def sumLuma: Long = { var s = 0L; var i = 0; while (i < px.length) { s += px(i); i += 1 }; s }
  }

  private val MaxDim = 1 << 14 // 16384² grayscale = 256 MB; larger is hostile

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)

  /** REAL baseline JPEG decode, grayscale (single-component, 8-bit,
    * sequential DCT, no subsampling) profile: marker walk, DHT-defined
    * canonical Huffman entropy decode, DC prediction (restart-interval
    * aware), dequantization, 2-D IDCT, +128 level shift, edge-block crop.
    * Anything else — color, progressive, 12-bit, arithmetic coding,
    * truncation, lying lengths — quarantines as None. */
  def decodeJpegGray(bytes: Array[Byte]): Option[GrayFrame] = {
    if (bytes == null || bytes.length < 4) return None
    if ((bytes(0) & 0xFF) != 0xFF || (bytes(1) & 0xFF) != 0xD8) return None // SOI
    try decodeJpegGray0(bytes)
    catch {
      // the explicit guards below should make this unreachable; a missed
      // corner must still honor the quarantine contract, not kill a task
      case scala.util.control.NonFatal(_) => None
    }
  }

  private def decodeJpegGray0(bytes: Array[Byte]): Option[GrayFrame] = {
    var pos = 2
    var w = 0; var h = 0
    var qtId = -1
    val qt = scala.collection.mutable.Map.empty[Int, Array[Int]]
    val dcT = scala.collection.mutable.Map.empty[Int, Huff]
    val acT = scala.collection.mutable.Map.empty[Int, Huff]
    var dcSel = -1; var acSel = -1
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      // next marker (skip fill bytes)
      if (pos + 1 >= bytes.length) return None
      if ((bytes(pos) & 0xFF) != 0xFF) return None
      var m = bytes(pos + 1) & 0xFF
      pos += 2
      while (m == 0xFF && pos < bytes.length) { m = bytes(pos) & 0xFF; pos += 1 }
      m match {
        case 0xD9 => return None // EOI before any scan
        case mk if mk >= 0xD0 && mk <= 0xD7 => () // stray RST: skip
        case 0x01 => () // TEM, standalone
        case _ =>
          if (pos + 1 >= bytes.length) return None
          val len = be16(bytes, pos)
          if (len < 2 || pos.toLong + len > bytes.length) return None
          val seg = pos + 2
          val segEnd = pos + len
          m match {
            case 0xDB => // DQT: one or more (Pq,Tq)+64 tables
              var p = seg
              while (p < segEnd) {
                if (p >= bytes.length) return None
                val pqTq = bytes(p) & 0xFF
                if ((pqTq >> 4) != 0) return None // 16-bit tables: unsupported
                if (p + 65 > segEnd) return None
                val t = new Array[Int](64)
                var i = 0
                while (i < 64) { t(i) = bytes(p + 1 + i) & 0xFF; i += 1 }
                qt(pqTq & 0x0F) = t
                p += 65
              }
            case 0xC0 => // SOF0 baseline
              if (segEnd - seg < 6) return None
              if ((bytes(seg) & 0xFF) != 8) return None // 8-bit precision
              h = be16(bytes, seg + 1); w = be16(bytes, seg + 3)
              val ncomp = bytes(seg + 5) & 0xFF
              if (ncomp != 1) return None // grayscale profile
              if (segEnd - seg < 6 + 3) return None
              if ((bytes(seg + 7) & 0xFF) != 0x11) return None // 1×1 sampling
              qtId = bytes(seg + 8) & 0xFF
              if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
            case 0xC4 => // DHT: one or more tables
              var p = seg
              while (p < segEnd) {
                val tcTh = bytes(p) & 0xFF
                if (p + 17 > segEnd) return None
                val bits = new Array[Int](17)
                var total = 0
                var i = 1
                while (i <= 16) { bits(i) = bytes(p + i) & 0xFF; total += bits(i); i += 1 }
                if (total > 256 || p + 17 + total > segEnd) return None
                val vals = new Array[Byte](total)
                System.arraycopy(bytes, p + 17, vals, 0, total)
                val tbl = new Huff(bits, vals)
                if ((tcTh >> 4) == 0) dcT(tcTh & 0x0F) = tbl
                else acT(tcTh & 0x0F) = tbl
                p += 17 + total
              }
            case 0xDD => // DRI
              if (segEnd - seg < 2) return None
              restartInterval = be16(bytes, seg)
            case 0xDA => // SOS
              if (segEnd - seg < 4) return None
              if ((bytes(seg) & 0xFF) != 1) return None // 1 scan component
              val tsel = bytes(seg + 2) & 0xFF
              dcSel = tsel >> 4; acSel = tsel & 0x0F
              scanStart = segEnd
            case mk if mk >= 0xC1 && mk <= 0xCF && mk != 0xC4 && mk != 0xC8 =>
              return None // progressive/extended/arithmetic: unsupported
            case _ => () // APPn, COM, …: skip
          }
          pos = segEnd
      }
    }
    val q = qt.getOrElse(qtId, return None)
    val dc = dcT.getOrElse(dcSel, return None)
    val ac = acT.getOrElse(acSel, return None)
    if (w.toLong * h > Int.MaxValue - 8) return None // MaxDim² already caps
    val px = new Array[Int](w * h)
    val bx = (w + 7) / 8
    val by = (h + 7) / 8
    val reader = new BitReader(bytes, scanStart)
    val coef = new Array[Int](64)
    var pred = 0
    var mcu = 0
    var blk = 0
    val nblk = bx * by
    while (blk < nblk) {
      if (restartInterval > 0 && mcu == restartInterval) {
        if (!reader.consumeRestart()) return None
        pred = 0; mcu = 0
      }
      java.util.Arrays.fill(coef, 0)
      val t = reader.decodeHuff(dc)
      if (t < 0 || t > 11) return None
      val diffBits = if (t == 0) 0 else reader.readBits(t)
      if (diffBits < 0) return None
      pred += extend(diffBits, t)
      coef(0) = pred * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = reader.decodeHuff(ac)
        if (rs < 0) return None
        val r = rs >> 4; val s = rs & 0x0F
        if (s == 0) {
          if (r == 15) k += 16 // ZRL
          else eob = true // EOB
        } else {
          k += r
          if (k > 63) return None
          val vb = reader.readBits(s)
          if (vb < 0) return None
          // quant tables arrive in zig-zag order (T.81 B.2.4.1), same
          // order the scan walks: position k dequantizes by q(k)
          coef(ZigZag(k)) = extend(vb, s) * q(k)
          k += 1
        }
      }
      idctInto(coef, px, w, h, (blk % bx) * 8, (blk / bx) * 8)
      blk += 1; mcu += 1
    }
    Some(GrayFrame(w, h, px))
  }

  /** 2-D 8×8 inverse DCT (T.81 A.3.3, direct double evaluation — exact
    * enough for any conformant stream; the fixtures are DC-only so the
    * result is bit-exact by construction), +128 level shift, clamp, and
    * edge-crop placement into the image. Direct O(64²) per block: the
    * per-frame pixel budget at gate scale is tiny, and a separable
    * fixed-point fast path drops into this slot without changing callers. */
  private def idctInto(coef: Array[Int], px: Array[Int],
                       w: Int, h: Int, ox: Int, oy: Int): Unit = {
    val cos = Mjpeg.cosTable
    var y = 0
    while (y < 8) {
      val py = oy + y
      if (py < h) {
        var x = 0
        while (x < 8) {
          val pxx = ox + x
          if (pxx < w) {
            var sum = 0.0
            var u = 0
            while (u < 8) {
              var v = 0
              while (v < 8) {
                val c = coef(v * 8 + u)
                if (c != 0) {
                  val cu = if (u == 0) 0.70710678118654752440 else 1.0
                  val cv = if (v == 0) 0.70710678118654752440 else 1.0
                  sum += cu * cv * c * cos(x)(u) * cos(y)(v)
                }
                v += 1
              }
              u += 1
            }
            val s = math.round(sum / 4.0 + 128.0).toInt
            px(py * w + pxx) = if (s < 0) 0 else if (s > 255) 255 else s
          }
          x += 1
        }
      }
      y += 1
    }
  }

  private val cosTable: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // ------------------------------------------------------------ encoder

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def write(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nbits > 0) { write(0x7F, 8 - nbits) } // 1-pad
  }

  /** Canonical (code, length) for each symbol of a BITS/HUFFVAL table. */
  private def encTable(bits: Array[Int], vals: Array[Byte]): Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val m = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) { m += (vals(k) & 0xFF) -> ((code, l)); code += 1; k += 1; i += 1 }
      code <<= 1
      l += 1
    }
    m.result()
  }
  private val DcEnc = encTable(DcBits, DcVals)
  private val AcEnc = encTable(AcBits, AcVals)

  /** Grayscale baseline JPEG of constant 8×8 blocks: `blockValue(bx, by)`
    * (0..255) fills block (bx, by). Quantizer 8 everywhere: the flat
    * block's only nonzero DCT coefficient is DC = 8·(v−128), which
    * quantizes to exactly v−128 — the decode is LOSSLESS, so an oracle
    * can recompute pixels from the formula. Emits the Annex K example
    * Huffman tables in DHT and real DC-difference coding + EOB per block. */
  def synthJpegGrayBlocks(w: Int, h: Int, blockValue: (Int, Int) => Int,
                          restartEvery: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w % 8 == 0 && h % 8 == 0,
      s"synthJpegGrayBlocks: dims must be positive multiples of 8, got ${w}x$h")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xFF); out.write(m) }
    def seg(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
      body.foreach(b => out.write(b & 0xFF))
    }
    marker(0xD8) // SOI
    seg(0xDB, 0x00 +: Array.fill(64)(8)) // DQT id 0, all-8 quantizer
    seg(0xC0, Array(8, (h >> 8) & 0xFF, h & 0xFF, (w >> 8) & 0xFF, w & 0xFF,
      1, 1, 0x11, 0)) // SOF0: 8-bit, 1 component, 1×1 sampling, qt 0
    seg(0xC4, 0x00 +: (DcBits.drop(1) ++ DcVals.map(_ & 0xFF))) // DHT DC 0
    seg(0xC4, 0x10 +: (AcBits.drop(1) ++ AcVals.map(_ & 0xFF))) // DHT AC 0
    if (restartEvery > 0)
      seg(0xDD, Array((restartEvery >> 8) & 0xFF, restartEvery & 0xFF)) // DRI
    seg(0xDA, Array(1, 1, 0x00, 0, 63, 0)) // SOS: comp 1, DC0/AC0
    var bw = new BitWriter(out)
    var pred = 0
    var sinceRestart = 0
    var rstIdx = 0
    val bx = w / 8; val by = h / 8
    var b = 0
    while (b < bx * by) {
      if (restartEvery > 0 && sinceRestart == restartEvery) {
        bw.flush() // 1-pad to the byte boundary, then the restart marker
        marker(0xD0 + rstIdx)
        rstIdx = (rstIdx + 1) % 8
        bw = new BitWriter(out)
        pred = 0; sinceRestart = 0
      }
      val v = blockValue(b % bx, b / bx)
      require(v >= 0 && v <= 255, s"block value out of range: $v")
      val dcCoef = v - 128 // quantized DC under q=8
      val diff = dcCoef - pred
      pred = dcCoef
      val t = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = DcEnc(t)
      bw.write(c, l)
      if (t > 0) bw.write(if (diff > 0) diff else diff + (1 << t) - 1, t)
      val (ec, el) = AcEnc(0x00) // EOB: every AC coefficient is zero
      bw.write(ec, el)
      b += 1; sinceRestart += 1
    }
    bw.flush()
    marker(0xD9) // EOI
    out.toByteArray
  }

  // ------------------------------------------------------------ AVI (RIFF)

  private def fourcc(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** REAL AVI demux: RIFF('AVI ') chunk walk to `LIST movi`, collecting
    * the video stream chunks (`NNdc` compressed / `NNdb` uncompressed) in
    * file order — for MJPEG each payload is one complete JPEG. Bounds in
    * Long (the WAV lesson: a lying dword size near 2^31 must land on the
    * rejection, not wrap past it). Total: any malformation → None. */
  def aviFrames(bytes: Array[Byte]): Option[Vector[Array[Byte]]] = {
    if (bytes == null || bytes.length < 12) return None
    if (fourcc(bytes, 0) != "RIFF" || fourcc(bytes, 8) != "AVI ") return None
    val riffSize = le32(bytes, 4)
    if (riffSize < 4 || 8L + riffSize > bytes.length) return None
    // walk positions in LONG: on a ~2 GB blob a chunk ending exactly at
    // Int.MaxValue plus the odd-byte pad wraps an Int cursor negative and
    // the next fourcc read throws out of the quarantine contract — the
    // WAV/BMP lesson applied to the cursor itself, not just chunk sizes
    def walk(from: Long, to: Long): Option[Vector[Array[Byte]]] = {
      var pos = from
      while (pos + 8 <= to) {
        val id = fourcc(bytes, pos.toInt)
        val size = le32(bytes, pos.toInt + 4)
        if (size < 0 || pos + 8L + size > to) return None
        if (id == "LIST") {
          if (size < 4) return None
          val listType = fourcc(bytes, pos.toInt + 8)
          if (listType == "movi") {
            // collect video chunks inside movi
            val frames = Vector.newBuilder[Array[Byte]]
            var p = pos + 12
            val end = pos + 8 + size
            while (p + 8 <= end) {
              val cid = fourcc(bytes, p.toInt)
              val csz = le32(bytes, p.toInt + 4)
              if (csz < 0 || p + 8L + csz > end) return None
              if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
                (cid.endsWith("dc") || cid.endsWith("db"))) {
                val f = new Array[Byte](csz)
                System.arraycopy(bytes, p.toInt + 8, f, 0, csz)
                frames += f
              }
              p += 8L + csz + (csz & 1) // word-aligned
            }
            return Some(frames.result())
          }
          // a non-movi LIST (hdrl, …): recurse? movi is always top-level
          // inside RIFF; nothing video-bearing nests deeper — skip it.
        }
        pos += 8L + size + (size & 1)
      }
      None // no movi list
    }
    try walk(12L, math.min(bytes.length.toLong, 8L + riffSize))
    catch { // guards above should make this unreachable; honor the contract
      case scala.util.control.NonFatal(_) => None
    }
  }

  /** Canonical MJPEG AVI: RIFF('AVI '){ LIST hdrl { avih, LIST strl {
    * strh('vids'/'MJPG'), strf(BITMAPINFOHEADER) } }, LIST movi { 00dc… } }.
    * Structurally complete (a real demuxer's header expectations hold),
    * word-aligned chunks. */
  def synthAviMjpeg(frames: Seq[Array[Byte]], w: Int, h: Int,
                    fps: Int = 25): Array[Byte] = {
    require(frames.nonEmpty, "synthAviMjpeg: no frames")
    require(w > 0 && h > 0 && fps > 0, s"synthAviMjpeg: bad params ${w}x$h@$fps")
    val out = new java.io.ByteArrayOutputStream()
    def p16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    def p32(v: Int): Unit = { p16(v & 0xFFFF); p16((v >>> 16) & 0xFFFF) }
    def cc(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    def chunk(id: String, body: Array[Byte]): Unit = {
      cc(id); p32(body.length); out.write(body)
      if ((body.length & 1) == 1) out.write(0) // word alignment
    }
    def bytesOf(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream(); f(b); b.toByteArray
    }
    def w32(b: java.io.ByteArrayOutputStream, v: Int): Unit = {
      b.write(v & 0xFF); b.write((v >> 8) & 0xFF)
      b.write((v >> 16) & 0xFF); b.write((v >>> 24) & 0xFF)
    }
    def wcc(b: java.io.ByteArrayOutputStream, s: String): Unit =
      b.write(s.getBytes("US-ASCII"))
    val avih = bytesOf { b =>
      w32(b, 1000000 / fps); w32(b, 0); w32(b, 0); w32(b, 0x10) // HASINDEX-less, flags
      w32(b, frames.length); w32(b, 0); w32(b, 1); w32(b, 0)
      w32(b, w); w32(b, h); (0 until 4).foreach(_ => w32(b, 0))
    }
    val strh = bytesOf { b =>
      wcc(b, "vids"); wcc(b, "MJPG"); w32(b, 0); w32(b, 0); w32(b, 0)
      w32(b, 1); w32(b, fps) // rate/scale = fps
      w32(b, 0); w32(b, frames.length); w32(b, 0); w32(b, 0); w32(b, 0)
      w32(b, 0); b.write(Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)) // rcFrame
    }
    val strf = bytesOf { b =>
      w32(b, 40); w32(b, w); w32(b, h); b.write(1); b.write(0) // planes
      b.write(24); b.write(0); wcc(b, "MJPG")
      w32(b, w * h * 3); w32(b, 0); w32(b, 0); w32(b, 0); w32(b, 0)
    }
    val strl = bytesOf { b =>
      wcc(b, "LIST")
      val inner = {
        val ib = new java.io.ByteArrayOutputStream()
        wcc(ib, "strl")
        wcc(ib, "strh"); w32(ib, strh.length); ib.write(strh)
        wcc(ib, "strf"); w32(ib, strf.length); ib.write(strf)
        ib.toByteArray
      }
      w32(b, inner.length); b.write(inner)
    }
    val hdrl = bytesOf { b =>
      wcc(b, "LIST")
      val inner = {
        val ib = new java.io.ByteArrayOutputStream()
        wcc(ib, "hdrl")
        wcc(ib, "avih"); w32(ib, avih.length); ib.write(avih)
        ib.write(strl)
        ib.toByteArray
      }
      w32(b, inner.length); b.write(inner)
    }
    val movi = bytesOf { b =>
      wcc(b, "LIST")
      val inner = {
        val ib = new java.io.ByteArrayOutputStream()
        wcc(ib, "movi")
        frames.foreach { f =>
          wcc(ib, "00dc"); w32(ib, f.length); ib.write(f)
          if ((f.length & 1) == 1) ib.write(0)
        }
        ib.toByteArray
      }
      w32(b, inner.length); b.write(inner)
    }
    val body = hdrl ++ movi
    cc("RIFF"); p32(4 + body.length); cc("AVI "); out.write(body)
    out.toByteArray
  }
}
