package graft.ext

/** REAL pure-JVM media codecs for the multimodal column family — no
  * external libraries, so they run in this environment and upgrade two of
  * [[Multimodal.StubCodec]]'s documented stubs to actual decoders:
  *
  *  - WAV (RIFF / PCM): chunk-walking header parse + 16-bit LE sample
  *    extraction → duration, RMS loudness, peak amplitude. The audio
  *    quality signals a speech-corpus pipeline filters on (silence /
  *    clipping detection).
  *  - BMP (BITMAPINFOHEADER, 24 bpp, top-down AND bottom-up): header
  *    parse honoring the 4-byte row stride and row origin → dimensions,
  *    per-channel sums, corner luma. The image stats an image-corpus
  *    pipeline aggregates before training.
  *
  * Both decoders are TOTAL (`Option` — malformed bytes are a quarantine
  * row, never a task-killing throw: one corrupt blob in a 100 TB media
  * table must not fail the job after four retries). The companion
  * synthesizers emit canonical files from integer-only formulas, so the
  * SparkEntry gates can verify the decoders against an ANALYTIC DuckDB
  * replay: the oracle recomputes the expected stats from the generator
  * formula without ever seeing the bytes — any header-offset, stride,
  * sign, or endianness mistake in the parser hash-fails.
  *
  * Everything is exact integer arithmetic except the final RMS sqrt,
  * which both engines evaluate as the IEEE-correctly-rounded sqrt of the
  * same exactly-representable rational (sums stay < 2^53). */
object Codecs {

  // ------------------------------------------------------------------ WAV

  /** Decoded PCM WAV facts. `rmsQ6` = floor(sqrt(Σs²/n)·1e6 + 0.5) — the
    * repo's 6-decimal fixed-point convention (oracle-portable). */
  final case class WavInfo(channels: Int, sampleRate: Int, bits: Int,
                           nSamples: Int, durationMs: Long,
                           rmsQ6: Long, peak: Int)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  /** G.711 µ-law byte → linear PCM-ish value (the CCITT ulaw2linear
    * formula): complement, then magnitude ((mant·8 + 132) << exp) − 132
    * with the sign bit negating. Pure integer — SQL-replayable. */
  private[ext] def ulaw2linear(b: Byte): Int = {
    val u = (~b) & 0xFF
    val t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** Parse a RIFF/WAVE container: walk the chunk list (never assume the
    * canonical 44-byte layout — real encoders insert LIST/fact chunks),
    * accept PCM 16-bit (format 1) or G.711 µ-law 8-bit (format 7), and
    * fold the data chunk's samples. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var info: Option[WavInfo] = None
    while (pos + 8 <= bytes.length && info.isEmpty) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      // Bounds arithmetic in Long: a lying size near 2^31 would wrap
      // `pos + 8 + size` negative in Int, pass this check, and the sample
      // loop would AIOOBE out of the quarantine-as-None contract.
      if (size < 0 || pos.toLong + 8L + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          fmt = Some((le16(bytes, pos + 8), le16(bytes, pos + 10),
            le32(bytes, pos + 12), le16(bytes, pos + 22)))
        case "data" =>
          val (f, ch, rate, bits) = fmt.getOrElse(return None)
          val pcm16 = f == 1 && bits == 16
          val ulaw = f == 7 && bits == 8
          if ((!pcm16 && !ulaw) || ch < 1 || rate <= 0) return None
          val bytesPerSample = if (pcm16) 2 else 1
          val n = size / (bytesPerSample * ch)
          val count = n * ch
          var sumSq = 0L
          var peak = 0
          var k = 0
          val base = pos + 8
          while (k < count) { // stats over every sample of every channel
            val s =
              if (pcm16) (le16(bytes, base + 2 * k) << 16) >> 16 // sign-extend
              else ulaw2linear(bytes(base + k))
            sumSq += s.toLong * s
            val a = math.abs(s)
            if (a > peak) peak = a
            k += 1
          }
          val rmsQ6 =
            if (count == 0) 0L
            else math.floor(math.sqrt(sumSq.toDouble / count) * 1e6 + 0.5).toLong
          info = Some(WavInfo(ch, rate, bits, n,
            n.toLong * 1000L / rate, rmsQ6, peak))
        case _ => () // LIST/fact/cue …: skip
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    info
  }

  /** Canonical µ-law mono WAV (WAVE_FORMAT_MULAW, 18-byte fmt chunk with
    * cbSize=0 — the spec shape for non-PCM formats, which also exercises
    * the parser's size-flexible chunk walk): encoded byte k is
    * `(k·step + phase) mod 256`. */
  def synthWavUlaw(sampleRate: Int, n: Int, step: Int, phase: Int): Array[Byte] = {
    val out = new Array[Byte](12 + 8 + 18 + 8 + n)
    def put(i: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, i) }
    def p16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    put(0, "RIFF"); p32(4, out.length - 8); put(8, "WAVE")
    put(12, "fmt "); p32(16, 18); p16(20, 7); p16(22, 1)
    p32(24, sampleRate); p32(28, sampleRate); p16(32, 1); p16(34, 8)
    p16(36, 0) // cbSize
    put(38, "data"); p32(42, n)
    var k = 0
    while (k < n) {
      out(46 + k) = (((k.toLong * step + phase) % 256L).toInt & 0xFF).toByte
      k += 1
    }
    out
  }

  /** Canonical 44-byte-header mono PCM-16 WAV whose sample k is the pure
    * integer sawtooth `((k·step + phase) mod 65536) − 32768` — exactly
    * replayable in SQL via generate_series. */
  def synthWav(sampleRate: Int, n: Int, step: Int, phase: Int): Array[Byte] = {
    val data = 2 * n
    val out = new Array[Byte](44 + data)
    def put(i: Int, s: String): Unit = { s.getBytes("US-ASCII").copyToArray(out, i) }
    def p16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    put(0, "RIFF"); p32(4, 36 + data); put(8, "WAVE")
    put(12, "fmt "); p32(16, 16); p16(20, 1); p16(22, 1)
    p32(24, sampleRate); p32(28, sampleRate * 2); p16(32, 2); p16(34, 16)
    put(36, "data"); p32(40, data)
    var k = 0
    while (k < n) {
      val s = (((k.toLong * step + phase) % 65536L).toInt & 0xFFFF) - 32768
      p16(44 + 2 * k, s & 0xFFFF)
      k += 1
    }
    out
  }

  // ------------------------------------------------------------------ BMP

  /** Decoded 24-bpp BMP facts: dimensions, exact per-channel sums, and the
    * lumas of the (0,0) and (w−1,h−1) pixels in IMAGE coordinates — the
    * corner probes that catch a wrong row origin (bottom-up vs top-down)
    * or a mis-sized stride, which channel SUMS alone cannot (sums are
    * pixel-order-invariant). Luma = (299·r + 587·g + 114·b) div 1000. */
  final case class BmpInfo(width: Int, height: Int,
                           sumR: Long, sumG: Long, sumB: Long,
                           firstLuma: Int, lastLuma: Int)

  /** Decoded interleaved-RGB pixel buffer (image coordinates, y=0 top). */
  private[ext] final case class Pixels(w: Int, h: Int, rgb: Array[Int]) {
    def r(x: Int, y: Int): Int = rgb(3 * (y * w + x))
    def g(x: Int, y: Int): Int = rgb(3 * (y * w + x) + 1)
    def b(x: Int, y: Int): Int = rgb(3 * (y * w + x) + 2)
    def luma(x: Int, y: Int): Int =
      (299 * r(x, y) + 587 * g(x, y) + 114 * b(x, y)) / 1000
  }

  private def statsOf(p: Pixels): (Long, Long, Long) = {
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = 0
    while (i < p.rgb.length) { sr += p.rgb(i); sg += p.rgb(i + 1); sb += p.rgb(i + 2); i += 3 }
    (sr, sg, sb)
  }

  private[ext] def pixelsBmp(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes == null || bytes.length < 54) return None
    if (bytes(0) != 'B' || bytes(1) != 'M') return None
    val dataOffset = le32(bytes, 10)
    val hdrSize = le32(bytes, 14)
    if (hdrSize < 40) return None
    val w = le32(bytes, 18)
    val hRaw = le32(bytes, 22)
    val bpp = le16(bytes, 28)
    val compression = le32(bytes, 30)
    // hRaw == Int.MinValue survives math.abs as a negative; a width near
    // 2^31 would overflow `w * 3` negative, defeating the stride/bounds
    // check and making `new Array[Int](3*w*h)` throw. All dimension and
    // stride arithmetic happens in Long, so any lying header lands on the
    // bounds rejection below instead of an executor-killing exception.
    if (w <= 0 || hRaw == 0 || hRaw == Int.MinValue || bpp != 24 ||
      compression != 0) return None
    val h = math.abs(hRaw)
    val topDown = hRaw < 0
    val strideL = ((w.toLong * 3L + 3L) / 4L) * 4L
    if (dataOffset < 54 || dataOffset.toLong + strideL * h > bytes.length)
      return None
    // strideL*h <= bytes.length < 2^31 and strideL >= 3w, so 3*w*h and
    // every row offset below fit in Int from here on.
    val stride = strideL.toInt
    val rgb = new Array[Int](3 * w * h)
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      val rowBase = dataOffset + storedRow * stride
      var x = 0
      while (x < w) {
        rgb(3 * (y * w + x)) = bytes(rowBase + 3 * x + 2) & 0xFF     // R
        rgb(3 * (y * w + x) + 1) = bytes(rowBase + 3 * x + 1) & 0xFF // G
        rgb(3 * (y * w + x) + 2) = bytes(rowBase + 3 * x) & 0xFF     // B
        x += 1
      }
      y += 1
    }
    Some(Pixels(w, h, rgb))
  }

  def decodeBmp(bytes: Array[Byte]): Option[BmpInfo] =
    pixelsBmp(bytes).map { p =>
      val (sr, sg, sb) = statsOf(p)
      BmpInfo(p.w, p.h, sr, sg, sb, p.luma(0, 0), p.luma(p.w - 1, p.h - 1))
    }

  /** One fixed-length analysis window of a PCM stream — the audio analog
    * of video frame sampling. `sumAbs`/`peak` are exact integer energy
    * probes (VAD-style silence/clipping signals) so a SQL oracle replays
    * them without float drift. */
  final case class AudioFrame(frameNo: Int, nSamples: Int, sumAbs: Long, peak: Int)

  /** REAL audio framing: decode the WAV, then window the sample stream
    * into `frameLen`-sample frames (the final short frame is kept — a
    * real VAD scores it too). Mono 16-bit PCM, same parser as
    * [[decodeWav]]. */
  def wavFrames(bytes: Array[Byte], frameLen: Int): Option[Vector[AudioFrame]] = {
    require(frameLen > 0, s"wavFrames: bad frame length $frameLen")
    if (bytes == null || bytes.length < 44) return None
    if (tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int, Int)] = None
    while (pos + 8 <= bytes.length) {
      val id = tag(bytes, pos)
      val size = le32(bytes, pos + 4)
      if (size < 0 || pos.toLong + 8L + size > bytes.length) return None // Long: see decodeWav
      id match {
        case "fmt " =>
          if (size < 16) return None
          fmt = Some((le16(bytes, pos + 8), le16(bytes, pos + 10),
            le32(bytes, pos + 12), le16(bytes, pos + 22)))
        case "data" =>
          val (f, ch, _, bits) = fmt.getOrElse(return None)
          if (f != 1 || bits != 16 || ch != 1) return None
          val n = size / 2
          val base = pos + 8
          val out = Vector.newBuilder[AudioFrame]
          var start = 0
          var frameNo = 0
          while (start < n) {
            val end = math.min(start + frameLen, n)
            var sumAbs = 0L
            var peak = 0
            var k = start
            while (k < end) {
              val s = (le16(bytes, base + 2 * k) << 16) >> 16
              val a = math.abs(s)
              sumAbs += a
              if (a > peak) peak = a
              k += 1
            }
            out += AudioFrame(frameNo, end - start, sumAbs, peak)
            frameNo += 1
            start = end
          }
          return Some(out.result())
        case _ => ()
      }
      pos += 8 + size + (size & 1)
    }
    None
  }

  // ------------------------------------------------------------------ PNG

  /** Decoded 8-bit RGB PNG facts — same probe shape as [[BmpInfo]]. */
  final case class PngInfo(width: Int, height: Int,
                           sumR: Long, sumG: Long, sumB: Long,
                           firstLuma: Int, lastLuma: Int)

  private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A)
    .map(_.toByte)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)

  /** REAL PNG decode for the 8-bit/RGB (color type 2, no interlace)
    * profile: signature + chunk walk, multi-IDAT zlib inflate
    * (`java.util.zip.Inflater` — the JDK ships zlib), then per-row
    * UNFILTERING of all five PNG filter types (None/Sub/Up/Average/
    * Paeth, RFC 2083 §6). Total: anything malformed — bad signature,
    * truncated chunk, unsupported profile, corrupt deflate stream, wrong
    * decompressed size, invalid filter byte — quarantines as None. */
  def decodePng(bytes: Array[Byte]): Option[PngInfo] =
    pixelsPng(bytes).map { p =>
      val (sr, sg, sb) = statsOf(p)
      PngInfo(p.w, p.h, sr, sg, sb, p.luma(0, 0), p.luma(p.w - 1, p.h - 1))
    }

  private[ext] def pixelsPng(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes == null || bytes.length < 8 + 25) return None
    var i = 0
    while (i < 8) { if (bytes(i) != PngSig(i)) return None; i += 1 }
    var pos = 8
    var w = 0; var h = 0
    var sawIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended && pos + 8 <= bytes.length) {
      val len = be32(bytes, pos)
      if (len < 0 || pos.toLong + 12L + len > bytes.length) return None // Long: see decodeWav
      val ctype = tag(bytes, pos + 4)
      ctype match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(bytes, pos + 8); h = be32(bytes, pos + 12)
          val bitDepth = bytes(pos + 16) & 0xFF
          val colorType = bytes(pos + 17) & 0xFF
          val interlace = bytes(pos + 20) & 0xFF
          if (w <= 0 || h <= 0 || bitDepth != 8 || colorType != 2 ||
            interlace != 0) return None
          sawIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => ended = true
        case _ => () // ancillary chunks (tEXt, pHYs, …): skip
      }
      pos += 12 + len // len + type + data + CRC
    }
    if (!sawIhdr || idat.size == 0) return None
    // Totality guard BEFORE allocation: a 33-byte hostile blob declaring
    // w=h=1e6 would overflow (stride+1)*h in Int arithmetic and throw
    // NegativeArraySizeException out of the `new Array` — a task-killing
    // escape from the documented quarantine-as-None contract. The stride
    // itself is computed in Long (w near 2^31 overflows `w * 3` in Int,
    // which would corrupt the guard it feeds). Deflate expands at most
    // ~1032:1, so a decompressed size past idat·1032+64 can never inflate
    // successfully; reject it (and any Int overflow) with the same None
    // every other malformed shape gets.
    val strideL = w.toLong * 3L
    val rawLen = (strideL + 1L) * h
    if (rawLen > Int.MaxValue - 8 ||
        rawLen > idat.size.toLong * 1032L + 64L) return None
    val stride = strideL.toInt
    val raw = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(idat.toByteArray)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0 && !inf.finished()) return None // truncated/needs-dict
        off += n
      }
      if (off != raw.length) return None // wrong decompressed size
    } catch {
      case _: java.util.zip.DataFormatException => return None
    } finally inf.end()
    // unfilter in place into `img` (h rows of stride bytes)
    val img = new Array[Int](stride * h)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    var y = 0
    while (y < h) {
      val ft = raw(y * (stride + 1)) & 0xFF
      if (ft > 4) return None
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= 3) img(rowOut + x - 3) else 0
        val up = if (y > 0) img(rowOut - stride + x) else 0
        val ul = if (y > 0 && x >= 3) img(rowOut - stride + x - 3) else 0
        img(rowOut + x) = ft match {
          case 0 => cur
          case 1 => (cur + left) & 0xFF
          case 2 => (cur + up) & 0xFF
          case 3 => (cur + (left + up) / 2) & 0xFF
          case 4 => (cur + paeth(left, up, ul)) & 0xFF
        }
        x += 1
      }
      y += 1
    }
    Some(Pixels(w, h, img)) // PNG color type 2 is already interleaved RGB
  }

  /** Magic-sniffing pixel decode: BMP or PNG. */
  private[ext] def sniffPixels(bytes: Array[Byte]): Option[Pixels] = {
    if (bytes == null || bytes.length < 2) None
    else if (bytes(0) == 'B' && bytes(1) == 'M') pixelsBmp(bytes)
    else if (bytes(0) == PngSig(0) && bytes(1) == PngSig(1)) pixelsPng(bytes)
    else None
  }

  /** Encode an RGB buffer as a canonical bottom-up 24-bpp BMP — the cheap
    * exact re-encode target for [[resizeNearestToBmp]] (PNG re-encode
    * would add nothing: the pixels are already verified lossless). */
  private[ext] def encodeBmp(p: Pixels): Array[Byte] = {
    val stride = ((p.w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * p.h)
    def p16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, 54)
    p32(14, 40); p32(18, p.w); p32(22, p.h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, stride * p.h)
    var y = 0
    while (y < p.h) {
      val rowBase = 54 + (p.h - 1 - y) * stride
      var x = 0
      while (x < p.w) {
        out(rowBase + 3 * x) = p.b(x, y).toByte
        out(rowBase + 3 * x + 1) = p.g(x, y).toByte
        out(rowBase + 3 * x + 2) = p.r(x, y).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** REAL image resize: nearest-neighbor with the deterministic integer
    * mapping `src = (dst · srcDim) div dstDim` (exactly SQL-replayable —
    * no float sampling grid), over a sniffed BMP/PNG payload, re-encoded
    * as canonical BMP. Nearest-neighbor rather than a box/bilinear
    * filter: the pipeline use is thumbnailing for dedup/feature passes
    * where exact replayability is worth more than resample quality, and
    * a production filter drops into the same Pixels → Pixels slot. */
  def resizeNearestToBmp(bytes: Array[Byte], dstW: Int, dstH: Int): Option[Array[Byte]] = {
    require(dstW > 0 && dstH > 0, s"resize: bad target ${dstW}x$dstH")
    sniffPixels(bytes).map { src =>
      val rgb = new Array[Int](3 * dstW * dstH)
      var y = 0
      while (y < dstH) {
        val sy = y * src.h / dstH
        var x = 0
        while (x < dstW) {
          val sx = x * src.w / dstW
          rgb(3 * (y * dstW + x)) = src.r(sx, sy)
          rgb(3 * (y * dstW + x) + 1) = src.g(sx, sy)
          rgb(3 * (y * dstW + x) + 2) = src.b(sx, sy)
          x += 1
        }
        y += 1
      }
      encodeBmp(Pixels(dstW, dstH, rgb))
    }
  }

  /** 8-bit RGB PNG of the integer gradient `r=(11x+23y+id) mod 256,
    * g=(19x+5y+2id) mod 256, b=(3x+29y+5id) mod 256`, with row y
    * FILTERED as type `y mod 5` (every PNG filter exercised — the
    * encoder applies the forward filter, the decoder must invert it) and
    * the compressed stream split across TWO IDAT chunks (decoders must
    * concatenate). Chunk CRCs are real (`java.util.zip.CRC32`). */
  def synthPng(w: Int, h: Int, id: Long): Array[Byte] = {
    require(w > 0 && h > 0, s"synthPng: bad dims ${w}x$h")
    val stride = w * 3
    val img = new Array[Int](stride * h)
    for (y <- 0 until h; x <- 0 until w) {
      img(y * stride + 3 * x) = ((11L * x + 23L * y + id) % 256).toInt
      img(y * stride + 3 * x + 1) = ((19L * x + 5L * y + 2 * id) % 256).toInt
      img(y * stride + 3 * x + 2) = ((3L * x + 29L * y + 5 * id) % 256).toInt
    }
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val raw = new Array[Byte]((stride + 1) * h)
    for (y <- 0 until h) {
      val ft = y % 5
      raw(y * (stride + 1)) = ft.toByte
      for (x <- 0 until stride) {
        val cur = img(y * stride + x)
        val left = if (x >= 3) img(y * stride + x - 3) else 0
        val up = if (y > 0) img((y - 1) * stride + x) else 0
        val ul = if (y > 0 && x >= 3) img((y - 1) * stride + x - 3) else 0
        val f = ft match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (f & 0xFF).toByte
      }
    }
    val def_ = new java.util.zip.Deflater()
    def_.setInput(raw); def_.finish()
    val zbuf = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](4096)
    while (!def_.finished()) zbuf.write(tmp, 0, def_.deflate(tmp))
    def_.end()
    val z = zbuf.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write(Array((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte).map(_.toInt & 0xFF).map(_.toByte))
      val body = ctype.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32()
      crc.update(body)
      val c = crc.getValue
      out.write(Array((c >>> 24).toByte, (c >>> 16).toByte,
        (c >>> 8).toByte, c.toByte))
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = (w >>> 24).toByte; ihdr(1) = (w >>> 16).toByte
    ihdr(2) = (w >>> 8).toByte; ihdr(3) = w.toByte
    ihdr(4) = (h >>> 24).toByte; ihdr(5) = (h >>> 16).toByte
    ihdr(6) = (h >>> 8).toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2; ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0
    chunk("IHDR", ihdr)
    val split = math.max(1, z.length / 2)
    chunk("IDAT", z.slice(0, split))   // two IDATs: concatenation is
    chunk("IDAT", z.slice(split, z.length)) // part of the format contract
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** 24-bpp BMP whose pixel (x, y) — image coordinates, y=0 the TOP row —
    * is the pure integer gradient
    * `b=(5x+3y+id) mod 256, g=(7x+11y+2id) mod 256, r=(13x+17y+3id) mod 256`;
    * written bottom-up by default or top-down (negative height) so both
    * row origins exercise the decoder. */
  def synthBmp(w: Int, h: Int, id: Long, topDown: Boolean): Array[Byte] = {
    require(w > 0 && h > 0, s"synthBmp: bad dims ${w}x$h")
    val stride = ((w * 3 + 3) / 4) * 4
    val out = new Array[Byte](54 + stride * h)
    def p16(i: Int, v: Int): Unit = { out(i) = v.toByte; out(i + 1) = (v >> 8).toByte }
    def p32(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
      out(i + 2) = (v >> 16).toByte; out(i + 3) = (v >> 24).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, 54)
    p32(14, 40); p32(18, w); p32(22, if (topDown) -h else h)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, stride * h)
    var y = 0
    while (y < h) {
      val storedRow = if (topDown) y else h - 1 - y
      val rowBase = 54 + storedRow * stride
      var x = 0
      while (x < w) {
        out(rowBase + 3 * x) = ((5L * x + 3L * y + id) % 256).toByte
        out(rowBase + 3 * x + 1) = ((7L * x + 11L * y + 2 * id) % 256).toByte
        out(rowBase + 3 * x + 2) = ((13L * x + 17L * y + 3 * id) % 256).toByte
        x += 1
      }
      y += 1
    }
    out
  }
}
