package graft.auth

import java.security.SecureRandom

/** bcrypt (Provos & Mazières, "A Future-Adaptable Password Scheme",
  * USENIX 1999) — the X10 surface of SURVEY.md §2.5: the reference hashes
  * user passwords with `buddy-hashers` derive/check
  * (`/root/reference/src/dataworks/utils/auth.clj:67,72`). Implemented
  * from the published algorithm against the standard `$2a$` modular-crypt
  * format, zero dependencies.
  *
  * Implementation notes:
  *  - Blowfish's P-array and S-boxes are, by definition, the fractional
  *    hexadecimal digits of π. They are DERIVED here at class init (Machin
  *    formula over BigInt, ~8.4k hex digits, <1s once per JVM) instead of
  *    embedding 1042 opaque constants; a checksum over the first words
  *    guards the derivation.
  *  - `$2a$` semantics: UTF-8 password + a terminating 0x00, cyclic key
  *    words, 72-byte key cap, 23 of 24 output bytes encoded — the
  *    OpenBSD-compatible behavior every bcrypt implementation interops on.
  *  - Driver-side only (a login check), nothing distributed: cost 2^n
  *    Blowfish key schedules is the point of the algorithm.
  */
object Bcrypt {

  // ------------------------------------------------------ π-derived boxes

  /** 18 + 4·256 32-bit words of π's fractional hex expansion. */
  private lazy val piWords: Array[Int] = {
    val words = 18 + 4 * 256
    val hexDigits = words * 8
    val guard = 24
    val shift = 4 * (hexDigits + guard)
    // Machin: π = 16·arctan(1/5) − 4·arctan(1/239), fixed-point at 2^shift
    val one = BigInt(1) << shift
    def arctanInv(x: Long): BigInt = {
      val x2 = BigInt(x) * BigInt(x)
      var term = one / x
      var sum = BigInt(0)
      var k = 0
      while (term.signum != 0) {
        val t = term / (2 * k + 1)
        sum = if (k % 2 == 0) sum + t else sum - t
        term = term / x2
        k += 1
      }
      sum
    }
    val pi = 16 * arctanInv(5) - 4 * arctanInv(239)
    // fractional part, top `hexDigits` nibbles → 32-bit words
    var frac = pi - (BigInt(3) << shift)
    val out = new Array[Int](words)
    var i = 0
    while (i < words) {
      frac = frac << 32
      out(i) = (frac >> shift).toInt
      frac = frac - (BigInt(out(i)) << shift)
      i += 1
    }
    require(out(0) == 0x243f6a88 && out(1) == 0x85a308d3,
      "pi derivation broken: Blowfish P-array must open with pi's hex digits")
    out
  }

  private def initialP: Array[Int] = java.util.Arrays.copyOfRange(piWords, 0, 18)
  private def initialS: Array[Int] = java.util.Arrays.copyOfRange(piWords, 18, 18 + 1024)

  // --------------------------------------------------------- blowfish core

  /** One Blowfish encipherment of the two words in `lr` at offset `off`. */
  private def encipher(lr: Array[Int], off: Int, p: Array[Int], s: Array[Int]): Unit = {
    var l = lr(off)
    var r = lr(off + 1)
    l ^= p(0)
    var i = 0
    while (i <= 14) {
      // F(x) = ((S0[a] + S1[b]) ^ S2[c]) + S3[d], folded into the round
      r ^= (((s(l >>> 24) + s(0x100 | ((l >> 16) & 0xff))) ^
        s(0x200 | ((l >> 8) & 0xff))) + s(0x300 | (l & 0xff))) ^ p(i + 1)
      l ^= (((s(r >>> 24) + s(0x100 | ((r >> 16) & 0xff))) ^
        s(0x200 | ((r >> 8) & 0xff))) + s(0x300 | (r & 0xff))) ^ p(i + 2)
      i += 2
    }
    lr(off) = r ^ p(17)
    lr(off + 1) = l
  }

  /** Next 32-bit word of `data`, cycling (the bcrypt key/salt stream). */
  private def streamWord(data: Array[Byte], offp: Array[Int]): Int = {
    var word = 0
    var off = offp(0)
    var i = 0
    while (i < 4) {
      word = (word << 8) | (data(off) & 0xff)
      off = (off + 1) % data.length
      i += 1
    }
    offp(0) = off
    word
  }

  /** Standard key schedule: P ^= key, then re-encrypt the zero block
    * through P and S. */
  private def key(k: Array[Byte], p: Array[Int], s: Array[Int]): Unit = {
    val offp = Array(0)
    var i = 0
    while (i < 18) { p(i) ^= streamWord(k, offp); i += 1 }
    val lr = Array(0, 0)
    i = 0
    while (i < 18) { encipher(lr, 0, p, s); p(i) = lr(0); p(i + 1) = lr(1); i += 2 }
    i = 0
    while (i < 1024) { encipher(lr, 0, p, s); s(i) = lr(0); s(i + 1) = lr(1); i += 2 }
  }

  /** The "expensive key schedule" variant: like [[key]], but each block is
    * salted with the next two cyclic salt words before enciphering. */
  private def eksKey(salt: Array[Byte], k: Array[Byte],
                     p: Array[Int], s: Array[Int]): Unit = {
    val offp = Array(0)
    var i = 0
    while (i < 18) { p(i) ^= streamWord(k, offp); i += 1 }
    val soff = Array(0)
    val lr = Array(0, 0)
    i = 0
    while (i < 18) {
      lr(0) ^= streamWord(salt, soff)
      lr(1) ^= streamWord(salt, soff)
      encipher(lr, 0, p, s); p(i) = lr(0); p(i + 1) = lr(1); i += 2
    }
    i = 0
    while (i < 1024) {
      lr(0) ^= streamWord(salt, soff)
      lr(1) ^= streamWord(salt, soff)
      encipher(lr, 0, p, s); s(i) = lr(0); s(i + 1) = lr(1); i += 2
    }
  }

  /** "OrpheanBeholderScryDoubt" as the six 32-bit cipher-text seed words. */
  private val ctext = "OrpheanBeholderScryDoubt".getBytes("US-ASCII")
    .grouped(4).map(b => ((b(0) & 0xff) << 24) | ((b(1) & 0xff) << 16) |
      ((b(2) & 0xff) << 8) | (b(3) & 0xff)).toArray

  private def cryptRaw(password: Array[Byte], salt: Array[Byte], cost: Int): Array[Byte] = {
    require(cost >= 4 && cost <= 31, s"bcrypt cost out of range: $cost")
    require(salt.length == 16, "bcrypt salt must be 16 bytes")
    val p = initialP
    val s = initialS
    eksKey(salt, password, p, s)
    var round = 0L
    val rounds = 1L << cost
    while (round < rounds) {
      key(password, p, s)
      key(salt, p, s)
      round += 1
    }
    val cdata = ctext.clone()
    var i = 0
    while (i < 64) {
      var j = 0
      while (j < 6) { encipher(cdata, j, p, s); j += 2 }
      i += 1
    }
    val out = new Array[Byte](24)
    i = 0
    while (i < 6) {
      out(i * 4) = (cdata(i) >>> 24).toByte
      out(i * 4 + 1) = (cdata(i) >>> 16).toByte
      out(i * 4 + 2) = (cdata(i) >>> 8).toByte
      out(i * 4 + 3) = cdata(i).toByte
      i += 1
    }
    out
  }

  // ------------------------------------------------- bcrypt radix-64 codec

  private val b64Alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
  private val b64Index: Array[Int] = {
    val idx = Array.fill(128)(-1)
    b64Alphabet.zipWithIndex.foreach { case (c, i) => idx(c.toInt) = i }
    idx
  }

  private def b64Encode(data: Array[Byte], len: Int): String = {
    val sb = new StringBuilder
    var off = 0
    while (off < len) {
      val c1 = data(off) & 0xff; off += 1
      sb.append(b64Alphabet((c1 >> 2) & 0x3f))
      if (off >= len) { sb.append(b64Alphabet((c1 & 0x03) << 4)); return sb.toString }
      val c2 = data(off) & 0xff; off += 1
      sb.append(b64Alphabet(((c1 & 0x03) << 4) | ((c2 >> 4) & 0x0f)))
      if (off >= len) { sb.append(b64Alphabet((c2 & 0x0f) << 2)); return sb.toString }
      val c3 = data(off) & 0xff; off += 1
      sb.append(b64Alphabet(((c2 & 0x0f) << 2) | ((c3 >> 6) & 0x03)))
      sb.append(b64Alphabet(c3 & 0x3f))
    }
    sb.toString
  }

  /** -1 for anything outside the alphabet INCLUDING non-ASCII (a raw
    * charAt index into the 128-entry table would throw out of bounds —
    * and escape check()'s IllegalArgumentException contract). */
  private def b64At(c: Char): Int = if (c < 128) b64Index(c.toInt) else -1

  private def b64Decode(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var off = 0
    while (off < s.length - 1 && out.size() < maxLen) {
      val c1 = b64At(s.charAt(off)); val c2 = b64At(s.charAt(off + 1))
      if (c1 < 0 || c2 < 0) throw new IllegalArgumentException("bad bcrypt base64")
      out.write(((c1 << 2) | ((c2 & 0x30) >> 4)) & 0xff)
      if (out.size() >= maxLen || off + 2 >= s.length) return out.toByteArray
      val c3 = b64At(s.charAt(off + 2))
      if (c3 < 0) throw new IllegalArgumentException("bad bcrypt base64")
      out.write((((c2 & 0x0f) << 4) | ((c3 & 0x3c) >> 2)) & 0xff)
      if (out.size() >= maxLen || off + 3 >= s.length) return out.toByteArray
      val c4 = b64At(s.charAt(off + 3))
      if (c4 < 0) throw new IllegalArgumentException("bad bcrypt base64")
      out.write((((c3 & 0x03) << 6) | c4) & 0xff)
      off += 4
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ public API

  /** `$2a$` password bytes: UTF-8 + terminating NUL, capped at 72. */
  private def passwordBytes(password: String): Array[Byte] = {
    val raw = (password + "\u0000").getBytes("UTF-8")
    if (raw.length > 72) java.util.Arrays.copyOfRange(raw, 0, 72) else raw
  }

  /** Hash `password` against a full `$2a$NN$<salt22>` prefix (or a complete
    * hash — only the salt region is read). Deterministic: the check path. */
  def hashWith(password: String, saltSpec: String): String = {
    require(saltSpec.length >= 29 && saltSpec.startsWith("$2"),
      s"not a bcrypt salt spec: $saltSpec")
    val minor = saltSpec.charAt(2)
    require(minor == 'a' || minor == 'b' || minor == 'y',
      s"unsupported bcrypt variant: $$2$minor (2a/2b/2y share this algorithm)")
    require(saltSpec.charAt(3) == '$' && saltSpec.charAt(6) == '$',
      s"malformed bcrypt spec: $saltSpec")
    val cost = saltSpec.substring(4, 6).toInt
    val salt = b64Decode(saltSpec.substring(7, 29), 16)
    val digest = cryptRaw(passwordBytes(password), salt, cost)
    s"$$2$minor$$${"%02d".format(cost)}$$${b64Encode(salt, 16)}${b64Encode(digest, 23)}"
  }

  /** Derive a fresh salted hash (the write path; cost 12 ≈ 250ms — the
    * contemporary interactive-login setting). */
  def derive(password: String, cost: Int = 12): String = {
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    hashWith(password, s"$$2a$$${"%02d".format(cost)}$$${b64Encode(salt, 16)}")
  }

  /** Constant-time verification of `password` against a stored hash. */
  def check(password: String, stored: String): Boolean = {
    val recomputed =
      try hashWith(password, stored)
      catch { case scala.util.control.NonFatal(_) => return false } // any malformed store = mismatch, never a 500
    java.security.MessageDigest.isEqual(
      recomputed.getBytes("UTF-8"), stored.getBytes("UTF-8"))
  }

  private val rng = new SecureRandom()
}
