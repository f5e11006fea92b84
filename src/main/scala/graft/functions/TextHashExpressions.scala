package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, LongType}

/** Native signature computation for the text near-dup hot path: one tight
  * loop per document instead of an interpreted higher-order-function chain
  * (numPerm × shingles murmur calls through the expression interpreter).
  * Same pattern as VectorExpressions: static helpers invoked from both
  * `eval` and the generated code, so whole-stage codegen stays intact.
  */
object TextHashes {

  // Oracle-portable hash base: the top 28 bits of md5(s) — exactly the
  // integer DuckDB computes as ('0x' || substring(md5(s),1,7))::BIGINT.
  // One digest per shingle feeds every permutation below, which is also
  // CHEAPER than the previous numPerm seeded-murmur calls per shingle.
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  def md5Base28(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 20) | ((d(1) & 0xFFL) << 12) |
      ((d(2) & 0xFFL) << 4) | ((d(3) & 0xF0L) >>> 4)
  }
  /** Top 60 bits of md5(s) — DuckDB's ('0x'||substring(md5(s),1,15))::BIGINT. */
  def md5Base60(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
    h >>> 4
  }

  /** MinHash permutation family: h_p(x) = (a_p·x + b_p) mod P over the
    * md5-28-bit base — all exact int64 arithmetic, so a DuckDB oracle
    * replays every signature bit-identically (a seeded-murmur family is
    * engine-private and forces the gate down to a rows-only check).
    * P = 2³¹−1 (prime); a_p ∈ [1,P) since p+1 < P; products stay < 2⁵⁹. */
  private final val MinHashP = 2147483647L
  def minhashA(p: Int): Long = (2654435761L * (p + 1)) % MinHashP
  def minhashB(p: Int): Long = (40503L * (p + 1) * (p + 1) + 17L) % MinHashP

  // coefficient arrays depend only on numPerm — memoized so the per-ROW
  // expression call doesn't re-tabulate 2×numPerm multiply-mods (a
  // measurable fraction of signature cost on short documents)
  private val coeffCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  def minhashCoeffs(numPerm: Int): (Array[Long], Array[Long]) =
    coeffCache.computeIfAbsent(numPerm,
      n => (Array.tabulate(n)(minhashA), Array.tabulate(n)(minhashB)))

  /** MinHash signature: perm p's hash of shingle s = (a_p·md5₂₈(s)+b_p) mod P. */
  def minhash(sh: ArrayData, numPerm: Int): ArrayData = {
    val out = Array.fill(numPerm)(Int.MaxValue)
    val (as, bs) = minhashCoeffs(numPerm)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val x = md5Base28(sh.getUTF8String(i))
        var p = 0
        while (p < numPerm) {
          val h = ((as(p) * x + bs(p)) % MinHashP).toInt
          if (h < out(p)) out(p) = h
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct word n-gram shingles from a token array (single pass, no
    * interpreted lambda chain). Shorter-than-n docs yield one shingle of
    * all tokens (mirrors TextOps.wordShingles). */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val sep = UTF8String.fromString(" ")
    val m = toks.numElements()
    val out = new java.util.LinkedHashSet[UTF8String]()
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    if (m < n) {
      val parts = Array.tabulate(m)(tok)
      out.add(UTF8String.concatWs(sep, parts: _*))
    } else {
      var i = 0
      while (i + n <= m) {
        val parts = Array.tabulate(n)(j => tok(i + j))
        out.add(UTF8String.concatWs(sep, parts: _*))
        i += 1
      }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)).asInstanceOf[Array[Any]])
  }

  /** All Gopher-style repetition signals in ONE pass over the token array:
    * unigram/bigram/trigram occurrence maps live per-document inside the
    * expression, so the corpus-level plan needs NO explode and NO shuffle —
    * the relational spelling (explode grams → two hash aggregates) moves
    * every n-gram occurrence across the network and, worse, any lambda
    * formulation re-evaluates the tokenizer per element (the nested-HOF
    * trap: 6.7 s at sf0.1 vs ~0.2 s for this).
    *
    * Returns (n_tokens, distinct_token_ratio, top_bigram_frac,
    * dup_trigram_frac); fraction definitions and the floor(x·10⁶+0.5)/10⁶
    * rounding mirror the DuckDB oracle exactly. */
  def repetitionStats(toks: ArrayData): InternalRow = {
    import org.apache.spark.unsafe.types.UTF8String
    val sep = UTF8String.fromString(" ")
    val m = toks.numElements()
    // `split('')` never yields an empty array, but the registered SQL
    // function is reachable with `array()` — 0/0 would poison the ratio
    // with NaN, so report n_tokens=0 with null fractions instead.
    if (m == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0L, null, null, null))
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    // absent keys unbox to 0 (boxed-null → Int), so get+1 is the merge
    def bump(map: java.util.HashMap[UTF8String, Int], k: UTF8String): Unit =
      map.put(k, map.get(k) + 1)
    val uni = new java.util.HashMap[UTF8String, Int]()
    val bi = new java.util.HashMap[UTF8String, Int]()
    val tri = new java.util.HashMap[UTF8String, Int]()
    var i = 0
    while (i < m) {
      bump(uni, tok(i))
      if (i + 1 < m) bump(bi, UTF8String.concatWs(sep, tok(i), tok(i + 1)))
      if (i + 2 < m) bump(tri, UTF8String.concatWs(sep, tok(i), tok(i + 1), tok(i + 2)))
      i += 1
    }
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val distinctRatio = round6(uni.size.toDouble / m.toDouble)
    var topBi = 0
    bi.values.forEach(c => if (c > topBi) topBi = c)
    var dupTri = 0L
    tri.values.forEach(c => if (c >= 2) dupTri += c)
    val topBiFrac: Any =
      if (m < 2) null else round6(topBi.toDouble / (m - 1).toDouble)
    val dupTriFrac: Any =
      if (m < 3) null else round6(dupTri.toDouble / (m - 2).toDouble)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](m.toLong, distinctRatio, topBiFrac, dupTriFrac))
  }

  /** All consecutive token pairs as (w1, w2) rows — duplicates kept (LM
    * counts are per-occurrence). One pass; the `transform(sequence(...),
    * element_at…)` HOF spelling measured 6.7 s at sf0.1 vs ~0.2 s here —
    * the same interpreted-lambda trap repetitionStats documents. */
  def wordBigrams(toks: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val m = toks.numElements()
    val n = math.max(m - 1, 0)
    val out = new Array[Any](n)
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    var i = 0
    while (i < n) {
      out(i) = new GenericInternalRow(Array[Any](tok(i), tok(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DSIR feature buckets in one pass: md5₂₈(token) mod `buckets` for
    * every token occurrence, then md5₂₈(w1 + " " + w2) mod `buckets` for
    * every bigram occurrence — the exact integers DuckDB computes as
    * ('0x'||substring(md5(f),1,7))::BIGINT % buckets over the same
    * unigram/bigram feature strings. */
  def featBuckets(toks: ArrayData, buckets: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val sep = UTF8String.fromString(" ")
    val m = toks.numElements()
    val nb = math.max(m - 1, 0)
    val out = new Array[Long](m + nb)
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    var i = 0
    while (i < m) {
      out(i) = md5Base28(tok(i)) % buckets
      i += 1
    }
    i = 0
    while (i < nb) {
      out(m + i) = md5Base28(UTF8String.concatWs(sep, tok(i), tok(i + 1))) % buckets
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Σ_occurrences weights[bucket] over the featBuckets feature stream —
    * the trained-classifier margin, WITHOUT materializing the bucket
    * array: one pass over unigrams+bigrams, one add per occurrence. The
    * bucket arithmetic is featBuckets verbatim, so the fold is
    * bit-identical to exploding + joining the weight table. */
  def featWeightSum(toks: ArrayData, weights: Array[Long]): Long = {
    import org.apache.spark.unsafe.types.UTF8String
    val buckets = weights.length
    val sep = UTF8String.fromString(" ")
    val m = toks.numElements()
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    var z = 0L
    var i = 0
    while (i < m) {
      z += weights((md5Base28(tok(i)) % buckets).toInt)
      i += 1
    }
    i = 0
    while (i < m - 1) {
      z += weights((md5Base28(UTF8String.concatWs(sep, tok(i), tok(i + 1))) % buckets).toInt)
      i += 1
    }
    z
  }

  /** md5-60 hash of every n-token window, positions kept (duplicates and
    * overlaps included — substring-granularity dedup wants every span
    * occurrence). Shorter-than-n docs yield NO windows: no span is long
    * enough to count as duplication. O(m·n) chars hashed per doc; a
    * Rabin-Karp rolling form would be O(m) but its modular recurrence is
    * much harder to replay in SQL — at window 50 the constant is fine. */
  def windowHashes(toks: ArrayData, n: Int): ArrayData = {
    import org.apache.spark.unsafe.types.UTF8String
    val sep = UTF8String.fromString(" ")
    val m = toks.numElements()
    val k = m - n + 1
    if (k <= 0) return new GenericArrayData(Array.emptyLongArray)
    def tok(i: Int): UTF8String =
      if (toks.isNullAt(i)) UTF8String.EMPTY_UTF8 else toks.getUTF8String(i)
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val parts = Array.tabulate(n)(j => tok(i + j))
      out(i) = md5Base60(UTF8String.concatWs(sep, parts: _*))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Build the UTF8String stopword set a [[QualityRaw]] instance probes. */
  def toUtf8Set(words: Seq[String]): java.util.HashSet[org.apache.spark.unsafe.types.UTF8String] = {
    val s = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](words.size * 2)
    words.foreach(w => s.add(org.apache.spark.unsafe.types.UTF8String.fromString(w)))
    s
  }

  private val qualityWsPattern =
    org.apache.spark.unsafe.types.UTF8String.fromString("\\s+")
  // the char class of TextOps.punctRatio's regex, as ASCII bytes: counting
  // matching BYTES equals counting matching CHARS because every class
  // member is single-byte and UTF-8 continuation/lead bytes are >= 0x80
  private val punctBytes: Array[Boolean] = {
    val b = new Array[Boolean](128)
    ".,;:!?'\"()-".foreach(c => b(c.toInt) = true)
    b
  }

  /** Raw (un-rounded) 4-term quality mean — BIT-IDENTICAL to the Column
    * spelling in `TextOps.qualityScore` (and therefore to the DuckDB
    * oracle): the same UTF8String lower/trim/split the builtin expressions
    * call, the same integer counts, and the same IEEE op order
    * (((len + punct) + stopword) + wordlen) / 4 — but in ONE pass instead
    * of four interpreted re-tokenizations of the text (higher-order
    * functions break whole-stage codegen AND re-evaluate `split` per
    * feature; measured 10× on the quality-percentile path at sf1). */
  def qualityRaw(text: org.apache.spark.unsafe.types.UTF8String,
                 stopwordSet: java.util.HashSet[org.apache.spark.unsafe.types.UTF8String]): Double = {
    val len = text.numChars()
    val lenScore = math.min(len.toDouble / 500.0, 1.0)
    var pc = 0
    var bi = 0
    val nb = text.numBytes()
    while (bi < nb) {
      val b = org.apache.spark.unsafe.Platform.getByte(
        text.getBaseObject, text.getBaseOffset + bi)
      if (b >= 0 && punctBytes(b)) pc += 1
      bi += 1
    }
    val punctScore = 1.0 -
      math.min(pc.toDouble / math.max(len, 1).toDouble * 5.0, 1.0)
    val toks = text.toLowerCase.trim.split(qualityWsPattern, -1)
    val m = toks.length
    val gm = math.max(m, 1)
    var hits = 0
    var chars = 0 // int accumulator, mirroring aggregate(toks, 0, acc+length)
    var i = 0
    while (i < m) {
      val t = toks(i)
      if (t != null) {
        if (stopwordSet.contains(t)) hits += 1
        chars += t.numChars()
      }
      i += 1
    }
    val swScore = 1.0 -
      math.min(math.abs(hits.toDouble / gm.toDouble - 0.4) * 2.0, 1.0)
    val wlScore = 1.0 -
      math.min(math.abs(chars.toDouble / gm.toDouble - 5.0) / 5.0, 1.0)
    (lenScore + punctScore + swScore + wlScore) / 4.0
  }

  /** 60-bit SimHash: per-bit majority vote over the md5-60-bit token hash
    * (bit b set iff Σ_tokens ±1 votes > 0, duplicates voting once each).
    * 60 bits — not 64 — so the per-token hash is the md5 prefix integer a
    * DuckDB oracle computes verbatim; xxhash64 votes were engine-private
    * and kept the gate rows-only. LSH chunking is 4 × 15 bits (pigeonhole
    * still guarantees recall at Hamming ≤ 3). */
  final val SimHashBits = 60
  def simhash(toks: ArrayData): Long = {
    val counts = new Array[Int](SimHashBits)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val h = md5Base60(toks.getUTF8String(i))
        var b = 0
        while (b < SimHashBits) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < SimHashBits) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

/** `quality_raw(text, stopwords)` — string → the un-rounded composite
  * quality mean (see [[TextHashes.qualityRaw]]); callers apply the 1e-6
  * stable rounding on top. */
case class QualityRaw(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  override def dataType: DataType = DataTypes.DoubleType
  override protected def withNewChildInternal(c: Expression): QualityRaw = copy(child = c)
  @transient private lazy val swSet = TextHashes.toUtf8Set(stopwords)
  override def nullSafeEval(t: Any): Any =
    TextHashes.qualityRaw(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], swSet)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("swSet", swSet, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TextHashes.qualityRaw($t, $setRef);")
  }
}

/** `word_shingles(tokens, n)` — array<string> → distinct n-gram shingles. */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DataTypes.StringType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.shingles(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.shingles($a, $n);")
}

/** `minhash_sig(shingles)` — array<string> → array<int> of length numPerm. */
case class MinHashSig(child: Expression, numPerm: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.minhash(a.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.minhash($a, $numPerm);")
}

/** `simhash64(tokens)` — array<string> → long fingerprint. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.simhash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.simhash($a);")
}

/** `repetition_stats(tokens)` — array<string> → struct of the per-doc
  * repetition signals (see [[TextHashes.repetitionStats]]). */
case class RepetitionStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = RepetitionStats.schema
  override protected def withNewChildInternal(c: Expression): RepetitionStats = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.repetitionStats(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.repetitionStats($a);")
}

object RepetitionStats {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("distinct_token_ratio", DoubleType, nullable = true),
    StructField("top_bigram_frac", DoubleType, nullable = true),
    StructField("dup_trigram_frac", DoubleType, nullable = true)))
}

/** `word_bigrams(tokens)` — array<string> → array<struct<w1,w2>> of all
  * consecutive pairs (occurrences, not distinct). */
case class WordBigrams(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{StringType, StructField, StructType}
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("w1", StringType, nullable = false),
      StructField("w2", StringType, nullable = false))), containsNull = false)
  override protected def withNewChildInternal(c: Expression): WordBigrams = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.wordBigrams(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.wordBigrams($a);")
}

/** `word_window_hashes(tokens, n)` — array<string> → array<long> md5-60
  * hash per n-token window (positions kept). */
case class WordWindowHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): WordWindowHashes = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.windowHashes(a.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.windowHashes($a, $n);")
}

/** `feat_buckets(tokens, buckets)` — array<string> → array<long> of
  * md5-prefix unigram+bigram feature buckets. */
case class FeatBuckets(child: Expression, buckets: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def withNewChildInternal(c: Expression): FeatBuckets = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.featBuckets(a.asInstanceOf[ArrayData], buckets)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.featBuckets($a, $buckets);")
}

/** `feat_weight_sum(tokens)` — the classifier margin Σ w[bucket] as one
  * codegen'd pass (no bucket array, no join; weights ride as a plan
  * reference object). */
case class FeatWeightSum(child: Expression, weights: Array[Long]) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def withNewChildInternal(c: Expression): FeatWeightSum = copy(child = c)
  override def nullSafeEval(a: Any): Any =
    TextHashes.featWeightSum(a.asInstanceOf[ArrayData], weights)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("weights", weights, "long[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextHashes.featWeightSum($a, $wRef);")
  }
}

object TextHashExpressions {
  def word_bigrams(tokens: Column): Column =
    ColumnBridge.column(WordBigrams(ColumnBridge.expression(tokens)))
  def word_window_hashes(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordWindowHashes(ColumnBridge.expression(tokens), n))
  def feat_buckets(tokens: Column, buckets: Int): Column =
    ColumnBridge.column(FeatBuckets(ColumnBridge.expression(tokens), buckets))
  def feat_weight_sum(tokens: Column, weights: Array[Long]): Column =
    ColumnBridge.column(FeatWeightSum(ColumnBridge.expression(tokens), weights))
  def word_shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
  def quality_raw(text: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(QualityRaw(ColumnBridge.expression(text), stopwords))
  def repetition_stats(tokens: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(tokens)))
  def minhash_sig(shingles: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numPerm))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
