package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DataTypes, IntegerType, LongType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32

/** Native signature computation for the text near-dup hot path: one tight
  * loop per document instead of an interpreted higher-order-function chain
  * (numPerm × shingles murmur calls through the expression interpreter).
  * Same pattern as VectorExpressions: static helpers invoked from both
  * `eval` and the generated code, so whole-stage codegen stays intact.
  */
object TextHashes {

  /** MinHash signature: perm i's hash of shingle s = murmur3(s, seed=i). */
  def minhash(sh: ArrayData, numPerm: Int): ArrayData = {
    val out = Array.fill(numPerm)(Int.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      if (!sh.isNullAt(i)) {
        val s = sh.getUTF8String(i)
        var p = 0
        while (p < numPerm) {
          val h = Murmur3_x86_32.hashUnsafeBytes(
            s.getBaseObject, s.getBaseOffset, s.numBytes(), p)
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

  /** 64-bit SimHash: per-bit majority vote over xxhash64(token). */
  def simhash(toks: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val s = toks.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
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

object TextHashExpressions {
  def word_shingles(tokens: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(tokens), n))
  def minhash_sig(shingles: Column, numPerm: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), numPerm))
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))
}
