package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.functions.{col, conv, lit, md5, substring}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct-count state: the k SMALLEST distinct
  * hash values seen, O(k) memory. With uniform hashes in [0, 2⁶⁰), the kth
  * smallest value h₍ₖ₎ estimates the distinct count as
  * (k−1)·2⁶⁰ / h₍ₖ₎ (Bar-Yossef et al. 2002, the classic KMV/bottom-k
  * sketch) with relative stderr ≈ 1/√(k−2). Under k distinct values the
  * buffer IS the distinct set and the count is exact.
  *
  * A sorted long array, binary-search insert: k is small (tens-hundreds),
  * inserts past warm-up are one branch (candidate ≥ current max), and the
  * DISTINCT guard is the same search that finds the insertion point. */
final class KmvBuffer(val k: Int) {
  val hs = new Array[Long](k) // sorted ascending, first n valid
  var n = 0

  def insert(h: Long): Unit = {
    if (n == k && h >= hs(n - 1)) return // bigger than current kth — irrelevant
    var lo = 0
    var hi = n
    while (lo < hi) { // lower-bound binary search
      val mid = (lo + hi) >>> 1
      if (hs(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && hs(lo) == h) return // distinct guard
    val last = if (n < k) n else k - 1
    var j = last
    while (j > lo) { hs(j) = hs(j - 1); j -= 1 }
    hs(lo) = h
    if (n < k) n += 1
  }

  /** Distinct estimate: exact below k, (k−1)·2⁶⁰/h₍ₖ₎ at or above.
    * The arithmetic is IEEE double ops the DuckDB oracle replays verbatim:
    * (k−1)·2⁶⁰ is exactly representable, h₍ₖ₎→double rounds identically,
    * divide+floor are deterministic. */
  def estimate: Long =
    if (n < k) n.toLong
    else math.floor((k - 1).toDouble * math.pow(2, 60) / hs(k - 1).toDouble).toLong
}

/** `kmv_distinct(hash, k)` — approximate COUNT(DISTINCT) from a bottom-k
  * sketch over a precomputed uniform hash column. A TypedImperativeAggregate,
  * so Spark runs it PARTIAL before the shuffle: each map task ships ≤ k
  * longs per group instead of its distinct set — the fixed-size-synopsis
  * shape that makes distinct counting shuffle-bounded at 100 TB, where an
  * exact COUNT(DISTINCT) shuffles every distinct value. Buffers merge by
  * re-inserting (union of bottom-k sets is the bottom-k of the union), so
  * the estimate is partition-layout-invariant — SketchSpec pins that, and
  * the md5-prefix hash makes the whole sketch replay in DuckDB. */
case class KmvDistinct(
    hash: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(k > 1, "kmv_distinct k must be > 1 (the estimator divides by k-1)")

  override def inputTypes = Seq(LongType)
  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) b.insert(h.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, other: KmvBuffer): KmvBuffer = {
    var j = 0
    while (j < other.n) { b.insert(other.hs(j)); j += 1 }
    b
  }

  override def eval(b: KmvBuffer): Any = b.estimate

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 8)
    bb.putInt(b.n)
    var j = 0
    while (j < b.n) { bb.putLong(b.hs(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(k)
    val n = bb.getInt
    var j = 0
    while (j < n) { b.insert(bb.getLong); j += 1 } // sorted in, stays sorted
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): KmvDistinct =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): KmvDistinct =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = c(0))
}

object SketchExpressions {
  /** 60-bit md5-prefix hash of a column's string form — the uniform hash
    * the KMV estimator needs, spelled with codegen'd builtins and replayed
    * in DuckDB as `('0x' || substring(md5(x), 1, 15))::BIGINT`. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Approximate distinct count of `value` per group: k-minimum-values over
    * [[hash60]]. Exact below k distinct values. */
  def kmv_distinct(value: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(hash60(value)), k).toAggregateExpression())

  /** [[kmv_distinct]] over an already-hashed long column (reuse when several
    * sketches share one hash pass). */
  def kmv_distinct_hashed(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvDistinct(ColumnBridge.expression(hash), k).toAggregateExpression())
}
