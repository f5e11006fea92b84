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

/** `cms_sketch(cells, depth, width)` — a count-min sketch (Cormode &
  * Muthukrishnan 2005): a depth×width counter matrix where each input row
  * increments one cell per hash row, and a point estimate for a value is the
  * MIN of its depth cells (one-sided error: estimate ≥ true count, over by
  * ≤ 2·N/width with prob 1−2^−depth). The input is the precomputed array of
  * depth cell indices ([[SketchExpressions.cmsCells]] — codegen'd md5
  * builtins, so the hashing replays in DuckDB).
  *
  * A TypedImperativeAggregate, so Spark runs it PARTIAL before the shuffle:
  * each map task ships one depth×width matrix per group — a FIXED-size
  * synopsis of an unbounded token stream, the shape that makes frequency
  * estimation shuffle-bounded at 100 TB (the exact groupBy ships the whole
  * vocabulary). Cell updates are commutative sums, so the sketch is
  * partition-layout-invariant (SketchSpec pins it) and fully deterministic —
  * which is what lets the DuckDB oracle replay it cell-for-cell. */
case class CmsSketch(
    cells: Expression, depth: Int, width: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16, s"cms_sketch depth must be in [1,16], got $depth")
  require(width >= 2, s"cms_sketch width must be >= 2, got $width")

  override def inputTypes = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(cells)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val arr = cells.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var j = 0
      while (j < depth) {
        val c = a.getLong(j)
        // a mis-hashed cell must fail loudly, not corrupt a neighbor row
        if (c < 0 || c >= width) throw new IllegalArgumentException(
          s"cms_sketch: cell $c out of [0, $width) at depth row $j")
        b(j * width + c.toInt) += 1L
        j += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](depth * width)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): CmsSketch =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): CmsSketch =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CmsSketch =
    copy(cells = c(0))
}

/** `bloom_bitmap(cells, mBits)` — a Bloom filter as a long-array bitmap:
  * each input row sets one bit per hash row (the same md5 cell spelling as
  * [[CmsSketch]], width = mBits), merge is bitwise OR. The membership
  * contract is one-sided: a probed value whose bits are ALL set is MAYBE
  * present (false-positive rate ≈ (1−e^(−kn/m))^k), an unset bit is a
  * definite miss. Fixed size (m/8 bytes) regardless of how many values
  * went in — the shape that lets a 100 TB train corpus probe an eval set
  * as a broadcast bitmap instead of a broadcast distinct-value table.
  * Deterministic (bit-OR is commutative), so false positives replay
  * exactly in the DuckDB oracle via the equivalent position-set join. */
case class BloomBitmap(
    cells: Expression, mBits: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  require(mBits >= 64 && mBits % 64 == 0,
    s"bloom_bitmap mBits must be a positive multiple of 64, got $mBits")

  override def inputTypes = Seq(ArrayType(LongType))
  override def children: Seq[Expression] = Seq(cells)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val arr = cells.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      var j = 0
      while (j < n) {
        val c = a.getLong(j)
        if (c < 0 || c >= mBits) throw new IllegalArgumentException(
          s"bloom_bitmap: cell $c out of [0, $mBits)")
        b((c >>> 6).toInt) |= (1L << (c & 63L))
        j += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) |= other(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(b.clone())

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    var i = 0
    while (i < b.length) { bb.putLong(b(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new Array[Long](mBits / 64)
    var i = 0
    while (i < b.length) { b(i) = bb.getLong; i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): BloomBitmap =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): BloomBitmap =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBitmap =
    copy(cells = c(0))
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

  /** The depth cell indices of a value for a [[CmsSketch]]: row j hashes
    * `"j:" + value` through the 60-bit md5 prefix, mod width. Spelled with
    * codegen'd builtins; DuckDB replays it as
    * `('0x' || substring(md5(j || ':' || v), 1, 15))::BIGINT % width`. */
  def cmsCells(value: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{array, concat, pmod}
    array((0 until depth).map { j =>
      pmod(hash60(concat(lit(s"$j:"), value.cast("string"))), lit(width.toLong))
    }: _*)
  }

  /** Count-min sketch of `value` per group: a flattened depth×width counter
    * matrix (row-major), built in one pass with map-side partials. */
  def cms_sketch(value: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(cmsCells(value, depth, width)), depth, width)
        .toAggregateExpression())

  /** [[cms_sketch]] over a caller-built cells column — for callers that
    * need to gate the cells expression (e.g. `when(v.isNotNull, cmsCells(v))`
    * so null rows contribute NOTHING: bare `cmsCells` of a null value is an
    * array of null cells, not a null array, and would mis-count as cell 0). */
  def cms_sketch_cells(cells: Column, depth: Int, width: Int): Column =
    ColumnBridge.column(
      CmsSketch(ColumnBridge.expression(cells), depth, width)
        .toAggregateExpression())

  /** Point frequency estimate of `term` from a [[cms_sketch]] column: the
    * min of its depth cells — codegen'd `element_at` lookups over the
    * sketch array, no shuffle, usable per probe row. */
  def cmsEstimate(sketch: Column, term: Column, depth: Int, width: Int): Column = {
    import org.apache.spark.sql.functions.{array, array_min, concat, element_at, pmod}
    array_min(array((0 until depth).map { j =>
      val cell = pmod(hash60(concat(lit(s"$j:"), term.cast("string"))), lit(width.toLong))
      element_at(sketch, (cell + lit(j.toLong * width) + lit(1L)).cast("int"))
    }: _*))
  }

  /** Bloom bitmap of `value` per group: kHash bits per value over an
    * mBits-wide bitmap ([[cmsCells]] positions, width = mBits). */
  def bloom_bitmap(value: Column, kHash: Int, mBits: Int): Column =
    ColumnBridge.column(
      BloomBitmap(ColumnBridge.expression(cmsCells(value, kHash, mBits)), mBits)
        .toAggregateExpression())

  /** Bloom membership probe: true iff ALL of `value`'s kHash bits are set
    * in `bloom` — codegen'd element_at + shift + mask, no shuffle. A true
    * is "maybe present" (bounded false-positive rate); false is certain. */
  def bloomMightContain(bloom: Column, value: Column, kHash: Int, mBits: Int): Column = {
    import org.apache.spark.sql.functions.{call_function, concat, element_at, pmod, shiftright}
    (0 until kHash).map { j =>
      val cell = pmod(hash60(concat(lit(s"$j:"), value.cast("string"))), lit(mBits.toLong))
      // word = bloom[cell >> 6], bit = cell & 63; variable-amount shift via
      // the SQL shiftright builtin (the Scala wrapper only takes a literal)
      call_function("shiftright",
        element_at(bloom, (shiftright(cell, 6) + lit(1L)).cast("int")),
        pmod(cell, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)
  }
}
