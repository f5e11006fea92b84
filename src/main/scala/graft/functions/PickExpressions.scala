package graft.functions

import java.nio.ByteBuffer
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{concat, lit, md5}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bounded deterministic "random" picks for the crux 1.16 two-arg find
  * aggregates `(sample N ?x)` / `(rand N ?x)` (Q15).
  *
  * Both used to collect the whole group (`collect_set`/`collect_list`) and
  * slice on the reduce side — unbounded per-group state that a single hot
  * key at 100 TB turns into an executor-killing buffer (VERDICT r10 #2).
  * These aggregates keep ≤ k entries per map task instead (the
  * [[TopKByScore]] shape): partial-aggregate before the shuffle, ship ≤ k
  * (hash, value) pairs per group per task, merge by the same bounded
  * insert. Both remain engine-replayable: every ordering decision is a
  * comparison of md5 values the DuckDB oracle computes identically.
  *
  * Value payloads are type-generic: entries serialize through an
  * [[UnsafeProjection]] over the child's data type, so any atomic column
  * (string, long, double, date…) works without per-type aggregates. */
object PickExpressions {

  /** `(sample N ?x)`: the first k DISTINCT values in salted-md5 order —
    * md5(cast(x as string) || ':42') ascending. Same pick set and order as
    * the former collect_set + sort + slice, with O(k) state. */
  def sample_picks(value: Column, k: Int): Column = {
    val h = md5(concat(value.cast("string"), lit(":42")).cast("binary"))
    ColumnBridge.column(SampleBottomK(
      ColumnBridge.expression(h), ColumnBridge.expression(value), k)
      .toAggregateExpression())
  }

  /** `(rand N ?x)`: k picks WITH replacement — pick i (1-based) is the
    * group value minimizing md5(cast(x as string) || ':' || i || ':42').
    * Each i is an independent seeded hash order, so picks can repeat
    * (replacement) while staying deterministic, partition-invariant, and
    * SQL-replayable (`min_by(x, md5(x || ':' || i || ':42'))`). */
  def rand_picks(value: Column, k: Int): Column =
    ColumnBridge.column(RandPicks(
      ColumnBridge.expression(value.cast("string")),
      ColumnBridge.expression(value), k)
      .toAggregateExpression())
}

/** Shared plumbing: generic value (de)serialization via UnsafeProjection
  * and defensive copies for buffer-retained catalyst values. */
private[functions] trait PickAggBase {
  def valueType: DataType

  @transient protected lazy val valueProj: UnsafeProjection =
    UnsafeProjection.create(Array(valueType))

  /** Catalyst values read off a reused input row must be copied before
    * the buffer retains them past the row's lifetime — INCLUDING the
    * container types: an UnsafeArrayData/MapData/InternalRow returned by
    * eval() is a VIEW into the operator's reused row buffer, and a
    * retained view mutates into the next row's bytes (wrong picks for an
    * array-typed ?x). `InternalRow.copyValue` handles every Catalyst
    * value shape. */
  protected def copyVal(v: Any): Any = v match {
    case b: Array[Byte] => b.clone()
    case x => InternalRow.copyValue(x)
  }

  protected def writeValue(bb: java.io.ByteArrayOutputStream, v: Any): Unit = {
    val row = valueProj(InternalRow(v))
    val bytes = row.getBytes
    val len = ByteBuffer.allocate(4).putInt(bytes.length).array()
    bb.write(len); bb.write(bytes)
  }

  protected def readValue(bb: ByteBuffer): Any = {
    val len = bb.getInt
    val bytes = new Array[Byte](len)
    bb.get(bytes)
    val row = new UnsafeRow(1)
    row.pointTo(bytes, len)
    row.get(0, valueType)
  }

  protected def writeBytes(bb: java.io.ByteArrayOutputStream, b: Array[Byte]): Unit = {
    bb.write(ByteBuffer.allocate(4).putInt(b.length).array()); bb.write(b)
  }

  protected def readBytes(bb: ByteBuffer): Array[Byte] = {
    val len = bb.getInt
    val b = new Array[Byte](len)
    bb.get(b)
    b
  }
}

/** Sorted bottom-k distinct (hash, value) state: ≤ k entries ascending by
  * hash (hex-string binary order — identical to the SQL `ORDER BY md5(…)`
  * the oracle replays). Distinct values hash distinctly (md5 over the
  * value's cast string — injective per column type, collisions
  * cryptographically negligible), so the hash-equality guard IS the
  * distinct guard. */
final class BottomKPickBuffer(val k: Int) {
  val hs = new Array[UTF8String](k)
  val vs = new Array[Any](k)
  var n = 0

  def insert(h: UTF8String, v: Any): Unit = {
    if (n == k && hs(k - 1).compareTo(h) <= 0) return // ≥ current kth — irrelevant
    var lo = 0
    var hi = n
    while (lo < hi) { // lower-bound binary search
      val mid = (lo + hi) >>> 1
      if (hs(mid).compareTo(h) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && hs(lo).compareTo(h) == 0) return // distinct guard
    val last = if (n < k) n else k - 1
    var j = last
    while (j > lo) { hs(j) = hs(j - 1); vs(j) = vs(j - 1); j -= 1 }
    hs(lo) = h
    vs(lo) = v
    if (n < k) n += 1
  }
}

/** `(sample N ?x)` aggregate: bottom-k distinct values by salted md5,
  * O(k) state per map task (see [[PickExpressions]]). */
case class SampleBottomK(
    hash: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[BottomKPickBuffer] with PickAggBase {

  require(k > 0, "sample k must be positive")

  override def valueType: DataType = value.dataType
  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(value.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hash.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"sample hash child must be a string, got ${hash.dataType}")

  override def createAggregationBuffer(): BottomKPickBuffer = new BottomKPickBuffer(k)

  override def update(b: BottomKPickBuffer, input: InternalRow): BottomKPickBuffer = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      b.insert(h.asInstanceOf[UTF8String].copy(), copyVal(v))
    b
  }

  override def merge(b: BottomKPickBuffer, other: BottomKPickBuffer): BottomKPickBuffer = {
    var j = 0
    while (j < other.n) { b.insert(other.hs(j), other.vs(j)); j += 1 }
    b
  }

  override def eval(b: BottomKPickBuffer): Any =
    new GenericArrayData(b.vs.take(b.n))

  override def serialize(b: BottomKPickBuffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(ByteBuffer.allocate(4).putInt(b.n).array())
    var j = 0
    while (j < b.n) {
      writeBytes(out, b.hs(j).getBytes)
      writeValue(out, b.vs(j))
      j += 1
    }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): BottomKPickBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new BottomKPickBuffer(k)
    val n = bb.getInt
    var j = 0
    while (j < n) {
      val h = UTF8String.fromBytes(readBytes(bb))
      b.insert(h, readValue(bb))
      j += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): SampleBottomK =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): SampleBottomK =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): SampleBottomK =
    copy(hash = c(0), value = c(1))
}

/** k independent argmin slots: slot i holds the (digest, value) minimizing
  * md5(str || ':' || (i+1) || ':42'), digests compared as unsigned bytes
  * (== hex-string order). Merge is per-slot min — commutative and
  * associative, so picks are partition-layout-invariant. */
final class RandPickBuffer(val k: Int) {
  val hs = new Array[Array[Byte]](k)
  val vs = new Array[Any](k)

  def offer(i: Int, digest: Array[Byte], v: Any): Unit = {
    val cur = hs(i)
    if (cur == null || RandPickBuffer.compareDigests(digest, cur) < 0) {
      hs(i) = digest
      vs(i) = v
    }
  }
}

object RandPickBuffer {
  /** Unsigned lexicographic byte compare — the order md5 hex strings sort
    * in, so the SQL oracle's `min_by(x, md5(…))` agrees bit-for-bit. */
  def compareDigests(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val cmp = (a(i) & 0xff) - (b(i) & 0xff)
      if (cmp != 0) return cmp
      i += 1
    }
    a.length - b.length
  }
}

/** `(rand N ?x)` aggregate: k with-replacement picks, O(k) state per map
  * task (see [[PickExpressions]]). */
case class RandPicks(
    str: Expression, value: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[RandPickBuffer] with PickAggBase {

  require(k > 0, "rand k must be positive")

  override def valueType: DataType = value.dataType
  override def children: Seq[Expression] = Seq(str, value)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(value.dataType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (str.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"rand string child must be a string, got ${str.dataType}")

  override def createAggregationBuffer(): RandPickBuffer = new RandPickBuffer(k)

  // hot-path hygiene: ONE digest per task and the k salt suffixes
  // precomputed once — update() runs per input ROW, and a fresh
  // MessageDigest.getInstance plus k string-encode allocations per row is
  // measurable at the scale this aggregate exists for
  @transient private lazy val md = MessageDigest.getInstance("MD5")
  @transient private lazy val salts: Array[Array[Byte]] =
    Array.tabulate(k)(i => s":${i + 1}:42".getBytes("UTF-8"))

  override def update(b: RandPickBuffer, input: InternalRow): RandPickBuffer = {
    val s = str.eval(input)
    val v = value.eval(input)
    if (s != null && v != null) {
      val base = s.asInstanceOf[UTF8String].getBytes
      val vc = copyVal(v)
      var i = 0
      while (i < k) {
        md.reset()
        md.update(base)
        md.update(salts(i))
        b.offer(i, md.digest(), vc)
        i += 1
      }
    }
    b
  }

  override def merge(b: RandPickBuffer, other: RandPickBuffer): RandPickBuffer = {
    var i = 0
    while (i < k) {
      if (other.hs(i) != null) b.offer(i, other.hs(i), other.vs(i))
      i += 1
    }
    b
  }

  override def eval(b: RandPickBuffer): Any = {
    val present = (0 until k).filter(b.hs(_) != null)
    new GenericArrayData(present.map(b.vs(_)).toArray[Any])
  }

  override def serialize(b: RandPickBuffer): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < k) {
      if (b.hs(i) == null) out.write(ByteBuffer.allocate(4).putInt(-1).array())
      else {
        writeBytes(out, b.hs(i))
        writeValue(out, b.vs(i))
      }
      i += 1
    }
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): RandPickBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new RandPickBuffer(k)
    var i = 0
    while (i < k) {
      val len = bb.getInt
      if (len >= 0) {
        val digest = new Array[Byte](len)
        bb.get(digest)
        b.offer(i, digest, readValue(bb))
      }
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): RandPicks =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): RandPicks =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): RandPicks =
    copy(str = c(0), value = c(1))
}
