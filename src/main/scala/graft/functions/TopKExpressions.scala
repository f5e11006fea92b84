package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k state: ≤ k (score, id) pairs, O(k) memory. Insertion
  * replaces the current worst only when the candidate beats it, where
  * "better" = higher score, ties broken by LOWER id — the same ordering as
  * `ORDER BY score DESC, id` so results are engine-comparable. k is small
  * (≤ a few hundred), so a linear worst-scan beats heap bookkeeping. */
final class TopKBuffer(val k: Int) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(score: Double, id: Long): Unit =
    if (n < k) { scores(n) = score; ids(n) = id; n += 1 }
    else {
      var worst = 0
      var j = 1
      while (j < n) {
        if (better(scores(worst), ids(worst), scores(j), ids(j))) worst = j
        j += 1
      }
      if (better(score, id, scores(worst), ids(worst))) {
        scores(worst) = score; ids(worst) = id
      }
    }

  /** Indices sorted best-first (score desc, id asc). */
  def sortedIdx: Array[Int] =
    Array.range(0, n).sortWith((a, b) => better(scores(a), ids(a), scores(b), ids(b)))
}

/** `top_k_by(score, id, k)` — aggregate returning the k highest-scoring
  * (score, id) pairs as `array<struct<score double, id bigint>>`, best
  * first. A TypedImperativeAggregate, so Spark runs it as a PARTIAL
  * aggregate before the shuffle: each map task ships at most k pairs per
  * group instead of its whole input — the top-k-per-key shape that holds
  * at 100 TB, with no window sort and no per-group spill. */
case class TopKByScore(
    score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer]
    with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

  // declared input types: an int id / float score would otherwise throw
  // ClassCastException per row deep inside the aggregate — the analyzer
  // now inserts casts (or fails analysis cleanly)
  override def inputTypes =
    Seq(org.apache.spark.sql.types.DoubleType, org.apache.spark.sql.types.LongType)

  require(k > 0, "top_k_by k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.n) { b.insert(other.scores(j), other.ids(j)); j += 1 }
    b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedIdx.map(j =>
      InternalRow(b.scores(j), b.ids(j)): Any))

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + b.n * 16)
    bb.putInt(b.n)
    var j = 0
    while (j < b.n) { bb.putDouble(b.scores(j)); bb.putLong(b.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(k)
    val n = bb.getInt
    var j = 0
    while (j < n) { b.insert(bb.getDouble, bb.getLong); j += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(off: Int): TopKByScore =
    copy(mutableAggBufferOffset = off)
  override def withNewInputAggBufferOffset(off: Int): TopKByScore =
    copy(inputAggBufferOffset = off)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKByScore =
    copy(score = c(0), id = c(1))
}

object TopKExpressions {
  /** Column builder: top-k (score, id) pairs per group, best first. */
  def top_k_by(score: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByScore(ColumnBridge.expression(score), ColumnBridge.expression(id), k)
        .toAggregateExpression())
}
