package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, ByteType, DataType, DateType, IntegerType, LongType, ShortType, StringType, TimestampNTZType, TimestampType}

/** Static helper shared by `eval` and generated code: |set(a) ∩ set(b)|
  * over two arrays, WITHOUT materializing the intersection array the way
  * `size(array_intersect(a, b))` does. Builds one hash set from the
  * smaller side, probes with the larger, counts distinct hits — the exact
  * Jaccard-verification inner loop of the near-dup operators, which runs
  * once per candidate pair. */
object SetOps {
  def intersectionSize(a: ArrayData, b: ArrayData, dt: DataType): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val set = new java.util.HashSet[Any](small.numElements() * 2)
    var i = 0
    val n = small.numElements()
    while (i < n) {
      if (!small.isNullAt(i)) set.add(small.get(i, dt))
      i += 1
    }
    var count = 0
    var j = 0
    val m = large.numElements()
    while (j < m && !set.isEmpty) {
      if (!large.isNullAt(j) && set.remove(large.get(j, dt))) count += 1
      j += 1
    }
    count
  }
}

/** `intersection_size(a, b)` ≡ `size(array_intersect(a, b))` for non-null
  * element arrays, minus the intermediate array allocation + copy. */
case class IntersectionSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override protected def withNewChildrenInternal(l: Expression, r: Expression): IntersectionSize =
    copy(left = l, right = r)

  private lazy val elementType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.intersectionSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], elementType)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dtRef = ctx.addReferenceObj("elemType", elementType, classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOps.intersectionSize($a, $b, $dtRef);")
  }
}

/** Optimizer rule (injected via `GraftExtensions`): rewrite
  * `size(array_intersect(a, b))` to [[IntersectionSize]] wherever only the
  * COUNT of the intersection is consumed. Matches the non-legacy `size`
  * (null in → null out) — legacy `size(null) = -1` keeps the original
  * expression. Pure-SQL Jaccard queries get the allocation-free path the
  * Scala operators use directly. */
object IntersectionSizeRule extends Rule[LogicalPlan] {
  private def rewritable(e: Expression): Boolean = e.dataType match {
    // null-element arrays keep the original expression (array_intersect
    // counts a null present on both sides, the hash probe skips it), and
    // the element type must be a WHITELISTED value-equality type: the
    // hash probe uses JVM equals/hashCode, which diverges from SQL set
    // semantics for floating point (0.0 vs -0.0 has flip-flopped across
    // releases), binary (Array[Byte] is identity-equal), structs (mixed
    // Unsafe/Generic rows), decimals (scale-sensitive equals). The
    // rewrite must never be the thing that changes a pure-SQL answer.
    case ArrayType(et, containsNull) => !containsNull && valueEquality(et)
    case _ => false
  }

  private def valueEquality(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
         LongType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ai: ArrayIntersect, legacySizeOfNull)
          if !legacySizeOfNull && rewritable(ai.left) && rewritable(ai.right) =>
        IntersectionSize(ai.left, ai.right)
    }
}

object SetExpressions {
  def intersection_size(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectionSize(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
