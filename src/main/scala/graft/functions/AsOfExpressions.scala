package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Static helper shared by `eval` and generated code: rightmost element of
  * a time-sorted struct array whose first field is <= `t` — one binary
  * search per row, O(log versions). The streaming as-of enrichment runs
  * this once per event; a `filter`+`array_max` HOF spelling would walk the
  * whole version array per event through the interpreter. */
object AsOfOps {
  def pick(arr: ArrayData, t: Any, numFields: Int, timeType: DataType,
           ord: Ordering[Any]): InternalRow = {
    var lo = 0
    var hi = arr.numElements() - 1
    var best = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val row = arr.getStruct(mid, numFields)
      // null ELEMENTS and null times both sort first in sort_array and
      // never match (SQL as-of semantics) — skip past them, don't NPE:
      // the public asof_pick accepts arrays built outside enrichAsOf
      val tm = if (row == null) null else row.get(0, timeType)
      if (tm != null && ord.compare(tm, t) <= 0) { best = mid; lo = mid + 1 }
      else if (tm == null) lo = mid + 1
      else hi = mid - 1
    }
    if (best < 0) null else arr.getStruct(best, numFields)
  }
}

/** `asof_pick(versions, t)`: given `versions` = array of structs sorted
  * ascending (first field = version time), the LAST struct with time <= `t`
  * — i.e. the latest version visible at `t`; null if none. Ties on the
  * time resolve to the max remaining-field tuple (array order), matching
  * the native as-of join's backward tie-break. */
case class AsOfPick(left: Expression, right: Expression)
    extends BinaryExpression {

  private lazy val structType: StructType =
    left.dataType.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
  private lazy val timeType: DataType = structType.fields(0).dataType
  @transient private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(timeType).asInstanceOf[Ordering[Any]]

  override def dataType: DataType = structType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    left.dataType match {
      case ArrayType(st: StructType, _) if st.fields.nonEmpty =>
        if (st.fields(0).dataType == right.dataType)
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"asof_pick: probe type ${right.dataType} must equal the struct's " +
            s"first (time) field type ${st.fields(0).dataType}")
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"asof_pick: first argument must be array<struct<...>>, got $other")
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): AsOfPick =
    copy(left = l, right = r)

  override def nullSafeEval(a: Any, t: Any): Any =
    AsOfOps.pick(a.asInstanceOf[ArrayData], t, structType.length, timeType, ord)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ttRef = ctx.addReferenceObj("timeType", timeType, classOf[DataType].getName)
    val ordRef = ctx.addReferenceObj("ord", ord, classOf[Ordering[Any]].getName)
    val n = structType.length
    nullSafeCodeGen(ctx, ev, (a, t) => s"""
      ${ev.value} = graft.functions.AsOfOps.pick($a, $t, $n, $ttRef, $ordRef);
      ${ev.isNull} = ${ev.value} == null;""")
  }
}

object AsOfExpressions {
  def asof_pick(versions: Column, t: Column): Column =
    ColumnBridge.column(AsOfPick(
      ColumnBridge.expression(versions), ColumnBridge.expression(t)))
}
