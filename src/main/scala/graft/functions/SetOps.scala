package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Sorted-set kernels, static so generated code can call them and the
  * expression stays inside whole-stage codegen. */
object SetOps {
  /** Two-pointer intersection count over two ASCENDING-sorted int arrays
    * (strictly increasing, i.e. sets). O(|a|+|b|) with zero allocation —
    * unlike `array_intersect`, which builds a hash set per row (measured
    * 14.0s → 2.9s over 5.5M candidate pairs at sf0.1). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }

  /** Long-element twin (e.g. 60-bit hash sets). */
  def sortedIntersectSizeLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1L; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Custom Catalyst expression: |A ∩ B| for sorted int- or long-array
  * sets via a two-pointer merge. The callers guarantee sortedness
  * (arrays come from `sort_array` over distinct values); on unsorted
  * input the count is undefined, matching the contract of a merge join.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType

  private def elemOk(t: DataType) = t match {
    case ArrayType(IntegerType, _) | ArrayType(LongType, _) => true
    case _ => false
  }

  private def isLong = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    if (elemOk(left.dataType) && elemOk(right.dataType) &&
        left.dataType.asInstanceOf[ArrayType].elementType ==
          right.dataType.asInstanceOf[ArrayType].elementType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_size needs two array<int> or two array<bigint> " +
          s"children, got ${left.dataType} and ${right.dataType}")
  }

  private def kernel: String =
    if (isLong) "sortedIntersectSizeLong" else "sortedIntersectSize"

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isLong)
      SetOps.sortedIntersectSizeLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SetOps.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SetOps.$kernel($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectSize {
  /** Column-API entry point. */
  def sorted_intersect_size(a: Column, b: Column): Column =
    GraftBridge.column(SortedIntersectSize(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
