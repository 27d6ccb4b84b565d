package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Count of common elements of two ASCENDING-SORTED long arrays with no
  * duplicates and no nulls — value-identical to
  * `size(array_intersect(a, b))` under those preconditions (which the
  * hashed-token/shingle dimension tables in [[graft.textops.TextOps]]
  * establish with `sort_array(array_distinct(...))`-shaped derivations).
  *
  * Why a custom Expression: `array_intersect` allocates an OpenHashSet
  * AND an output array per row, only for `size` to throw the elements
  * away. On the near-dup verify path that is one hash set + one array
  * per candidate pair (millions of pairs per partition at scale); the
  * sorted-merge count is a single allocation-free pointer walk per
  * pair. The sort is paid once per DOCUMENT on the dimension side, not
  * once per pair.
  */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count_sorted expects two array<bigint>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  def compute(la: Any, ra: Any): Int = {
    val a = la.asInstanceOf[ArrayData]
    val b = ra.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def nullSafeEval(la: Any, ra: Any): Any = compute(la, ra)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("intersectCountSorted", this, getClass.getName)
    nullSafeCodeGen(ctx, ev, (la, ra) =>
      s"${ev.value} = $ref.compute($la, $ra);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
}

object IntersectCountSorted {
  def count(a: Column, b: Column): Column =
    Bridge.column(IntersectCountSorted(
      Bridge.expression(a), Bridge.expression(b)))
}
