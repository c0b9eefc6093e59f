package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over `array<double>` — a codegen'd Catalyst
  * expression replacing the interpreted `aggregate(zip_with(...))` fold in
  * the similarity hot path (SURVEY.md §4.2 anticipated exactly this: "custom
  * expression for cosine similarity if `aggregate()` proves too slow").
  *
  * Semantics are a strict drop-in for
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0D, (acc,x) -> acc+x)`:
  *   - summation is sequential left-to-right (bit-identical);
  *   - a null element in either array → NULL (zip_with yields a null
  *     product, the fold absorbs it);
  *   - different lengths → NULL (zip_with pads the short side with null).
  * The null-slot scan is skipped entirely at codegen time when both child
  * array types carry `containsNull = false`.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires (array<double>, array<double>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // result can be NULL for non-null inputs (ragged lengths / null slots)
  override def nullable: Boolean = true

  private def mayHaveNullSlots: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    if (l.numElements() != r.numElements() ||
        (mayHaveNullSlots && VectorOps.anyNullSlot(l, r))) null
    else VectorOps.dot(l, r)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val check = if (mayHaveNullSlots)
        s"$a.numElements() != $b.numElements() || graft.functions.VectorOps.anyNullSlot($a, $b)"
      else
        s"$a.numElements() != $b.numElements()"
      s"""
         |if ($check) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.VectorOps.dot($a, $b);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Static kernel shared by interpreted eval and generated code; callers
    * guarantee equal lengths and no null slots.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** True iff any slot of either array is null (HOF parity: such a pair
    * dot-products to NULL).
    */
  def anyNullSlot(a: ArrayData, b: ArrayData): Boolean = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Column API: dot product of two `array<double>` columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
