package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over `array<double>` / `array<float>` (each side
  * independently) — a codegen'd Catalyst expression replacing the
  * interpreted `aggregate(zip_with(...))` fold in the similarity hot path
  * (SURVEY.md §4.2 anticipated exactly this: "custom expression for cosine
  * similarity if `aggregate()` proves too slow").
  *
  * Semantics are a strict drop-in for
  * `aggregate(zip_with(aD, bD, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` where
  * `aD`/`bD` are the double-widened inputs:
  *   - float elements widen to double EXACTLY, so accepting raw
  *     `array<float>` is bit-identical to `transform(v, cast-to-double)`
  *     first — minus 2× the bytes through every exchange that carries the
  *     vector (the reason the float form exists: embeddings ship as
  *     float32, and the near-dup verification joins shuffle them);
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
      case (ArrayType(DoubleType | FloatType, _), ArrayType(DoubleType | FloatType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires array<double|float> on both sides, got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  /** Kernel name specialized to the child element types at PLAN time —
    * the generated loop has no per-element branches.
    */
  private def kernel: String =
    (if (isFloat(left)) "dotF" else "dotD") + (if (isFloat(right)) "F" else "D")

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
    else (isFloat(left), isFloat(right)) match {
      case (false, false) => VectorOps.dotDD(l, r)
      case (false, true) => VectorOps.dotDF(l, r)
      case (true, false) => VectorOps.dotFD(l, r)
      case (true, true) => VectorOps.dotFF(l, r)
    }
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
         |  ${ev.value} = graft.functions.VectorOps.$kernel($a, $b);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

  /** Static kernels shared by interpreted eval and generated code; callers
    * guarantee equal lengths and no null slots. One loop per element-type
    * pair — specialized at plan time, branch-free per element; float reads
    * widen to double exactly, so every variant agrees bit-for-bit with
    * [[dotDD]] over the cast inputs.
    */
  def dotDD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    s
  }

  def dotFD(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    s
  }

  def dotDF(a: ArrayData, b: ArrayData): Double = dotFD(b, a)

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
