package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native dot product over numeric-element arrays — a codegen'd Catalyst
  * expression replacing the interpreted `aggregate(zip_with(...))` fold in
  * the similarity hot path (SURVEY.md §4.2 anticipated exactly this:
  * "custom expression for cosine similarity if `aggregate()` proves too
  * slow").
  *
  * Semantics are a strict drop-in for
  * `aggregate(zip_with(aD, bD, (x,y) -> x*y), 0D, (acc,x) -> acc+x)` where
  * `aD`/`bD` are the double-widened inputs:
  *   - every element widens to double EXACTLY per IEEE 754 (float always;
  *     integral types for |x| ≤ 2⁵³ — far beyond any embedding code), so
  *     accepting raw `array<float>` / `array<bigint>` is bit-identical to
  *     `transform(v, cast-to-double)` first — minus 2× the bytes through
  *     every exchange that carries a float vector (embeddings ship as
  *     float32, and the near-dup verification joins shuffle them), and
  *     minus re-running the cast transform once per referencing plane in
  *     [[graft.operators.Similarity.lshBucket]];
  *   - summation is sequential left-to-right (bit-identical);
  *   - a null element in either array → NULL (zip_with yields a null
  *     product, the fold absorbs it);
  *   - different lengths → NULL (zip_with pads the short side with null).
  * The element accessors are specialized at PLAN time (the generated loop
  * has no per-element branches), and the null-slot scan is skipped entirely
  * at codegen time when both child array types carry `containsNull = false`.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (DoubleType | FloatType | LongType | IntegerType |
                        ShortType | ByteType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product requires arrays of double/float/integral elements on " +
          s"both sides, got (${left.dataType.catalogString}, " +
          s"${right.dataType.catalogString})")
    }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  // result can be NULL for non-null inputs (ragged lengths / null slots)
  override def nullable: Boolean = true

  private def mayHaveNullSlots: Boolean = (left.dataType, right.dataType) match {
    case (ArrayType(_, ln), ArrayType(_, rn)) => ln || rn
    case _ => true
  }

  /** Plan-time-resolved element reader (interpreted path). Widening to
    * double is exact for every accepted type.
    */
  private def reader(e: Expression): (ArrayData, Int) => Double = elemType(e).get match {
    case DoubleType => (a, i) => a.getDouble(i)
    case FloatType => (a, i) => a.getFloat(i).toDouble
    case LongType => (a, i) => a.getLong(i).toDouble
    case IntegerType => (a, i) => a.getInt(i).toDouble
    case ShortType => (a, i) => a.getShort(i).toDouble
    case ByteType => (a, i) => a.getByte(i).toDouble
  }

  @transient private lazy val readL = reader(left)
  @transient private lazy val readR = reader(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val l = a.asInstanceOf[ArrayData]
    val r = b.asInstanceOf[ArrayData]
    if (l.numElements() != r.numElements() ||
        (mayHaveNullSlots && VectorOps.anyNullSlot(l, r))) null
    else {
      val n = l.numElements()
      var s = 0.0
      var i = 0
      while (i < n) {
        s += readL(l, i) * readR(r, i)
        i += 1
      }
      s
    }
  }

  /** Java accessor for one element, widened to double (codegen path). */
  private def acc(e: Expression, arr: String, i: String): String = elemType(e).get match {
    case DoubleType => s"$arr.getDouble($i)"
    case FloatType => s"(double) $arr.getFloat($i)"
    case LongType => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType => s"(double) $arr.getShort($i)"
    case ByteType => s"(double) $arr.getByte($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val check = if (mayHaveNullSlots)
        s"$a.numElements() != $b.numElements() || graft.functions.VectorOps.anyNullSlot($a, $b)"
      else
        s"$a.numElements() != $b.numElements()"
      val n = ctx.freshName("dpN")
      val i = ctx.freshName("dpI")
      val s = ctx.freshName("dpS")
      s"""
         |if ($check) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $s += ${acc(left, a, i)} * ${acc(right, b, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

object VectorOps {

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

  /** Column API: dot product of two numeric-element array columns. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
