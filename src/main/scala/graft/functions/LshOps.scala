package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id — a native codegen'd Catalyst expression
  * fusing plane-weight generation, the `planes` sign-bit dot products and
  * the bit assembly into ONE tight loop per row.
  *
  * Strict drop-in for the declarative formulation its DuckDB oracle twins
  * state (SparkEntry q25/q27/q81):
  * {{{
  *   (0 until planes).map { p =>
  *     val w = transform(sequence(lit(0), size(vec) - 1),
  *       j => planeWeight(planeOffset + p, j).cast("double"))
  *     when(dot(vec, w) > 0, lit(1L << p)).otherwise(lit(0L))
  *   }.reduce(_ + _)
  * }}}
  * including the edge semantics: NULL input array or any NULL element slot
  * ⇒ every per-plane dot is NULL ⇒ every `when` falls to `otherwise(0)` ⇒
  * bucket 0 (the expression is therefore never-null). Weight arithmetic is
  * the square-then-multiply mod 2³¹−1 mixer (see
  * [[graft.operators.Similarity]] scaladoc for why the affine form was
  * replaced); element widening and the sequential fold are bit-identical
  * to [[DotProductExpr]] over the generated weight array.
  *
  * Why an expression and not the HOF composition: `size(vec)` is per-row,
  * so Catalyst cannot constant-fold the weight arrays — the interpreted
  * `transform(sequence(...))` re-derives every weight per row per plane
  * through boxed Column-tree evaluation. The banded near-dup generator
  * evaluates `tables × planes` (≈ 60 at 500k vectors) plane dots per row,
  * which made weight generation the measured bottleneck of
  * `pipe_embedding_neardup`; here each weight is ~6 integer ops in a
  * compiled loop.
  */
case class LshBucketExpr(child: Expression, planes: Int, planeOffset: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType | FloatType | LongType | IntegerType |
                   ShortType | ByteType, _) =>
      if (planes < 1 || planes > 62)
        TypeCheckResult.TypeCheckFailure(s"lsh_bucket planes must be in [1, 62], got $planes")
      else if (planeOffset < 0)
        TypeCheckResult.TypeCheckFailure(s"lsh_bucket planeOffset must be >= 0, got $planeOffset")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_bucket requires an array of double/float/integral elements, " +
        s"got ${other.catalogString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  // NULL input folds to bucket 0 (declarative parity), so the output is
  // never null regardless of child nullability
  override def nullable: Boolean = false

  /** Element-type tag for the kernel's widening switch (resolved at plan
    * time; the kernel's per-element loop is branch-free).
    */
  private def kind: Int = child.dataType match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case _ => 5 // ByteType — checkInputDataTypes admits nothing else
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else LshBucketExpr.bucketKernel(v.asInstanceOf[ArrayData], planes, planeOffset, kind)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = code"""
      ${childGen.code}
      long ${ev.value} = 0L;
      if (!${childGen.isNull}) {
        ${ev.value} = graft.functions.LshBucketExpr.bucketKernel(
          ${childGen.value}, $planes, $planeOffset, $kind);
      }""", isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBucketExpr =
    copy(child = newChild)
}

object LshBucketExpr {

  private val P = 2147483647L // 2^31 - 1, prime

  /** Static kernel shared by interpreted eval and generated code (named to
    * avoid the Expression.eval forwarder clash — see SimHash64Expr).
    * A null element slot yields bucket 0, like the declarative form's
    * NULL-dot-per-plane.
    */
  def bucketKernel(arr: ArrayData, planes: Int, planeOffset: Int, kind: Int): Long = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L
      i += 1
    }
    // widen once to double (exact for every accepted element type) so the
    // per-plane loop reads a flat array
    val v = new Array[Double](n)
    i = 0
    kind match {
      case 0 => while (i < n) { v(i) = arr.getDouble(i); i += 1 }
      case 1 => while (i < n) { v(i) = arr.getFloat(i).toDouble; i += 1 }
      case 2 => while (i < n) { v(i) = arr.getLong(i).toDouble; i += 1 }
      case 3 => while (i < n) { v(i) = arr.getInt(i).toDouble; i += 1 }
      case 4 => while (i < n) { v(i) = arr.getShort(i).toDouble; i += 1 }
      case _ => while (i < n) { v(i) = arr.getByte(i).toDouble; i += 1 }
    }
    var bucket = 0L
    var p = 0
    while (p < planes) {
      val pi = planeOffset + p
      var s = 0.0
      var j = 0
      while (j < n) {
        // square-then-multiply mod 2^31-1 — bit-identical to
        // Similarity.planeWeight and the DuckDB planeWeightSql twin
        val w1 = ((pi + 1).toLong * 1566083941L + j.toLong * 1812433253L) % P
        val w2 = (w1 * w1) % P
        val w = (w2 * 1103515245L) % P % 1001L - 500L
        s += v(j) * w.toDouble
        j += 1
      }
      if (s > 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  /** Column API: the fused LSH bucket kernel. */
  def lshBucket(vec: Column, planes: Int, planeOffset: Int): Column =
    ColumnBridge.column(LshBucketExpr(ColumnBridge.expression(vec), planes, planeOffset))
}
