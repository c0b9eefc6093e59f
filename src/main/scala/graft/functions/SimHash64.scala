package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit SimHash over a token array — a native Catalyst expression with
  * whole-stage codegen (preference order (b) from SURVEY.md §7.4: a custom
  * `Expression` beats a Scala UDF). One pass per row, no intermediate
  * explosion: the 60×-row md5 formulation used for the DuckDB oracle twin
  * (SparkEntry q24) is the cross-check, this is the production path.
  *
  * Token hash = XxHash64 (Spark's own codegen'd hash, seed 42); bit j of the
  * signature is set iff the count of tokens with bit j set exceeds those
  * without.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.simhashKernel(input.asInstanceOf[ArrayData])

  // The kernel must NOT be named `eval`: the companion class inherits
  // Expression.eval, which suppresses scalac's static forwarder for a
  // same-named object method, so Janino would fail to resolve the call and
  // Spark would silently fall back to interpreted execution (disabling
  // whole-stage codegen for the entire stage). `simhashKernel` has no class
  // member clash, so the forwarder is emitted; SimHash64Spec pins this with
  // a CODEGEN_ONLY factory-mode test.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.simhashKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {

  /** Static kernel shared by interpreted eval and generated code. */
  def simhashKernel(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API: simhash64(tokensCol). */
  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(tokens)))

  /** Hamming distance between two simhash signatures. */
  def hamming(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b)).cast("int")
}
