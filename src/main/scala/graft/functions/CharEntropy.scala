package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shannon entropy (bits per character) of a string's codepoint
  * distribution — the classic gibberish/low-diversity signal
  * (`aaaa…` → 0 bits, uniform noise → log₂ alphabet): a quality-filter
  * primitive next to TextAnalysis.qualitySignals.
  *
  * A native codegen'd Expression (SURVEY.md §7.4 preference (b)): the
  * declarative alternative explodes one row per CHARACTER (a 1000×
  * row-inflation before a groupBy), which is exactly the intermediate
  * blowup a per-row kernel avoids; this is one histogram pass per row,
  * zero extra rows. The DuckDB oracle (q129) states the exploded
  * formulation over `string_split(text, '')` + `entropy()` — the
  * cross-engine contract, with this kernel as the production path.
  *
  * Both engines sum `p·log₂p` in engine-chosen order, so consumers round
  * to 6 dp (the q71 ln convention) before comparing or gating.
  */
case class CharEntropyExpr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"char_entropy requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropyKernel(input.asInstanceOf[UTF8String])

  // Kernel deliberately NOT named `eval` — see SimHash64Expr: a class
  // member name clash would suppress the static forwarder and silently
  // disable whole-stage codegen for the stage.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyExpr.entropyKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {

  private val Log2 = math.log(2.0)

  /** Static kernel shared by interpreted eval and generated code:
    * H = log₂n − (Σ c·log₂c)/n over codepoint counts (one pass + one
    * histogram iteration; iteration order is a deterministic function of
    * the input string, so repeated runs are bit-identical).
    */
  def entropyKernel(s: UTF8String): Double = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n == 0) return 0.0
    val counts = new java.util.HashMap[Integer, Integer]()
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      counts.merge(cp, 1, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    var sum = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      sum += c * (math.log(c) / Log2)
    }
    math.log(n.toDouble) / Log2 - sum / n.toDouble
  }

  /** Column API: charEntropy(textCol) — bits per character. */
  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropyExpr(ColumnBridge.expression(text)))
}
