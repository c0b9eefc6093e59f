package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd MinHash signature kernel — the hot path of the dedup pipeline
  * (SURVEY.md §7.5 anticipated exactly this: "custom machinery for MinHash
  * if built-ins fall short").
  *
  * Computes, in ONE pass over a shingle array, all k permutation minimums
  * of the classic `(a_s·t + b_s) mod p` family over the md5-derived base
  * hash `t = first-60-bits(md5(shingle)) mod p`. Numerically identical to
  * the SQL formulation `min((a·conv(substring(md5(x),1,15),16,10) + b) % p)`
  * (the first 15 hex chars of an md5 ARE the first 60 bits of its digest),
  * but without materializing a 32-char hex string and big-integer-parsing
  * it per shingle — digest bytes are folded into a long directly.
  */
case class MinHashSigsExpr(child: Expression, k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sigs requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"
  // empty input arrays yield NULL (a doc with no shingles has no signature)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.sigs(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.sigs($c, $k);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigsExpr =
    copy(child = newChild)
}

/** Codegen'd intersection count over two SORTED string arrays: a two-
  * pointer merge, no per-pair hash-set allocation (vs `array_intersect`).
  * Sort order must be Spark's `sort_array` order for strings, i.e.
  * UTF8String binary order — the caller sorts each side ONCE per document,
  * then every candidate pair is verified in O(|A|+|B|).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires (array<string>, array<string>), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    MinHashKernel.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.MinHashKernel.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd shingle-set builder: tokenize on the space byte, form word
  * n-grams, dedup, and sort (UTF8String binary order = `sort_array` order)
  * in ONE pass — replacing the `sort_array(array_distinct(zip_with(...)))`
  * chain and its three intermediate arrays per row. Tokenization matches
  * `split(text, ' ')` exactly (empty tokens from doubled/leading/trailing
  * spaces are kept). Documents with fewer than n tokens yield NULL.
  */
case class ShingleSortedSetExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_sorted_set requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingle_sorted_set"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.shingleSortedSet(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinHashKernel.shingleSortedSet($c, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleSortedSetExpr =
    copy(child = newChild)
}

/** Codegen'd 60-bit SimHash over a token array using the md5-derived base
  * hash — the ENGINE-PORTABLE twin of [[SimHash64Expr]] (whose XxHash64
  * kernel DuckDB cannot reproduce): bit j of the signature is set iff
  * tokens with bit j set outnumber those without, token hash =
  * first-60-bits(md5(token)). Bit-identical to the explode→groupBy SQL
  * formulation (SparkEntry q24), in one pass per row.
  */
case class Md5SimHash60Expr(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_simhash60 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_simhash60"

  override def nullSafeEval(input: Any): Any =
    MinHashKernel.md5SimHash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashKernel.md5SimHash60($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5SimHash60Expr =
    copy(child = newChild)
}

object MinHashKernel {

  /** MinHash universe: the Mersenne prime 2³¹−1. The space must dwarf the
    * corpus's total shingle count — with the previous P = 1000003, a 5M-doc
    * corpus (195M shingle draws) saturated all 10⁶ residues ~195× over, so
    * "hot" t-values that happen to map small under BOTH multipliers of a
    * band handed ~150 unrelated docs the same band key (measured in the
    * PipelineScaleBench 10× run; SCALE.md §LSH candidate growth).
    * (P−1)² ≈ 4.6e18 keeps `A(s)·t + B(s)` inside both a Java long and a
    * DuckDB BIGINT (max 9.2e18) with no overflow.
    */
  val P = 2147483647L

  /** Per-slot permutation constants `π_s(t) = (A(s)·t + B(s)) mod P`:
    * A(s) = 7919^(s+1) mod P, B(s) = 104729^(s+1) mod P. The multipliers
    * must be LARGE and unstructured mod P — the original family's small
    * odd multipliers (2s+1 ∈ {1..15}, slot 0 the identity!) left the k
    * "independent" minimums heavily rank-correlated, so a 2-row LSH band
    * collided with ~single-hash probability and unrelated-pair candidates
    * grew O(n²): measured 3.0→30.2 candidate pairs/doc from 500k→5M docs.
    * Successive prime powers mod a prime are unstructured and
    * deterministic in any engine.
    */
  private val MaxK = 64
  val A: Array[Long] = {
    val a = new Array[Long](MaxK); var v = 1L
    for (s <- 0 until MaxK) { v = v * 7919L % P; a(s) = v }; a
  }
  val B: Array[Long] = {
    val b = new Array[Long](MaxK); var v = 1L
    for (s <- 0 until MaxK) { v = v * 104729L % P; b(s) = v }; b
  }

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars = bytes 0..6
    * plus the high nibble of byte 7 = (first 8 bytes big-endian) >>> 4.
    */
  def md5Prefix60(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** All k permutation minimums in one pass; null slots are skipped; an
    * array with no non-null element yields null (no signature).
    */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val t = md5Prefix60(arr.getUTF8String(i)) % P
        var s = 0
        while (s < k) {
          val v = (A(s) * t + B(s)) % P
          if (v < mins(s)) mins(s) = v
          s += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** Two-pointer merge count of common elements of two sorted arrays
    * (UTF8String binary order, `sort_array` parity). Inputs are distinct
    * per construction, so equal elements advance both sides.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** Tokenize on the space byte (0x20 never occurs inside a UTF-8
    * multibyte sequence, so a byte scan is exact), keeping empty tokens —
    * `split(text, ' ')` parity. Returns null for docs with < n tokens;
    * otherwise the DISTINCT n-gram shingles in UTF8String binary order.
    */
  def shingleSortedSet(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    // token boundaries: indices of spaces
    var nToks = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nToks += 1; i += 1 }
    if (nToks < n) return null
    val starts = new Array[Int](nToks + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nToks) = bytes.length + 1 // sentinel: each token ends at starts(t+1)-1
    val set = new java.util.TreeSet[UTF8String]()
    var s = 0
    while (s + n <= nToks) {
      // shingle = bytes[starts(s) .. starts(s+n)-2] — the n tokens plus the
      // n-1 separator spaces between them, exactly array_join(slice, " ")
      val from = starts(s)
      val until = starts(s + n) - 1
      set.add(UTF8String.fromBytes(bytes, from, until - from))
      s += 1
    }
    new GenericArrayData(set.toArray(new Array[UTF8String](set.size)).asInstanceOf[Array[AnyRef]])
  }

  /** One-pass 60-bit md5 SimHash (engine-portable bit layout, q24 twin). */
  def md5SimHash60(arr: ArrayData): Long = {
    val counts = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = md5Prefix60(arr.getUTF8String(i))
        var j = 0
        while (j < 60) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Column API. */
  def minhashSigs(shingles: Column, k: Int): Column =
    ColumnBridge.column(MinHashSigsExpr(ColumnBridge.expression(shingles), k))

  def shingleSortedSetCol(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleSortedSetExpr(ColumnBridge.expression(text), n))

  def md5SimHash60Col(tokens: Column): Column =
    ColumnBridge.column(Md5SimHash60Expr(ColumnBridge.expression(tokens)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
