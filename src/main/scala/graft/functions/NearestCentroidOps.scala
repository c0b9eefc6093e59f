package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native argmin-over-codebook assignment — the constant-code-size
  * replacement for `least(struct(dist_0, id_0), …, struct(dist_k, id_k))`.
  *
  * The declarative least-of-k-structs form inlines k dot products into the
  * generated method, so its code size GROWS with k: past a few dozen
  * centroids the method blows the JIT inline/compile limits and execution
  * falls off the codegen cliff (measured 4.4× on the PQ when-chain, the
  * same pathology at the subspace level). This expression keeps the
  * generated code CONSTANT — one call into a loop kernel that scans the
  * plan-time codebook — so k is bounded by arithmetic cost, not by
  * bytecode size: k-means/IVF/PQ assignment now scales to the k ≈ √n
  * regimes the SemDeDup/IVF literature actually uses.
  *
  * Two distance modes, each a STRICT drop-in for the declarative
  * formulation it replaces (bit-identical assignments, pinned by
  * property spec):
  *   - `cosine = false` (Lloyd): `dist_c = round₆(|v|² − 2·v·c + |c|²)`
  *     with the 6-dp HALF_UP quantization and ascending-id tiebreak of
  *     [[graft.operators.Similarity.kmeansLloyd]];
  *   - `cosine = true` (IVF): `dist_c = 1 − v·c / (‖v‖·‖c‖)` RAW (no
  *     rounding), NaN ordered largest, ties to the smallest cell id —
  *     the `cellDistStructs` contract.
  *
  * `sp` selects the codebook (PQ's per-subspace training); single-codebook
  * callers pass `lit(0)`. All folds are sequential left-to-right like
  * [[DotProductExpr]]; `|c|²`/`‖c‖` are precomputed once at PLAN time with
  * the same fold. NULL vector, null element slot, codebook-dimension
  * mismatch, or out-of-range `sp` ⇒ NULL (callers pre-filter validity,
  * exactly as they did for the struct form).
  *
  * `cellIds(sp)` must ascend — the scan-order tiebreak then equals the
  * struct form's smallest-ID tiebreak.
  */
case class NearestCentroidExpr(vec: Expression, sp: Expression,
                               codebooks: Array[Array[Array[Double]]],
                               cellIds: Array[Array[Long]],
                               cosine: Boolean)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = sp

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, sp.dataType) match {
    case (ArrayType(DoubleType | FloatType | LongType | IntegerType |
                    ShortType | ByteType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (v, s) => TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires (array<numeric>, int), got " +
        s"(${v.catalogString}, ${s.catalogString})")
  }

  require(codebooks.nonEmpty && codebooks.length == cellIds.length,
    "codebooks and cellIds must be non-empty and parallel")
  require(codebooks.indices.forall(i =>
    codebooks(i).nonEmpty && codebooks(i).length == cellIds(i).length),
    "every subspace needs parallel non-empty centroid/id arrays")
  require(cellIds.forall(ids => ids.sameElements(ids.sorted)),
    "cellIds must ascend per subspace (the smallest-id tiebreak contract)")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_centroid"

  private def kind: Int = vec.dataType match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case _ => 5
  }

  @transient private lazy val state =
    new NearestCentroidState(codebooks, cellIds, cosine)

  override def nullSafeEval(v: Any, s: Any): Any = {
    val r = state.nearest(v.asInstanceOf[ArrayData], s.asInstanceOf[Int], kind)
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stateRef = ctx.addReferenceObj("ncState", state,
      classOf[NearestCentroidState].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("ncR")
      s"""
         |java.lang.Long $r = $stateRef.nearest($a, $b, $kind);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.longValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): NearestCentroidExpr =
    copy(vec = newLeft, sp = newRight)

  // the Array fields make case-class equality REFERENCE equality, which
  // defeats Catalyst canonicalization/subexpression elimination when the
  // same codebook kernels both sides of a plan — compare them deeply.
  // Catalyst probes hashCode/equals constantly during planning
  // (ExpressionSet, EquivalentExpressions, canonicalization), so the
  // O(k·dim) deep hash is computed ONCE (cached) and equals
  // short-circuits on reference-equal codebooks (the common case: one
  // collected codebook shared across a plan's expressions)
  @transient private lazy val deepHash: Int =
    NearestCentroidOps.codebookHash(codebooks, cellIds)

  override def equals(other: Any): Boolean = other match {
    case that: NearestCentroidExpr =>
      vec == that.vec && sp == that.sp && cosine == that.cosine &&
        NearestCentroidOps.codebooksEqual(codebooks, cellIds,
          that.codebooks, that.cellIds)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(vec, sp, Boolean.box(cosine), Int.box(deepHash))
}

/** The query-side probe list: the `nProbe` nearest cell ids of the
  * codebook, best-first, as `array<long>` — the constant-code-size
  * replacement for `slice(array_sort(array(struct…)), 1, nProbe)`, whose
  * expression tree (and generated method) grows with the codebook. Same
  * (dist, id) total order including NaN-largest; same NULL contract as
  * [[NearestCentroidExpr]].
  */
case class NearestCellsExpr(vec: Expression, sp: Expression,
                            codebooks: Array[Array[Array[Double]]],
                            cellIds: Array[Array[Long]],
                            cosine: Boolean, nProbe: Int)
    extends BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = sp

  require(nProbe >= 1, s"nProbe must be positive: $nProbe")

  override def checkInputDataTypes(): TypeCheckResult = (vec.dataType, sp.dataType) match {
    case (ArrayType(DoubleType | FloatType | LongType | IntegerType |
                    ShortType | ByteType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case (v, s) => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells requires (array<numeric>, int), got " +
        s"(${v.catalogString}, ${s.catalogString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cells"

  private def kind: Int = vec.dataType match {
    case ArrayType(DoubleType, _) => 0
    case ArrayType(FloatType, _) => 1
    case ArrayType(LongType, _) => 2
    case ArrayType(IntegerType, _) => 3
    case ArrayType(ShortType, _) => 4
    case _ => 5
  }

  @transient private lazy val state =
    new NearestCentroidState(codebooks, cellIds, cosine)

  override def nullSafeEval(v: Any, s: Any): Any =
    state.nearestKData(v.asInstanceOf[ArrayData], s.asInstanceOf[Int], kind, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stateRef = ctx.addReferenceObj("ncsState", state,
      classOf[NearestCentroidState].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val r = ctx.freshName("ncsR")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  $stateRef.nearestKData($a, $b, $kind, $nProbe);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): NearestCellsExpr =
    copy(vec = newLeft, sp = newRight)

  // deep equality over the Array codebook fields — the
  // [[NearestCentroidExpr]] canonicalization rationale (same cached
  // hash + reference short-circuit)
  @transient private lazy val deepHash: Int =
    NearestCentroidOps.codebookHash(codebooks, cellIds)

  override def equals(other: Any): Boolean = other match {
    case that: NearestCellsExpr =>
      vec == that.vec && sp == that.sp && cosine == that.cosine &&
        nProbe == that.nProbe &&
        NearestCentroidOps.codebooksEqual(codebooks, cellIds,
          that.codebooks, that.cellIds)
    case _ => false
  }

  override def hashCode(): Int =
    java.util.Objects.hash(vec, sp, Boolean.box(cosine), Int.box(nProbe),
      Int.box(deepHash))
}

/** Plan-time-frozen codebook state shared by interpreted eval and the
  * generated code (shipped through the codegen references array).
  */
final class NearestCentroidState(codebooks: Array[Array[Array[Double]]],
                                 cellIds: Array[Array[Long]],
                                 cosine: Boolean) extends Serializable {

  // flat per-subspace layout: centroids row-major + per-centroid |c|²
  // (Lloyd) or ‖c‖ (cosine), both via the sequential fold
  private val dims: Array[Int] = codebooks.map(_.head.length)
  private val ks: Array[Int] = codebooks.map(_.length)
  private val flat: Array[Array[Double]] = codebooks.map { cb =>
    val d = cb.head.length
    val out = new Array[Double](cb.length * d)
    var c = 0
    while (c < cb.length) {
      require(cb(c).length == d, "ragged centroids within one subspace")
      System.arraycopy(cb(c), 0, out, c * d, d)
      c += 1
    }
    out
  }
  private val norms: Array[Array[Double]] = codebooks.map { cb =>
    cb.map { cv =>
      var s = 0.0
      var j = 0
      while (j < cv.length) { s += cv(j) * cv(j); j += 1 }
      if (cosine) math.sqrt(s) else s
    }
  }

  /** The 6-dp HALF_UP quantization `round(col, 6)` applies to doubles
    * (shortest-decimal BigDecimal, like Spark's and Scala's `BigDecimal`
    * of a double). NaN/±Inf pass through like Spark's Round does —
    * BigDecimal.valueOf would THROW on them, and a corrupt embedding
    * must degrade to the struct form's NaN-largest ordering, not crash
    * the job (review finding, round 11).
    */
  private def round6(d: Double): Double =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def nearest(arr: ArrayData, sp: Int, kind: Int): java.lang.Long = {
    if (sp < 0 || sp >= flat.length) return null
    val d = dims(sp)
    val n = arr.numElements()
    if (n != d) return null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
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
    var vn2 = 0.0
    i = 0
    while (i < n) { vn2 += v(i) * v(i); i += 1 }
    val vNorm = if (cosine) math.sqrt(vn2) else 0.0
    val cb = flat(sp)
    val nm = norms(sp)
    val k = ks(sp)
    var best = Double.PositiveInfinity
    var bestId = cellIds(sp)(0)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var j = 0
      val base = c * d
      while (j < d) { dot += v(j) * cb(base + j); j += 1 }
      val dist =
        if (cosine) 1.0 - dot / (vNorm * nm(c))
        else round6(vn2 - 2.0 * dot + nm(c))
      // strict < with an ascending-id scan = the struct form's
      // (dist, id) least; NaN never beats a finite best, and an all-NaN
      // row keeps the smallest id — both matching Spark's NaN-largest
      // struct ordering
      if (dist < best) { best = dist; bestId = cellIds(sp)(c) }
      c += 1
    }
    java.lang.Long.valueOf(bestId)
  }

  /** Spark's total order on (dist, id) structs: NaN sorts LARGEST and
    * equals itself, ties fall to the id.
    */
  private def before(d1: Double, c1: Long, d2: Double, c2: Long): Boolean = {
    val n1 = java.lang.Double.isNaN(d1)
    val n2 = java.lang.Double.isNaN(d2)
    if (n1 && n2) c1 < c2
    else if (n1) false
    else if (n2) true
    else if (d1 < d2) true
    else if (d1 > d2) false
    else c1 < c2
  }

  /** The `nProbe` nearest cell ids, best-first — the query-side twin of
    * [[nearest]], replacing `slice(array_sort(structs), 1, nProbe)`
    * with a partial selection over the same (dist, id) order (including
    * NaN-largest). Null contract identical to [[nearest]].
    */
  def nearestK(arr: ArrayData, sp: Int, kind: Int, nProbe: Int): Array[Long] = {
    if (sp < 0 || sp >= flat.length) return null
    val d = dims(sp)
    val n = arr.numElements()
    if (n != d) return null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      i += 1
    }
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
    var vn2 = 0.0
    i = 0
    while (i < n) { vn2 += v(i) * v(i); i += 1 }
    val vNorm = if (cosine) math.sqrt(vn2) else 0.0
    val cb = flat(sp)
    val nm = norms(sp)
    val k = ks(sp)
    val dists = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      var j = 0
      val base = c * d
      while (j < d) { dot += v(j) * cb(base + j); j += 1 }
      dists(c) =
        if (cosine) 1.0 - dot / (vNorm * nm(c))
        else round6(vn2 - 2.0 * dot + nm(c))
      c += 1
    }
    val take = math.min(nProbe, k)
    val out = new Array[Long](take)
    val used = new Array[Boolean](k)
    var r = 0
    while (r < take) {
      var bi = -1
      c = 0
      while (c < k) {
        if (!used(c) && (bi < 0 ||
          before(dists(c), cellIds(sp)(c), dists(bi), cellIds(sp)(bi)))) bi = c
        c += 1
      }
      used(bi) = true
      out(r) = cellIds(sp)(bi)
      r += 1
    }
    out
  }

  /** [[nearestK]] boxed as Catalyst ArrayData (codegen entry point). */
  def nearestKData(arr: ArrayData, sp: Int, kind: Int,
                   nProbe: Int): ArrayData = {
    val r = nearestK(arr, sp, kind, nProbe)
    if (r == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(r)
  }
}

object NearestCentroidOps {

  /** One-time deep hash of a (codebooks, cellIds) pair — cached by the
    * expressions so Catalyst's constant hashCode probing never re-walks
    * the k×dim arrays.
    */
  private[functions] def codebookHash(codebooks: Array[Array[Array[Double]]],
                                      cellIds: Array[Array[Long]]): Int =
    31 * java.util.Arrays.deepHashCode(codebooks.asInstanceOf[Array[AnyRef]]) +
      java.util.Arrays.deepHashCode(cellIds.asInstanceOf[Array[AnyRef]])

  /** Deep equality with a reference short-circuit (the common case: one
    * collected codebook array shared across a plan's expressions).
    */
  private[functions] def codebooksEqual(a: Array[Array[Array[Double]]],
                                        ai: Array[Array[Long]],
                                        b: Array[Array[Array[Double]]],
                                        bi: Array[Array[Long]]): Boolean =
    ((a eq b) || java.util.Arrays.deepEquals(
      a.asInstanceOf[Array[AnyRef]], b.asInstanceOf[Array[AnyRef]])) &&
      ((ai eq bi) || java.util.Arrays.deepEquals(
        ai.asInstanceOf[Array[AnyRef]], bi.asInstanceOf[Array[AnyRef]]))

  /** Column API: nearest centroid id of `vec` within `codebooks(sp)`. */
  def nearestCentroid(vec: Column, sp: Column,
                      codebooks: Array[Array[Array[Double]]],
                      cellIds: Array[Array[Long]],
                      cosine: Boolean): Column =
    ColumnBridge.column(NearestCentroidExpr(
      ColumnBridge.expression(vec), ColumnBridge.expression(sp),
      codebooks, cellIds, cosine))

  /** Column API: the nProbe nearest cell ids, best-first. */
  def nearestCells(vec: Column, sp: Column,
                   codebooks: Array[Array[Array[Double]]],
                   cellIds: Array[Array[Long]],
                   cosine: Boolean, nProbe: Int): Column =
    ColumnBridge.column(NearestCellsExpr(
      ColumnBridge.expression(vec), ColumnBridge.expression(sp),
      codebooks, cellIds, cosine, nProbe))

  /** Single-codebook convenience with 0..k−1 ids (the Lloyd shape). */
  def nearestCluster(vec: Column, codebook: Array[Array[Double]],
                     cosine: Boolean = false): Column = {
    import org.apache.spark.sql.functions.lit
    nearestCentroid(vec, lit(0), Array(codebook),
      Array(codebook.indices.map(_.toLong).toArray), cosine)
  }
}
