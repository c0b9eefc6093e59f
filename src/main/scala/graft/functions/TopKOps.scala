package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-heap top-k as a partial-aggregatable Catalyst aggregate.
  *
  * The scale fix the per-query `row_number()` window cannot provide: a
  * window partitioned by query_id funnels EVERY candidate row of a query
  * into one task for the sort (at 100 TB, billions of rows per reducer).
  * This aggregate keeps a k-entry min-heap per (group, partition) during
  * the partial phase, so the exchange carries at most `groups × partitions
  * × k` serialized entries instead of the full candidate set, and the
  * final phase only heap-merges.
  *
  * Ordering is total and engine-reproducible: best = highest score, ties
  * broken by LOWEST id — exactly the `ORDER BY score DESC, id ASC` the
  * replaced windows used (`java.lang.Double.compare` mirrors Spark's NaN
  * ordering: NaN sorts above every other double).
  *
  * TWO INTENTIONAL divergences from the window formulation (both pinned
  * in TopKOpsSpec):
  *   - null-score (or null-id) rows are skipped entirely: a group with
  *     fewer than k non-null candidates returns only those, while the
  *     window would hand trailing ranks to null-score rows (nulls sort
  *     last under desc). Ranks here are dense over REAL candidates — a
  *     null-score "neighbor" at rank k is never a useful ANN result.
  *   - inputs are hard-typed (double score, bigint id) where the window
  *     ordered any orderable type: the serialized heap buffer is a flat
  *     fixed-width (double, long) array. Cast or zipWithIndex other id
  *     types at the call site.
  *
  * Result: `array<struct<score:double, id:bigint>>` sorted best-first and
  * truncated to k; `posexplode` turns it back into ranked rows.
  */
case class BoundedTopK(
    k: Int,
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {

  require(k > 0, s"topk requires k > 0, got $k")

  def score: Expression = left
  def id: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk requires (double, bigint), got (${s.catalogString}, ${i.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // null score/id rows carry no rankable candidate — skip (the window
    // formulation ordered them last and they never reached rank <= k)
    if (s != null && i != null) {
      buffer.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any = {
    val sorted = buffer.sortedBestFirst()
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedTopK =
    copy(left = newLeft, right = newRight)
}

/** k-bounded buffer: a flat (score, id) array kept heap-ordered worst-first
  * so eviction is O(log k). Total order: (score asc, id desc) — the heap
  * root is the entry the final ranking would drop first.
  */
final class TopKBuffer(val k: Int) {
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  /** entry a ranks STRICTLY WORSE than entry b */
  @inline private def worse(sa: Double, ia: Long, sb: Double, ib: Long): Boolean = {
    val c = java.lang.Double.compare(sa, sb)
    if (c != 0) c < 0 else ia > ib
  }

  private def ensure(cap: Int): Unit = if (scores.length < cap) {
    val newCap = math.min(k, math.max(cap, scores.length * 2))
    scores = java.util.Arrays.copyOf(scores, newCap)
    ids = java.util.Arrays.copyOf(ids, newCap)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (worse(scores(i), ids(i), scores(p), ids(p))) {
        val ts = scores(i); val ti = ids(i)
        scores(i) = scores(p); ids(i) = ids(p)
        scores(p) = ts; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && worse(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < n && worse(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      val ts = scores(i); val ti = ids(i)
      scores(i) = scores(m); ids(i) = ids(m)
      scores(m) = ts; ids(m) = ti
      i = m
    }
  }

  def offer(s: Double, i: Long): Unit =
    if (n < k) {
      ensure(n + 1)
      scores(n) = s; ids(n) = i; n += 1
      siftUp(n - 1)
    } else if (worse(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown()
    }

  def absorb(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.n) { offer(other.scores(j), other.ids(j)); j += 1 }
  }

  /** entries sorted best-first: (score desc, id asc) */
  def sortedBestFirst(): Array[(Double, Long)] = {
    val out = Array.tabulate(n)(j => (scores(j), ids(j)))
    out.sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * n)
    bb.putInt(n)
    var j = 0
    while (j < n) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val i = bb.getLong
      buf.offer(s, i)
      j += 1
    }
    buf
  }
}

object TopKOps {

  /** Column API: `topk(k, score, id)` aggregate — array of the k best
    * (score desc, id asc) entries as `struct<score, id>`, best-first.
    */
  def topK(k: Int, score: Column, id: Column): Column =
    ColumnBridge.column(
      BoundedTopK(k, ColumnBridge.expression(score), ColumnBridge.expression(id))
        .toAggregateExpression())
}
