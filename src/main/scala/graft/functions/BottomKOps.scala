package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded-heap BOTTOM-k by id with an array payload — the seed-collection
  * aggregate: "the k smallest-id rows of each group, with their vectors",
  * as one partial-aggregatable pass.
  *
  * The job-count fix for PQ seeding (guide §1.2 step 1 — fewer passes):
  * [[graft.operators.Similarity]]'s fused PQ trainer seeded each subspace
  * with its own `where(__sp = sp).orderBy(__id).limit(k)` TakeOrdered job —
  * `subspaces` driver round-trips and `subspaces` full passes over the
  * slices relation. Grouping by subspace with this aggregate collects every
  * subspace's seeds in ONE job and ONE pass; the partial phase keeps a
  * k-entry heap per (group, partition), so the exchange carries at most
  * `groups × partitions × k` entries — the [[TopKOps]] scale contract.
  *
  * Ordering is total on the id (smallest first). A NULL id FAILS FAST:
  * the replaced `orderBy(id).limit(k)` sorts nulls first in Spark, so
  * silently skipping them would yield different seeds than the non-long
  * fallback path still does — and a null id in a seed relation is a data
  * bug worth surfacing, not a row to guess about. Null payloads are
  * skipped (the slices relation is built null-free; a null vec carries
  * nothing a seed could use).
  *
  * Result: `array<struct<id:bigint, vec:array<double>>>` sorted id-ascending
  * and truncated to k.
  */
case class BoundedBottomKVec(
    k: Int,
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKVecBuffer] with BinaryLike[Expression] {

  require(k > 0, s"bottomk requires k > 0, got $k")

  def id: Expression = left
  def vec: Expression = right

  override def checkInputDataTypes(): TypeCheckResult =
    (id.dataType, vec.dataType) match {
      case (LongType, ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
      case (i, v) => TypeCheckResult.TypeCheckFailure(
        s"bottomk requires (bigint, array<double>), got (${i.catalogString}, ${v.catalogString})")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("vec", ArrayType(DoubleType, containsNull = false), nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "bottomk_vec"

  override def createAggregationBuffer(): BottomKVecBuffer = new BottomKVecBuffer(k)

  override def update(buffer: BottomKVecBuffer, input: InternalRow): BottomKVecBuffer = {
    val i = id.eval(input)
    val v = vec.eval(input)
    require(i != null,
      "bottomk_vec: null id on the seed path — ids must be non-null " +
        "(a null would silently reorder seeds vs the orderBy-nulls-first fallback)")
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      // a null element inside the payload cannot occur on the seed path
      // (slices are built null-free); toDoubleArray would throw if it did
      buffer.offer(i.asInstanceOf[Long], arr.toDoubleArray())
    }
    buffer
  }

  override def merge(buffer: BottomKVecBuffer, other: BottomKVecBuffer): BottomKVecBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: BottomKVecBuffer): Any = {
    val sorted = buffer.sortedAsc()
    new GenericArrayData(sorted.map { case (i, v) =>
      InternalRow(i, new GenericArrayData(v))
    })
  }

  override def serialize(buffer: BottomKVecBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKVecBuffer =
    BottomKVecBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedBottomKVec =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedBottomKVec =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedBottomKVec =
    copy(left = newLeft, right = newRight)
}

/** k-bounded buffer keeping the SMALLEST ids: a flat array kept
  * max-heap-ordered on id (the root is the largest kept id — the entry
  * evicted first). A duplicate of the root id does not evict it (first
  * encountered wins), mirroring the TakeOrdered stability the seed path
  * replaced; seed relations have unique ids, so the case is degenerate.
  */
final class BottomKVecBuffer(val k: Int) {
  private var ids = new Array[Long](math.min(k, 16))
  private var vecs = new Array[Array[Double]](math.min(k, 16))
  private var n = 0

  private def ensure(cap: Int): Unit = if (ids.length < cap) {
    val newCap = math.min(k, math.max(cap, ids.length * 2))
    ids = java.util.Arrays.copyOf(ids, newCap)
    vecs = java.util.Arrays.copyOf(vecs, newCap)
  }

  private def swap(a: Int, b: Int): Unit = {
    val ti = ids(a); val tv = vecs(a)
    ids(a) = ids(b); vecs(a) = vecs(b)
    ids(b) = ti; vecs(b) = tv
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (ids(i) > ids(p)) { swap(i, p); i = p } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < n && ids(l) > ids(m)) m = l
      if (r < n && ids(r) > ids(m)) m = r
      if (m == i) return
      swap(i, m)
      i = m
    }
  }

  def offer(id: Long, vec: Array[Double]): Unit =
    if (n < k) {
      ensure(n + 1)
      ids(n) = id; vecs(n) = vec; n += 1
      siftUp(n - 1)
    } else if (id < ids(0)) {
      ids(0) = id; vecs(0) = vec
      siftDown()
    }

  def absorb(other: BottomKVecBuffer): Unit = {
    var j = 0
    while (j < other.n) { offer(other.ids(j), other.vecs(j)); j += 1 }
  }

  /** entries sorted id-ascending */
  def sortedAsc(): Array[(Long, Array[Double])] = {
    val out = Array.tabulate(n)(j => (ids(j), vecs(j)))
    out.sortBy(_._1)
  }

  def toBytes: Array[Byte] = {
    var size = 4
    var j = 0
    while (j < n) { size += 8 + 4 + 8 * vecs(j).length; j += 1 }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(n)
    j = 0
    while (j < n) {
      bb.putLong(ids(j))
      bb.putInt(vecs(j).length)
      var d = 0
      while (d < vecs(j).length) { bb.putDouble(vecs(j)(d)); d += 1 }
      j += 1
    }
    bb.array()
  }
}

object BottomKVecBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKVecBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getInt
    val buf = new BottomKVecBuffer(k)
    var j = 0
    while (j < cnt) {
      val id = bb.getLong
      val len = bb.getInt
      val v = new Array[Double](len)
      var d = 0
      while (d < len) { v(d) = bb.getDouble; d += 1 }
      buf.offer(id, v)
      j += 1
    }
    buf
  }
}

object BottomKOps {

  /** Column API: `bottomk_vec(k, id, vec)` aggregate — array of the k
    * smallest-id (id, vec) entries as `struct<id, vec>`, id-ascending.
    */
  def bottomKVec(k: Int, id: Column, vec: Column): Column =
    ColumnBridge.column(
      BoundedBottomKVec(k, ColumnBridge.expression(id), ColumnBridge.expression(vec))
        .toAggregateExpression())
}
