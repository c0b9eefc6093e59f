package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy hitters as a partial-aggregatable Catalyst
  * aggregate — the frequent-items sketch for UNBOUNDED-cardinality keys
  * (URLs, n-grams, user ids) where an exact `groupBy(key).count()`
  * would shuffle the full distinct-key set. Each partial buffer holds
  * at most `capacity` counters; the exchange carries `partitions ×
  * capacity` entries no matter how many distinct keys the corpus has.
  *
  * Guarantees (the classic MG bound, merge-preserving per Agarwal et
  * al.'s mergeable-summaries scheme): for every key,
  * `true − n/(capacity+1) ≤ estimate ≤ true` — so every key with true
  * count > n/(capacity+1) is RETAINED. When `capacity ≥` the distinct
  * key count no decrement ever fires and every estimate is EXACT (the
  * q184 oracle regime — this is also the only regime where the result
  * is independent of partitioning and merge order; undercapacity
  * estimates depend on both, which is why the sketch guarantee, not a
  * hash, is what the spec pins there).
  *
  * Result: the top `emit` retained entries as
  * `array<struct<item:string, est:bigint>>`, (est desc, item asc) —
  * best-first, `posexplode` turns it back into ranked rows.
  */
case class HeavyHitters(
    capacity: Int,
    emit: Int,
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] with UnaryLike[Expression] {

  require(capacity > 0, s"heavy_hitters requires capacity > 0, got $capacity")
  require(emit > 0 && emit <= capacity,
    s"heavy_hitters requires 0 < emit <= capacity, got emit=$emit capacity=$capacity")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters requires a string item, got ${t.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(capacity)

  override def update(buffer: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    // null items carry no key — skip, like BoundedTopK's null candidates
    if (v != null) buffer.add(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: MgBuffer, other: MgBuffer): MgBuffer = {
    buffer.absorb(other)
    buffer
  }

  override def eval(buffer: MgBuffer): Any = {
    val top = buffer.topEntries(emit)
    new GenericArrayData(top.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  override def serialize(buffer: MgBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgBuffer.fromBytes(capacity, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

/** Capacity-bounded Misra–Gries counter map.
  *
  * `add` is the textbook stream update (hit +1 / insert / global
  * decrement sweep — the sweep is O(capacity) but amortized O(1): every
  * decrement cancels a prior increment). `absorb` is the mergeable-
  * summaries combine: sum counts, and when over capacity subtract the
  * (capacity+1)-th largest count from everything, dropping non-positive
  * survivors — at most `capacity` entries remain and the MG error bound
  * adds across merges.
  */
final class MgBuffer(val capacity: Int) {
  private val map =
    new java.util.HashMap[String, Long](math.min(capacity.toLong * 2, 1L << 16).toInt)

  def size: Int = map.size

  def add(item: String): Unit = {
    val cur = map.get(item)
    if (cur != 0L || map.containsKey(item)) map.put(item, cur + 1L)
    else if (map.size < capacity) map.put(item, 1L)
    else {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
      }
    }
  }

  def absorb(other: MgBuffer): Unit = {
    val it = other.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = map.get(e.getKey)
      map.put(e.getKey, cur + e.getValue)
    }
    if (map.size > capacity) {
      // threshold = (capacity+1)-th largest count; subtract it everywhere
      val counts = new Array[Long](map.size)
      var j = 0
      val vi = map.values().iterator()
      while (vi.hasNext) { counts(j) = vi.next(); j += 1 }
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - capacity - 1)
      val ei = map.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        if (e.getValue <= t) ei.remove() else e.setValue(e.getValue - t)
      }
    }
  }

  /** top `emit` retained entries, (est desc, item asc) — item ties in
    * UTF-8 BYTE order (what `ORDER BY` means to a binary-collation
    * engine), not Java's UTF-16 code-unit order: the two disagree for
    * supplementary-plane characters (U+FFFF vs surrogate-led emoji).
    */
  def topEntries(emit: Int): Array[(String, Long)] = {
    val all = new Array[(String, Long)](map.size)
    var j = 0
    val it = map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); all(j) = (e.getKey, e.getValue); j += 1 }
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(StandardCharsets.UTF_8), b.getBytes(StandardCharsets.UTF_8)) < 0
    val sorted = all.sortWith { (a, b) =>
      if (a._2 != b._2) a._2 > b._2 else utf8Lt(a._1, b._1)
    }
    sorted.take(emit)
  }

  /** every retained (item, estimate) — the spec's guarantee surface */
  def entries: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    val it = map.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
    b.result()
  }

  def toBytes: Array[Byte] = {
    var bytes = 4
    val it0 = map.keySet().iterator()
    while (it0.hasNext) bytes += 12 + it0.next().getBytes(StandardCharsets.UTF_8).length
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(map.size)
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val kb = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(kb.length)
      bb.put(kb)
      bb.putLong(e.getValue)
    }
    bb.array()
  }
}

object MgBuffer {
  def fromBytes(capacity: Int, bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MgBuffer(capacity)
    var j = 0
    while (j < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.map.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      j += 1
    }
    buf
  }
}

object HeavyHittersOps {

  /** Column API: `heavyHitters(capacity, emit, item)` aggregate — the
    * top `emit` Misra–Gries entries as `struct<item, est>`, best-first.
    */
  def heavyHitters(capacity: Int, emit: Int, item: Column): Column =
    ColumnBridge.column(
      HeavyHitters(capacity, emit, ColumnBridge.expression(item))
        .toAggregateExpression())
}
