package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The bounded-heap top-k aggregate must be a DROP-IN for
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, id ASC) <= k` —
  * same rows, same ranks — while aggregating partially (heap-merge across
  * partitions instead of a single-reducer sort).
  */
class TopKOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ranked(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(TopKOps.topK(k, col("score"), col("id")).as("__top"))
      .select(col("g"), posexplode(col("__top")))
      .select(col("g"), col("col.id").as("id"), (col("pos") + 1).cast("long").as("rn"))

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id").asc)
    df.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k).select("g", "id", "rn")
  }

  private lazy val data = (0 until 5000).map { i =>
    (i % 7L, ((i * 2654435761L) % 1000L).toDouble / 10.0, i.toLong)
  }.toDF("g", "score", "id")

  test("topk equals the row_number window formulation exactly (ties included)") {
    // scores collide heavily (only 1000 distinct values over 5000 rows), so
    // the id tiebreak is exercised constantly
    val a = ranked(data, 25).as[(Long, Long, Long)].collect().toSet
    val b = windowed(data, 25).as[(Long, Long, Long)].collect().toSet
    assert(a == b && a.size == 7 * 25)
  }

  test("topk merges across many partitions (partial agg path)") {
    val scattered = data.repartition(32)
    val a = ranked(scattered, 10).as[(Long, Long, Long)].collect().toSet
    val b = windowed(data, 10).as[(Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("k larger than the group returns the whole group, ranked") {
    val tiny = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (2L, 1.0, 12L)).toDF("g", "score", "id")
    val out = ranked(tiny, 100).as[(Long, Long, Long)].collect().toSet
    assert(out == Set((1L, 11L, 1L), (1L, 10L, 2L), (2L, 12L, 1L)))
  }

  test("equal scores rank by ascending id, like the window ORDER BY") {
    val tied = Seq((1L, 3.0, 30L), (1L, 3.0, 10L), (1L, 3.0, 20L)).toDF("g", "score", "id")
    val out = ranked(tied, 2).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 10L, 1L), (1L, 20L, 2L)))
  }

  test("null scores never rank (window parity: they sort past every rank)") {
    val withNulls = Seq((1L, Some(3.0), 1L), (1L, None, 2L), (1L, Some(1.0), 3L))
      .toDF("g", "score", "id")
    val out = ranked(withNulls, 2).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L), (1L, 3L, 2L)))
  }

  test("INTENTIONAL divergence: fewer non-null rows than k omits trailing " +
    "null-score ranks the window would emit") {
    // the row_number window ranks null-score rows too (nulls sort last under
    // desc) — with k=3 it would emit id=2 at rn=3. The aggregate treats
    // null score as "no rankable candidate" and stops at the non-null rows:
    // ranks are dense over REAL candidates only. Documented in BoundedTopK's
    // scaladoc; this spec pins the divergence so it stays a decision, not a
    // drift.
    val withNulls = Seq((1L, Some(3.0), 1L), (1L, None, 2L), (1L, Some(1.0), 3L))
      .toDF("g", "score", "id")
    val agg = ranked(withNulls, 3).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    assert(agg == Seq((1L, 1L, 1L), (1L, 3L, 2L))) // no rank 3
    val win = windowed(withNulls, 3).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    assert(win == Seq((1L, 1L, 1L), (1L, 3L, 2L), (1L, 2L, 3L))) // window ranks the null
  }

  test("NaN scores rank FIRST, like the window's descending double order") {
    // Spark orders NaN above every other double; Double.compare in the
    // heap comparator must reproduce that, or plans diverge on dirty data
    val dirty = Seq((1L, Double.NaN, 10L), (1L, 99.0, 11L), (1L, Double.NaN, 12L),
      (1L, 1.0, 13L)).toDF("g", "score", "id")
    val a = ranked(dirty, 3).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    val b = windowed(dirty, 3).orderBy("rn").as[(Long, Long, Long)].collect().toSeq
    assert(a == b)
    assert(a.map(_._2) == Seq(10L, 12L, 11L)) // NaNs first (id-tiebroken), then 99.0
  }

  test("buffer survives serialize/deserialize round-trip") {
    val buf = new TopKBuffer(3)
    Seq((1.0, 1L), (5.0, 2L), (3.0, 3L), (4.0, 4L), (5.0, 0L)).foreach {
      case (s, i) => buf.offer(s, i)
    }
    val back = TopKBuffer.fromBytes(3, buf.toBytes)
    assert(back.sortedBestFirst().toSeq == Seq((5.0, 0L), (5.0, 2L), (4.0, 4L)))
  }
}
