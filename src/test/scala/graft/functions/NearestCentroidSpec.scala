package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Parity of the native constant-code-size argmin kernel with the
  * declarative least-of-k-structs formulations it replaces — random
  * codebooks/vectors (including ties and near-boundary distances), both
  * distance modes, large-k sanity, and the NULL edge contract.
  */
class NearestCentroidSpec extends SparkSpec {
  import spark.implicits._

  private def vecGen(dim: Int): Gen[Array[Double]] =
    Gen.listOfN(dim, Gen.chooseNum(-8, 8).map(_ / 4.0)).map(_.toArray)

  private def sample[A](g: Gen[A], count: Int, seed0: Int): Seq[A] =
    (0 until count).flatMap(i => g(Gen.Parameters.default, Seed((seed0 + i).toLong)))

  private def declarativeLloyd(v: Column, cb: Array[Array[Double]]): Column = {
    val structs = cb.toSeq.zipWithIndex.map { case (cv, c) =>
      var cn2 = 0.0
      var j = 0
      while (j < cv.length) { cn2 += cv(j) * cv(j); j += 1 }
      val dist = VectorOps.dotProduct(v, v) -
        lit(2.0) * VectorOps.dotProduct(v, typedlit(cv.toSeq)) + lit(cn2)
      struct(round(dist, 6).as("d"), lit(c.toLong).as("cl"))
    }
    least(structs: _*).getField("cl")
  }

  private def declarativeCosine(v: Column, cb: Array[Array[Double]],
                                ids: Array[Long]): Column = {
    val n = sqrt(VectorOps.dotProduct(v, v))
    val structs = cb.toSeq.zip(ids).map { case (cv, cell) =>
      val c = typedlit(cv.toSeq)
      struct((lit(1.0) - VectorOps.dotProduct(v, c)
        / (n * sqrt(VectorOps.dotProduct(c, c)))).as("dist"),
        lit(cell).as("cell"))
    }
    least(structs: _*).getField("cell")
  }

  test("Lloyd mode matches least-of-structs on random codebooks, ties included") {
    val dim = 6
    // duplicate centroid planted at indices 2 and 5 → ties must break to 2
    val cb0 = sample(vecGen(dim), 6, 100).toArray
    val cb = cb0.updated(5, cb0(2).clone())
    val vecs = sample(vecGen(dim), 300, 500) ++ cb.map(_.clone()) // exact hits tie too
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    val out = df.select($"id",
      NearestCentroidOps.nearestCluster($"v", cb).as("native"),
      declarativeLloyd($"v", cb).as("decl"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (id, n, d) => assert(n == d, s"id $id: native $n decl $d") }
    assert(out.exists(_._2 == 2L) && !out.exists(_._2 == 5L),
      "duplicate-centroid ties must land on the smaller id")
  }

  test("cosine mode matches cellDistStructs semantics with arbitrary ascending cell ids") {
    val dim = 8
    val cb = sample(vecGen(dim), 5, 900).toArray
    val ids = Array(3L, 17L, 42L, 99L, 1000L)
    val vecs = sample(vecGen(dim), 250, 1300)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    val out = df.select($"id",
      NearestCentroidOps.nearestCentroid($"v", lit(0), Array(cb),
        Array(ids), cosine = true).as("native"),
      declarativeCosine($"v", cb, ids).as("decl"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (id, n, d) => assert(n == d, s"id $id: native $n decl $d") }
  }

  test("zero vector: native keeps the smallest cell where the declarative form ANSI-crashes") {
    // under Spark 4's default ANSI mode the declarative 1 − dot/(‖v‖·‖c‖)
    // throws DIVIDE_BY_ZERO on a zero-norm vector — the kernel's IEEE
    // division yields all-NaN distances and falls back to the smallest
    // cell (NaN-largest ordering), strictly more robust than what it
    // replaces
    val cb = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val ids = Array(7L, 9L)
    val zdf = Seq((1L, Seq(0.0, 0.0))).toDF("id", "v")
    val native = zdf.select(NearestCentroidOps.nearestCentroid($"v", lit(0),
      Array(cb), Array(ids), cosine = true).as("c")).as[Long].head()
    assert(native == 7L)
    val thrown = intercept[Exception](
      zdf.select(declarativeCosine($"v", cb, ids).as("d")).as[Long].head())
    assert(thrown.getClass.getSimpleName == "SparkArithmeticException" &&
      thrown.getMessage.contains("DIVIDE_BY_ZERO"))
  }

  test("per-subspace selection matches running each codebook separately") {
    val dim = 4
    val cbs = Array(
      sample(vecGen(dim), 3, 50).toArray,
      sample(vecGen(dim), 4, 60).toArray)
    val ids = cbs.map(cb => cb.indices.map(_.toLong).toArray)
    val vecs = sample(vecGen(dim), 120, 800)
    val df = vecs.zipWithIndex.flatMap { case (v, i) =>
      Seq(0, 1).map(sp => (i.toLong, sp, v.toSeq))
    }.toDF("id", "sp", "v")
    val out = df.select($"id", $"sp",
      NearestCentroidOps.nearestCentroid($"v", $"sp", cbs, ids,
        cosine = false).as("native"),
      when($"sp" === 0, declarativeLloyd($"v", cbs(0)))
        .otherwise(declarativeLloyd($"v", cbs(1))).as("decl"))
      .as[(Long, Int, Long, Long)].collect()
    out.foreach { case (id, sp, n, d) => assert(n == d, s"($id, $sp): $n vs $d") }
  }

  test("large k runs and agrees with the declarative form on a sample") {
    // k = 300 would multiply the struct form's generated code 300×; the
    // kernel stays one loop. Parity checked on a small slice (the
    // declarative plan at k=300 still EXECUTES, just off the fast path).
    val dim = 16
    val cb = sample(vecGen(dim), 300, 2000).toArray
    val vecs = sample(vecGen(dim), 40, 4000)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    val out = df.select($"id",
      NearestCentroidOps.nearestCluster($"v", cb).as("native"),
      declarativeLloyd($"v", cb).as("decl"))
      .as[(Long, Long, Long)].collect()
    out.foreach { case (id, n, d) => assert(n == d, s"id $id: $n vs $d") }
  }

  test("nearestCells matches slice(array_sort(structs)) on random data, ties and all") {
    val dim = 8
    val cb0 = sample(vecGen(dim), 6, 3000).toArray
    val cb = cb0.updated(4, cb0(1).clone()) // planted duplicate → tie
    val ids = Array(2L, 5L, 11L, 12L, 40L, 41L)
    val vecs = sample(vecGen(dim), 200, 3500)
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }
      .toDF("id", "v")
    val declarative = {
      val n = sqrt(VectorOps.dotProduct($"v", $"v"))
      val structs = cb.toSeq.zip(ids).map { case (cv, cell) =>
        val c = typedlit(cv.toSeq)
        struct((lit(1.0) - VectorOps.dotProduct($"v", c)
          / (n * sqrt(VectorOps.dotProduct(c, c)))).as("dist"),
          lit(cell).as("cell"))
      }
      transform(slice(array_sort(array(structs: _*)), 1, 3), e => e.getField("cell"))
    }
    val out = df.select($"id",
      NearestCentroidOps.nearestCells($"v", lit(0), Array(cb), Array(ids),
        cosine = true, nProbe = 3).as("native"),
      declarative.as("decl"))
      .as[(Long, Seq[Long], Seq[Long])].collect()
    out.foreach { case (id, n, d) => assert(n == d, s"id $id: $n vs $d") }
    // nProbe beyond the codebook returns every cell, ordered
    val all = df.limit(1).select(NearestCentroidOps.nearestCells($"v", lit(0),
      Array(cb), Array(ids), cosine = true, nProbe = 99)).as[Seq[Long]].head()
    assert(all.size == 6 && all.toSet == ids.toSet)
  }

  test("NaN/Inf elements degrade to NaN-largest ordering instead of crashing round6") {
    // a corrupt embedding (NaN element) passes the null-slot validity
    // gates; the Lloyd kernel must assign it deterministically (all
    // distances NaN -> smallest id), not throw from BigDecimal.valueOf
    val cb = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val got = Seq(
      (1L, Seq(Double.NaN, 2.0)),
      (2L, Seq(Double.PositiveInfinity, 0.0)),
      (3L, Seq(1.0, 0.1))).toDF("id", "v")
      .select($"id", NearestCentroidOps.nearestCluster($"v", cb).as("c"))
      .as[(Long, Long)].collect().toMap
    assert(got(1L) == 0L)  // all-NaN distances keep the smallest id
    assert(got(3L) == 0L)  // sanity: finite row picks its true argmin
    // +Inf vector: distances are +Inf (ordered below NaN), smallest id wins
    assert(got(2L) == 0L)
  }

  test("NULL contract: null vector, null slot, ragged length, bad subspace all yield NULL") {
    val cb = Array(Array(1.0, 2.0), Array(0.5, -1.0))
    val rows = Seq(
      (1L, Some(Seq(Some(1.0), Some(2.0))), 0),
      (2L, None, 0),
      (3L, Some(Seq(Some(1.0), None)), 0),
      (4L, Some(Seq(Some(1.0), Some(2.0), Some(3.0))), 0),
      (5L, Some(Seq(Some(1.0), Some(2.0))), 7))
      .toDF("id", "v", "sp")
    val got = rows.select($"id",
      NearestCentroidOps.nearestCentroid($"v", $"sp", Array(cb),
        Array(Array(0L, 1L)), cosine = false).as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got(1L).isDefined)
    assert(got(2L).isEmpty && got(3L).isEmpty && got(4L).isEmpty && got(5L).isEmpty)
  }
}
