package graft.engine

import java.sql.Date

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** SURVEY.md §5.2.3: property-based quantization invariants on random dense
  * score matrices (raw ScalaCheck generators, deterministic seeds).
  */
class QuantizationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples(n: Int): Seq[List[Score]] =
    (0 until n).flatMap(i => denseGen(Gen.Parameters.default, Seed(i.toLong)))

  private def forAllSamples(n: Int)(body: List[Score] => Unit): Unit =
    samples(n).foreach(body)

  private val denseGen: Gen[List[Score]] = for {
    nCves <- Gen.choose(1, 5)
    nDays <- Gen.choose(2, 6)
    scores <- Gen.listOfN(nCves * nDays, Gen.choose(0, 5).map(_ / 10.0))
  } yield {
    val out = for {
      c <- 0 until nCves
      t <- 0 until nDays
    } yield Score(Date.valueOf(f"2024-01-${t + 1}%02d"), s"CVE-$c",
      scores(c * nDays + t), scores(c * nDays + t))
    out.toList
  }

  test("count(changes) <= count(dense) and changes-of-changes is empty-or-smaller") {
    forAllSamples(5) { rows =>
      val df = rows.toDF()
      val once = Changes.changedRows(df, "cve", Seq("date"), "epss").cache()
      val onceN = once.count()
      assert(onceN <= rows.size)
      val twice = Changes.changedRows(once, "cve", Seq("date"), "epss").count()
      assert(twice <= onceN)
      once.unpersist()
    }
  }

  test("dense |> changes |> forwardFill reconstructs dense from each cve's first change onward") {
    forAllSamples(5) { rows =>
      val df = rows.toDF()
      val changes = Changes.changedRows(df, "cve", Seq("date"), "epss")
      val spine = df.select("date", "cve")
      val filled = Changes.forwardFill(changes, spine)
        .select("date", "cve", "epss").as[(Date, String, Double)].collect()
        .map { case (dt, c, e) => (dt.toString, c) -> e }.toMap

      // expected: per cve, forward-fill from the first CHANGE (the first
      // sighting row is dropped by F5 semantics)
      val byCve = rows.groupBy(_.cve)
      byCve.foreach { case (cve, rs) =>
        val sorted = rs.sortBy(_.date.toString)
        val firstChange = sorted.zipWithIndex.drop(1)
          .find { case (r, i) => r.epss != sorted(i - 1).epss }
        firstChange.foreach { case (_, idx0) =>
          var cur = Double.NaN
          sorted.zipWithIndex.drop(idx0).foreach { case (r, i) =>
            if (i == idx0 || (i > 0 && r.epss != sorted(i - 1).epss)) cur = r.epss
            assert(filled.get((r.date.toString, cve)).contains(cur),
              s"cve=$cve date=${r.date} expected=$cur got=${filled.get((r.date.toString, cve))}")
          }
        }
      }
    }
  }
}
