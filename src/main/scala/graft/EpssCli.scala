package graft

import java.time.LocalDate

import org.apache.spark.sql.SparkSession

import graft.engine._
import graft.sources.ScoreStore

/** The reference's CLI surface (cli.py:27-163) re-expressed over the engine:
  *
  *   scores --store DIR [-a MIN] [-b MAX] [--date D] [--drop-unchanged]
  *          [--min-epss X] [--max-epss X] [--min-percentile X] [--max-percentile X]
  *          [--cve ID]... [--output-format table|csv|json|jsonl|parquet] [--output PATH]
  *   urls [-a MIN] [-b MAX]
  *   date-range --store DIR
  *
  * `--date D` collapses to min=max (cli.py:93-95, 132-134). Max-date
  * discovery is offline from the store listing (SURVEY.md §7.6.4). Output
  * default is the console table with no row cap (cli.py:15-16).
  */
object EpssCli {

  final case class Args(m: Map[String, List[String]]) {
    def one(k: String): Option[String] = m.get(k).flatMap(_.headOption)
    def all(k: String): List[String] = m.getOrElse(k, Nil)
    def flag(k: String): Boolean = m.contains(k)
  }

  def parseArgs(argv: Seq[String]): (String, Args) = {
    require(argv.nonEmpty, "usage: scores|urls|date-range [options]")
    val cmd = argv.head
    val m = scala.collection.mutable.Map.empty[String, List[String]]
    var i = 1
    while (i < argv.length) {
      val k = argv(i).dropWhile(_ == '-')
      val hasVal = i + 1 < argv.length && !argv(i + 1).startsWith("--")
      if (hasVal) { m(k) = m.getOrElse(k, Nil) :+ argv(i + 1); i += 2 }
      else { m(k) = m.getOrElse(k, Nil); i += 1 }
    }
    (cmd, Args(m.toMap))
  }

  def run(spark: SparkSession, argv: Seq[String]): Unit = {
    val (cmd, a) = parseArgs(argv)
    cmd match {
      case "scores" => scores(spark, a)
      case "urls" =>
        val min = a.one("a").map(LocalDate.parse).getOrElse(DateRanges.V3MinDate)
        val max = a.one("b").map(LocalDate.parse).getOrElse(min)
        DateRanges.urlsInRange(min, max).foreach(println)
      case "date-range" =>
        val store = a.one("store").getOrElse(sys.error("--store required"))
        val maxD = ScoreStore.maxDate(spark, store)
        println(s"""{"min_date": "${DateRanges.V3MinDate}", "max_date": "${maxD.getOrElse("")}"}""")
      case other => sys.error(s"unknown command: $other")
    }
  }

  private def scores(spark: SparkSession, a: Args): Unit = {
    val store = a.one("store").getOrElse(sys.error("--store required"))
    val latest = ScoreStore.maxDate(spark, store)
      .getOrElse(sys.error("empty store"))
    val date = a.one("date").map(LocalDate.parse)
    val (min, max) = DateRanges.resolve(
      date.orElse(a.one("a").map(LocalDate.parse)),
      date.orElse(a.one("b").map(LocalDate.parse)),
      latest)
    val q = EpssQuery(
      cveIds = Option(a.all("cve")).filter(_.nonEmpty),
      minEpss = a.one("min-epss").map(_.toDouble),
      maxEpss = a.one("max-epss").map(_.toDouble),
      minPercentile = a.one("min-percentile").map(_.toDouble),
      maxPercentile = a.one("max-percentile").map(_.toDouble))
    val base =
      if (a.flag("drop-unchanged"))
        Changes.changedScores(
          ScoreStore.readWithBaseline(spark, store, min, max).transform(q.filter),
          minDate = Some(min))
      else
        ScoreStore.read(spark, store, min, max).transform(q.filter)
          .orderBy(org.apache.spark.sql.functions.col("date").asc,
            org.apache.spark.sql.functions.col("cve").desc)
    (a.one("output"), a.one("output-format").getOrElse("table")) match {
      case (Some(path), fmt) => Outputs.write(base, path, fmt, singleFile = true)
      case (None, "jsonl" | "json") => Outputs.showJsonl(base, Int.MaxValue)
      case (None, _) => Outputs.show(base, Int.MaxValue)
    }
  }

  def main(argv: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, argv.toSeq) finally spark.stop()
  }
}
