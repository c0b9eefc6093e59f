package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for removeDuplicatedSpans on the PipelineScaleBench
  * synthetic (500k docs + universal boilerplate span): times each internal
  * stage separately so the expensive one is measured, not guessed. Not part
  * of the driver contract.
  */
object SubstrProfile {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(500000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vocabSize = math.max(1000, nDocs / 500)
    val tokensPerDoc = 40
    val toksE = (0 until tokensPerDoc).map { p =>
      concat(lit("w"), pmod(xxhash64(col("base"), lit(p)), lit(vocabSize.toLong)).cast("string"))
    }
    val docs0 = spark.range(nDocs.toLong)
      .withColumn("near_dup", pmod(xxhash64(col("id")), lit(50L)) === 0 && col("id") > 0)
      .withColumn("base", when(col("near_dup"), col("id") - 1).otherwise(col("id")))
      .select(col("id").as("doc_id"),
        concat_ws(" ", (toksE.init :+
          when(col("near_dup"), lit("CHANGED")).otherwise(toksE.last)): _*).as("text"))
    val boiler = lit("shared cookie banner boilerplate appears on every page")
    docs0.select(col("doc_id"), concat_ws(" ", col("text"), boiler).as("text"))
      .write.mode("overwrite").parquet("/tmp/substr-profile.parquet")
    val df = spark.read.parquet("/tmp/substr-profile.parquet")
    val n = 5

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val rows = f
      println(f"[profile] $name%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($rows rows)")
    }

    val base = df.filter(col("text").isNotNull)
      .select(col("doc_id"), split(col("text"), " ").as("__t"))
    def gramKeys(salt: Int) =
      transform(sequence(lit(1), size(col("__t")) - lit(n - 1)), i =>
        xxhash64((lit(salt) +: (0 until n).map(j =>
          element_at(col("__t"), i + lit(j)))): _*))
    val keyArr = arrays_zip(gramKeys(0).as("h1"), gramKeys(1).as("h2"))
    val withGrams = base.filter(size(col("__t")) >= n)
    time("distinct_explode") {
      withGrams.select(col("doc_id"), explode(array_distinct(keyArr)).as("__k")).count()
    }
    val dup = withGrams
      .select(col("doc_id"), explode(array_distinct(keyArr)).as("__k"))
      .groupBy(col("__k.h1").as("__h1"), col("__k.h2").as("__h2"))
      .agg(count(lit(1)).as("__nd"), min(col("doc_id")).as("__canon"))
      .filter(col("__nd") >= 2)
      .select("__h1", "__h2", "__canon")
    time("dup_table") { dup.count() }
    val pg = withGrams
      .select(col("doc_id"), posexplode(keyArr))
      .select(col("doc_id"), col("pos"), col("col.h1").as("__h1"), col("col.h2").as("__h2"))
    time("pg_explode") { pg.count() }
    val cov = pg.join(dup, Seq("__h1", "__h2"))
      .filter(col("doc_id") =!= col("__canon"))
      .groupBy(col("doc_id")).agg(collect_set(col("pos")).as("__starts"))
    time("cov") { cov.count() }
    val covSet = array_distinct(flatten(transform(col("__starts"),
      s => sequence(s, s + lit(n - 1)))))
    val out = base.join(cov, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("__t"),
        when(col("__starts").isNull, lit(null)).otherwise(covSet).as("__cov"))
      .select(col("doc_id"),
        when(col("__cov").isNull, array_join(col("__t"), " "))
          .otherwise(array_join(
            filter(col("__t"), (_, i) => !array_contains(col("__cov"), i)), " "))
          .as("text"),
        when(col("__cov").isNull, lit(0L))
          .otherwise(size(col("__cov")).cast("long")).as("n_removed"))
    time("rebuild_join") {
      out.agg(max(xxhash64(col("doc_id"), col("text"), col("n_removed")))).head()
      nDocs.toLong
    }
    time("end_to_end") {
      val o = graft.operators.Dedup.removeDuplicatedSpans(df, "doc_id", "text", n = 5)
      o.agg(max(xxhash64(o.columns.map(col): _*))).head()
      nDocs.toLong
    }
    time("end_to_end_2") {
      val o = graft.operators.Dedup.removeDuplicatedSpans(df, "doc_id", "text", n = 5)
      o.agg(max(xxhash64(o.columns.map(col): _*))).head()
      nDocs.toLong
    }
    spark.stop()
  }
}
