package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch bisect harness for the q162 covariance regression (round 11). */
object CovBisect {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val base = df.select(transform(col("embedding"), x => x.cast("double")).as("__v"))
    def agg0(d: org.apache.spark.sql.DataFrame) = d
      .groupBy(col("i"), col("j"))
      .agg(sum((col("xi") * col("xj")).cast("decimal(38,12)")).cast("double").as("__sxy"),
        sum(col("xi").cast("decimal(38,12)")).cast("double").as("__sx"),
        sum(col("xj").cast("decimal(38,12)")).cast("double").as("__sy"),
        count(lit(1)).as("__n"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        round((col("__sxy") - col("__sx") * col("__sy") / col("__n")) / col("__n"), 6).as("cov"))
    val full = base
      .select(col("__v"), posexplode(col("__v")).as(Seq("i", "xi")))
      .select(col("i"), col("xi"), posexplode(col("__v")).as(Seq("j", "xj")))
    time("V0 full-gram (r10 shape)") { agg0(full).count() }
    time("V1 + filter j>=i") { agg0(full.where(col("j") >= col("i"))).count() }
    val upper = agg0(full.where(col("j") >= col("i")))
    time("V2 + explode mirror") {
      upper.select(explode(when(col("i") === col("j"),
          array(struct(col("i"), col("j"), col("cov"))))
        .otherwise(array(struct(col("i"), col("j"), col("cov")),
          struct(col("j").as("i"), col("i").as("j"), col("cov"))))).as("__c"))
        .select(col("__c.i").as("i"), col("__c.j").as("j"), col("__c.cov").as("cov"))
        .count()
    }
    time("V3 mirror over localCheckpoint") {
      val u = upper.localCheckpoint()
      u.select(explode(when(col("i") === col("j"),
          array(struct(col("i"), col("j"), col("cov"))))
        .otherwise(array(struct(col("i"), col("j"), col("cov")),
          struct(col("j").as("i"), col("i").as("j"), col("cov"))))).as("__c"))
        .select(col("__c.i"), col("__c.j"), col("__c.cov")).count()
    }
    time("V5 cov outside the explode") {
      upper.select(col("cov"), explode(when(col("i") === col("j"),
          array(struct(col("i"), col("j"))))
        .otherwise(array(struct(col("i"), col("j")),
          struct(col("j").as("i"), col("i").as("j"))))).as("__c"))
        .select(col("__c.i"), col("__c.j"), col("cov")).count()
    }
    time("V6 unconditional explode + diagonal filter") {
      upper.select(col("cov"), col("i"), col("j"),
        explode(array(lit(0), lit(1))).as("__m"))
        .where(col("__m") === 0 || col("j") > col("i"))
        .select(when(col("__m") === 0, col("i")).otherwise(col("j")).as("i"),
          when(col("__m") === 0, col("j")).otherwise(col("i")).as("j"),
          col("cov")).count()
    }
    time("V4 mirror via unionAll") {
      upper.unionAll(upper.where(col("j") > col("i"))
        .select(col("j").as("i"), col("i").as("j"), col("cov"))).count()
    }
    println(upper.select(explode(when(col("i") === col("j"),
        array(struct(col("i"), col("j"), col("cov"))))
      .otherwise(array(struct(col("i"), col("j"), col("cov")),
        struct(col("j").as("i"), col("i").as("j"), col("cov"))))).as("__c"))
      .queryExecution.executedPlan.toString.take(3000))
    spark.stop()
  }
}
