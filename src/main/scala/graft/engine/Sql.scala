package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-over-dataframes surface (Q1/Q2 — util.py:55-66): register frames as
  * temp views, run through the full Catalyst lifecycle (parse → analyze →
  * optimize → codegen). The only lazy path in the reference becomes the
  * default execution model here.
  */
object Sql {

  def queryOne(df: DataFrame, name: String, sql: String): DataFrame = {
    df.createOrReplaceTempView(name)
    df.sparkSession.sql(sql)
  }

  def queryMany(spark: SparkSession, dfs: Map[String, DataFrame], sql: String): DataFrame = {
    dfs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    spark.sql(sql)
  }

  /** Register every parquet table in a testdata dir as a temp view. */
  def registerDir(spark: SparkSession, dir: String, tables: Seq[String]): Unit =
    tables.foreach { t =>
      spark.read.parquet(s"$dir/$t.parquet").createOrReplaceTempView(t)
    }
}
