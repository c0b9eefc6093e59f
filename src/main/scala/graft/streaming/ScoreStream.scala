package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.engine.Score

/** The flagship as a stream: daily snapshot files landing in a directory
  * (the EPSS feed's append pattern) become a continuous change log.
  *
  * State = last seen (epss, percentile) per CVE in the state store; each
  * micro-batch emits only rows whose epss differs from the carried value —
  * streaming quantization with batch-identical semantics (a CVE's first
  * sighting emits nothing, matching F5's null-drop).
  *
  * Scale: state is hash-distributed by key across executors (~300k keys ×
  * 16 bytes — trivial); each micro-batch shuffles only its own snapshot.
  */
object ScoreStream {

  /** Per-batch events may contain several dates; fold them in date order. */
  def changedScoresStream(snapshots: Dataset[Score]): Dataset[Score] = {
    val spark = snapshots.sparkSession
    import spark.implicits._
    snapshots.groupByKey(_.cve)
      .flatMapGroupsWithState[Double, Score](
        org.apache.spark.sql.streaming.OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (cve: String, rows: Iterator[Score], state: GroupState[Double]) =>
          val ordered = rows.toSeq.sortBy(_.date.getTime)
          val out = scala.collection.mutable.ArrayBuffer.empty[Score]
          var prev: Option[Double] = state.getOption
          ordered.foreach { r =>
            if (prev.exists(_ != r.epss)) out += r
            prev = Some(r.epss)
          }
          prev.foreach(state.update)
          out.iterator
      }
  }

  /** File-source wiring: watch a directory of score parquet. */
  def fromDirectory(spark: SparkSession, dir: String): Dataset[Score] = {
    import spark.implicits._
    spark.readStream
      .schema(graft.engine.Schemas.scoreSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(dir)
      .as[Score]
  }
}
