package graft.operators

import java.nio.charset.StandardCharsets
import java.util.zip.Deflater

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Compression-ratio quality signals: per document, the DEFLATE
  * compressed size of the UTF-8 text and the ratio `deflate/raw` — the
  * classic cheap redundancy detector in corpus filtering (near-constant
  * boilerplate and keyboard-mash both compress far below natural prose;
  * pipelines gate on both tails). Complements [[TextAnalysis]]'s
  * repetition/entropy signals with a measure that sees long-range
  * redundancy a bigram histogram cannot.
  *
  * Like [[Multimodal]]'s decode kernels (and unlike the codegen'd
  * TextAnalysis ops), this is a partition-batched `mapPartitions` pass —
  * DEFLATE is inherently imperative. One `Deflater` is allocated per
  * partition and `reset()` between rows (allocation is the expensive
  * part: each carries native zlib state), and it is `end()`ed when the
  * partition iterator drains, so native memory is bounded by
  * concurrent-task count, not row count. Text bytes never shuffle: the
  * kernel runs on the executors that read them and only the three
  * numeric signals flow downstream.
  *
  * Determinism: zlib output for a fixed (input, level, strategy) is
  * stable for a given zlib build, and the JDK pins its bundled zlib — so
  * results are deterministic within an environment (spec-pinned against
  * a driver-side single-string reference, the plumbing oracle). Across
  * engines the VALUES are not portable (DuckDB exposes no DEFLATE), so
  * the query is rows-only at the correctness gate, like the other
  * engine-specific kernels (SimHash/XxHash64, HLL).
  */
object Compression {

  /** `(id, raw_bytes, deflate_bytes, ratio)` per non-empty document;
    * `ratio` rounded 6 dp. `level` is the zlib level 1-9 (default 6,
    * zlib's own default trade-off).
    */
  def compressionSignals(df: DataFrame, idCol: String, textCol: String,
                         level: Int = 6): DataFrame = {
    require(level >= 1 && level <= 9, s"zlib level out of [1,9]: $level")
    val s = df.sparkSession
    import s.implicits._
    val rows = df
      .filter(col(textCol).isNotNull && length(col(textCol)) > 0)
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
    rows.mapPartitions { it =>
      val d = new Deflater(level, false)
      var ended = false
      def end(): Unit = if (!ended) { d.end(); ended = true }
      // native zlib state must be released even when the consumer never
      // drains the iterator (limit/take, task abort): the completion
      // listener fires unconditionally at task end, and the drain-time
      // end() below only releases EARLY on the happy path (end() is
      // idempotent via the flag)
      org.apache.spark.TaskContext.get() match {
        case null => // driver-side/local test evaluation: drain-time end() only
        case tc   => tc.addTaskCompletionListener[Unit](_ => end())
      }
      val mapped = it.map { case (id, text) =>
        val raw = text.getBytes(StandardCharsets.UTF_8)
        d.reset()
        d.setInput(raw)
        d.finish()
        val buf = new Array[Byte](8192)
        var n = 0L
        while (!d.finished()) n += d.deflate(buf)
        (id, raw.length.toLong, n)
      }
      new Iterator[(Long, Long, Long)] {
        override def hasNext: Boolean = {
          val h = mapped.hasNext
          if (!h) end()
          h
        }
        override def next(): (Long, Long, Long) = mapped.next()
      }
    }.toDF(idCol, "raw_bytes", "deflate_bytes")
      .withColumn("ratio",
        round(col("deflate_bytes").cast("double") / col("raw_bytes").cast("double"), 6))
  }
}
