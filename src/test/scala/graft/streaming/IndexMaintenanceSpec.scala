package graft.streaming

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.{Similarity, TextAnalysis}

class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("idx-maint").toString

  test("startIndexMaintenance: streamed growth equals the add verb; drift rows land per batch") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300)
    val idxDir = s"$tmp/dense-idx"
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(base, "vec_id", "embedding",
        nCentroids = 8, subspaces = 4, subDim = 16, pqK = 4, pqIters = 1),
      idxDir)

    // two micro-batches: the delta split in half, one file each
    val src = s"$tmp/dense-src"
    delta.filter(col("vec_id") < 400).coalesce(1)
      .write.mode("overwrite").parquet(src)
    delta.filter(col("vec_id") >= 400).coalesce(1)
      .write.mode("append").parquet(src)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val deltaDir = s"$tmp/dense-delta"
    val monitor = s"$tmp/dense-monitor"
    val q = IndexMaintenance.startIndexMaintenance(spark, idxDir, deltaDir,
      stream, "vec_id", "embedding", s"$tmp/dense-ckpt", monitor)
    q.awaitTermination()

    // one monitor row per non-empty batch, batch sizes accounted for
    val mon = spark.read.parquet(monitor)
      .select("batch_id", "n_batch", "retrain")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(mon.size == 2)
    assert(mon.map(_._2).sum == delta.count())

    // encode-then-append parity: the maintained index's codes are
    // row-for-row what the add verb produces over the same rows
    val maintained = IndexMaintenance.loadMaintainedIndex(spark, idxDir, deltaDir)
    val added = Similarity.ivfPqIndexAdd(
      Similarity.ivfPqIndexLoad(spark, idxDir), delta, "vec_id", "embedding")
    def codeRows(i: Similarity.IvfPqIndex) = i.codes
      .select("id", "cell", "code_0", "code_1", "code_2", "code_3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    assert(codeRows(maintained) == codeRows(added))
    assert(maintained.codes.count() == added.codes.count())

    // search parity through the maintained index; streamed rows findable
    val qs = graft.operators.Sampling.hashSampleN(emb, "vec_id", 8)
    def hits(i: Similarity.IvfPqIndex) =
      Similarity.ivfPqSearch(i, emb, qs, "vec_id", "embedding",
        k = 3, nProbe = 4, rerank = 10)
        .as[(Long, Long, Long)].collect().toSet
    assert(hits(maintained) == hits(added) && hits(maintained).nonEmpty)

    // no deltas yet: the maintained load IS the base load
    val fresh = IndexMaintenance.loadMaintainedIndex(spark, idxDir,
      s"$tmp/no-such-delta")
    assert(fresh.codes.count() ==
      Similarity.ivfPqIndexLoad(spark, idxDir).codes.count())

    // exactly-once monitor rows: each batch's row lives in its own
    // overwritten batch=<id> partition (a crash-replayed batch rewrites
    // its partition instead of double-appending)
    val monFs = new org.apache.hadoop.fs.Path(monitor)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(monFs.exists(new org.apache.hadoop.fs.Path(s"$monitor/batch=0")))
    assert(monFs.exists(new org.apache.hadoop.fs.Path(s"$monitor/batch=1")))
  }

  test("compaction: save(loadMaintained) reopens standalone and the deltas are retirable") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300)
    val idxDir = s"$tmp/compact-idx"
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(base, "vec_id", "embedding",
        nCentroids = 8, subspaces = 4, subDim = 16, pqK = 4, pqIters = 1),
      idxDir)
    val deltaDir = s"$tmp/compact-delta"
    Similarity.ivfPqEncode(Similarity.ivfPqIndexLoad(spark, idxDir),
        delta, "vec_id", "embedding")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$deltaDir/batch=0")

    val maintained = IndexMaintenance.loadMaintainedIndex(spark, idxDir, deltaDir)
    val outDir = s"$tmp/compact-out"
    IndexMaintenance.compactMaintainedIndex(spark, idxDir, deltaDir, outDir)

    def codeRows(i: Similarity.IvfPqIndex) = i.codes
      .select("id", "cell", "code_0", "code_1", "code_2", "code_3")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    // the compacted directory is a SELF-VALIDATING standalone index
    // holding exactly the maintained view — the deltas are now retirable
    val reopened = Similarity.ivfPqIndexLoad(spark, outDir)
    assert(codeRows(reopened) == codeRows(maintained))
    val withoutDeltas = IndexMaintenance.loadMaintainedIndex(spark, outDir,
      s"$tmp/compact-retired")
    assert(codeRows(withoutDeltas) == codeRows(maintained))

    // in-place compaction refused (it would overwrite codes mid-read)
    intercept[IllegalArgumentException](
      IndexMaintenance.compactMaintainedIndex(spark, idxDir, deltaDir, idxDir))

    // a foreign-but-column-named parquet in deltaDir refuses at open:
    // name-and-TYPE schema equality with the base codes (int-typed
    // doppelgangers would otherwise coerce silently through the union)
    val foreignDir = s"$tmp/compact-foreign"
    import spark.implicits._
    Seq((1, 2, 3, 4, 5, 6)).toDF("id", "cell", "code_0", "code_1", "code_2", "code_3")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$foreignDir/batch=0")
    val ex = intercept[IllegalArgumentException](
      IndexMaintenance.loadMaintainedIndex(spark, idxDir, foreignDir))
    assert(ex.getMessage.contains("codes schema"))
  }

  test("streamed growth preserves the vec+words payloads: a maintained stored index serves binarySearchCells corpus-free") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = emb.filter(col("vec_id") < 300)
    val delta = emb.filter(col("vec_id") >= 300)
    val idxDir = s"$tmp/payload-idx"
    Similarity.ivfPqIndexSave(
      Similarity.ivfPqIndexBuild(base, "vec_id", "embedding",
        nCentroids = 8, subspaces = 4, subDim = 16, pqK = 4, pqIters = 1,
        storeVectors = true, storeSignWords = true),
      idxDir)
    val src = s"$tmp/payload-src"
    delta.coalesce(1).write.mode("overwrite").parquet(src)
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
    val deltaDir = s"$tmp/payload-delta"
    IndexMaintenance.startIndexMaintenance(spark, idxDir, deltaDir,
      stream, "vec_id", "embedding", s"$tmp/payload-ckpt",
      s"$tmp/payload-monitor").awaitTermination()

    // the streamed delta carries BOTH payloads (ivfPqEncode mirrors the
    // base codes schema), so the maintained view serves the cell-pruned
    // binary verb with the corpus argument unread
    val maintained = IndexMaintenance.loadMaintainedIndex(spark, idxDir, deltaDir)
    assert(maintained.codes.columns.contains("vec") &&
      maintained.codes.columns.contains("words"))
    val qs = graft.operators.Sampling.hashSampleN(emb, "vec_id", 8)
      .localCheckpoint()
    val added = Similarity.ivfPqIndexAdd(
      Similarity.ivfPqIndexLoad(spark, idxDir), delta, "vec_id", "embedding")
    val poisoned = emb.select(col("vec_id"),
      org.apache.spark.sql.functions.transform(col("embedding"),
        x => x * 0.0f).as("embedding"))
    def serve(i: Similarity.IvfPqIndex) =
      Similarity.binarySearchCells(i, poisoned, qs, "vec_id", "embedding",
        k = 3, nProbe = 4, rerank = 10)
        .as[(Long, Long, Long)].collect().toSet
    assert(serve(maintained) == serve(added) && serve(maintained).nonEmpty)
    // streamed rows are findable through the binary arm
    assert(serve(maintained).exists(_._2 >= 300L),
      "a streamed row must be retrievable from the maintained words payload")
  }

  test("compactMonitor: one plain parquet holding the maintained rows exactly; in-place refused") {
    // two batch=<id> partitions in the monitor-row shape the dense
    // stream writes (the sparse monitor differs only in columns — the
    // verb is shape-agnostic)
    val monDir = s"$tmp/monc"
    Seq((0L, 50L, 0.1, false)).toDF("batch_id", "n_batch", "tv", "retrain")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$monDir/batch=0")
    Seq((1L, 60L, 0.3, true)).toDF("batch_id", "n_batch", "tv", "retrain")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$monDir/batch=1")
    val outDir = s"$tmp/monc-out"
    IndexMaintenance.compactMonitor(spark, monDir, outDir)
    def rows(dir: String) = spark.read.parquet(dir)
      .select("batch_id", "n_batch", "tv", "retrain")
      .as[(Long, Long, Double, Boolean)].collect().toSet
    assert(rows(outDir) == rows(monDir) && rows(outDir).size == 2)
    // the partition column is dropped — batch_id alone identifies rows
    assert(spark.read.parquet(outDir).columns.sorted.toSeq ==
      Seq("batch_id", "n_batch", "retrain", "tv"))
    // the compacted layout is ONE directory of plain files, no batch=
    assert(!new java.io.File(outDir).listFiles
      .exists(f => f.isDirectory && f.getName.startsWith("batch=")))
    intercept[IllegalArgumentException](
      IndexMaintenance.compactMonitor(spark, monDir, monDir))
  }

  test("startSparseDriftMonitor: in-vocabulary batch passes, alien batch trips the gate") {
    val corpus = Seq(
      (0L, "apple banana apple"),
      (1L, "apple cherry"),
      (2L, "banana cherry")).toDF("doc_id", "text")
    val idxDir = s"$tmp/sparse-idx"
    TextAnalysis.sparseIndexSave(
      TextAnalysis.sparseIndexBuild(corpus, "doc_id", "text"), idxDir)

    val src = s"$tmp/sparse-src"
    Seq((10L, "apple banana")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(src)
    Seq((11L, "durian elderberry"), (12L, "durian fig")).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)

    val monitor = s"$tmp/sparse-monitor"
    // tvThreshold 0.4: a 2-token in-vocabulary batch legitimately moves
    // df SHARES by 1/3 (its own tininess), which is not the signal this
    // case isolates — the OOV mass is
    val q = IndexMaintenance.startSparseDriftMonitor(spark, idxDir, stream,
      "doc_id", "text", s"$tmp/sparse-ckpt", monitor, tvThreshold = 0.4)
    q.awaitTermination()

    val mon = spark.read.parquet(monitor)
      .select("n_oov_terms", "oov_mass", "rebuild")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .toSet
    // one batch entirely inside the frozen vocabulary, one entirely OOV
    assert(mon == Set((0L, 0.0, false), (3L, 1.0, true)))
  }
}
