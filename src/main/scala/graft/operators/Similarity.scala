package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Similarity search over an embedding column (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast cross join of the
  * (small) query set against the corpus, one narrow projection per pair,
  * ranked by a per-query window. At 100 TB the corpus side stays fully
  * partitioned; only queries are broadcast, so no shuffle of the big side at
  * all until the final per-query top-k (a tiny aggregate).
  *
  * Scale path: random-hyperplane LSH — a deterministic integer-arithmetic
  * plane family (no RNG state, reproducible in any engine) hashes each
  * vector to a bucket; candidate search touches only same-bucket vectors,
  * turning O(N·Q) into O(N·Q/2^planes) with a plain equi-join on bucket id.
  *
  * All float math is widened to double FIRST and folded sequentially
  * (`aggregate` over `zip_with`) so results are bit-deterministic and
  * engine-portable.
  */
object Similarity {

  /** Elementwise widen to double. */
  def asDouble(vec: Column): Column = transform(vec, x => x.cast("double"))

  /** Sequential left-to-right dot product — a native codegen'd expression
    * (bit-identical to the `aggregate(zip_with(...))` fold it replaces).
    */
  def dot(a: Column, b: Column): Column = VectorOps.dotProduct(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))


  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-match excluded), rank-deterministic via (cos desc, id).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms once per row on each side — the per-pair kernel is ONE native
    // dot product plus two multiplies, not three interpreted folds
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
    val q = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "rn")
  }

  /** All pairs with cosine above a threshold (embedding near-dup). The
    * cross join is the sf-correctness baseline; the LSH bucket join below is
    * the scale path.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("id_a"), asDouble(col(vecCol)).as("__va"))
      .withColumn("__na", norm(col("__va")))
    val b = df.select(col(idCol).as("id_b"), asDouble(col(vecCol)).as("__vb"))
      .withColumn("__nb", norm(col("__vb")))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      // dot > t·‖a‖·‖b‖ avoids a per-pair division; same predicate
      .filter(dot(col("__va"), col("__vb")) > lit(threshold) * col("__na") * col("__nb"))
      .select("id_a", "id_b")
  }

  /** L2-normalize to a unit vector (zero vectors pass through unchanged) —
    * the usual prep before cosine ANN so dot product IS cosine.
    */
  def normalize(vec: Column): Column = {
    val v = asDouble(vec)
    val n = norm(v)
    when(n > 0, transform(v, x => x / n)).otherwise(v)
  }

  /** Symmetric int8 quantization: scale each vector by 127/max|x| and
    * round half-up via an explicit floor(x·s + 0.5) — floor is defined
    * identically in every engine, unlike round()'s half-up/half-even split.
    * 4× smaller embeddings for the ANN candidate stage; exact rerank can
    * read the float column. All-zero vectors get scale 0 (all-zero codes),
    * not the 127/0 = Infinity → NaN a naive scale would produce.
    */
  def quantizeScale(vec: Column): Column = {
    val maxAbs = array_max(transform(asDouble(vec), x => abs(x)))
    when(maxAbs > 0, lit(127.0) / maxAbs).otherwise(lit(0.0))
  }

  def quantizeInt8(vec: Column): Column = {
    val scale = quantizeScale(vec)
    transform(asDouble(vec), x => floor(x * scale + lit(0.5)).cast("long"))
  }

  /** Deterministic pseudo-random integer plane weight in [-500, 500]:
    * pure 64-bit arithmetic, identical in any engine (no RNG, no hashing).
    */
  private def planeWeight(plane: Int, dim: Column): Column =
    (lit(plane.toLong * 1315423911L) + dim * lit(2654435761L)) % 1001L - 500L

  /** Random-hyperplane LSH bucket id from `planes` sign bits. The plane
    * weight array is generated to the VECTOR'S own length — a hard-coded
    * dimension would make `dot` return NULL on any other embedding width
    * (ragged-length HOF semantics), silently collapsing every vector into
    * bucket 0 and the bucket join into a full cross product.
    */
  def lshBucket(vec: Column, planes: Int = 4): Column = {
    val v = asDouble(vec)
    (0 until planes).map { p =>
      val w = transform(sequence(lit(0), size(v) - 1), j => planeWeight(p, j).cast("double"))
      when(dot(v, w) > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** IVF-style ANN: a coarse quantizer assigns every vector to its nearest
    * centroid cell; queries probe only the `nProbe` nearest cells. Centroids
    * here are a deterministic sample (first `nCentroids` corpus vectors by
    * id) — a trained k-means codebook is plug-compatible, the Spark plan is
    * identical: one broadcast of the (tiny) codebook for assignment, one
    * equi-join on cell id for search. At 100 TB the corpus never shuffles;
    * cells act as partition-pruning for the candidate scan.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    // the codebook is tiny by construction — collect it ONCE and broadcast a
    // literal table, instead of re-running a corpus TakeOrdered in each of
    // the two crossJoins below
    val spark = corpus.sparkSession
    val centRows = corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(col(idCol).cast("long").as("cell"), asDouble(col(vecCol)).as("__centv"))
      .collect()
    val centSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("__centv", org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType))))
    val cents = spark.createDataFrame(
      java.util.Arrays.asList(centRows: _*), centSchema)
      .withColumn("__cn", norm(col("__centv")))
    val assignW = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("__cdist").asc, col("cell").asc)
    // assign each corpus vector to its nearest centroid (cosine distance)
    val cells = corpus.select(col(idCol), asDouble(col(vecCol)).as("__cv"))
      .withColumn("__n", norm(col("__cv")))
      .crossJoin(broadcast(cents))
      .withColumn("__cdist", lit(1.0) - dot(col("__cv"), col("__centv")) / (col("__n") * col("__cn")))
      .withColumn("__rn", row_number().over(assignW))
      .filter(col("__rn") === 1)
      .select(col(idCol).as("neighbor_id"), col("__cv"), col("__n"), col("cell"))
    // each query probes its nProbe nearest cells
    val probeW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__cdist").asc, col("cell").asc)
    val probes = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"))
      .withColumn("__qn", norm(col("__qv")))
      .crossJoin(broadcast(cents))
      .withColumn("__cdist", lit(1.0) - dot(col("__qv"), col("__centv")) / (col("__qn") * col("__cn")))
      .withColumn("__rn", row_number().over(probeW))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "__qv", "__qn", "cell")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    cells.join(broadcast(probes), "cell")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("__cv"), col("__qv")) / (col("__n") * col("__qn")))
      .withColumn("rn", row_number().over(rankW).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "rn")
  }

  /** Two-stage retrieval — the production ANN pattern: a cheap QUANTIZED
    * scan ranks every (query, candidate) pair by int8 dot product and
    * keeps the top `rerank` per query; only those survivors get the exact
    * float cosine and the final top-k. The int8 stage reads 4× less data
    * per vector at scale (int8 columns vs floats); both stages are rank-
    * deterministic via id tiebreaks, so results are engine-reproducible.
    */
  def quantizedRerankTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                          vecCol: String, k: Int, rerank: Int = 20): DataFrame = {
    // stage 1 carries ONLY ids + int8 codes (as double arrays — the native
    // codegen'd dot kernel is double-typed; values are exact small
    // integers). Float vectors are re-joined for the <= Q·rerank
    // survivors, so the window exchange moves quarter-width codes, not
    // codes + floats + norms.
    def codes(df: DataFrame, id: String) =
      df.select(col(idCol).as(id),
        transform(quantizeInt8(col(vecCol)), x => x.cast("double")).as(s"__c$id"))
    val wApprox = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("__approx").desc, col("neighbor_id").asc)
    val survivors = codes(corpus, "neighbor_id")
      .crossJoin(broadcast(codes(queries, "query_id")))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("__approx", dot(col("__cneighbor_id"), col("__cquery_id")))
      .withColumn("__arn", row_number().over(wApprox))
      .filter(col("__arn") <= rerank)                       // stage 1: quantized
      .select("query_id", "neighbor_id")
    def floats(df: DataFrame, id: String, v: String, n: String) =
      df.select(col(idCol).as(id), asDouble(col(vecCol)).as(v))
        .withColumn(n, norm(col(v)))
    val wExact = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    survivors
      .join(floats(corpus, "neighbor_id", "__cv", "__cn"), "neighbor_id")
      .join(broadcast(floats(queries, "query_id", "__qv", "__qn")), "query_id")
      .withColumn("cos", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
      .withColumn("rn", row_number().over(wExact).cast("long"))
      .filter(col("rn") <= k)                               // stage 2: exact rerank
      .select("query_id", "neighbor_id", "rn")
  }

  /** Bucketed ANN top-k: equi-join on LSH bucket instead of a cross join.
    * Recall < 1 by construction; `probeBits` > 0 adds multi-probe: each
    * query also searches every bucket within that Hamming distance of its
    * own (union of single-bit flips for probeBits = 1).
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, planes: Int = 4, probeBits: Int = 0): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(vecCol)).as("__cv"),
      lshBucket(col(vecCol), planes).as("bucket"))
      .withColumn("__cn", norm(col("__cv")))
    val q0 = queries.select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__qv"),
      lshBucket(col(vecCol), planes).as("bucket"))
      .withColumn("__qn", norm(col("__qv")))
    // multi-probe: explode each query over its own bucket plus every bucket
    // within Hamming distance `probeBits` — recall rises, candidates stay few
    val q = if (probeBits <= 0) q0 else {
      val masks = (1 until (1 << planes)).filter(m => Integer.bitCount(m) <= probeBits)
      val flips = masks.map(m => col("bucket").bitwiseXOR(lit(m.toLong)))
      q0.withColumn("bucket", explode(array(col("bucket") +: flips: _*)))
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    c.join(broadcast(q), "bucket")
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", dot(col("__cv"), col("__qv")) / (col("__cn") * col("__qn")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "rn")
  }
}
