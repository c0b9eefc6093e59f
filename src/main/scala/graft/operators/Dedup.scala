package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for 100 TB-class corpora.
  *
  * Scale design: every path is shuffle-expressible —
  *   - exact dedup = one hash aggregation on a content digest (map-side
  *     partial agg collapses duplicates before the shuffle);
  *   - near-dup = MinHash+LSH: shingle explode (linear) → per-doc signature
  *     (one hash agg) → band keys → self-equi-join on (band, key). The
  *     self-join touches only colliding buckets, avoiding the O(n²) pair
  *     space; identical-document clusters create key skew, which AQE's
  *     skew-join splitting absorbs;
  *   - exact Jaccard verification runs only on LSH candidate pairs.
  *
  * Hashes are md5 hex strings (built-in, codegen'd, and reproducible in any
  * engine) — minimums over strings are order-insensitive, so signatures need
  * no sorted input.
  */
object Dedup {

  /** Exact duplicate groups: content digest → group size + canonical id.
    * `sha2` collisions are cryptographically negligible, so no byte-compare
    * pass is needed.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_hash"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("canonical_id"))

  /** Distinct (doc, shingle) pairs; shingles are word n-grams. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int = 2): DataFrame =
    df.withColumn("__toks", split(col(textCol), " "))
      .filter(size(col("__toks")) >= n)
      .select(col(idCol), explode(expr(
        s"transform(sequence(0, size(__toks)-$n), i -> array_join(slice(__toks, i+1, $n), ' '))"))
        .as("shingle"))
      .distinct()

  /** MinHash prime field: small enough that (a·t + b) never overflows a
    * 64-bit long in ANY engine (DuckDB errors on BIGINT overflow where the
    * JVM would silently wrap — parity demands staying in range).
    */
  val MinhashP = 1000003L

  /** One base hash per shingle: first 60 bits of md5, reduced mod P —
    * hex-cast reproducible in any engine.
    */
  private def baseHash = conv(substring(md5(col("shingle")), 1, 15), 16, 10)
    .cast("long") % MinhashP

  /** MinHash signature: k independent permutations from the classic
    * `(a_s·t + b_s) mod p` family over ONE md5-derived base hash (8× less
    * hashing than per-seed md5). One groupBy with k min-aggregates,
    * map-side combinable, no sort.
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 2, k: Int = 8): DataFrame =
    sigsFrom(shingles(df, idCol, textCol, n), idCol, k)

  private def sigsFrom(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val withT = sh.withColumn("__t", baseHash)
    val aggs = (0 until k).map { s =>
      min((lit(2L * s + 1) * col("__t") + lit(7919L * s)) % MinhashP).as(s"mh_$s")
    }
    withT.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Banded signature rows: (id, band_id, band_key). k signature columns are
    * split into k/rowsPerBand bands; docs agreeing on ANY full band collide.
    */
  def lshBands(sigs: DataFrame, idCol: String, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bands = (0 until k / rowsPerBand).map { b =>
      val cols = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"mh_$i"))
      sigs.select(col(idCol), lit(b).as("band_id"),
        md5(concat_ws(":", cols: _*)).as("band_key"))
    }
    bands.reduce(_.unionByName(_))
  }

  /** Distinct colliding pairs (docA < docB) from a band table. */
  private def candidatesFromBands(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("doc_a"), col("band_id"), col("band_key"))
    val b = bands.select(col(idCol).as("doc_b"), col("band_id"), col("band_key"))
    a.join(b, Seq("band_id", "band_key"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
  }

  /** Candidate near-dup pairs (docA < docB) from LSH band collisions. */
  def lshCandidates(df: DataFrame, idCol: String, textCol: String,
                    n: Int = 2, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    candidatesFromBands(
      lshBands(minhashSignatures(df, idCol, textCol, n, k), idCol, k, rowsPerBand), idCol)

  /** Exact n-gram Jaccard for a set of candidate pairs: one shingle-equality
    * join for intersections + a broadcast-size join for set sizes. Runs only
    * on candidates — never on the full pair space.
    */
  def jaccardForPairs(df: DataFrame, pairs: DataFrame, idCol: String,
                      textCol: String, n: Int = 2): DataFrame =
    jaccardForPairsOn(shingles(df, idCol, textCol, n), pairs, idCol)

  /** Exact Jaccard over a PRE-BUILT shingle table (lets callers reuse one
    * shingle pass across the signature and verification branches).
    */
  def jaccardForPairsOn(sh: DataFrame, pairs: DataFrame, idCol: String): DataFrame = {
    val sizes = sh.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val shA = sh.select(col(idCol).as("doc_a"), col("shingle"))
    val shB = sh.select(col(idCol).as("doc_b"), col("shingle"))
    val inter = pairs.join(shA, "doc_a").join(shB, Seq("doc_b", "shingle"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed(idCol, "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .withColumn("jaccard",
        col("n_inter") / (col("sz_a") + col("sz_b") - col("n_inter")).cast("double"))
      .select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b", "jaccard")
  }

  /** Full near-dup pipeline: MinHash → LSH candidates → exact Jaccard ≥ t.
    * The shingle table feeds three plan branches (signatures, intersection,
    * sizes); recomputing the narrow explode per branch benchmarks faster
    * here than caching it (columnar cache materialization + lost file-scan
    * stats degrade the joins) — at 100 TB, materialize the shingle table to
    * parquet once instead and feed all branches from that.
    */
  def nearDups(df: DataFrame, idCol: String, textCol: String, minJaccard: Double,
               n: Int = 2, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val sh = shingles(df, idCol, textCol, n)
    val cands = candidatesFromBands(lshBands(sigsFrom(sh, idCol, k), idCol, k, rowsPerBand), idCol)
    jaccardForPairsOn(sh, cands, idCol)
      .filter(col("jaccard") >= minJaccard)
  }
}
