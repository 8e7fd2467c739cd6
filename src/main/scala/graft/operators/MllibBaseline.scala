package graft.operators

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, MinHashLSH}
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MLlib `MinHashLSH` baseline (round 11, SURVEY §7.2): the canonical
  * library approach to the reference's task (minhash_lsh.py) run through
  * Spark's OWN implementation — fit + approxSimilarityJoin — so the a14
  * quality panel can carry a library-baseline row (recall/MRR on the same
  * corpus and the same exact-Jaccard truth) next to the engine's LSH.
  *
  * The hash FAMILY differs from the reference's by design (MLlib:
  * min over set indices of ((1+i)*a + b) mod 2038074743 per table, with
  * (a, b) drawn from scala.util.Random(seed); the reference: 128
  * SHA-1/md5-seeded permutations mod 2^61-1, banded 32x4) — this row is a
  * comparison POINT, not a parity surface; reference parity stays pinned
  * by the o04/o05 golden gates.
  *
  * Oracle strategy: the coefficient draw is replicated bit-for-bit
  * ([[replicateCoefficients]] — the decompiled createRawLSHModel contract,
  * spec-pinned by solving (a, b) back out of a fitted model's transform
  * output), so the DuckDB twin re-derives MLlib's minhashes, candidate
  * join, and 1 - |A∩B|/|A∪B| distances from the same parquet — a full
  * derivation gate, not a pinned-constant gate.
  */
object MllibBaseline {

  /** MinHashLSH.HASH_PRIME (spark-mllib MinHashLSH$.HASH_PRIME). */
  val HashPrime: Int = 2038074743

  /** Sparse-vector dimensionality for the doc -> set-of-indices encoding:
    * shingle hashes (md5 family, mod 2^61-1) folded to `hash % Dim`.
    * 2^20 keeps the false-merge rate negligible at gate scale while the
    * oracle reproduces the fold exactly. */
  val Dim: Int = 1 << 20

  /** Replicates MinHashLSH.fit's coefficient generation exactly:
    * `val rand = new scala.util.Random(seed)`, then per hash table
    * `(1 + rand.nextInt(HASH_PRIME - 1), rand.nextInt(HASH_PRIME - 1))`.
    * MllibBaselineSpec pins this against a REAL fitted model by solving
    * (a, b) from its transform of two probe vectors — if a Spark upgrade
    * changes the draw, the spec trips before the oracle gate does. */
  def replicateCoefficients(seed: Long, numTables: Int): Array[(Int, Int)] = {
    val rand = new scala.util.Random(seed)
    Array.fill(numTables)(
      (1 + rand.nextInt(HashPrime - 1), rand.nextInt(HashPrime - 1)))
  }

  /** (doc_id, hs: Array[Long]) -> (doc_id, idx): the distinct sorted
    * `hs % Dim` index set — the set-of-indices form MLlib's Jaccard
    * metric space is defined over. */
  def indexSets(hashedShingles: DataFrame, hsCol: String = "hs"): DataFrame =
    hashedShingles.select(col("doc_id"),
      array_sort(array_distinct(
        transform(col(hsCol), h => pmod(h, lit(Dim.toLong)).cast("int")))).as("idx"))

  /** Top-k ids per query through the LIBRARY's own path: build sparse
    * binary vectors, `MinHashLSH.fit`, `approxSimilarityJoin` at
    * threshold 1.0 (every bucket-colliding pair with any overlap), then
    * a deterministic (distance asc, id asc) top-k per query. The UDF is
    * the mandatory `ml.linalg.Vector` input boundary, not a data-plane
    * kernel; the per-query window runs over candidate sets the LSH join
    * already pruned. Output: (query_id, rank, id). */
  def mllibTopK(corpusIdx: DataFrame, queriesIdx: DataFrame, k: Int,
                numTables: Int = 16, seed: Long = 42L): DataFrame = {
    val dim = Dim
    val toVec = udf((idx: Seq[Int]) =>
      Vectors.sparse(dim, idx.toArray, Array.fill(idx.length)(1.0)))
    val corpus = corpusIdx
      .select(col("doc_id").cast("long").as("id"), toVec(col("idx")).as("features"))
    val queries = queriesIdx
      .select(col("doc_id").cast("long").as("query_id"), toVec(col("idx")).as("features"))
    val model = new MinHashLSH()
      .setNumHashTables(numTables).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
      .fit(corpus)
    val joined = model.approxSimilarityJoin(corpus, queries, 1.0, "dist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist").asc, col("id").asc)
    joined
      .select(col("datasetB.query_id").as("query_id"),
        col("datasetA.id").as("id"), col("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id")
  }

  /** Replicates BucketedRandomProjectionLSH.fit's random unit vectors
    * exactly: `val rand = new scala.util.Random(seed)`, then per hash
    * table a dim-long array of `rand.nextGaussian()` draws, L2-normalized
    * (breeze `normalize` — elementwise division by the sqrt-of-sum-of-
    * squares norm). MllibBaselineSpec pins this against a REAL fitted
    * model's transform output at a bucket length fine enough that any
    * draw/normalize drift would flip floors — if a Spark upgrade changes
    * the contract, the spec trips before the a19 oracle gate does. */
  def replicateUnitVectors(seed: Long, numTables: Int, dim: Int): Array[Array[Double]] = {
    val rand = new scala.util.Random(seed)
    Array.fill(numTables) {
      val a = Array.fill(dim)(rand.nextGaussian())
      var s = 0.0
      var i = 0
      while (i < dim) { s += a(i) * a(i); i += 1 }
      val n = math.sqrt(s)
      a.map(_ / n)
    }
  }

  /** Top-k ids per query through the LIBRARY's Euclidean-LSH path
    * (the vector-side twin of [[mllibTopK]], round 12 / SURVEY §7.2):
    * dense vectors from the float embeddings,
    * `BucketedRandomProjectionLSH.fit` (hash per table =
    * floor(dot(x, unitVec)/bucketLength)), `approxSimilarityJoin` at a
    * keep-all threshold (unit-normalized corpus ⇒ distances ≤ 2, so 2.1
    * mirrors a18's Jaccard-distance 1.0: every bucket-colliding pair
    * survives and ranking is by the library's exact key distance), then
    * a deterministic (distance asc, id asc) top-k per query. The UDF is
    * the mandatory `ml.linalg.Vector` boundary. Output:
    * (query_id, rank, id). */
  def mllibBrpTopK(embs: DataFrame, queries: DataFrame, k: Int,
                   numTables: Int = 16, bucketLength: Double = 0.02,
                   threshold: Double = 2.1, seed: Long = 42L): DataFrame = {
    val toVec = udf((v: Seq[Float]) => Vectors.dense(v.map(_.toDouble).toArray))
    val corpus = embs
      .select(col("vec_id").cast("long").as("id"), toVec(col("embedding")).as("features"))
    val qs = queries
      .select(col("vec_id").cast("long").as("query_id"), toVec(col("embedding")).as("features"))
    val model = new BucketedRandomProjectionLSH()
      .setNumHashTables(numTables).setSeed(seed).setBucketLength(bucketLength)
      .setInputCol("features").setOutputCol("hashes")
      .fit(corpus)
    val joined = model.approxSimilarityJoin(corpus, qs, threshold, "dist")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("dist").asc, col("id").asc)
    joined
      .select(col("datasetB.query_id").as("query_id"),
        col("datasetA.id").as("id"), col("dist"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id")
  }
}
