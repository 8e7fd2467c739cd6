package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Distributed seed-stable synthetic corpus generator (O1 —
  * benchmarks/synth_data.py:86-120 reimagined for scale): the reference
  * builds its corpus in a single-process Python loop; here every doc is
  * derived purely from its id through hash-based uniforms, so generation
  * is embarrassingly parallel, shuffle-free, and IDENTICAL for any
  * partitioning or executor count — the property that matters at 100 TB.
  *
  * (NumPy's MT19937 draw order cannot be reproduced without serializing
  * generation, which would defeat distribution; the reference's actual
  * corpus is covered separately by the checked-in parity fixture.)
  */
object SyntheticCorpus {
  /** Deterministic per-(id, stream) uniform in [0, 1): xxhash64-based. */
  private def u(id: org.apache.spark.sql.Column, stream: org.apache.spark.sql.Column, seed: Int) =
    (pmod(xxhash64(id, stream, lit(seed)), lit(1L << 40)).cast("double") /
      lit((1L << 40).toDouble))

  /** docs(doc_id, text): ~N(avgWords, sigmaWords) words (clamped >= 1)
    * drawn uniformly from vocab {w0..w{V-1}} — the reference generator's
    * distributional shape (synth_data.py:101-109). */
  def docs(spark: SparkSession, nDocs: Long, vocabSize: Int = 20,
           avgWords: Int = 40, sigmaWords: Double = 10.0, seed: Int = 42): DataFrame = {
    val id = col("id")
    // Irwin–Hall approximate normal: sum of 12 hash-uniforms minus 6
    // (classic public construction) — chosen over Box–Muller because it
    // uses no transcendentals: each uniform is an exact multiple of 2^-40,
    // the 12-term sum is exact in double (< 2^44 significant bits), and
    // the remaining *sigma, +avg steps are single correctly-rounded IEEE
    // ops — so a standard-SQL oracle reproduces n_words bit-for-bit.
    val gauss = (1 to 12).map(j => u(id, lit(-j), seed)).reduce(_ + _) - lit(6.0)
    val nWords = greatest(lit(1), (lit(avgWords) + lit(sigmaWords) * gauss).cast("int"))
    spark.range(nDocs)
      .withColumn("n_words", nWords)
      .select(
        col("id").as("doc_id"),
        concat_ws(" ",
          transform(sequence(lit(1), col("n_words")),
            i => concat(lit("w"), pmod(xxhash64(col("id"), i, lit(seed)), lit(vocabSize)))))
          .as("text"))
  }

  /** vectors(vec_id, embedding float[dims]): hash-uniform components in
    * [-1, 1) — the same partition-invariant id-derived construction as
    * [[docs]], for benchmarking vector paths at arbitrary corpus sizes. */
  def vectors(spark: SparkSession, n: Long, dims: Int = 64,
              seed: Int = 7): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dims - 1)),
        d => (u(col("id"), d, seed) * 2.0 - 1.0).cast("float")).as("embedding"))
}
