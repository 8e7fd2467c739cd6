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

  /** docsLlm(doc_id, text, lang): the LLM-pipeline decade fixture —
    * [[docs]]' distributional shape plus the structure the dedup/sampling
    * operators exist for, still derived purely from ids (partition- and
    * scale-invariant):
    *
    *  - `dupFrac` of documents join a duplicate FAMILY (family id hashed
    *    from the doc id, ~`famMean` expected members): family members draw
    *    their text from the family id, so half are EXACT duplicates
    *    (d01's workload) and the other half append one per-doc mutation
    *    word (near-duplicates — high-Jaccard pairs for the banded/block
    *    candidate generators, d03/d06's workload);
    *  - `lang` follows a Zipf-ish 8-language split (en 60% … sw 0.3%),
    *    giving the mixing/budget samplers (u06/u07, p01 stage 6) real
    *    skewed group structure;
    *  - vocabulary is `vocabSize`-wide (default 5000 vs docs' 20) so
    *    shingle diversity at multi-million-doc scale resembles text, not
    *    a 20-word toy alphabet. */
  def docsLlm(spark: SparkSession, nDocs: Long, vocabSize: Int = 5000,
              avgWords: Int = 40, sigmaWords: Double = 10.0,
              dupFrac: Double = 0.25, famMean: Int = 8,
              seed: Int = 42): DataFrame = {
    val id = col("doc_id")
    val famCount = math.max(1L, (nDocs * dupFrac).toLong / famMean)
    val isDup = u(id, lit(-100), seed) < dupFrac
    val fam = pmod(xxhash64(id, lit(-101), lit(seed)), lit(famCount))
    // text identity: family id for dup members (negated into a disjoint
    // id space so a family never aliases a singleton doc), own id otherwise
    val tid = when(isDup, -fam - 1).otherwise(id)
    val gauss = (1 to 12).map(j => u(tid, lit(-j), seed)).reduce(_ + _) - lit(6.0)
    val nWords = greatest(lit(1), (lit(avgWords) + lit(sigmaWords) * gauss).cast("int"))
    val baseText = concat_ws(" ",
      transform(sequence(lit(1), nWords),
        i => concat(lit("w"), pmod(xxhash64(tid, i, lit(seed)), lit(vocabSize)))))
    val mutated = isDup && u(id, lit(-102), seed) < 0.5
    val text = when(mutated,
      concat(baseText, lit(" m"), pmod(xxhash64(id, lit(-104), lit(seed)), lit(16))))
      .otherwise(baseText)
    val lu = u(id, lit(-103), seed)
    val lang = when(lu < 0.60, "en").when(lu < 0.75, "fr").when(lu < 0.85, "de")
      .when(lu < 0.93, "zh").when(lu < 0.97, "ru").when(lu < 0.99, "hi")
      .when(lu < 0.997, "fi").otherwise("sw")
    spark.range(nDocs).select(col("id").as("doc_id"))
      .select(col("doc_id"), text.as("text"), lang.as("lang"))
  }
}
