package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.TopKByScore.top_k_by_score
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each D-dim vector into `m`
  * subspaces of `subDim` dims, train a small k-means codebook per
  * subspace, and store each vector as `m` small integer codes —
  * compressing a float corpus ~`(4*subDim)/1`-fold per subspace. Queries
  * are answered by ADC (asymmetric distance computation): per query,
  * precompute the m×k lookup table of squared sub-distances to every
  * codeword, then score a vector by m table lookups and an add.
  *
  * Scale shape: codebooks are tiny (m*k rows) and broadcast everywhere;
  * encoding is a broadcast join + per-row argmin (narrow); the ADC scan
  * joins the code postings against the broadcast LUT on (subspace, code)
  * — a hash equi-join over already-compressed data, never all-pairs on
  * floats. Every arithmetic step is double-widened fixed-order (the
  * kmeansTrain discipline), so a DuckDB oracle reproduces codes and
  * rankings bit-for-bit.
  */
object Pq {

  /** Train per-subspace codebooks: (subspace, centroid_id, cv) with
    * `cv` of length `subDim`. Reuses [[Ann.kmeansTrain]] (seeded md5
    * init, integer-quantized means) on each vector slice. */
  def train(embs: DataFrame, m: Int, subDim: Int, k: Int = 8, iters: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    (0 until m).map { s =>
      Ann.kmeansTrain(
        embs.select(col(idCol),
          slice(col(vecCol), s * subDim + 1, subDim).as("sub")),
        k = k, iters = iters, idCol = idCol, vecCol = "sub")
        .withColumn("subspace", lit(s))
    }.reduce(_ unionByName _)

  /** Encode every vector: (id, subspace, code) — code = argmin codeword
    * by L2 over the slice, ties to the smaller centroid_id. */
  def encode(embs: DataFrame, codebooks: DataFrame, m: Int, subDim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val subs = (0 until m).map { s =>
      embs.select(col(idCol).cast("long").as("id"),
        lit(s).as("subspace"),
        slice(col(vecCol), s * subDim + 1, subDim).as("sub"))
    }.reduce(_ unionByName _)
    subs.join(broadcast(codebooks), "subspace")
      .select(col("id"), col("subspace"),
        neg_l2_float(col("sub"), col("cv")).as("score"),
        col("centroid_id"))
      .groupBy("id", "subspace")
      .agg(top_k_by_score(col("score"), col("centroid_id"), 1).as("topk"))
      .select(col("id"), col("subspace"),
        col("topk").getItem(0).getField("id").as("code"))
  }

  /** Per-query ADC lookup table: (query_id, subspace, code, d) — the
    * squared sub-distance from the query's slice to every codeword.
    * Tiny (queries × m × k rows); always broadcast. */
  private def queryLut(queries: DataFrame, codebooks: DataFrame,
                       m: Int, subDim: Int,
                       idCol: String, vecCol: String): DataFrame = {
    val qsubs = (0 until m).map { s =>
      queries.select(col(idCol).cast("long").as("query_id"),
        lit(s).as("subspace"),
        slice(col(vecCol), s * subDim + 1, subDim).as("qsub"))
    }.reduce(_ unionByName _)
    qsubs.join(broadcast(codebooks), "subspace")
      .select(col("query_id"), col("subspace"),
        col("centroid_id").as("code"),
        sq_l2_float(col("qsub"), col("cv")).as("d"))
  }

  /** Sum the per-subspace partials in fixed subspace order and rank:
    * input (query_id, id, subspace, d) -> (query_id, rank, id). */
  private def rankBySummedPartials(parts: DataFrame, k: Int): DataFrame = {
    val scored = parts
      .groupBy("query_id", "id")
      .agg(array_sort(collect_list(struct(col("subspace"), col("d")))).as("ds"))
      .select(col("query_id"), col("id"),
        (-aggregate(col("ds"), lit(0.0), (acc, x) => acc + x.getField("d"))).as("score"))
    Ann.explodeTopK(
      scored.groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** ADC top-k: for each query, rank the encoded corpus by
    * -(Σ_s sqL2(q_s, codeword[code_s])) — the per-subspace squared
    * partials are summed in fixed subspace order so the score (and thus
    * the ranking and its ties) reproduces cross-engine. Codes may be
    * precomputed (pass `codes`) or derived here. Output (query_id, rank, id). */
  def adcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
              k: Int, m: Int, subDim: Int,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lut = queryLut(queries, codebooks, m, subDim, idCol, vecCol)
    rankBySummedPartials(
      codes.join(broadcast(lut), Seq("subspace", "code"))
        .select(col("query_id"), col("id"), col("subspace"), col("d")), k)
  }

  /** IVF-PQ (the construction FAISS calls IVFPQ — coarse quantizer +
    * product codes): each query probes its `nprobe` nearest coarse
    * centroids, and ONLY the probed clusters' members are scored, by ADC
    * lookups over their PQ codes — the float corpus is never touched at
    * query time. This is the 100 TB vector-search plan: inverted lists
    * keyed by centroid_id (hash equi-join, never all-pairs), codes 64x
    * smaller than the vectors they stand for, and per-query LUTs small
    * enough to broadcast always. `assigned` is (id, centroid_id) from
    * the coarse quantizer (the same argmin Ann.ivfTopK builds).
    * Output (query_id, rank, id). */
  def ivfAdcTopK(codes: DataFrame, assigned: DataFrame, codebooks: DataFrame,
                 cents: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
                 m: Int, subDim: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = cents.select(col("centroid_id").cast("long").as("centroid_id"), col("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val probes = Ann.explodeTopK(
      q.crossJoin(broadcast(c))
        .select(col("query_id"), col("centroid_id").as("id"),
          neg_l2_float(col("qv"), col("cv")).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), nprobe).as("topk")))
      .select(col("query_id"), col("id").as("centroid_id"))
    val cands = assigned.join(broadcast(probes), "centroid_id")
      .select(col("query_id"), col("id"))
    val lut = queryLut(queries, codebooks, m, subDim, idCol, vecCol)
    rankBySummedPartials(
      codes.join(cands, "id")
        .join(broadcast(lut), Seq("query_id", "subspace", "code"))
        .select(col("query_id"), col("id"), col("subspace"), col("d")), k)
  }
}
