package graft.operators

import graft.functions.GraftFunctions._
import graft.functions.TopKByScore.top_k_by_score
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for Nearest
  * Neighbor Search", TPAMI 2011): split each D-dim vector into `m`
  * subspaces of `subDim` dims, train a small k-means codebook per
  * subspace, and store each vector as `m` small integer codes —
  * compressing the float corpus ~(4*subDim)-fold per subspace. Queries
  * are answered by ADC (asymmetric distance computation): per query,
  * precompute the m×k lookup table of squared sub-distances to every
  * codeword, then score a vector by m table reads and adds.
  *
  * Scale shape: codebooks are tiny (m*k rows) and broadcast everywhere;
  * ALL m subspaces train in ONE Lloyd's loop (the per-iteration state is
  * keyed by (subspace, centroid_id), so m chains cost the same number of
  * Spark jobs as one); scoring reads PACKED codes — one array<int>[m]
  * per vector — through a single codegen kernel, so the ADC scan is one
  * narrow projection over compressed rows, exactly the brute-force scan
  * shape but over 32-bit codes instead of 256-byte floats. Every
  * arithmetic step is double-widened fixed-order (the kmeansTrain
  * discipline), so a DuckDB oracle reproduces codes and rankings
  * bit-for-bit.
  */
object Pq {

  /** Ceiling on shortlist rows [[ivfAdcRerankTopK]] will collect to the
    * driver for the localized re-rank join. Driver cost at the cap is
    * ~100 MB transient (2^20 boxed two-long Rows, ~90 bytes each), freed
    * once the LocalRelation plan is built. Batches above it — 26k+
    * queries at the default 40-deep shortlist — keep the fully
    * distributed broadcast plan. */
  final val MaxLocalShortlistRows: Int = 1 << 20

  /** Train per-subspace codebooks: (subspace, centroid_id, cv) with `cv`
    * of length `subDim`. Same arithmetic as [[Ann.kmeansTrain]] run per
    * subspace slice (seeded md5 init — the SAME k seed rows for every
    * subspace — argmin assignment with ties to the smaller centroid_id,
    * integer-quantized order-independent means, empty clusters keep
    * their previous centroid), but all m subspaces advance in one joint
    * iteration: per round ONE broadcast-assign pass and ONE hash
    * aggregation keyed by (subspace, centroid_id), localCheckpointed
    * once — m codebooks for the job count of one. */
  def train(embs: DataFrame, m: Int, subDim: Int, k: Int = 8, iters: Int = 2,
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val scale = 1048576.0 // 2^20: power of two, so un-scaling divides exactly
    val base = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val subs = subSlices(base, m, subDim)
    // seed ids: the k rows sorting first by (md5(id), id) — a tiny
    // TakeOrderedAndProject + in-array rank (no window), shared verbatim
    // by every subspace (the slice does not change the seed order)
    val seeds = base
      .select(struct(md5(col("id").cast("string")).as("o1"), col("id").as("id")).as("s"))
      .orderBy(col("s.o1"), col("s.id"))
      .limit(k)
      .agg(array_sort(collect_list(col("s"))).as("arr"))
      .select(posexplode(col("arr")).as(Seq("centroid_id", "s")))
      .select(col("centroid_id").cast("long").as("centroid_id"), col("s.id").as("id"))
    // m*k rows: coalesce to one partition before each eager checkpoint
    // (the Ann.kmeansTrain rationale — empty-partition tasks dominated)
    var cents = subs.join(broadcast(seeds), "id")
      .select(col("subspace"), col("centroid_id"), col("sub").as("cv"))
      .coalesce(1)
      .localCheckpoint(true)
    // a corpus smaller than k seeds fewer codewords per subspace — size
    // the kernel's flat codebook by the actual per-subspace count
    val kEff = (cents.count() / m).toInt
    var it = 0
    while (it < iters) {
      // joint assignment of ALL m subspaces via one pq_encode projection
      // over the broadcast flattened codebooks (same score arithmetic and
      // tie-break as the neg_l2_float + top_k(1) aggregate it replaces —
      // which cost a 16x-exploded object aggregate plus a join back to the
      // slices per round, the dominant build cost). The vector rides
      // along, so the means update slices it directly with NO join.
      val booksRow = packCodebooks(cents)
      val means = base.crossJoin(broadcast(booksRow))
        .select(col("v"),
          graft.functions.GraftFunctions.pq_encode(col("v"), col("books_flat"), m, kEff)
            .as("codes"))
        .select(col("v"), posexplode(col("codes")).as(Seq("subspace", "code")))
        .select(col("subspace"), col("code").cast("long").as("centroid_id"),
          posexplode(slice(col("v"), col("subspace") * subDim + 1, lit(subDim)))
            .as(Seq("dim", "x")))
        .groupBy("subspace", "centroid_id", "dim")
        .agg(sum(round(col("x").cast("double") * scale).cast("long")).as("sx"),
          count(lit(1)).as("n"))
        .withColumn("cx",
          ((col("sx").cast("double") / col("n").cast("double")) / scale).cast("float"))
        .groupBy("subspace", "centroid_id")
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("cx")))),
          s => s.getField("cx")).as("cv"))
      cents = means
        .unionByName(cents.join(means.select("subspace", "centroid_id"),
          Seq("subspace", "centroid_id"), "left_anti"))
        .coalesce(1)
        // checkpoint every round (the kmeansTrain rationale: the next
        // round consumes cents twice — broadcast + anti-join)
        .localCheckpoint(true)
      it += 1
    }
    cents
  }

  /** Encode every vector: (id, subspace, code) — code = argmin codeword
    * by L2 over the slice, ties to the smaller centroid_id. */
  def encode(embs: DataFrame, codebooks: DataFrame, m: Int, subDim: Int,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val base = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    subSlices(base, m, subDim).join(broadcast(codebooks), "subspace")
      .select(col("id"), col("subspace"),
        neg_l2_float(col("sub"), col("cv")).as("score"),
        col("centroid_id"))
      .groupBy("id", "subspace")
      .agg(top_k_by_score(col("score"), col("centroid_id"), 1).as("topk"))
      .select(col("id"), col("subspace"),
        col("topk").getItem(0).getField("id").as("code"))
  }

  /** Pack row-form codes into one array<int>[m] per vector (subspace
    * order) — the persisted compressed-corpus layout the ADC kernel
    * scans. */
  def packCodes(codes: DataFrame): DataFrame =
    codes.groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("subspace"), col("code")))),
        x => x.getField("code").cast("int")).as("codes"))

  /** ADC top-k: for each query, rank the encoded corpus by
    * -(Σ_s sqL2(q_s, codeword[code_s])) — the per-subspace squared
    * partials are summed in fixed subspace order (one codegen kernel over
    * packed codes + the query's packed LUT), so the score and its ties
    * reproduce cross-engine. `packed` is the [[packCodes]] layout — the
    * persisted artifact, packed once, scanned by every query. `codewords`
    * is the per-subspace codebook size k (the LUT stride).
    * Output (query_id, rank, id). */
  def adcTopK(packed: DataFrame, codebooks: DataFrame, queries: DataFrame,
              k: Int, m: Int, subDim: Int, codewords: Int = 16,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val lut = packLut(queryLut(queries, codebooks, m, subDim, idCol, vecCol))
    Ann.explodeTopK(
      packed.crossJoin(broadcast(lut))
        .select(col("query_id"), col("id"),
          adc_score(col("codes"), col("lut"), codewords).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** The (query_id, centroid_id) probe set: each query's `nprobe`
    * nearest coarse centroids (broadcast centroids, partial top-k). */
  private def ivfProbeSet(cents: DataFrame, queries: DataFrame, nprobe: Int,
                          idCol: String, vecCol: String): DataFrame = {
    val c = cents.select(col("centroid_id").cast("long").as("centroid_id"), col("cv"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    Ann.explodeTopK(
      q.crossJoin(broadcast(c))
        .select(col("query_id"), col("centroid_id").as("id"),
          neg_l2_float(col("qv"), col("cv")).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), nprobe).as("topk")))
      .select(col("query_id"), col("id").as("centroid_id"))
  }

  /** The DISTINCT centroid ids a batch will probe, collected to the
    * driver — bounded by min(|queries| × nprobe, nCents), and nCents is
    * model-sized (the coarse quantizer broadcasts by contract), so the
    * collect is KBs at any corpus scale. A disk-served engine turns this
    * set into a STATIC `IN` predicate on its bucketed code table, so the
    * batch scan reads only the probed buckets (and, within them, only
    * the sorted row groups) instead of the whole fused table — the
    * pruning the broadcast join alone cannot give a parquet scan. */
  private[graft] def probedCentroidIds(cents: DataFrame, queries: DataFrame,
                                       nprobe: Int, idCol: String = "vec_id",
                                       vecCol: String = "embedding"): Array[Long] =
    ivfProbeSet(cents, queries, nprobe, idCol, vecCol)
      .select(col("centroid_id")).distinct()
      .collect().map(_.getLong(0)).sorted

  /** IVF-PQ (the construction FAISS calls IVFPQ — coarse quantizer +
    * product codes): each query probes its `nprobe` nearest coarse
    * centroids, and ONLY the probed clusters' members are scored, by the
    * ADC kernel over their packed codes — the float corpus is never
    * touched at query time. This is the 100 TB vector-search plan:
    * the code table (id, centroid_id, codes) streams ONCE through a
    * BROADCAST join with the tiny (queries × nprobe) probe set — rows in
    * unprobed clusters drop in-stage, probed rows fan out to their
    * queries and feed the map-side partial top-k directly, so the corpus
    * never shuffles (the earlier (query, candidate)-pair equi-join
    * shuffled |queries| × cluster-size rows: 150 M pairs at 4 M vectors
    * under c8, measured 5-9× slower and spill-unstable). Codes are 64×
    * smaller than the vectors; per-query LUTs broadcast always.
    * Output (query_id, rank, id). */
  def ivfAdcTopKFused(fused: DataFrame, codebooks: DataFrame,
                      cents: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
                      m: Int, subDim: Int, codewords: Int = 16,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val probes = ivfProbeSet(cents, queries, nprobe, idCol, vecCol)
    val lut = packLut(queryLut(queries, codebooks, m, subDim, idCol, vecCol))
    Ann.explodeTopK(
      fused.join(broadcast(probes), "centroid_id")
        .join(broadcast(lut), "query_id")
        .select(col("query_id"), col("id"),
          adc_score(col("codes"), col("lut"), codewords).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** The coarse-residual table (idCol, centroid_id, vecCol = x − c(x))
    * residual PQ trains and encodes over — ONE owner for the
    * construction so production and tests cannot drift: a single float
    * subtraction per dimension (exact-then-round, so it reproduces as
    * `(x::DOUBLE − c::DOUBLE)::FLOAT` in any IEEE engine). `assigned`
    * is (id, centroid_id); centroids broadcast. */
  def residualTable(embs: DataFrame, cents: DataFrame, assigned: DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    embs.select(col(idCol).cast("long").as("id"), col(vecCol))
      .join(assigned, "id")
      .join(broadcast(cents), "centroid_id")
      .select(col("id").as(idCol), col("centroid_id"),
        zip_with(col(vecCol), col("cv"), (x, y) => x - y).as(vecCol))

  /** Residual IVF-PQ (the construction FAISS's IndexIVFPQ actually
    * builds — Jégou et al. 2011 §III: product-quantize x − c(x), the
    * residual to the assigned coarse centroid, not x itself). Residual
    * quantization centers every cluster's distribution at the origin,
    * so the same 32 bits spend their resolution on local structure —
    * the recall win that makes IVF-PQ usable at small code budgets.
    * `fusedResid` is (id, centroid_id, codes) with codes from
    * residual-trained codebooks; each query builds ONE LUT PER PROBED
    * CENTROID from its own residual q − c (that is the price of
    * residuals: LUTs are nprobe× the plain form — still
    * queries × nprobe × m × k doubles, broadcast-sized always).
    *
    * Scale shape: identical to [[ivfAdcTopKFused]] — the fused code
    * table streams through a BROADCAST of the per-(query, centroid)
    * LUT set joined on centroid_id; the corpus never shuffles. */
  def ivfAdcTopKResidual(fusedResid: DataFrame, codebooks: DataFrame,
                         cents: DataFrame, queries: DataFrame, k: Int,
                         nprobe: Int, m: Int, subDim: Int, codewords: Int = 16,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    // the composite LUT key packs centroid_id into 10 bits — fail fast
    // instead of silently mis-decoding if a caller brings a bigger (or
    // negative-id) coarse quantizer. cents is the broadcast-sized model
    // table, so this one-row agg is free next to the probe itself.
    val cidBounds = cents
      .agg(min(col("centroid_id").cast("long")), max(col("centroid_id").cast("long")))
      .head()
    require(!cidBounds.isNullAt(0) && cidBounds.getLong(0) >= 0 &&
      cidBounds.getLong(1) < 1024,
      s"residual LUT key packs centroid_id into [0, 1024); got " +
        s"[${cidBounds.get(0)}, ${cidBounds.get(1)}] — repack with a wider key")
    val probes = ivfProbeSet(cents, queries, nprobe, idCol, vecCol)
    val c = cents.select(col("centroid_id").cast("long").as("centroid_id"),
      col("cv").as("ccv"))
    // (query, probed centroid) residual pseudo-queries, keyed by a
    // composite so the shared LUT builder can treat each as one query
    val pseudo = probes
      .join(queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).as("qv")), "query_id")
      .join(broadcast(c), "centroid_id")
      .select((col("query_id") * 1024 + col("centroid_id")).as("qkey"),
        zip_with(col("qv"), col("ccv"), (x, y) => x - y).as("qrv"))
    val lut = packLut(queryLut(pseudo, codebooks, m, subDim, "qkey", "qrv"))
      .select(expr("query_id div 1024").as("query_id"),
        (col("query_id") % 1024).cast("long").as("centroid_id"), col("lut"))
    Ann.explodeTopK(
      fusedResid.join(broadcast(lut), "centroid_id")
        .select(col("query_id"), col("id"),
          adc_score(col("codes"), col("lut"), codewords).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** Separate-tables form of [[ivfAdcTopKFused]] (`packed` (id, codes) +
    * `assigned` (id, centroid_id)): joins them once on id first — fine
    * for gate-scale inputs; an engine serving repeated probes should
    * hold the fused table and call the fused form directly
    * (api.VectorEngine does). */
  def ivfAdcTopK(packed: DataFrame, assigned: DataFrame, codebooks: DataFrame,
                 cents: DataFrame, queries: DataFrame, k: Int, nprobe: Int,
                 m: Int, subDim: Int, codewords: Int = 16,
                 idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAdcTopKFused(
      packed.join(assigned.select(col("id"), col("centroid_id")), "id"),
      codebooks, cents, queries, k, nprobe, m, subDim, codewords, idCol, vecCol)

  /** IVF-PQ with exact re-ranking (the FAISS refine pattern —
    * Jégou et al. 2011 §V.A's asymmetric re-ranking stage): the
    * compressed coarse-pruned ADC pass produces a SHORTLIST of
    * `shortlist` ids per query, then only those rows are re-scored
    * exactly (float negative squared L2, the metric ADC approximates)
    * and reduced to the final k — compressed-index recall, exact-scan
    * precision. The float corpus is probed by a broadcast hash join on
    * the O(queries × shortlist) shortlist (never scanned ranked); with
    * a corpus bucketed/sorted by id the probe prunes to the matching
    * buckets, the point-lookup shape a 100 TB serving tier wants.
    * Output (query_id, rank, id) — rank by the exact score.
    *
    * EAGER when localized: if |queries| × shortlist (an upper bound on
    * shortlist rows, from one count of the tiny query side — never from
    * executing the shortlist plan) fits [[MaxLocalShortlistRows]], the
    * compressed-scan subplan runs ONCE at call time and the returned plan
    * re-ranks a driver-local shortlist — the serving shape, where
    * embedding the whole ADC subplan inside a broadcast exchange would
    * cost a second planning pass and re-execute it wholesale on broadcast
    * eviction. Bigger batches return the fully lazy distributed plan.
    * Row set is identical either way. */
  def ivfAdcRerankTopK(packed: DataFrame, assigned: DataFrame,
                       codebooks: DataFrame, cents: DataFrame,
                       embs: DataFrame, queries: DataFrame,
                       k: Int, shortlist: Int, nprobe: Int,
                       m: Int, subDim: Int, codewords: Int = 16,
                       idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    ivfAdcRerankTopKFused(
      packed.join(assigned.select(col("id"), col("centroid_id")), "id"),
      codebooks, cents, embs, queries, k, shortlist, nprobe, m, subDim,
      codewords, idCol, vecCol)

  /** [[ivfAdcRerankTopK]] over the fused (id, centroid_id, codes) table —
    * the engine-serving form whose compressed shortlist pass never
    * shuffles the corpus (see [[ivfAdcTopKFused]]). */
  def ivfAdcRerankTopKFused(fused: DataFrame,
                            codebooks: DataFrame, cents: DataFrame,
                            embs: DataFrame, queries: DataFrame,
                            k: Int, shortlist: Int, nprobe: Int,
                            m: Int, subDim: Int, codewords: Int = 16,
                            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(shortlist >= k, "shortlist must be >= k")
    val shortPlan = ivfAdcTopKFused(fused, codebooks, cents, queries,
      shortlist, nprobe, m, subDim, codewords, idCol, vecCol)
      .select(col("query_id"), col("id"))
    // localization is gated on a CARDINALITY BOUND from the inputs —
    // |queries| × shortlist ≥ actual shortlist rows (the per-query top-k
    // emits at most `shortlist` ids) — so the decision never executes the
    // compressed-scan subplan: the old collect-and-check probe ran the
    // whole ADC scan once for the size check and then AGAIN inside the
    // returned plan whenever the check failed. The query-side count is
    // one cheap job over the (typically tiny, often cached) batch.
    val nQueries = queries.select(col(idCol)).limit(
      MaxLocalShortlistRows / math.max(shortlist, 1) + 1).count()
    val short =
      if (nQueries * shortlist <= MaxLocalShortlistRows) {
        import scala.jdk.CollectionConverters._
        queries.sparkSession.createDataFrame(
          shortPlan.collect().toSeq.asJava, shortPlan.schema)
      } else shortPlan
    val base = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    Ann.explodeTopK(
      base.join(broadcast(short), "id")
        .join(broadcast(q), "query_id")
        .select(col("query_id"), col("id"),
          neg_l2_float(col("v"), col("qv")).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** One-row (books_flat: array<float>) frame: the codebooks flattened
    * (subspace-major, codeword-minor, dim-innermost) — the broadcastable
    * layout [[graft.core.Kernels.pqEncode]] scans. Pass a coarse-centroid
    * table as (subspace=0, centroid_id, cv) to get the assignment form. */
  def packCodebooks(codebooks: DataFrame): DataFrame =
    codebooks.agg(flatten(transform(
      array_sort(collect_list(struct(col("subspace"), col("centroid_id"), col("cv")))),
      x => x.getField("cv"))).as("books_flat"))

  /** (id, subspace, sub): every vector sliced into its m subspace views —
    * a narrow union of projections, no shuffle. */
  private def subSlices(base: DataFrame, m: Int, subDim: Int): DataFrame =
    (0 until m).map { s =>
      base.select(col("id"), lit(s).as("subspace"),
        slice(col("v"), s * subDim + 1, subDim).as("sub"))
    }.reduce(_ unionByName _)

  /** Per-query ADC lookup table rows: (query_id, subspace, code, d) — the
    * squared sub-distance from the query's slice to every codeword. */
  private def queryLut(queries: DataFrame, codebooks: DataFrame,
                       m: Int, subDim: Int,
                       idCol: String, vecCol: String): DataFrame = {
    val q = queries.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
    subSlices(q, m, subDim)
      .select(col("id").as("query_id"), col("subspace"), col("sub").as("qsub"))
      .join(broadcast(codebooks), "subspace")
      .select(col("query_id"), col("subspace"),
        col("centroid_id").as("code"),
        sq_l2_float(col("qsub"), col("cv")).as("d"))
  }

  /** Pack a query's LUT rows into one array<double>[m*k] laid out
    * subspace-major, code-minor — the kernel's read layout. */
  private def packLut(lut: DataFrame): DataFrame =
    lut.groupBy("query_id")
      .agg(transform(
        array_sort(collect_list(struct(col("subspace"), col("code"), col("d")))),
        x => x.getField("d")).as("lut"))
}
