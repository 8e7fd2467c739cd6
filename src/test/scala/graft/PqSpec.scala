package graft

import graft.operators.{Ann, Pq}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** Product quantization: codebook shape, code determinism under
  * repartitioning, and ADC ranking sanity against exact search. */
class PqSpec extends SparkSpec {

  private lazy val embs =
    spark.read.parquet(s"$testDataDir/embeddings.parquet").cache()
  private lazy val books = Pq.train(embs, m = 8, subDim = 8, k = 16, iters = 2).cache()

  test("codebooks: 8 subspaces x 16 codewords of 8 dims") {
    val rows = books.collect()
    assert(rows.length == 128)
    assert(rows.map(_.getAs[Long]("centroid_id")).toSet == (0L until 16L).toSet)
    assert(rows.forall(_.getSeq[Float](books.columns.indexOf("cv")).length == 8))
  }

  test("codes are partition-invariant (same argmin under repartition)") {
    val a = Pq.encode(embs, books, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val b = Pq.encode(embs.repartition(13), books, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(a.toSeq == b.toSeq)
    assert(a.length == embs.count() * 8)
  }

  test("ADC top-1 recall against exact L2 is reasonable and self-match is near-top") {
    val queries = embs.filter(col("vec_id") < 20)
    val codes = Pq.packCodes(Pq.encode(embs, books, m = 8, subDim = 8))
    val adc = Pq.adcTopK(codes, books, queries, k = 5, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // PQ distance of a vector to itself is the quantization error — small,
    // so the query itself lands in its own top-5 for most queries
    val selfHits = (0L until 20L).count(q => adc.exists(t => t._1 == q && t._3 == q))
    assert(selfHits >= 15, s"self in top-5 only $selfHits/20")
    val exact = Ann.bruteForceTopK(embs, queries, k = 5, neg_l2_float)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val hits = adc.groupBy(_._1).map { case (q, rows) =>
      rows.map(_._3).toSet.intersect(exact(q).map(_._2).toSet).size
    }.sum
    // the synthetic embeddings are near-random — the adversarial case for
    // PQ (no subspace structure to exploit), so the bar is a sanity floor,
    // not a quality target: far above the ~1% a random top-5 would score
    assert(hits >= 20 * 5 * 0.2, s"ADC recall too low: $hits/100")
  }

  test("ivfpq rerank with exhaustive shortlist equals exact L2 search") {
    // probe every cluster and shortlist the whole corpus: the compressed
    // pass then only PROPOSES candidates and the exact re-score decides —
    // output must equal brute-force neg-L2 top-k bit-for-bit
    val n = embs.count().toInt
    val queries = embs.filter(col("vec_id") < 10)
    val cents = Ann.kmeansTrain(embs, k = 4, iters = 2)
    val assigned = graft.api.VectorEngine.assign(
      embs.select(col("vec_id").cast("long").as("id"), col("embedding").as("v")),
      cents)
    val codes = Pq.packCodes(Pq.encode(embs, books, m = 8, subDim = 8))
    val rerank = Pq.ivfAdcRerankTopK(codes, assigned, books, cents, embs,
      queries, k = 5, shortlist = n, nprobe = 4, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val exact = Ann.bruteForceTopK(embs, queries, k = 5, neg_l2_float)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(rerank == exact)
    // a realistic shortlist: rerank recall >= plain ivfpq recall (the
    // refine stage can only improve the ordering of what ivfpq surfaces)
    val short = Pq.ivfAdcRerankTopK(codes, assigned, books, cents, embs,
      queries, k = 5, shortlist = 25, nprobe = 2, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val plain = Pq.ivfAdcTopK(codes, assigned, books, cents, queries,
      k = 5, nprobe = 2, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val truth = exact.map(t => (t._1, t._3)).toSet
    val rs = short.count(truth.contains)
    val rp = plain.count(truth.contains)
    assert(rs >= rp, s"rerank recall $rs < ivfpq recall $rp")
  }

  test("residual IVF-PQ beats plain-vector codes at identical bits and nprobe") {
    val queries = embs.filter(col("vec_id") < 20)
    val cents = Ann.kmeansTrain(embs, k = 4, iters = 2)
    val assigned = graft.api.VectorEngine.assign(
      embs.select(col("vec_id").cast("long").as("id"), col("embedding").as("v")),
      cents)
    // residual table via the one shared constructor (Pq.residualTable)
    val resid = Pq.residualTable(embs, cents, assigned).cache()
    val rbooks = Pq.train(resid, m = 8, subDim = 8, k = 16, iters = 2).cache()
    val rfused = Pq.packCodes(Pq.encode(resid, rbooks, m = 8, subDim = 8))
      .join(resid.select(col("vec_id").as("id"), col("centroid_id")), "id")
    val residual = Pq.ivfAdcTopKResidual(rfused, rbooks, cents, queries,
      k = 5, nprobe = 4, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val codes = Pq.packCodes(Pq.encode(embs, books, m = 8, subDim = 8))
    val plain = Pq.ivfAdcTopK(codes, assigned, books, cents, queries,
      k = 5, nprobe = 4, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val truth = Ann.bruteForceTopK(embs, queries, k = 5, neg_l2_float)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val rr = residual.count(truth.contains)
    val rp2 = plain.count(truth.contains)
    assert(rr >= rp2, s"residual recall $rr < plain recall $rp2")
    // self-match: every query's own residual code must surface itself
    // in its top-5 when all clusters are probed (the query's own code
    // has near-minimal ADC self-distance)
    val byQ = residual.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byQ.keySet == truth.map(_._1))
    byQ.foreach { case (q2, ids) =>
      assert(ids.contains(q2), s"query $q2 missing from its own top-5: $ids")
    }
  }

  test("joint trainer equals per-subspace kmeansTrain exactly") {
    import org.apache.spark.sql.functions.slice
    val joint = Pq.train(embs, m = 2, subDim = 32, k = 4, iters = 2)
      .collect()
      .map(r => (r.getAs[Int]("subspace"), r.getAs[Long]("centroid_id")) ->
        r.getSeq[Float](r.fieldIndex("cv")).toList).toMap
    val perSlice = (0 until 2).flatMap { s =>
      Ann.kmeansTrain(
        embs.select(col("vec_id"), slice(col("embedding"), s * 32 + 1, 32).as("sub")),
        k = 4, iters = 2, idCol = "vec_id", vecCol = "sub")
        .collect()
        .map(r => (s, r.getAs[Long]("centroid_id")) ->
          r.getSeq[Float](r.fieldIndex("cv")).toList)
    }.toMap
    assert(joint == perSlice)
  }

  test("IVF-PQ probing every cluster equals the full ADC scan exactly") {
    val queries = embs.filter(col("vec_id") < 8)
    val codes = Pq.packCodes(Pq.encode(embs, books, m = 8, subDim = 8))
    // trivial coarse quantizer: 4 centroids from the corpus itself
    val cents = embs.filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    // coarse assignment = 1-NN argmin over the centroids
    val assign = Ann.bruteForceTopK(cents.select(col("centroid_id").as("vec_id"),
      col("cv").as("embedding")), embs, k = 1, neg_l2_float)
      .select(col("query_id").as("id"), col("id").as("centroid_id"))
    val full = Pq.adcTopK(codes, books, queries, k = 5, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    val ivf = Pq.ivfAdcTopK(codes, assign, books, cents, queries,
      k = 5, nprobe = 4, m = 8, subDim = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted
    assert(ivf.toSeq == full.toSeq)
  }
}
