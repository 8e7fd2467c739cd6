package graft.core

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** MinHash-LSH banding index as a postings DataFrame, and the candidate
  * generation / scoring / top-k query path on top of it
  * (reference: app/src/minhash_lsh.py — O8-O12 in SURVEY §2).
  *
  * Scale notes (100 TB design):
  *  - the "index" is a DataFrame `(id, band, key64, key64b)`; persisted as
  *    Parquet (optionally bucketed by key64) it is rebuilt-free across jobs,
  *    and cached it serves repeated queries — replacing the reference's
  *    per-worker in-memory hash tables (worker_tasks.py:79-117);
  *  - the bucket identity is carried by TWO independent 64-bit hashes of
  *    (band, band-slice) rather than the raw 4-long slice: every shuffle,
  *    window and join key stays fixed-width (no array comparisons in the
  *    hot path). A single 64-bit key would birthday-collide at ~10^12
  *    buckets (100 TB scale); the joint 96+ bits make a false bucket merge
  *    ~2^-60 probable, and a merge can only add candidates that scoring
  *    then ranks out — the same tolerance the reference's byte-key tables
  *    already accept;
  *  - single-vector probes broadcast the 32-row query side — no shuffle of
  *    the postings side at query time;
  *  - the bucket cap (skew guard, max_bucket_size=5000) reproduces the
  *    reference's keep-first-5000-in-row-order semantics deterministically
  *    via a window ordered by id.
  */
object Lsh {
  case class Params(bands: Int = 32, numPerm: Int = 128, maxBucketSize: Int = 5000) {
    require(numPerm % bands == 0, "num_perm must be divisible by bands") // minhash_lsh.py:35
    val rows: Int = numPerm / bands
  }

  /** Explode a signature column into its per-band key slices:
    * array<array<long>> of length `bands`, each slice `rows` long
    * (minhash_lsh.py:47-54). */
  def bandSlices(sig: Column, p: Params): Column =
    transform(sequence(lit(0), lit(p.bands - 1)),
      b => slice(sig, b * lit(p.rows) + lit(1), lit(p.rows)))

  /** The two independent fixed-width bucket keys for a (band, slice) pair. */
  private def withBucketKeys(df: DataFrame): DataFrame =
    df.withColumn("key64", xxhash64(col("band"), col("band_key")))
      .withColumn("key64b", xxhash64(col("band_key"), col("band")))
      .drop("band_key")

  /** Build the postings table `(id, band, key64, key64b)` with the
    * reference's bucket cap (minhash_lsh.py:42-57). */
  def postings(sigs: DataFrame, idCol: String, sigCol: String, p: Params = Params()): DataFrame = {
    val exploded = sigs.select(
      col(idCol).cast("long").as("id"),
      posexplode(bandSlices(col(sigCol), p)).as(Seq("band", "band_key")))
    val keyed = withBucketKeys(exploded)
    if (p.maxBucketSize <= 0) keyed
    else {
      // Scale-safe cap: a full-table `row_number` window would sort every
      // posting and land each bucket on one task — the exact skew the cap
      // guards against. Instead, find the over-cap buckets with a map-side-
      // combinable count (partial aggregation absorbs hot keys), pass
      // under-cap rows through untouched (anti join), and run the ordered
      // keep-first-by-id window ONLY over the rare over-cap buckets. The
      // over-cap bucket list is bounded by totalPostings/cap keys
      // (3 longs each), so it broadcasts even at 100 TB scale.
      val over = keyed.groupBy("band", "key64", "key64b")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > p.maxBucketSize)
        .select("band", "key64", "key64b")
      val small = keyed.join(broadcast(over), joinKeys, "left_anti")
      val w = Window.partitionBy("band", "key64", "key64b").orderBy("id")
      val big = keyed.join(broadcast(over), joinKeys)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= p.maxBucketSize)
        .drop("rn")
      small.unionByName(big)
    }
  }

  private val joinKeys = Seq("band", "key64", "key64b")

  /** Postings rows for a single query signature — a 32-row DataFrame built
    * on the driver; keys computed by the same Spark expressions so they
    * match the index side bit-for-bit. */
  def queryPostings(spark: SparkSession, querySig: Array[Long], p: Params = Params()): DataFrame = {
    import spark.implicits._
    val rows = (0 until p.bands).map { b =>
      (b, querySig.slice(b * p.rows, (b + 1) * p.rows).toSeq)
    }
    withBucketKeys(rows.toDF("band", "band_key"))
  }

  /** Candidate ids for a query signature: union of the query's band buckets,
    * deduplicated (minhash_lsh.py:76-96 minus the nondeterministic
    * 2000-candidate early exit — documented deviation, SURVEY §7.4). */
  def candidates(index: DataFrame, query: DataFrame): DataFrame =
    index.join(broadcast(query), joinKeys)
      .select("id").distinct()

  /** Full single-query top-k (O9-O11 + O19/O20): candidates from a
    * broadcast probe of the cached postings, deduplicated, scored, then
    * global top-k via TakeOrderedAndProject (per-partition partial top-k +
    * driver merge).
    *
    * `maxCandidates` reproduces the reference's candidate cap
    * (minhash_lsh.py:95-96) deterministically: instead of the reference's
    * insertion-order early exit, the probe uses the smallest PREFIX of
    * bands (band 0, 1, ...) whose cumulative bucket sizes reach the cap
    * (all bands when the total stays under it). Candidate sets match the
    * reference whenever the cap doesn't trigger; when it does, both
    * engines scan a truncated band prefix — ours reproducibly.
    * `maxCandidates <= 0` disables the cap. */
  def querySignature(sigs: DataFrame, index: DataFrame, querySig: Array[Long], k: Int,
                     p: Params = Params(), maxCandidates: Int = 0): DataFrame = {
    val spark = sigs.sparkSession
    val qp = queryPostings(spark, querySig, p)
    val hits = index.join(broadcast(qp), joinKeys).select("band", "id")
    val capped =
      if (maxCandidates <= 0) hits
      else {
        // The band-prefix cap FUSED into the probe plan (no separate
        // driver-side sizing job): a hit row in band b survives iff the
        // total number of hit rows in bands < b is still under the cap —
        // exactly the smallest band prefix whose cumulative bucket sizes
        // reach maxCandidates, inclusive. The window is single-partition,
        // but it only ever sees this one query's bucket hits (cap-bounded
        // in practice), never the index.
        val before = Window.orderBy("band")
          .rangeBetween(Window.unboundedPreceding, -1)
        hits.withColumn("n_before", count(lit(1)).over(before))
          .filter(col("n_before") < maxCandidates)
          .drop("n_before")
      }
    val cand = capped.select("id").distinct()
    // the query vector travels as DATA (broadcast 1-row frame), not as a
    // 128-literal expression: every probe then reuses the same compiled
    // plan — codegen recompilation per query was the dominant latency cost
    import spark.implicits._
    val qdf = Seq(Tuple1(querySig.toSeq)).toDF("qsig")
    sigs.join(broadcast(cand), sigs("doc_id") === cand("id"))
      .crossJoin(broadcast(qdf))
      .select(
        col("id"),
        graft.functions.GraftFunctions.est_jaccard(col("sig"), col("qsig")).as("score"),
        slice(col("sig"), 1, 10).as("vector_preview"))
      .orderBy(desc("score"), asc("id"))
      .limit(k)
  }

  /** Batch probe: top-k per query signature, all queries through ONE
    * compiled plan (the Spark-native form of the reference's per-request
    * scatter — amortizes planning/codegen across the whole batch).
    * `queries` is (query_id, sig); output (query_id, rank, id, score).
    *
    * The query postings side is broadcast (bounded: 32 rows per query);
    * the candidate set is NOT broadcast — it grows with batch size and
    * bucket skew, so AQE picks the join strategy. */
  def queryBatch(sigs: DataFrame, index: DataFrame, queries: DataFrame, k: Int,
                 p: Params = Params()): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val qPost = withBucketKeys(queries.select(col("query_id"),
      posexplode(bandSlices(col("sig"), p)).as(Seq("band", "band_key"))))
    val cand = index.join(broadcast(qPost), joinKeys)
      .select("query_id", "id").distinct()
    val cs = sigs.select(col("doc_id").as("id"), col("sig").as("sig_c"))
    val qs = queries.select(col("query_id"), col("sig").as("sig_q"))
    val grouped = cand.join(cs, "id").join(broadcast(qs), "query_id")
      .withColumn("score",
        graft.functions.GraftFunctions.est_jaccard(col("sig_c"), col("sig_q")))
      .groupBy("query_id")
      .agg(top_k_by_score(col("score"), col("id"), k).as("topk"))
    grouped.select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as("id"), col("hit.score").as("score"))
  }

  /** All-pairs near-duplicate candidates from the index: ids sharing at
    * least one band bucket, normalized to a < b. The band-level join is the
    * scale path (no cross join ever materializes). */
  def candidatePairs(index: DataFrame): DataFrame = {
    val l = index.select(col("band"), col("key64"), col("key64b"), col("id").as("a"))
    val r = index.select(col("band"), col("key64"), col("key64b"), col("id").as("b"))
    l.join(r, joinKeys)
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Similarity self-join: candidate pairs scored with estimated Jaccard and
    * thresholded — the engine's `similarity_join` (SURVEY §7.1 step 4). */
  def similaritySelfJoin(sigs: DataFrame, idCol: String, sigCol: String,
                         threshold: Double, p: Params = Params()): DataFrame = {
    val idx = postings(sigs, idCol, sigCol, p)
    val pairs = candidatePairs(idx)
    val sa = sigs.select(col(idCol).cast("long").as("a"), col(sigCol).as("sig_a"))
    val sb = sigs.select(col(idCol).cast("long").as("b"), col(sigCol).as("sig_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("score", graft.functions.GraftFunctions.est_jaccard(col("sig_a"), col("sig_b")))
      .filter(col("score") >= threshold)
      .select("a", "b", "score")
  }

  /** General two-sided similarity join: (a from left, b from right, score)
    * for pairs sharing at least one LSH band bucket with estimated Jaccard
    * >= threshold. Both sides are banded; candidates come from the
    * band-bucket equi-join (never a cross join). */
  def similarityJoin(leftSigs: DataFrame, rightSigs: DataFrame,
                     idCol: String, sigCol: String,
                     threshold: Double, p: Params = Params()): DataFrame = {
    val li = postings(leftSigs, idCol, sigCol, p)
      .select(col("band"), col("key64"), col("key64b"), col("id").as("a"))
    val ri = postings(rightSigs, idCol, sigCol, p)
      .select(col("band"), col("key64"), col("key64b"), col("id").as("b"))
    val pairs = li.join(ri, joinKeys).select("a", "b").distinct()
    val sa = leftSigs.select(col(idCol).cast("long").as("a"), col(sigCol).as("sig_a"))
    val sb = rightSigs.select(col(idCol).cast("long").as("b"), col(sigCol).as("sig_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("score", graft.functions.GraftFunctions.est_jaccard(col("sig_a"), col("sig_b")))
      .filter(col("score") >= threshold)
      .select("a", "b", "score")
  }
}
