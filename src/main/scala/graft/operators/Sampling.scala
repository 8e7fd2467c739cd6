package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic, reproducible corpus sampling/splitting — the shape a
  * training-data pipeline needs for holdout splits and down-sampling at
  * scale: a pure projection keyed on a content-independent id hash, so
  * membership is stable across runs, partitionings, and engines (no
  * `rand()`, which is neither reproducible across retries nor
  * cross-engine checkable).
  */
object Sampling {

  /** Stable bucket in [0, buckets): first 16 hex digits of md5(id) as an
    * unsigned 64-bit integer, mod `buckets`. Identical arithmetic is
    * expressible in standard SQL (('0x'||substr(md5(id),1,16))::UBIGINT
    * % buckets), giving cross-engine-checkable splits. */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    (conv(substring(md5(id.cast("string")), 1, 16), 16, 10)
      .cast("decimal(38,0)") % buckets).cast("int")

  /** Deterministic percentage split: (id, bucket, split) where split is
    * assigned by cumulative weight over the 100 hash buckets, e.g.
    * Seq("train" -> 90, "val" -> 5, "test" -> 5). */
  def split(df: DataFrame, idCol: String = "doc_id",
            weights: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): DataFrame =
    df.select(col(idCol), hashBucket(col(idCol)).as("bucket"),
      splitLabel(col(idCol), weights).as("split"))

  /** The split label as a pure COLUMN of the id — the composable form of
    * [[split]]: a pipeline that already holds the row can project the
    * label instead of joining the assignment table back on the id (a
    * corpus-sized self-join for what is a deterministic function of the
    * key). Same buckets, same labels, bit-identical to [[split]]. */
  def splitLabel(id: Column,
                 weights: Seq[(String, Int)] = Seq("train" -> 90, "val" -> 5, "test" -> 5)): Column = {
    require(weights.map(_._2).sum == 100, "split weights must sum to 100")
    val bucket = hashBucket(id)
    val cum = weights.scanLeft(0)(_ + _._2).tail
    weights.zip(cum).foldRight(lit(weights.last._1): Column) {
      case (((name, _), hi), acc) => when(bucket < hi, name).otherwise(acc)
    }
  }

  /** Deterministic p-percent sample: rows whose hash bucket (out of 100)
    * falls below `pct`. */
  def samplePct(df: DataFrame, pct: Int, idCol: String = "doc_id"): DataFrame =
    df.filter(hashBucket(col(idCol)) < pct)

  /** Stratified deterministic sample — the data-mixing primitive for
    * training corpora (keep 100% of low-resource strata, down-sample the
    * dominant ones): each row keeps iff its id-hash bucket falls below
    * its group's rate (pct out of 100; `defaultPct` for unlisted groups).
    * A pure projection+filter (no shuffle, no rand()); membership is
    * stable across runs, partitionings, and engines, so a mixture is
    * reproducible and auditable at any scale. */
  def stratifiedSample(df: DataFrame, groupCol: String,
                       rates: Map[String, Int], defaultPct: Int = 100,
                       idCol: String = "doc_id"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct): Column) {
      case (acc, (g, pct)) => when(col(groupCol) === g, pct).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Deterministic sequence packing (the GPT-pretraining layout: shuffle
    * documents, concatenate, cut into `budget`-token chunks): documents
    * are dealt into `buckets` independent streams by id hash — the
    * parallelism unit, each stream packs with one partitioned window,
    * never a global sort — ordered pseudo-randomly inside the stream by
    * the same hash, and assigned the chunk their first token falls in:
    * seq_id = bucket * 2^32 + (tokens-before-this-doc div budget). All
    * integer arithmetic: reproducible across runs, partitionings, and
    * engines. `tokenCol` is the per-doc token count. Output: input
    * columns + (bucket, seq_id). */
  def packSequences(df: DataFrame, tokenCol: Column, budget: Int = 512,
                    buckets: Int = 32, idCol: String = "doc_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_bucket")
      .orderBy(col("_ord"), col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("_bucket", hashBucket(col(idCol), buckets))
      .withColumn("_ord", md5(col(idCol).cast("string")))
      .withColumn("_tok", tokenCol.cast("long"))
      .withColumn("_before", sum(col("_tok")).over(w) - col("_tok"))
      .withColumn("seq_id",
        col("_bucket").cast("long") * (1L << 32) + expr(s"_before div ${budget}L"))
      .withColumnRenamed("_bucket", "bucket")
      .drop("_ord", "_tok", "_before")
  }

  /** Cluster-balanced deterministic sampling — the "flatten the semantic
    * distribution" primitive for training mixtures (cap every k-means /
    * IVF cluster at `perCluster` rows so dominant clusters stop drowning
    * the tail): per cluster, keep the `perCluster` rows with the SMALLEST
    * stable id hash (first 13 md5 hex digits = 52 bits, exact in a
    * double), ties broken by id. Membership is a pure function of
    * (id, cluster), reproducible across runs, partitionings, and engines.
    *
    * `assigned` must carry (idCol, clusterCol). Output: (clusterCol,
    * rank, idCol) with rank 1..perCluster in hash order.
    *
    * Scale shape: a partial+final TopKByScore aggregate — map-side
    * combine caps every partition's contribution at perCluster rows, so
    * a degenerate giant cluster costs O(perCluster) per partition, never
    * a single-reducer window sort (this is why it's not row_number()). */
  def clusterBalancedSample(assigned: DataFrame, perCluster: Int,
                            idCol: String = "vec_id",
                            clusterCol: String = "centroid_id"): DataFrame = {
    import graft.functions.TopKByScore.top_k_by_score
    val hash52 = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("decimal(38,0)").cast("double")
    assigned
      .select(col(clusterCol).cast("long").as("query_id"),
        col(idCol).cast("long").as("id"), (-hash52).as("score"))
      .groupBy("query_id")
      .agg(top_k_by_score(col("score"), col("id"), perCluster).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "hit")))
      .select(col("query_id").as(clusterCol), (col("pos") + 1).cast("int").as("rank"),
        col("hit.id").as(idCol))
  }

  /** Temperature-flattened domain mixing — the multilingual/multi-domain
    * sampling primitive of large-corpus pipelines (sample each domain
    * ∝ n^alpha with alpha < 1, so dominant domains are down-weighted and
    * the tail is up-weighted). Each group's document quota is
    * floor(docsPerSqrtDoc * sqrt(n_g)) — alpha = 0.5 hardwired because
    * sqrt is IEEE-correctly-rounded in every engine (unlike pow/log), so
    * quotas are cross-engine exact — and the quota is filled
    * deterministically by smallest stable id hash (52-bit md5 prefix),
    * ties by id: membership is a pure function of (id, group, n_g),
    * reproducible across runs, partitionings, and engines.
    *
    * Output: (idCol, groupCol, n_docs, quota, rank, selected).
    *
    * Scale shape: quotas come from a group-sized count aggregate that
    * broadcasts back; the within-group hash rank uses the [[budgetSample]]
    * two-phase trick — 1024 coarse hash buckets (the top 10 bits of the
    * 52-bit hash, monotone in hash order) give per-(group, bucket) counts
    * whose running totals are a window over a GROUPS x 1024-row aggregate,
    * and the per-doc rank is bucket-prefix + row_number over (group,
    * bucket) — so no whole-group single-task sort ever forms. */
  def temperatureMix(df: DataFrame, groupCol: String, docsPerSqrtDoc: Double,
                     idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hash52 = conv(substring(md5(col(idCol).cast("string")), 1, 13), 16, 10)
      .cast("decimal(38,0)").cast("long")
    val quotas = df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("quota",
        floor(lit(docsPerSqrtDoc) * sqrt(col("n_docs").cast("double"))).cast("long"))
      .withColumnRenamed(groupCol, "_qg")
    val bucketed = df.select(col(idCol), col(groupCol), hash52.as("_h"))
      .withColumn("_bucket", shiftright(col("_h"), 42)) // top 10 of 52 bits
    val wb = Window.partitionBy(groupCol).orderBy("_bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = bucketed.groupBy(groupCol, "_bucket").agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum(col("_c")).over(wb), lit(0L)))
      .drop("_c")
      .withColumnRenamed(groupCol, "_bg").withColumnRenamed("_bucket", "_bb")
    // null-safe joins: a null group is a legal partition and must not drop
    val ww = Window.partitionBy(col(groupCol), col("_bucket"))
      .orderBy(col("_h"), col(idCol))
    bucketed
      .join(before, col(groupCol) <=> col("_bg") && col("_bucket") <=> col("_bb"))
      .withColumn("rank", col("_before") + row_number().over(ww).cast("long"))
      .join(quotas, col(groupCol) <=> col("_qg"))
      .select(col(idCol), col(groupCol), col("n_docs"), col("quota"),
        col("rank"), (col("rank") <= col("quota")).as("selected"))
  }

  /** EXACT global rank by (`scoreCol` desc, `idCol` asc) over an
    * integer-score table WITHOUT a whole-corpus single-task window — the
    * shared two-phase shape (scores coarsen to buckets by arithmetic
    * shift, per-bucket counts prefix-sum through a window over the tiny
    * bucket aggregate, in-bucket rank partitions by BUCKET). Appends
    * `_rank` (1-based). Used by the u08 classifier cutoff and u09 DSIR
    * selection; equivalence to the naive single-window rank is
    * spec-pinned (ClassifierSpec). */
  def globalRank(scored: DataFrame, scoreCol: String = "score",
                 idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = scored.withColumn("_bucket", shiftright(col(scoreCol), 10))
    val wb = Window.orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = bucketed.groupBy("_bucket").agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum(col("_c")).over(wb), lit(0L)))
      .drop("_c")
      .withColumnRenamed("_bucket", "_b")
    val ww = Window.partitionBy(col("_bucket"))
      .orderBy(col(scoreCol).desc, col(idCol))
    bucketed.join(before, col("_bucket") === col("_b"))
      .withColumn("_rank", col("_before") + row_number().over(ww).cast("long"))
      .drop("_bucket", "_b", "_before")
  }

  /** DSIR-style importance selection (Xie et al. 2023 "Data Selection
    * for Language Models via Importance Resampling", reduced to the
    * engine's exact-arithmetic discipline): score every document by how
    * much more likely its tokens are under the TARGET domain's unigram
    * distribution than under the whole corpus's, keep the top `quota`
    * docs by score. The log-likelihood ratio uses the integer bit-length
    * proxy (bitlen(c_target+1) - bitlen(c_corpus+1) per token
    * occurrence — the t10 trick), per-token-averaged in 64ths with
    * truncating division, so scores are exact BIGINTs and the DuckDB
    * oracle replays the whole selection including the fitted weights.
    *
    * Scale shape: one token explode feeds BOTH count aggregations (the
    * weight "model" is one vocab-bounded groupBy — map-side combined);
    * scoring is a join against that vocab-bounded table (broadcastable)
    * + one per-doc sum; selection is [[globalRank]]'s two-phase cutoff.
    * Output: (id, score, selected). */
  def dsirSelect(docs: DataFrame, isTarget: Column, quota: Long,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    import graft.core.Shingling
    val base = docs.select(col(idCol).cast("long").as(idCol),
      isTarget.cast("boolean").as("_t"),
      Shingling.tokens(lower(col(textCol))).as("_tk"))
    // NOT materialized (measured neutral at sf0.1, and at scale storing
    // the exploded token frame costs O(corpus tokens) where re-running
    // the tokenize projection costs only CPU): each consumer re-derives
    // the explode; the narrow per-doc score frame below IS materialized
    val tok = base.select(col(idCol), col("_t"), explode(col("_tk")).as("_w"))
    val weights = tok.groupBy("_w").agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("_ct"),
      count(lit(1)).as("_cr"))
      .select(col("_w"),
        (length(bin(col("_ct") + 1)) - length(bin(col("_cr") + 1)))
          .cast("long").as("_delta"))
    val sums = tok.join(weights, "_w")
      .groupBy(idCol).agg(sum("_delta").as("_sum"), count(lit(1)).as("_n"))
    val scoredAll = base.select(col(idCol)).join(sums, Seq(idCol), "left")
      .selectExpr(idCol,
        // per-token average in 64ths; sign-split truncating division
        // (matches the oracle's CASE; docs with no tokens score 0)
        """coalesce(CASE WHEN _sum >= 0 THEN (_sum * 64) div _n
          |  ELSE -(((-_sum) * 64) div _n) END, 0L) AS score""".stripMargin)
      // materialize the (id, score) frame ONCE: globalRank consumes its
      // input twice (scored side + bucket-count side) with no
      // ReusedExchange, so a lazy frame re-runs the token explode and
      // both count aggregations per consumer (the qualityClassifier
      // rationale; 16 longs per doc)
      .localCheckpoint(true)
    globalRank(scoredAll, "score", idCol)
      .withColumn("selected", col("_rank") <= quota)
      .select(col(idCol), col("score"), col("selected"))
  }

  /** Quality-ranked selection under a per-group token budget — the "data
    * mixing" primitive: within each group (language, domain, source),
    * take documents in (score desc, id) order until the group's token
    * budget is exhausted. Exact prefix semantics: a doc is selected iff
    * the running token total through it (inclusive) is <= budget.
    *
    * Scale shape: the naive form is one window partitioned by group —
    * which funnels each ENTIRE group through a single task (a language
    * at 100 TB is tens of TB: a scale-killer). This computes the same
    * answer in two phases with no whole-group sort: (1) coarsen score
    * into `resolution` buckets (monotone in score, so bucket order
    * refines global order) and aggregate per-(group, bucket) token sums
    * — a map-side-combined hash agg to a GROUPS x resolution table whose
    * running totals are a window over that tiny table; (2) the per-doc
    * running total is bucket-prefix + a window partitioned by
    * (group, BUCKET) — partitions `resolution`-times finer than the
    * group, so no single task ever sees a whole group. Output: input id,
    * group, n_toks, cum_tokens, selected.
    */
  def budgetSample(df: DataFrame, groupCol: String, scoreCol: Column,
                   tokenCol: Column, budget: Long, resolution: Int = 1024,
                   idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // bucket edge rows exactly where the single-window desc order puts
    // them: NaN scores sort FIRST under desc (Spark and standard SQL
    // agree) -> the top bucket; null scores sort LAST -> the bottom one
    val scored = df.select(col(idCol), col(groupCol),
      tokenCol.cast("long").as("n_toks"), scoreCol.cast("double").as("_score"))
      .withColumn("_bucket",
        when(isnan(col("_score")), lit(Long.MaxValue)).otherwise(
          coalesce(floor(col("_score") * resolution),
            lit(Long.MinValue))))
      // materialize once: both the per-(group, bucket) token aggregate
      // and the final join consume this frame, and the score/token
      // expressions are typically kernel passes over the corpus (the
      // qualityClassifier rationale; a narrow 4-column frame)
      .localCheckpoint(true)
    val bucketTot = scored.groupBy(groupCol, "_bucket")
      .agg(sum(col("n_toks")).as("_btoks"))
    // running total of all STRICTLY HIGHER buckets — a window over the
    // (groups x resolution)-row aggregate, not over the corpus
    val wb = Window.partitionBy(groupCol).orderBy(col("_bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketBefore = bucketTot.withColumn(
      "_before", coalesce(sum(col("_btoks")).over(wb), lit(0L)))
      .drop("_btoks")
      .withColumnRenamed(groupCol, "_g").withColumnRenamed("_bucket", "_b")
    // within-(group, bucket) running total: partitions are resolution-x
    // finer than the group, so no whole-group single-task sort
    val ww = Window.partitionBy(col(groupCol), col("_bucket"))
      .orderBy(col("_score").desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // null-safe join keys: a null group is a legal window partition in
    // the single-window form and must not drop here
    scored.join(bucketBefore,
        col(groupCol) <=> col("_g") && col("_bucket") <=> col("_b"))
      .withColumn("cum_tokens", col("_before") + sum(col("n_toks")).over(ww))
      .withColumn("selected", col("cum_tokens") <= budget)
      .select(col(idCol), col(groupCol), col("n_toks"), col("cum_tokens"),
        col("selected"))
  }

  /** Deterministic epoch shuffle + shard assignment — the LAST step of a
    * training-data pipeline (after packing/selection, the sequences must
    * be written out in pseudo-random order across N shard files so data
    * loaders stream them without a runtime shuffle buffer). Every row
    * gets a seeded order key (md5 of "seed:id" — a different seed is a
    * different epoch permutation), a shard from a DISJOINT slice of the
    * same digest, and an exact 1-based position within its shard in key
    * order. All pure functions of (seed, id): the permutation is
    * reproducible across runs, partitionings, and engines, and a
    * training run can be resumed or audited from (seed, shard, pos)
    * alone.
    *
    * Scale shape: no global sort and no whole-shard single-task window —
    * the in-shard position uses the shared two-phase rank (the order
    * key's first byte is a 256-way bucket PREFIX, so per-(shard, bucket)
    * row_number + a prefix-sum over the tiny (shards x 256) count table
    * equals the single-window rank). The writer form is
    * `repartition(shard) + sortWithinPartitions(key)` on top of this
    * same key — one shuffle, ordered shard files.
    *
    * Output: (idCol, shard, pos). */
  def shuffleShards(df: DataFrame, nShards: Int, seed: Long = 42L,
                    idCol: String = "doc_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nShards > 0, "nShards must be positive")
    val keyed = df.select(col(idCol).cast("long").as(idCol))
      .withColumn("_key",
        md5(concat(lit(seed.toString), lit(":"), col(idCol).cast("string"))))
      // shard from hex digits 17..24 — disjoint from the order key's
      // bucket prefix, so shard membership and in-shard order are
      // independent slices of one digest
      .withColumn("shard",
        (conv(substring(col("_key"), 17, 8), 16, 10).cast("long")
          % nShards).cast("int"))
      // first hex byte = 256-way bucket; lowercase hex is ASCII-ordered,
      // so the bucket is a true prefix of the string order key
      .withColumn("_bucket", conv(substring(col("_key"), 1, 2), 16, 10).cast("int"))
    // Deliberate recompute-over-materialize: the keyed projection is
    // consumed twice (the offset aggregate below and the ranked probe
    // side), so the md5/conv columns are evaluated in two scans. The
    // alternatives are all worse at scale: caching/localCheckpoint leaks
    // executor storage from a pure plan-building function, and forcing
    // both consumers onto one shared exchange adds a full-row shuffle on
    // the aggregate branch (today it partial-aggregates map-side and
    // shuffles only ~shards x 256 count rows) while column pruning keeps
    // the exchanges un-reusable anyway. The aggregate branch's scan is
    // pruned to the id column + the hash arithmetic; everything is a
    // pure function of (seed, id), so correctness is unaffected.
    val wb = Window.partitionBy(col("shard")).orderBy(col("_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = keyed.groupBy("shard", "_bucket").agg(count(lit(1)).as("_c"))
      .withColumn("_before", coalesce(sum(col("_c")).over(wb), lit(0L)))
      .drop("_c")
      .withColumnRenamed("shard", "_s").withColumnRenamed("_bucket", "_b")
    val ww = Window.partitionBy(col("shard"), col("_bucket"))
      .orderBy(col("_key"), col(idCol))
    keyed.join(broadcast(before), col("shard") === col("_s") && col("_bucket") === col("_b"))
      .withColumn("pos", col("_before") + row_number().over(ww).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }
}
