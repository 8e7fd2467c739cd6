package graft

import graft.core.{Lsh, MinHashCoefficients, MinHashPipeline, Qed, Shingling}
import graft.functions.GraftFunctions._
import graft.operators.{Ann, Dedup, Metrics, TextAnalysis}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline extension) expressed Spark-first; `oracleSql` is
  * the DuckDB-equivalent ANSI SQL the driver checks it against at sf0.01.
  *
  * Numeric conventions for cross-engine bit-equality:
  *  - aggregates in exact DECIMAL, cast to DOUBLE at the end;
  *  - floating-point reductions written with the same sequential order on
  *    both sides (kernel loops <-> DuckDB list_reduce);
  *  - ranking outputs carry integer ranks (ties broken by id), and scores
  *    only when they are exact dyadic rationals (e.g. m/128).
  *
  * The reference-faithful SHA-1 hash family cannot run in DuckDB (no sha1
  * function there), so pipeline queries here use the md5 family (same
  * seed-42 MinHash coefficients, same modular arithmetic); SHA-1 parity is
  * covered bit-for-bit by MinHashGoldenSpec's goldens.
  */
object SparkEntry {
  /** Word-shingle size used by the document pipeline queries. */
  final val K = 3
  final val Prime = graft.core.Mod61.Prime

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Full reference query lifecycle (SURVEY §3.1): corpus -> shingles ->
    * SHA-1/mod-p hashes -> 128-perm MinHash -> 32-band LSH postings ->
    * candidate probe for doc 0's signature -> estimated-Jaccard top-5.
    */
  def entry(spark: SparkSession): DataFrame = {
    val docs = t(spark, "/root/testdata/sf0.001", "documents")
    val sigs = MinHashPipeline
      .withSignature(docs, "text", MinHashPipeline.Params(kShingle = K))
      .select("doc_id", "sig")
    val index = Lsh.postings(sigs, "doc_id", "sig")
    val qSig = sigs.filter(col("doc_id") === 0).head().getSeq[Long](1).toArray
    Lsh.querySignature(sigs, index, qSig, k = 5)
  }

  // ---- shared Spark fragments -------------------------------------------

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("shingles", Shingling.shingles(col("text"), K, byWord = true))

  /** (doc_id, sig) with the md5 hash family — cached per data dir: the
    * signature table is the reference's build-once index artifact
    * (sigs.npy), reused by every downstream query (SURVEY §3.2). */
  private val sigCache = scala.collection.concurrent.TrieMap[String, DataFrame]()
  private def md5Sigs(s: SparkSession, dir: String): DataFrame =
    sigCache.getOrElseUpdate(dir, {
      docShingles(s, dir)
        .select(col("doc_id"),
          minhash_signature(shingle_hashes_md5(col("shingles"))).as("sig"))
        .cache()
    })

  /** LSH postings index — cached per data dir (the reference's build-once
    * in-memory LSH tables, worker_tasks.py:79-117). */
  private val postCache = scala.collection.concurrent.TrieMap[String, DataFrame]()
  private def lshIndex(s: SparkSession, dir: String): DataFrame =
    postCache.getOrElseUpdate(dir,
      Lsh.postings(md5Sigs(s, dir), "doc_id", "sig").cache())

  /** LSH top-k (k=5) per query doc (doc_id < nQueries): query_id, rank,
    * id, score — O9-O11 composed. */
  private def lshTopK(s: SparkSession, dir: String, nQueries: Int, k: Int = 5): DataFrame = {
    val sigs = md5Sigs(s, dir)
    val post = lshIndex(s, dir)
    val qp = post.filter(col("id") < nQueries)
      .select(col("id").as("query_id"), col("band"), col("key64"), col("key64b"))
    val cand = post.join(broadcast(qp), Seq("band", "key64", "key64b"))
      .select("query_id", "id").distinct()
    val cs = sigs.select(col("doc_id").as("id"), col("sig").as("sig_c"))
    val qs = sigs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("sig").as("sig_q"))
    val scored = broadcast(cand).join(cs, "id").join(broadcast(qs), "query_id")
      .withColumn("score", est_jaccard(col("sig_c"), col("sig_q")))
    Ann.explodeTopKWithScore(scored.groupBy("query_id")
      .agg(graft.functions.TopKByScore.top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  /** Brute-force top-k per query doc by the reference's oracle metric
    * (negative L2 over signatures — benchmark_runner.py:109-117). */
  private def bruteTopK(s: SparkSession, dir: String, nQueries: Int, k: Int = 5): DataFrame = {
    val sigs = md5Sigs(s, dir)
    val q = sigs.filter(col("doc_id") < nQueries)
      .select(col("doc_id").as("query_id"), col("sig").as("sig_q"))
    val scored = sigs.select(col("doc_id").as("id"), col("sig").as("sig_c"))
      .crossJoin(broadcast(q))
      .withColumn("score", neg_l2_long(col("sig_c"), col("sig_q")))
    Ann.explodeTopK(scored.groupBy("query_id")
      .agg(graft.functions.TopKByScore.top_k_by_score(col("score"), col("id"), k).as("topk")))
  }

  // ---- shared DuckDB fragments ------------------------------------------

  private val duckToks =
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"

  /** CTE preamble: toks, sh (shingles). */
  private def duckShingleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, $duckToks AS t FROM documents
       |), sh AS (
       |  SELECT doc_id, CASE WHEN len(t) < $K THEN [array_to_string(t, ' ')]
       |    ELSE list_distinct([array_to_string(t[i:i+${K - 1}], ' ') for i in range(1, len(t)-$K+2)]) END AS shingles
       |  FROM toks
       |)""".stripMargin

  private lazy val duckCoefs: String =
    MinHashCoefficients.A.zip(MinHashCoefficients.B)
      .map { case (a, b) => s"{'a': ${a}::HUGEINT, 'b': ${b}::HUGEINT}" }
      .mkString("[", ", ", "]")

  /** md5-family stable hash of a string expression, as DuckDB SQL. */
  private def duckMd5Mod(e: String): String =
    s"(('0x'||substr(md5($e),1,16))::UBIGINT % ${Prime}::UBIGINT)::BIGINT"

  /** CTE preamble ending in sig(doc_id, s: BIGINT[128]). */
  private def duckSigSql: String =
    duckShingleSql +
      s""", h AS (
         |  SELECT doc_id, list_transform(shingles, s -> ${duckMd5Mod("s")}) AS hs FROM sh
         |), sig AS (
         |  SELECT doc_id, [ list_min(list_transform(hs, x -> ((c.a * x::HUGEINT + c.b) % ${Prime}::HUGEINT)::BIGINT)) for c in ${duckCoefs} ] AS s
         |  FROM h
         |)""".stripMargin

  /** CTE: bands(doc_id, band, key BIGINT[4]) from sig. */
  private def duckBandsSql: String =
    duckSigSql +
      """, bands AS (
        |  SELECT doc_id, b.band AS band, s[b.band*4+1 : b.band*4+4] AS key
        |  FROM sig CROSS JOIN (SELECT unnest(range(0, 32)) AS band) b
        |)""".stripMargin

  /** est-Jaccard between sig lists x and y (exact m/128 dyadic). */
  private def duckEstJacc(x: String, y: String): String =
    s"len(list_filter(range(1, 129), i -> $x[i] = $y[i])) / 128.0"

  /** Sequential-order negative L2 over sig lists (matches Kernels.negL2Long
    * loop order exactly). */
  private def duckNegL2(x: String, y: String): String =
    s"-sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, 129), i -> ($x[i]::DOUBLE - $y[i]::DOUBLE) * ($x[i]::DOUBLE - $y[i]::DOUBLE))), (a, v) -> a + v))"

  /** CTE: lsh_topk(query_id, rank, id, score) for query docs < nQ. */
  private def duckLshTopKSql(nQ: Int, k: Int = 5): String =
    duckBandsSql +
      s""", cand AS (
         |  SELECT DISTINCT q.doc_id AS query_id, o.doc_id AS id
         |  FROM bands q JOIN bands o ON q.band = o.band AND q.key = o.key
         |  WHERE q.doc_id < $nQ
         |), scored AS (
         |  SELECT c.query_id, c.id, ${duckEstJacc("sq.s", "sc.s")} AS score
         |  FROM cand c JOIN sig sq ON sq.doc_id = c.query_id
         |              JOIN sig sc ON sc.doc_id = c.id
         |), lsh_topk AS (
         |  SELECT query_id, rank, id, score FROM (
         |    SELECT query_id, id, score,
         |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
         |    FROM scored) WHERE rank <= $k
         |)""".stripMargin

  /** CTE: brute_topk(query_id, rank, id) by neg-L2 over sigs, queries < nQ. */
  private def duckBruteTopKSql(nQ: Int, k: Int = 5): String =
    s""", bscored AS (
       |  SELECT q.doc_id AS query_id, o.doc_id AS id, ${duckNegL2("q.s", "o.s")} AS score
       |  FROM sig q CROSS JOIN sig o WHERE q.doc_id < $nQ
       |), brute_topk AS (
       |  SELECT query_id, rank, id FROM (
       |    SELECT query_id, id,
       |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
       |    FROM bscored) WHERE rank <= $k
       |)""".stripMargin

  /** ±1 random-hyperplane weight (plane p 0-based, dim d 0-based) — must
    * match Ann.rhpWeightCol exactly: bit0 of (A[p]*(p*64+d+1)+B[p]) mod P. */
  private def duckRhpSql(planes: Int): String = {
    val aList = MinHashCoefficients.A.take(16).mkString("[", ", ", "]")
    val bList = MinHashCoefficients.B.take(16).mkString("[", ", ", "]")
    s"""rhp AS (
       |  SELECT vec_id, list_reduce(list_prepend(0::BIGINT,
       |    [ CASE WHEN list_reduce(list_prepend(0.0,
       |        [ embedding[d+1]::DOUBLE *
       |          (CASE WHEN (($aList[p+1]::HUGEINT * (p*64+d+1) + $bList[p+1]) % ${Prime}::HUGEINT) % 2 = 1 THEN -1.0 ELSE 1.0 END)
       |          for d in range(0, len(embedding)) ]), (a, v) -> a + v) > 0
       |      THEN (1::BIGINT << p) ELSE 0::BIGINT END
       |      for p in range(0, $planes) ]), (a, v) -> a + v) AS bucket
       |  FROM embeddings
       |)""".stripMargin
  }

  // ---- query catalog ----------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Aggregation over lineitem (SURVEY §2.1 aggregations; TPC-H Q1 shape).
    "q01_lineitem_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Multi-way join + agg: dims broadcast, fact shuffles once.
    "q02_revenue_by_nation" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,6)") - col("l_discount").cast("decimal(18,6)")))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy("n_name")
    }),

    // Window top-k per group (O11's per-query top-k shape).
    "q03_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // O1 synthetic corpus generator (hash-based, partitioning-invariant;
    // no SQL oracle possible for the RNG -> rows-only check).
    "o01_synth_corpus" -> ((s, dir) => {
      graft.sources.SyntheticCorpus.docs(s, nDocs = 1000)
        .select(col("doc_id"), size(split(col("text"), " ")).as("n_words"))
        .orderBy("doc_id")
    }),

    // O2 shingling: per-doc distinct word k-gram stats.
    "o02_shingles" -> ((s, dir) => {
      docShingles(s, dir)
        .select(
          col("doc_id"),
          size(col("shingles")).as("n_shingles"),
          array_min(col("shingles")).as("sh_min"),
          array_max(col("shingles")).as("sh_max"))
        .orderBy("doc_id")
    }),

    // O2 char-gram mode: distinct char 5-gram stats.
    "o03_char_shingles" -> ((s, dir) => {
      t(s, dir, "documents")
        .withColumn("cs", Shingling.charShingles(col("text"), 5))
        .select(col("doc_id"), size(col("cs")).as("n_grams"),
          array_min(col("cs")).as("g_min"), array_max(col("cs")).as("g_max"))
        .orderBy("doc_id")
    }),

    // O3+O4+O5 MinHash signatures (md5 family; SHA-1 golden-tested).
    "o04_minhash_md5" -> ((s, dir) => {
      md5Sigs(s, dir)
        .select(
          col("doc_id"),
          element_at(col("sig"), 1).as("sig_first"),
          element_at(col("sig"), 64).as("sig_mid"),
          element_at(col("sig"), 128).as("sig_last"),
          aggregate(col("sig"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("sig_xor"))
        .orderBy("doc_id")
    }),

    // O8 LSH banding index: per-band bucket stats over the postings table.
    "o08_lsh_bands" -> ((s, dir) => {
      lshIndex(s, dir)
        .groupBy("band")
        .agg(countDistinct("key64", "key64b").as("n_buckets"),
          count(lit(1)).as("n_postings"))
        .orderBy("band")
    }),

    // O9 candidate generation: per-query distinct candidate count.
    "o09_lsh_candidates" -> ((s, dir) => {
      val post = lshIndex(s, dir)
      val qp = post.filter(col("id") < 10)
        .select(col("id").as("query_id"), col("band"), col("key64"), col("key64b"))
      post.join(broadcast(qp), Seq("band", "key64", "key64b"))
        .groupBy("query_id")
        .agg(countDistinct("id").as("n_candidates"))
        .orderBy("query_id")
    }),

    // O10 estimated Jaccard over all LSH candidate pairs (threshold 0.5).
    "o10_est_jaccard_pairs" -> ((s, dir) => {
      val sigs = md5Sigs(s, dir)
      val pairs = Lsh.candidatePairs(lshIndex(s, dir))
      val sa = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      val sb = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
      pairs.join(sa, "a").join(sb, "b")
        .withColumn("score", est_jaccard(col("sig_a"), col("sig_b")))
        .filter(col("score") >= 0.5)
        .select("a", "b", "score")
        .orderBy("a", "b")
    }),

    // O11 per-query top-k by estimated Jaccard among LSH candidates.
    "o11_lsh_topk" -> ((s, dir) => lshTopK(s, dir, nQueries = 10).orderBy("query_id", "rank")),

    // O12 result padding to fixed width k with -1 sentinel ids.
    "o12_padding" -> ((s, dir) => {
      val k = 5
      lshTopK(s, dir, nQueries = 10)
        .groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
          x => x.getField("id")).as("ids"))
        .withColumn("padded",
          concat(col("ids"), array_repeat(lit(-1L), lit(k) - size(col("ids")))))
        .select(col("query_id"), posexplode(col("padded")).as(Seq("pos", "id")))
        .orderBy("query_id", "pos")
    }),

    // O13 per-dimension equi-width histogram over embeddings (sparse).
    "o13_histogram" -> ((s, dir) => {
      Qed.histogram(t(s, dir, "embeddings"), "embedding", nBins = 256)
        .orderBy("dim", "bucket")
    }),

    // O16+O23 brute-force exact top-k by negative L2 over embeddings.
    "o16_l2_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 5), k = 5, neg_l2_float)
        .orderBy("query_id", "rank")
    }),

    // O25-O27 metrics: LSH predictions vs the signature-L2 brute-force
    // truth (the reference's own oracle definition), per-query integers.
    "o25_metrics" -> ((s, dir) => {
      val pred = lshTopK(s, dir, nQueries = 20)
        .groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
          x => x.getField("id")).as("ids"))
      val truth = bruteTopK(s, dir, nQueries = 20)
        .groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
          x => x.getField("id")).as("ids"))
      Metrics.perQuery(pred, truth).orderBy("query_id")
    }),

    // O26/O27 aggregate metric summary (micro-averaged => exact integer
    // arithmetic, cross-engine safe; per-query MRR inputs are in o25).
    "o26_metrics_summary" -> ((s, dir) => {
      val pred = lshTopK(s, dir, nQueries = 20)
        .groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
          x => x.getField("id")).as("ids"))
      val truth = bruteTopK(s, dir, nQueries = 20)
        .groupBy("query_id")
        .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
          x => x.getField("id")).as("ids"))
      Metrics.perQuery(pred, truth)
        .agg(
          count(lit(1)).as("n_queries"),
          sum("n_hits").as("sum_hits"),
          sum("n_pred").as("sum_pred"),
          (sum("n_hits").cast("double") / (count(lit(1)) * 5).cast("double")).as("recall_at_k"),
          (sum("n_hits").cast("double") / sum("n_pred").cast("double")).as("precision_micro"))
    }),

    // Dedup: exact duplicate groups by content hash.
    "d01_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents")).orderBy("text_hash")
    }),

    // Dedup survivor selection: near-dup docs labeled with the smallest id
    // among themselves and their >=0.9-similar partners (one labeling pass
    // over the LSH pair set).
    "d02_dedup_groups" -> ((s, dir) => {
      val sigs = md5Sigs(s, dir)
      val pairs = Lsh.candidatePairs(lshIndex(s, dir))
      val sa = sigs.select(col("doc_id").as("a"), col("sig").as("sig_a"))
      val sb = sigs.select(col("doc_id").as("b"), col("sig").as("sig_b"))
      val scored = pairs.join(sa, "a").join(sb, "b")
        .filter(est_jaccard(col("sig_a"), col("sig_b")) >= 0.9)
      val edges = scored.select(col("a").as("doc"), col("b").as("peer"))
        .unionByName(scored.select(col("b").as("doc"), col("a").as("peer")))
      edges.groupBy("doc")
        .agg(least(min(col("peer")), col("doc")).as("label"))
        .select(col("doc"), col("label"))
        .orderBy("doc")
    }),

    // Dedup: SimHash 61-bit fingerprints (token multiset, md5 family).
    "d03_simhash" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(col("doc_id"),
          simhash61(shingle_hashes_md5(Shingling.tokens(col("text")))).as("fp"))
        .orderBy("doc_id")
    }),

    // Text analysis: language-ID, quality, token counts, fingerprint.
    "t01_text_analysis" -> ((s, dir) => {
      TextAnalysis.analyze(t(s, dir, "documents")).orderBy("doc_id")
    }),

    // Multimodal plumbing: synthesize media, stub-decode features
    // (deterministic; no SQL oracle for the byte-level stub -> rows-only).
    "m01_multimodal_features" -> ((s, dir) => {
      val media = graft.operators.Multimodal.synthesize(s, n = 100)
      graft.operators.Multimodal.extractFeatures(media, dim = 16)
        .select(col("media_id"), element_at(col("features"), 1).as("f0"),
          element_at(col("features"), 16).as("f15"))
        .orderBy("media_id")
    }),

    // Token frequency: explode -> agg -> deterministic top-20.
    "t02_word_freq" -> ((s, dir) => {
      t(s, dir, "documents")
        .select(explode(Shingling.tokens(lower(col("text")))).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(desc("cnt"), asc("token"))
        .limit(20)
    }),

    // Streaming-shaped batch: tumbling 1-hour windowed aggregation.
    // (events.parquet stores TIMESTAMP(NANOS); Spark 4 only reads those as
    // long via the legacy flag — convert to micros explicitly.)
    "s01_events_hourly" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .select(col("w.start").as("hour_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("hour_start", "event_type")
    }),

    // O30 inspection/diagnostics: table stats (describe-style).
    "o30_inspect" -> ((s, dir) => {
      t(s, dir, "documents")
        .groupBy("lang")
        .agg(count(lit(1)).as("n"),
          min("n_chars").as("min_chars"), max("n_chars").as("max_chars"),
          countDistinct("source").as("n_sources"))
        .orderBy("lang")
    }),

    // Semi/anti joins: customers with vs without orders, per segment.
    "q04_semi_anti" -> ((s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("grp", lit("with_orders"))
      val withoutO = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .withColumn("grp", lit("without_orders"))
      withO.unionByName(withoutO)
        .select("c_mktsegment", "grp", "n")
        .orderBy("c_mktsegment", "grp")
    }),

    // Relational set operations: INTERSECT / UNION / EXCEPT.
    "q05_setops" -> ((s, dir) => {
      val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).withColumn("op", lit("intersect"))
        .unionByName(cn.union(sn).distinct().withColumn("op", lit("union")))
        .unionByName(cn.distinct().except(sn).withColumn("op", lit("except")))
        .orderBy("op", "nationkey")
    }),

    // Rollup aggregation (grouping sets).
    "q06_rollup" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),

    // JSON extraction from the events.props payload.
    "q07_json" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t(s, dir, "events")
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("k")).as("min_k"), max(col("k")).as("max_k"))
        .orderBy("event_type")
    }),

    // String function coverage over part names.
    "q08_strings" -> ((s, dir) => {
      t(s, dir, "part")
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          length(col("p_name")).as("nlen"),
          regexp_replace(col("p_type"), " ", "_").as("type_u"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          substring(col("p_name"), 1, 5).as("prefix5"))
        .orderBy("p_partkey")
    }),

    // Date/time functions over shipdate (timestamp[ms]).
    "q09_dates" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy(date_trunc("month", col("l_shipdate")).as("ship_month"))
        .agg(count(lit(1)).as("n"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
        .withColumn("ship_year", year(col("ship_month")))
        .select("ship_month", "ship_year", "n", "first_ship", "last_ship")
        .orderBy("ship_month")
    }),

    // Exact percentiles (sort-based; identical interpolation both engines).
    "q10_percentiles" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // O14+O15 QED: query-dependent bin windows -> conjunctive bin filter.
    "o14_qed_filter" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val bounds = Qed.dimBounds(e, "embedding").orderBy("dim").collect()
        .map(r => (r.getDouble(1), r.getDouble(2)))
      val qv = e.filter(col("vec_id") === 0).head().getSeq[Float](1).map(_.toDouble)
      val r = math.max(1, (0.02 * 256).toInt) // qed.py:48
      val windows = qv.indices.map { d =>
        val (lo, hi) = bounds(d)
        val qb = if (hi == lo) 0
          else math.min(math.floor((qv(d) - lo) * 256 / (hi - lo)), 255).toInt
        (math.max(0, qb - r), math.min(255, qb + r))
      }.toArray
      e.filter(Qed.passesBins(col("embedding"), bounds, windows))
        .select("vec_id").orderBy("vec_id")
    }),

    // IVF coarse quantization: nearest-centroid assignment (argmin via the
    // top-k aggregate, k=1), centroids = first 8 vectors.
    "a03_ivf_assign" -> ((s, dir) => {
      import graft.functions.TopKByScore.top_k_by_score
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      val assigned = e.select(col("vec_id").as("query_id"), col("embedding").as("v"))
        .crossJoin(broadcast(cents))
        .select(col("query_id"),
          col("centroid_id").as("id"),
          neg_l2_float(col("v"), col("cv")).as("score"))
        .groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), 1).as("topk"))
      Ann.explodeTopK(assigned)
        .groupBy(col("id").as("centroid_id"))
        .agg(count(lit(1)).as("n_members"))
        .orderBy("centroid_id")
    }),

    // Batch session windows (30-min gap) per user — the streaming
    // sessionize operator run over bounded input.
    "s02_sessions" -> ((s, dir) => {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      t(s, dir, "events")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
        .orderBy("user_id", "session_start")
    }),

    // Containment similarity C(A,B) = |A∩B| / |A| over LSH candidate pairs
    // (asymmetric near-dup containment — catches subset duplication).
    "d04_containment" -> ((s, dir) => {
      val base = docShingles(s, dir)
        .select(col("doc_id"), col("shingles"))
      val pairs = Lsh.candidatePairs(lshIndex(s, dir))
      val sa = base.select(col("doc_id").as("a"), col("shingles").as("sh_a"))
      val sb = base.select(col("doc_id").as("b"), col("shingles").as("sh_b"))
      pairs.join(sa, "a").join(sb, "b")
        .withColumn("containment",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(col("sh_a")).cast("double"))
        .filter(col("containment") >= 0.8)
        .select("a", "b", "containment")
        .orderBy("a", "b")
    }),

    // String aggregation: ordered concatenation per group.
    "q11_string_agg" -> ((s, dir) => {
      t(s, dir, "nation")
        .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(array_join(array_sort(collect_list(col("n_name"))), ",").as("nations"),
          count(lit(1)).as("n"))
        .orderBy("r_name")
    }),

    // ANN scale path end-to-end: IVF search (centroids = first 8 vectors,
    // nprobe=3), rank-only output.
    "a04_ivf_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
      Ann.ivfTopK(e, cents, e.filter(col("vec_id") < 10), k = 5, nprobe = 3)
        .orderBy("query_id", "rank")
    }),

    // ANN: brute-force cosine top-k over embeddings.
    "a01_cosine_topk" -> ((s, dir) => {
      val e = t(s, dir, "embeddings")
      Ann.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5, cosine_sim)
        .orderBy("query_id", "rank")
    }),

    // ANN scale path: random-hyperplane LSH bucket assignment.
    "a02_rhp_bucket" -> ((s, dir) => {
      t(s, dir, "embeddings")
        .select(col("vec_id"), Ann.rhpBucket(col("embedding"), planes = 8).as("bucket"))
        .orderBy("vec_id")
    }),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_lineitem_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty,
        |  CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_revenue_by_nation" ->
      """SELECT n_name,
        |  CAST(sum(l_extendedprice::DECIMAL(18,2) * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6))) AS DOUBLE) AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q03_top_orders_per_cust" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "o02_shingles" ->
      (duckShingleSql +
        """
          |SELECT doc_id, len(shingles) AS n_shingles,
          |  list_aggregate(shingles, 'min') AS sh_min,
          |  list_aggregate(shingles, 'max') AS sh_max
          |FROM sh ORDER BY doc_id""".stripMargin),

    "o03_char_shingles" ->
      """WITH cs AS (
        |  SELECT doc_id, CASE WHEN length(text) < 5 THEN [text]
        |    ELSE list_distinct([substr(text, i, 5) for i in range(1, length(text)-5+2)]) END AS g
        |  FROM documents
        |)
        |SELECT doc_id, len(g) AS n_grams,
        |  list_aggregate(g, 'min') AS g_min,
        |  list_aggregate(g, 'max') AS g_max
        |FROM cs ORDER BY doc_id""".stripMargin,

    "o04_minhash_md5" ->
      (duckSigSql +
        """
          |SELECT doc_id, s[1] AS sig_first, s[64] AS sig_mid, s[128] AS sig_last,
          |  list_reduce(s, (a,b) -> xor(a,b)) AS sig_xor
          |FROM sig ORDER BY doc_id""".stripMargin),

    "o08_lsh_bands" ->
      (duckBandsSql +
        """
          |SELECT band, count(DISTINCT key) AS n_buckets, count(*) AS n_postings
          |FROM bands GROUP BY band ORDER BY band""".stripMargin),

    "o09_lsh_candidates" ->
      (duckBandsSql +
        """
          |SELECT q.doc_id AS query_id, count(DISTINCT o.doc_id) AS n_candidates
          |FROM bands q JOIN bands o ON q.band = o.band AND q.key = o.key
          |WHERE q.doc_id < 10
          |GROUP BY q.doc_id ORDER BY query_id""".stripMargin),

    "o10_est_jaccard_pairs" ->
      (duckBandsSql +
        s"""
           |, pairs AS (
           |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
           |  WHERE l.doc_id < r.doc_id
           |)
           |SELECT p.a, p.b, ${duckEstJacc("sa.s", "sb.s")} AS score
           |FROM pairs p JOIN sig sa ON sa.doc_id = p.a JOIN sig sb ON sb.doc_id = p.b
           |WHERE ${duckEstJacc("sa.s", "sb.s")} >= 0.5
           |ORDER BY a, b""".stripMargin),

    "o11_lsh_topk" ->
      (duckLshTopKSql(10) +
        """
          |SELECT query_id, rank, id, score FROM lsh_topk ORDER BY query_id, rank""".stripMargin),

    "o12_padding" ->
      (duckLshTopKSql(10) +
        """
          |, arr AS (
          |  SELECT query_id, list(id ORDER BY rank) AS ids FROM lsh_topk GROUP BY query_id
          |), padded AS (
          |  SELECT query_id,
          |    list_concat(ids, list_transform(range(1, 5 - len(ids) + 1), i -> -1::BIGINT)) AS p
          |  FROM arr
          |)
          |SELECT query_id, i - 1 AS pos, p[i] AS id
          |FROM padded CROSS JOIN (SELECT unnest(range(1, 6)) AS i) ix
          |WHERE i <= len(p)
          |ORDER BY query_id, pos""".stripMargin),

    "o13_histogram" ->
      """WITH dims AS (
        |  SELECT d.dim AS dim, embedding[d.dim + 1]::DOUBLE AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
        |), bounds AS (
        |  SELECT dim, min(v) AS lo, max(v) AS hi FROM dims GROUP BY dim
        |)
        |SELECT d.dim AS dim, CASE WHEN b.hi = b.lo THEN 0
        |  ELSE least(floor((d.v - b.lo) * 256 / (b.hi - b.lo)), 255)::INT END AS bucket,
        |  count(*) AS cnt
        |FROM dims d JOIN bounds b ON d.dim = b.dim
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "o16_l2_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, o.vec_id AS id,
        |    -sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(o.embedding)+1),
        |      i -> (o.embedding[i]::DOUBLE - q.embedding[i]::DOUBLE) * (o.embedding[i]::DOUBLE - q.embedding[i]::DOUBLE))), (a, v) -> a + v)) AS score
        |  FROM embeddings o CROSS JOIN embeddings q WHERE q.vec_id < 5
        |)
        |SELECT query_id, rank, id FROM (
        |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
        |  FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "o25_metrics" ->
      (duckLshTopKSql(20) + duckBruteTopKSql(20) +
        """
          |, pred AS (SELECT query_id, list(id ORDER BY rank) AS ids FROM lsh_topk GROUP BY query_id)
          |, tr AS (SELECT query_id, list(id ORDER BY rank) AS ids FROM brute_topk GROUP BY query_id)
          |SELECT p.query_id,
          |  len(list_distinct(p.ids)) AS n_pred,
          |  len(list_intersect(p.ids, t.ids)) AS n_hits,
          |  (SELECT min(i) FROM unnest(range(1, len(p.ids)+1)) AS u(i)
          |   WHERE list_contains(t.ids, p.ids[i])) AS first_hit_rank
          |FROM pred p JOIN tr t ON p.query_id = t.query_id
          |ORDER BY p.query_id""".stripMargin),

    "o30_inspect" ->
      """SELECT lang, count(*) AS n, min(n_chars) AS min_chars,
        |  max(n_chars) AS max_chars, count(DISTINCT source) AS n_sources
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q04_semi_anti" ->
      """SELECT c_mktsegment, 'with_orders' AS grp, count(*) AS n
        |FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |UNION ALL
        |SELECT c_mktsegment, 'without_orders' AS grp, count(*) AS n
        |FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment, grp""".stripMargin,

    "q05_setops" ->
      """SELECT nationkey, 'intersect' AS op FROM
        |  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'union' AS op FROM
        |  (SELECT c_nationkey AS nationkey FROM customer UNION SELECT s_nationkey FROM supplier)
        |UNION ALL
        |SELECT nationkey, 'except' AS op FROM
        |  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        |ORDER BY op, nationkey""".stripMargin,

    "q06_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS rf, coalesce(l_linestatus, 'ALL') AS ls,
        |  count(*) AS n, CAST(sum(l_quantity::DECIMAL(18,2)) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY rf, ls""".stripMargin,

    "q07_json" ->
      """SELECT event_type, count(*) AS n,
        |  sum(json_extract_string(props, '$.k')::BIGINT) AS sum_k,
        |  min(json_extract_string(props, '$.k')::BIGINT) AS min_k,
        |  max(json_extract_string(props, '$.k')::BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q08_strings" ->
      """SELECT p_partkey, upper(p_name) AS uname, length(p_name) AS nlen,
        |  replace(p_type, ' ', '_') AS type_u,
        |  lpad(p_brand, 12, '*') AS brand_pad,
        |  substr(p_name, 1, 5) AS prefix5
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""".stripMargin,

    "q09_dates" ->
      """SELECT date_trunc('month', l_shipdate) AS ship_month,
        |  year(date_trunc('month', l_shipdate))::INT AS ship_year,
        |  count(*) AS n, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
        |FROM lineitem GROUP BY 1 ORDER BY ship_month""".stripMargin,

    "q10_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS p50,
        |  quantile_cont(l_extendedprice, 0.9) AS p90,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "d02_dedup_groups" ->
      (duckBandsSql +
        s"""
           |, pairs AS (
           |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
           |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
           |  WHERE l.doc_id < r.doc_id
           |), scored AS (
           |  SELECT p.a, p.b FROM pairs p
           |  JOIN sig sa ON sa.doc_id = p.a JOIN sig sb ON sb.doc_id = p.b
           |  WHERE ${duckEstJacc("sa.s", "sb.s")} >= 0.9
           |), edges AS (
           |  SELECT a AS doc, b AS peer FROM scored
           |  UNION ALL SELECT b AS doc, a AS peer FROM scored
           |)
           |SELECT doc, least(min(peer), doc) AS label
           |FROM edges GROUP BY doc ORDER BY doc""".stripMargin),

    "o14_qed_filter" ->
      """WITH dims AS (
        |  SELECT vec_id, d.dim AS dim, embedding[d.dim + 1]::DOUBLE AS v
        |  FROM embeddings CROSS JOIN (SELECT unnest(range(0, 64)) AS dim) d
        |), bounds AS (
        |  SELECT dim, min(v) AS lo, max(v) AS hi FROM dims GROUP BY dim
        |), qd AS (
        |  SELECT d.dim AS dim,
        |    CASE WHEN b.hi = b.lo THEN 0
        |      ELSE least(floor((d.v - b.lo) * 256 / (b.hi - b.lo)), 255)::INT END AS qb
        |  FROM dims d JOIN bounds b ON d.dim = b.dim WHERE d.vec_id = 0
        |), sel AS (
        |  SELECT dim, greatest(qb - 5, 0) AS wlo, least(qb + 5, 255) AS whi FROM qd
        |)
        |SELECT d.vec_id AS vec_id
        |FROM dims d JOIN bounds b ON d.dim = b.dim JOIN sel s ON d.dim = s.dim
        |GROUP BY d.vec_id
        |HAVING bool_and(
        |  (CASE WHEN b.hi = b.lo THEN 0
        |    ELSE least(floor((d.v - b.lo) * 256 / (b.hi - b.lo)), 255)::INT END)
        |  BETWEEN s.wlo AND s.whi)
        |ORDER BY vec_id""".stripMargin,

    "a03_ivf_assign" ->
      """WITH scored AS (
        |  SELECT e.vec_id AS query_id, c.vec_id AS centroid_id,
        |    -sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(e.embedding)+1),
        |      i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE) * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE))), (a, v) -> a + v)) AS score
        |  FROM embeddings e CROSS JOIN embeddings c WHERE c.vec_id < 8
        |), best AS (
        |  SELECT query_id, centroid_id FROM (
        |    SELECT query_id, centroid_id,
        |      row_number() OVER (PARTITION BY query_id ORDER BY score DESC, centroid_id) AS rn
        |    FROM scored) WHERE rn = 1
        |)
        |SELECT centroid_id, count(*) AS n_members FROM best
        |GROUP BY centroid_id ORDER BY centroid_id""".stripMargin,

    "o26_metrics_summary" ->
      (duckLshTopKSql(20) + duckBruteTopKSql(20) +
        """
          |, pred AS (SELECT query_id, list(id ORDER BY rank) AS ids FROM lsh_topk GROUP BY query_id)
          |, tr AS (SELECT query_id, list(id ORDER BY rank) AS ids FROM brute_topk GROUP BY query_id)
          |, pq AS (
          |  SELECT p.query_id,
          |    len(list_distinct(p.ids)) AS n_pred,
          |    len(list_intersect(p.ids, t.ids)) AS n_hits
          |  FROM pred p JOIN tr t ON p.query_id = t.query_id
          |)
          |SELECT count(*) AS n_queries, sum(n_hits)::BIGINT AS sum_hits,
          |  sum(n_pred)::BIGINT AS sum_pred,
          |  sum(n_hits)::DOUBLE / (count(*) * 5)::DOUBLE AS recall_at_k,
          |  sum(n_hits)::DOUBLE / sum(n_pred)::DOUBLE AS precision_micro
          |FROM pq""".stripMargin),

    "s02_sessions" ->
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |      OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) >= INTERVAL '30 minutes'
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |), sess AS (
        |  SELECT user_id, ts,
        |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM marked
        |)
        |SELECT user_id, min(ts) AS session_start, count(*) AS n_events
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin,

    "d04_containment" ->
      (duckBandsSql +
        """
          |, pairs AS (
          |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
          |  FROM bands l JOIN bands r ON l.band = r.band AND l.key = r.key
          |  WHERE l.doc_id < r.doc_id
          |)
          |SELECT p.a, p.b,
          |  len(list_intersect(sa.shingles, sb.shingles))::DOUBLE / len(sa.shingles)::DOUBLE AS containment
          |FROM pairs p JOIN sh sa ON sa.doc_id = p.a JOIN sh sb ON sb.doc_id = p.b
          |WHERE len(list_intersect(sa.shingles, sb.shingles))::DOUBLE / len(sa.shingles)::DOUBLE >= 0.8
          |ORDER BY a, b""".stripMargin),

    "q11_string_agg" ->
      """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations, count(*) AS n
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "a04_ivf_topk" ->
      """WITH assigned AS (
        |  SELECT id, centroid_id FROM (
        |    SELECT e.vec_id AS id, c.vec_id AS centroid_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        -sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(e.embedding)+1),
        |          i -> (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE) * (e.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE))), (a, v) -> a + v)) DESC,
        |        c.vec_id) AS rn
        |    FROM embeddings e CROSS JOIN embeddings c WHERE c.vec_id < 8
        |  ) WHERE rn = 1
        |), probes AS (
        |  SELECT qid, centroid_id FROM (
        |    SELECT q.vec_id AS qid, c.vec_id AS centroid_id,
        |      row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |        -sqrt(list_reduce(list_prepend(0.0, list_transform(range(1, len(q.embedding)+1),
        |          i -> (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE) * (q.embedding[i]::DOUBLE - c.embedding[i]::DOUBLE))), (a, v) -> a + v)) DESC,
        |        c.vec_id) AS rn
        |    FROM embeddings q CROSS JOIN embeddings c WHERE c.vec_id < 8 AND q.vec_id < 10
        |  ) WHERE rn <= 3
        |), scored AS (
        |  SELECT p.qid AS query_id, a.id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(m.embedding)+1),
        |      i -> m.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)), (x, v) -> x + v)
        |    / sqrt(
        |      list_reduce(list_prepend(0.0, list_transform(range(1, len(m.embedding)+1),
        |        i -> m.embedding[i]::DOUBLE * m.embedding[i]::DOUBLE)), (x, v) -> x + v)
        |      * list_reduce(list_prepend(0.0, list_transform(range(1, len(q.embedding)+1),
        |        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)), (x, v) -> x + v)) AS score
        |  FROM probes p
        |  JOIN assigned a ON a.centroid_id = p.centroid_id
        |  JOIN embeddings m ON m.vec_id = a.id
        |  JOIN embeddings q ON q.vec_id = p.qid
        |)
        |SELECT query_id, rank, id FROM (
        |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
        |  FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "d01_dedup_exact" ->
      """SELECT md5(text) AS text_hash, count(*) AS cnt, min(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) ORDER BY text_hash""".stripMargin,

    "d03_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, $duckToks AS t FROM documents
         |), h AS (
         |  SELECT doc_id, list_transform(t, s -> ${duckMd5Mod("s")}) AS hs FROM toks
         |)
         |SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
         |  [ CASE WHEN list_reduce(list_prepend(0, list_transform(hs, x -> CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)), (a, v) -> a + v) > 0
         |    THEN (1::BIGINT << b) ELSE 0::BIGINT END for b in range(0, 61) ]), (a, v) -> a + v) AS fp
         |FROM h ORDER BY doc_id""".stripMargin,

    "t01_text_analysis" -> duckTextAnalysisSql,

    "t02_word_freq" ->
      """SELECT token, count(*) AS cnt FROM (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS token
        |  FROM documents
        |) GROUP BY token ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    "s01_events_hourly" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS hour_start, event_type,
        |  count(*) AS n_events,
        |  CAST(sum(value::DECIMAL(18,2)) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour_start, event_type""".stripMargin,

    "a01_cosine_topk" ->
      """WITH scored AS (
        |  SELECT q.vec_id AS query_id, o.vec_id AS id,
        |    list_reduce(list_prepend(0.0, list_transform(range(1, len(o.embedding)+1),
        |      i -> o.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)), (a, v) -> a + v)
        |    / sqrt(
        |      list_reduce(list_prepend(0.0, list_transform(range(1, len(o.embedding)+1),
        |        i -> o.embedding[i]::DOUBLE * o.embedding[i]::DOUBLE)), (a, v) -> a + v)
        |      * list_reduce(list_prepend(0.0, list_transform(range(1, len(q.embedding)+1),
        |        i -> q.embedding[i]::DOUBLE * q.embedding[i]::DOUBLE)), (a, v) -> a + v)) AS score
        |  FROM embeddings o CROSS JOIN embeddings q WHERE q.vec_id < 10
        |)
        |SELECT query_id, rank, id FROM (
        |  SELECT query_id, id, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, id) AS rank
        |  FROM scored) WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "a02_rhp_bucket" ->
      s"""WITH ${duckRhpSql(8)}
         |SELECT vec_id, bucket FROM rhp ORDER BY vec_id""".stripMargin,
  )

  /** DuckDB reimplementation of TextAnalysis.analyze — identical
    * expression order for every floating-point step. */
  private def duckTextAnalysisSql: String = {
    val langs = TextAnalysis.stopwords.keys.toSeq.sorted
    def swList(l: String) =
      TextAnalysis.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    val ratios = langs.map { l =>
      s"CASE WHEN len(t) = 0 THEN 0.0 ELSE len(list_filter(t, x -> list_contains(${swList(l)}, x)))::DOUBLE / len(t)::DOUBLE END AS r_$l"
    }.mkString(",\n    ")
    val best = s"greatest(${langs.map(l => s"r_$l").mkString(", ")})"
    val pick = langs.reverse.foldLeft("'und'") { (acc, l) =>
      s"CASE WHEN r_$l = best AND best > 0 THEN '$l' ELSE $acc END"
    }
    s"""WITH toks AS (
       |  SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
       |  FROM documents
       |), feats AS (
       |  SELECT doc_id, text, t,
       |    $ratios,
       |    length(text)::DOUBLE AS n_chars,
       |    length(regexp_replace(text, '[^A-Za-z]', '', 'g'))::DOUBLE AS letters,
       |    length(regexp_replace(text, '[^.,;:!?''"]', '', 'g'))::DOUBLE AS punct,
       |    CASE WHEN len(t) = 0 THEN 0.0
       |      ELSE list_reduce(list_prepend(0::BIGINT, list_transform(t, x -> length(x)::BIGINT)), (a, v) -> a + v)::DOUBLE / len(t)::DOUBLE END AS mean_tok_len
       |  FROM toks
       |), scored AS (
       |  SELECT doc_id, $best AS best, *,
       |    CASE WHEN n_chars = 0 THEN 0.0 ELSE
       |      0.4 * (letters / n_chars) + 0.3 * least(mean_tok_len / 10.0, 1.0) + 0.3 * (1.0 - punct / n_chars)
       |    END AS quality
       |  FROM feats
       |)
       |SELECT doc_id,
       |  $pick AS lang_pred,
       |  quality,
       |  len(t) AS n_tokens,
       |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_subwords,
       |  list_reduce(list_prepend(0::BIGINT, list_transform(t, s -> ${duckMd5Mod("s")})), (acc, h) -> ((acc::HUGEINT * 1000003 + h) % ${Prime}::HUGEINT)::BIGINT) AS fingerprint
       |FROM scored ORDER BY doc_id""".stripMargin
  }
}
