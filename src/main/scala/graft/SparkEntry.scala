package graft

import graft.core.{Lsh, MinHashCoefficients, MinHashPipeline, Shingling}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 (or a
  * training-data-pipeline extension) expressed Spark-first; `oracleSql` is
  * the DuckDB-equivalent ANSI SQL the driver checks it against at sf0.01.
  *
  * Numeric convention: aggregates computed in exact DECIMAL and cast to
  * DOUBLE at the end, so both engines produce bit-identical values
  * regardless of summation order.
  */
object SparkEntry {
  /** Word-shingle size used by the document pipeline queries (reference
    * default for real corpora; synth_data.py:128 uses k=3). */
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

  // ---- shared fragments -------------------------------------------------

  private def docShingles(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .withColumn("shingles", Shingling.shingles(col("text"), K, byWord = true))

  /** DuckDB expression fragments mirroring the Spark pipeline. */
  private val duckToks =
    "list_filter(string_split_regex(text, '\\s+'), x -> x <> '')"
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

    // Multi-way join + agg: dims broadcast, fact shuffles once (SURVEY §2.1 joins).
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

    // Window top-k per group (O11's per-query top-k shape; SURVEY §2.1 windows).
    "q03_top_orders_per_cust" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
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

    // O3+O4+O5 MinHash signatures (md5 hash family — cross-engine oracle;
    // the reference SHA-1 family is golden-tested in MinHashGoldenSpec).
    "o04_minhash_md5" -> ((s, dir) => {
      docShingles(s, dir)
        .withColumn("sig", minhash_signature(shingle_hashes_md5(col("shingles"))))
        .select(
          col("doc_id"),
          element_at(col("sig"), 1).as("sig_first"),
          element_at(col("sig"), 64).as("sig_mid"),
          element_at(col("sig"), 128).as("sig_last"),
          aggregate(col("sig"), lit(0L), (acc, x) => acc.bitwiseXOR(x)).as("sig_xor"))
        .orderBy("doc_id")
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

    "o04_minhash_md5" ->
      (duckShingleSql +
        s""", h AS (
           |  SELECT doc_id, list_transform(shingles, s -> (('0x'||substr(md5(s),1,16))::UBIGINT % ${Prime}::UBIGINT)::BIGINT) AS hs FROM sh
           |), sig AS (
           |  SELECT doc_id, [ list_min(list_transform(hs, x -> ((c.a * x::HUGEINT + c.b) % ${Prime}::HUGEINT)::BIGINT)) for c in ${duckCoefs} ] AS s
           |  FROM h
           |)
           |SELECT doc_id, s[1] AS sig_first, s[64] AS sig_mid, s[128] AS sig_last,
           |  list_reduce(s, (a,b) -> xor(a,b)) AS sig_xor
           |FROM sig ORDER BY doc_id""".stripMargin),
  )
}
