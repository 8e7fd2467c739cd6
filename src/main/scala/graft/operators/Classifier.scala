package graft.operators

import graft.functions.GraftFunctions.text_stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Learned (model-based) quality filter — the CCNet/GPT-3-style second
  * stage after rule filters: train a linear classifier on a cheap proxy
  * label, score every document, keep the top slice by score. The sandbox
  * proxy label is the engine's own Gopher-style rule (TextAnalysis
  * .qualityFilter's conjunction, re-derived here over raw-token integer
  * stats); in production the same plumbing trains against "docs from a
  * trusted corpus = positive" or LLM-judged labels.
  *
  * The model is a diagonal-covariance Fisher / Rocchio-style linear
  * discriminant: w_j = (mean_pos_j - mean_neg_j) / var_j over six
  * integer document features, with the keep cutoff prior-matched (keep
  * exactly as many documents as the training label marks positive, in
  * (score desc, id) order) — the standard "keep the top X% by
  * classifier score" filter shape.
  *
  * EXACT ARITHMETIC, BY DESIGN: features are integers, training is ONE
  * aggregation pass of BIGINT sums (order-free, so partition layout
  * can't change the model — unlike float-sum training), and the fitted
  * weights are integer fixed-point (2^-16) with truncating division.
  * The DuckDB oracle (SparkEntry u08) re-derives the ENTIRE model —
  * sums, variances, weights, scores, cutoff — bit-for-bit from the same
  * parquet: a full-derivation gate like a05's k-means, not a
  * pinned-constant gate. This is why the trainer is not MLlib
  * LogisticRegression: LBFGS float iterates cannot be replayed exactly
  * by an independent engine, and a correctness gate that can't replay
  * the fit pins nothing. (MLlib baselines live in a18/a19 where the
  * library IS the thing being measured.)
  *
  * Scale shape (100 TB): feature extraction is a pure projection (one
  * codegen kernel pass, no shuffle); training is one map-side-combined
  * hash aggregate to a single 20-number row; scoring is a broadcast-free
  * literal projection; the prior-matched cutoff uses the same two-phase
  * bucket-prefix rank as Sampling.budgetSample — a window over the
  * ~thousands-row per-bucket aggregate plus a window partitioned by
  * score BUCKET, so no whole-corpus single-task sort ever forms. The
  * features scan runs twice (train + score); a production caller
  * persists `labeledFeatures` between the passes.
  */
object Classifier {

  /** Fixed-point scale for class means and weights (2^16). */
  val FP: Long = 1L << 16

  /** Number of (non-bias) features; columns x1..x6. */
  val NumFeatures: Int = 6

  /** Per-document integer features + the proxy label, one kernel pass.
    * Raw stats come from Kernels.textStats ([ntok, ndis, topcnt, nchars,
    * letters, punct, sumlen]); each feature is quantized to [0, 128] by
    * integer division so training sums stay exact and overflow-safe at
    * any corpus size (x <= 128, x^2 <= 16384: 10^12 docs fit in BIGINT).
    * The label re-states the Gopher-style conjunction (token count in
    * [16, 1000], composite quality >= 0.5, top-token fraction <= 0.2,
    * distinct ratio >= 0.3) over these raw stats with the exact double
    * arithmetic the DuckDB twin runs. Output: (id, label, x1..x6). */
  def labeledFeatures(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    docs
      .select(col(idCol),
        text_stats(coalesce(col(textCol), lit(""))).as("_st"))
      .select(col(idCol),
        element_at(col("_st"), 1).as("ntok"),
        element_at(col("_st"), 2).as("ndis"),
        element_at(col("_st"), 3).as("topcnt"),
        element_at(col("_st"), 4).as("nchars"),
        element_at(col("_st"), 5).as("letters"),
        element_at(col("_st"), 6).as("punct"),
        element_at(col("_st"), 7).as("sumlen"))
      .selectExpr(idCol,
        // the proxy label: Gopher-ish rule over the same raw stats —
        // every division is integer/integer in DOUBLE, bit-identical to
        // the oracle's ::DOUBLE casts
        """CASE WHEN ntok >= 16 AND ntok <= 1000
          |  AND (CASE WHEN nchars = 0 THEN 0.0D ELSE
          |        0.4D * (CAST(letters AS DOUBLE) / CAST(nchars AS DOUBLE))
          |      + 0.3D * least((CAST(sumlen AS DOUBLE) / CAST(ntok AS DOUBLE)) / 10.0D, 1.0D)
          |      + 0.3D * (1.0D - CAST(punct AS DOUBLE) / CAST(nchars AS DOUBLE)) END) >= 0.5D
          |  AND CAST(topcnt AS DOUBLE) / CAST(ntok AS DOUBLE) <= 0.2D
          |  AND CAST(ndis AS DOUBLE) / CAST(ntok AS DOUBLE) >= 0.3D
          |THEN 1 ELSE 0 END AS label""".stripMargin,
        "least(ntok, 128) AS x1",
        "CASE WHEN ntok = 0 THEN 0L ELSE (ndis * 64) div ntok END AS x2",
        "CASE WHEN ntok = 0 THEN 0L ELSE (topcnt * 64) div ntok END AS x3",
        "CASE WHEN nchars = 0 THEN 0L ELSE (letters * 64) div nchars END AS x4",
        "CASE WHEN nchars = 0 THEN 0L ELSE (punct * 64) div nchars END AS x5",
        "CASE WHEN ntok = 0 THEN 0L ELSE least((sumlen * 8) div ntok, 64L) END AS x6")

  /** The fitted model: integer fixed-point weights (units 2^-16 per raw
    * feature unit), the positive count (= the keep quota) and the
    * training row count. */
  final case class Model(w: Array[Long], nPos: Long, n: Long)

  /** ONE aggregation pass -> the fitted discriminant. Per feature j:
    * var_j  = max(sum(x^2)//n - (sum(x)//n)^2, 1)   (integer, truncated)
    * mpos_j = (sum_pos(x) * 2^16) // nPos
    * mneg_j = (sum_neg(x) * 2^16) // nNeg
    * w_j    = (mpos_j - mneg_j) / var_j              (truncating division)
    * All sums are exact BIGINTs, so the model is independent of
    * partitioning and replayable by the oracle. Requires both classes
    * present (a single-class corpus has nothing to separate). */
  def train(feat: DataFrame): Model = {
    val aggs =
      Seq(count(lit(1)).as("n"), sum(col("label").cast("long")).as("npos")) ++
        (1 to NumFeatures).flatMap { j =>
          Seq(sum(col(s"x$j")).as(s"s$j"),
            sum(col(s"x$j") * col(s"x$j")).as(s"q$j"),
            sum(when(col("label") === 1, col(s"x$j")).otherwise(0L)).as(s"p$j"))
        }
    val r = feat.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getAs[Long]("n")
    val nPos = r.getAs[Long]("npos")
    val nNeg = n - nPos
    require(nPos > 0 && nNeg > 0,
      s"classifier training needs both classes (nPos=$nPos of n=$n)")
    val w = (1 to NumFeatures).map { j =>
      val s = r.getAs[Long](s"s$j")
      val q = r.getAs[Long](s"q$j")
      val p = r.getAs[Long](s"p$j")
      val v = math.max(q / n - (s / n) * (s / n), 1L)
      val mPos = p * FP / nPos // non-negative: / is floor = trunc
      val mNeg = (s - p) * FP / nNeg
      val d = mPos - mNeg
      if (d >= 0) d / v else -((-d) / v) // truncating, sign-split like the oracle
    }.toArray
    Model(w, nPos, n)
  }

  /** Score every document and keep the top `model.nPos` by
    * (score desc, id asc) — the prior-matched cutoff. Exact global rank
    * WITHOUT a whole-corpus window: scores coarsen to buckets
    * (arithmetic shift — floor, monotone in score), per-bucket counts
    * prefix-sum through a window over the tiny bucket aggregate, and the
    * in-bucket rank is a window partitioned by BUCKET (never the whole
    * corpus in one task). Output: (id, label, score, keep). */
  def scoreFilter(feat: DataFrame, model: Model,
                  idCol: String = "doc_id"): DataFrame = {
    val score = (1 to NumFeatures)
      .map(j => lit(model.w(j - 1)) * col(s"x$j"))
      .reduce(_ + _)
    Sampling.globalRank(feat.withColumn("score", score), "score", idCol)
      .withColumn("keep", col("_rank") <= lit(model.nPos))
      .select(col(idCol), col("label"), col("score"), col("keep"))
  }

  /** End-to-end: features -> one-pass fit -> prior-matched filter.
    * The features frame is materialized ONCE (eager localCheckpoint of
    * the narrow (id, label, x1..x6) projection): left lazy, the
    * text_stats kernel pass over the corpus ran three times per call —
    * the training aggregate, the scored side of the rank, and the
    * bucket-count side of the rank (no ReusedExchange fires across
    * those subtrees) — measured 2.3s -> 1.4s at sf0.1. At cluster scale
    * swap for persist()/checkpoint on a reliable store; the frame is
    * 8 longs per doc either way. */
  def qualityClassifier(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val feat = labeledFeatures(docs, idCol, textCol).localCheckpoint(true)
    scoreFilter(feat, train(feat), idCol)
  }
}
