package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Search-quality metrics (reference: benchmarks/benchmark_runner.py:71-103
  * — O25 recall@k, O26 precision@k, O27 MRR). Inputs are result tables
  * (query_id, ids array<long>) for predictions and ground truth.
  *
  * Per-query outputs are kept as exact integers (hit counts, first-hit
  * rank) so cross-engine comparison is bit-exact; the means the reference
  * reports are one exact division away.
  */
object Metrics {

  /** Per-query metric counters: (query_id, n_pred, n_hits, first_hit_rank)
    * where first_hit_rank is 1-based, null if no prediction is in truth. */
  def perQuery(pred: DataFrame, truth: DataFrame): DataFrame = {
    val p = pred.select(col("query_id"), col("ids").as("pred_ids"))
    val t = truth.select(col("query_id"), col("ids").as("truth_ids"))
    p.join(t, "query_id")
      .select(
        col("query_id"),
        size(array_distinct(col("pred_ids"))).as("n_pred"),
        size(array_intersect(col("pred_ids"), col("truth_ids"))).as("n_hits"),
        // first 1-based position i where pred[i] ∈ truth (MRR numerator)
        array_min(filter(
          zip_with(col("pred_ids"),
            sequence(lit(1), size(col("pred_ids"))),
            (id, pos) => when(array_contains(col("truth_ids"), id), pos)),
          x => x.isNotNull)).as("first_hit_rank"))
  }

  /** Aggregate metrics exactly as the reference defines them:
    * recall@k = avg(|pred ∩ truth| / k), precision = avg(|∩| / |pred|),
    * mrr = avg(1/first_hit_rank, 0 when none). */
  def summary(pred: DataFrame, truth: DataFrame, k: Int): DataFrame =
    perQuery(pred, truth).agg(
      (sum(col("n_hits")).cast("double") / (count(lit(1)) * k).cast("double")).as("recall_at_k"),
      avg(col("n_hits").cast("double") / col("n_pred").cast("double")).as("precision_at_k"),
      avg(coalesce(lit(1.0) / col("first_hit_rank").cast("double"), lit(0.0))).as("mrr"))
}
