package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** O28 benchmark report: the reference's `results_synthetic.csv` shape
  * (benchmark_runner.py:133-248) — one row per method with retrieval
  * metrics against a shared ground truth plus wall-clock latency and
  * derived throughput. */
object BenchReport {
  case class MethodRun(method: String, pred: DataFrame, latencySec: Double, nQueries: Int)

  /** Build the report table from per-method prediction result sets
    * (query_id, ids array<long>) and a shared `truth`. */
  def report(spark: SparkSession, runs: Seq[MethodRun], truth: DataFrame, k: Int): DataFrame = {
    import spark.implicits._
    runs.map { r =>
      val m = Metrics.summary(r.pred, truth, k).head()
      val perQueryMs = r.latencySec * 1000.0 / r.nQueries
      (r.method, m.getDouble(0), m.getDouble(1), m.getDouble(2),
        perQueryMs, if (r.latencySec > 0) r.nQueries / r.latencySec else 0.0)
    }.toDF("method", "recall_at_k", "precision_at_k", "mrr",
      "latency_ms", "throughput_qps")
  }

  /** Write as a single CSV with header (the reference's sink,
    * benchmark_runner.py:248). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
}
