package graft

import graft.operators.BenchReport
import org.apache.spark.sql.functions._

/** O28: benchmark report in the reference's results_synthetic.csv shape,
  * comparing brute-force (=truth, perfect metrics) and LSH over the same
  * corpus queries. */
class BenchReportSpec extends SparkSpec {
  import spark.implicits._

  test("report reproduces the reference CSV shape with sane metrics") {
    val truth = Seq(
      (1L, Seq(1L, 10L, 11L)), (2L, Seq(2L, 20L, 21L))).toDF("query_id", "ids")
    val lsh = Seq(
      (1L, Seq(1L, 10L, 99L)), (2L, Seq(2L, 98L, 97L))).toDF("query_id", "ids")
    val runs = Seq(
      BenchReport.MethodRun("Brute-force", truth, latencySec = 0.026, nQueries = 2),
      BenchReport.MethodRun("LSH", lsh, latencySec = 0.012, nQueries = 2))
    val df = BenchReport.report(spark, runs, truth, k = 3)
    assert(df.columns.toSeq == Seq("method", "recall_at_k", "precision_at_k",
      "mrr", "latency_ms", "throughput_qps"))
    val rows = df.collect().map(r => r.getString(0) ->
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows("Brute-force") == ((1.0, 1.0, 1.0)))
    // LSH: q1 hits {1,10} of 3, q2 hits {2} -> recall (2+1)/6 = 0.5
    assert(rows("LSH")._1 == 0.5)
    assert(rows("LSH")._3 == 1.0) // top-1 correct both queries -> MRR 1.0

    val dir = java.nio.file.Files.createTempDirectory("graft-report").toString
    BenchReport.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
  }
}
