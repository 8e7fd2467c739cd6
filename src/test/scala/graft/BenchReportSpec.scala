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

  test("ANN method family report: exact truth vs ivf vs pq vs ivfpq") {
    val embs = spark.read.parquet(s"$testDataDir/embeddings.parquet").cache()
    val eng = graft.api.VectorEngine.build(embs).warmUp()
    val queries = embs.filter(col("vec_id") < 10)
    def asPred(df: org.apache.spark.sql.DataFrame) = df
      .groupBy("query_id")
      .agg(transform(array_sort(collect_list(struct(col("rank"), col("id")))),
        x => x.getField("id")).as("ids"))
    def timedRun(name: String, mode: String): BenchReport.MethodRun = {
      val t0 = System.nanoTime()
      val res = eng.topK(queries, k = 5, mode = mode)
      res.count()
      BenchReport.MethodRun(name, asPred(res), (System.nanoTime() - t0) / 1e9, 10)
    }
    val truthRun = timedRun("exact", "exact")
    val runs = Seq(truthRun, timedRun("ivf", "ivf"),
      timedRun("pq", "pq"), timedRun("ivfpq", "ivfpq"))
    val rep = BenchReport.report(spark, runs, truthRun.pred, k = 5)
    val rows = rep.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rows("exact") == 1.0)                 // truth against itself
    assert(rows.keySet == Set("exact", "ivf", "pq", "ivfpq"))
    // pruned/compressed methods trade recall, but must beat random (~1%)
    assert(rows("ivf") > 0.2 && rows("pq") > 0.2 && rows("ivfpq") > 0.1,
      rows.toString)
  }
}
