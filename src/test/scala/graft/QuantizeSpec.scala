package graft

import graft.operators.{Ann, Quantize}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Int8 scalar quantization: code bounds, reconstruction error vs the
  * per-dim scale, self-match on the quantized scan, and recall against
  * the exact float brute-force top-k. */
class QuantizeSpec extends SparkSpec {

  private lazy val embs =
    spark.read.parquet(s"$testDataDir/embeddings.parquet").cache()
  private lazy val scales = Quantize.scalesRow(embs).cache()
  private lazy val codes = Quantize.quantize(embs, scales).cache()

  test("codes stay in [-127, 127] and cover every input row") {
    val stats = codes.select(
      min(array_min(col("codes"))).as("lo"),
      max(array_max(col("codes"))).as("hi"),
      count(lit(1)).as("n")).head()
    assert(stats.getAs[Int]("lo") >= -127)
    assert(stats.getAs[Int]("hi") <= 127)
    assert(stats.getAs[Long]("n") == embs.count())
  }

  test("dequantization error per dim is at most half the dim's scale") {
    val s = scales.head().getSeq[Double](0)
    val joined = codes.join(
      embs.select(col("vec_id").cast("long").as("id"), col("embedding")), "id")
      .select(col("codes"), col("embedding")).collect()
    joined.foreach { r =>
      val c = r.getSeq[Int](0); val x = r.getSeq[Float](1)
      x.indices.foreach { i =>
        // clamped dims (|x| == corpus max) still land within scale/2
        assert(math.abs(c(i) * s(i) - x(i)) <= s(i) / 2 + 1e-9,
          s"dim $i: code ${c(i)} scale ${s(i)} x ${x(i)}")
      }
    }
  }

  test("quantized top-k ranks each query's own vector first") {
    val q = codes.filter(col("id") < 10)
    val top = Quantize.quantizedTopK(codes, scales, q, k = 5)
      .filter(col("rank") === 1).collect()
    top.foreach { r => assert(r.getLong(2) == r.getLong(0), s"query ${r.getLong(0)}") }
  }

  test("quantized top-k keeps high recall vs the exact float scan") {
    val queries = embs.filter(col("vec_id") < 20)
    val exact = Ann.bruteForceTopK(embs, queries, k = 5,
        (a, b) => graft.functions.GraftFunctions.neg_l2_float(a, b))
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val quant = Quantize.quantizedTopK(codes, scales, codes.filter(col("id") < 20), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val hits = exact.map { case (qid, rows) =>
      rows.map(_._2).toSet.intersect(quant(qid).map(_._2).toSet).size
    }.sum
    assert(hits >= 20 * 5 * 0.8, s"recall too low: $hits/100")
  }

  test("IVF over quantized codes with all clusters probed equals the full quantized scan") {
    val cents = embs.filter(col("vec_id") < 6)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val q = embs.filter(col("vec_id") < 8)
    val ivf = Quantize.ivfQuantizedTopK(embs, cents, scales, q, k = 5, nprobe = 6)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    val full = Quantize.quantizedTopK(codes, scales, codes.filter(col("id") < 8), k = 5)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.toSeq == full.toSeq)
  }

  test("quantize plan is a shuffle-free codegen projection over the scan") {
    val df = Quantize.quantize(embs, scales)
    df.collect() // materialize so AQE finalizes and codegen spans print
    val plan = df.queryExecution.executedPlan.toString
    // the corpus side must reach quantize without any hash/range shuffle;
    // the only exchange allowed is broadcasting the 1-row scales frame
    // (whose own one-time aggregation is behind the cache boundary)
    val corpusSide = plan.linesIterator.takeWhile(!_.contains("BroadcastExchange")).mkString("\n")
    assert(!corpusSide.contains("Exchange"), s"shuffle on the corpus side:\n$plan")
    // executed-plan toString renders whole-stage-codegen spans as "*(n)"
    assert(plan.contains("*(1) Project"), s"quantize not in a codegen span:\n$plan")
  }
}
