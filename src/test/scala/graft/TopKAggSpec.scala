package graft

import graft.functions.TopKByScore.top_k_by_score
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TopKByScore aggregate: equivalence with the window row_number form,
  * partial/merge correctness across partitions, tie-break (score desc,
  * id asc), and under-full groups. */
class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("matches window top-k on random data across many partitions") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(50) / 10.0, i.toLong))
    val df = rows.toDF("query_id", "score", "id").repartition(13).cache()

    val agg = graft.operators.Ann.explodeTopK(
      df.groupBy("query_id").agg(top_k_by_score(col("score"), col("id"), 7).as("topk")))
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("id"))
    val win = df.withColumn("rank", row_number().over(w)).filter(col("rank") <= 7)
      .select("query_id", "rank", "id").orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    assert(agg.toSeq == win.toSeq)
  }

  test("groups smaller than k return all rows, sorted") {
    val df = Seq((1L, 0.5, 10L), (1L, 0.9, 11L), (2L, 0.1, 20L))
      .toDF("query_id", "score", "id")
    val out = graft.operators.Ann.explodeTopK(
      df.groupBy("query_id").agg(top_k_by_score(col("score"), col("id"), 5).as("topk")))
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 1, 11L), (1L, 2, 10L), (2L, 1, 20L)))
  }

  test("ties broken by smaller id") {
    val df = Seq((1L, 1.0, 30L), (1L, 1.0, 10L), (1L, 1.0, 20L))
      .toDF("query_id", "score", "id")
    val out = graft.operators.Ann.explodeTopK(
      df.groupBy("query_id").agg(top_k_by_score(col("score"), col("id"), 2).as("topk")))
      .orderBy("rank").collect().map(_.getLong(2))
    assert(out.toSeq == Seq(10L, 20L))
  }

  test("distinct variant equals distinct-then-top-k when duplicates score identically") {
    import graft.functions.TopKByScore.top_k_by_score_distinct
    // the LSH shape: each (query_id, id) appears 1..32 times (band
    // duplication) with an identical score — scattered across partitions
    // so dedup must hold through partial buffers AND merge
    val rnd = new scala.util.Random(7)
    val base = for (q <- 0L until 10L; id <- 0L until 200L)
      yield (q, (rnd.nextInt(100) / 100.0, id))
    val dup = base.flatMap { case (q, (s, id)) =>
      Seq.fill(1 + rnd.nextInt(5))((q, s, id))
    }
    val df = dup.toDF("query_id", "score", "id").repartition(17).cache()

    val viaDistinctAgg = graft.operators.Ann.explodeTopK(
      df.groupBy("query_id")
        .agg(top_k_by_score_distinct(col("score"), col("id"), 7).as("topk")))
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    val viaDedupFirst = graft.operators.Ann.explodeTopK(
      df.distinct().groupBy("query_id")
        .agg(top_k_by_score(col("score"), col("id"), 7).as("topk")))
      .orderBy("query_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))

    assert(viaDistinctAgg.toSeq == viaDedupFirst.toSeq)
  }
}
