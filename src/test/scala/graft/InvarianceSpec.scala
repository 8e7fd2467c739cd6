package graft

import graft.core.{Lsh, MinHashPipeline}
import org.apache.spark.sql.functions._

/** The 100 TB determinism properties: results must not depend on the
  * partitioning/parallelism the cluster happens to run with, and the
  * batch probe must agree with the single-vector probe query-for-query. */
class InvarianceSpec extends SparkSpec {

  private def collectSorted(name: String): Seq[String] = {
    val df = SparkEntry.queries(name)(spark, testDataDir)
    df.collect().map(_.toString).sorted.toSeq
  }

  test("FP-heavy catalog queries are shuffle-partition invariant") {
    // order-dependent floating-point aggregation would diverge under a
    // different reducer count; these queries carry the engine's FP
    // surfaces (quality scores, decimal sums, cosine, est-Jaccard, MRR)
    val queries = Seq("q01_lineitem_agg", "t01_text_analysis", "s01_events_hourly",
      "a01_cosine_topk", "o26_metrics_summary", "s03_skew_agg",
      // round-4 surfaces: window as-of, banded range join, sequence
      // packing (partitioned window), packed-code ADC ranking
      "j01_asof_join", "j02_range_join", "u03_pack_sequences", "a12_pq_topk")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val at4 = queries.map(q => q -> collectSorted(q)).toMap
      spark.conf.set("spark.sql.shuffle.partitions", "13")
      queries.foreach { q =>
        assert(collectSorted(q) == at4(q), s"$q diverged across shuffle partition counts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("batch probe agrees with the single-vector probe, capped and uncapped") {
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val sigs = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = 3)).select("doc_id", "sig").cache()
    val index = Lsh.postings(sigs, "doc_id", "sig")
    for (cap <- Seq(0, 2000); qid <- Seq(0L, 7L, 42L)) {
      val qSig = sigs.filter(col("doc_id") === qid).head().getSeq[Long](1).toArray
      val single = Lsh.querySignature(sigs, index, qSig, 5, maxCandidates = cap)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val queries = sigs.filter(col("doc_id") === qid)
        .select(col("doc_id").as("query_id"), col("sig"))
      val batch = Lsh.queryBatch(sigs, index, queries, 5, maxCandidates = cap)
        .orderBy("rank")
        .collect().map(r => (r.getLong(2), r.getDouble(3))).toSeq
      assert(batch == single, s"cap=$cap qid=$qid")
    }
  }
}
