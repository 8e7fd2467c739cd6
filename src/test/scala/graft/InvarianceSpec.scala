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
      "j01_asof_join", "j02_range_join", "u03_pack_sequences", "a12_pq_topk",
      // round-10 surfaces: hash-rank quotas, integer LM bits, the card
      // (p01 is excluded only because its result caches per (session,
      // dir) — the second collect would read the cache, not re-plan)
      "u07_temperature_mix", "t10_lm_quality", "t11_corpus_card")
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

  test("10 sequential adds answer correctly and compact() flattens the plan") {
    import graft.api.{QueryEngine, VectorEngine}
    import graft.sources.SyntheticCorpus
    // ANALYZED plan size (QueryEngine.planNodes — the PRODUCTION growth
    // metric the compact threshold compares against; asserting through
    // it keeps the spec and the engine measuring the same thing)
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      QueryEngine.planNodes(df)
    // --- signature engine: 10 incremental doc batches -------------------
    // the cap re-application would otherwise TRIPLE the plan per add
    // (3^10 nodes); auto-compaction must keep analysis cost flat
    val mp = graft.core.MinHashPipeline.Params(kShingle = 1)
    val batches = (1 to 10).map(i =>
      SyntheticCorpus.docs(spark, 5, seed = 100 + i)
        .withColumn("doc_id", col("doc_id") + i * 1000))
    var eng = QueryEngine.build(SyntheticCorpus.docs(spark, 30), mp = mp)
    val stale = scala.collection.mutable.ArrayBuffer.empty[graft.api.QueryEngine]
    for (more <- batches) {
      stale += eng
      eng = eng.addDocuments(more)
    }
    // flat plan depth across 10 adds (auto-compaction bound, not 3^10)
    val grownDepth = planNodes(eng.index)
    assert(grownDepth <= 3 * QueryEngine.CompactThreshold,
      s"index plan grew to $grownDepth nodes")
    val qSig = eng.sigs.filter(col("doc_id") === 3).head().getSeq[Long](1).toArray
    val before = eng.query(qSig, 5)
    // the grown engine answers exactly like a from-scratch build over the
    // full corpus (keep-smallest cap algebra is closed under union)
    val fresh = QueryEngine.build(
      batches.foldLeft(SyntheticCorpus.docs(spark, 30))(_ unionByName _), mp = mp)
    assert(fresh.query(qSig, 5) == before)
    val compacted = eng.compact()
    assert(compacted.query(qSig, 5) == before)
    // compacted plans are single materialized scans
    assert(planNodes(compacted.index) <= 2)
    assert(planNodes(compacted.sigs) <= 2)
    // adds after compaction keep working (same cap algebra)
    val regrown = compacted.addDocuments(
      SyntheticCorpus.docs(spark, 5, seed = 999).withColumn("doc_id", col("doc_id") + 99000))
    assert(regrown.query(qSig, 5).length == 5)
    regrown.close(); compacted.close(); fresh.close(); stale.foreach(_.close())
    // --- vector engine: 10 incremental vector batches -------------------
    var veng = VectorEngine.build(SyntheticCorpus.vectors(spark, 100))
    val staleV = scala.collection.mutable.ArrayBuffer.empty[VectorEngine]
    for (i <- 1 to 10) {
      val more = SyntheticCorpus.vectors(spark, 5, seed = 100 + i)
        .withColumn("vec_id", col("vec_id") + i * 1000)
      staleV += veng
      veng = veng.addVectors(more)
    }
    assert(planNodes(veng.codes) <= 3 * QueryEngine.CompactThreshold)
    val q = veng.embs.filter(col("id") < 3)
      .select(col("id").as("vec_id"), col("v").as("embedding"))
    val beforeV = veng.topK(q, k = 3, mode = "ivfpq", nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val compactedV = veng.compact()
    val afterV = compactedV.topK(q, k = 3, mode = "ivfpq", nprobe = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(afterV == beforeV)
    assert(planNodes(compactedV.codes) <= 2)
    compactedV.close(); staleV.foreach(_.close())
  }

  test("interleaved adds and removes keep plan depth flat and answers exact") {
    import graft.api.{QueryEngine, VectorEngine}
    import graft.sources.SyntheticCorpus
    import spark.implicits._
    def planNodes(df: org.apache.spark.sql.DataFrame): Int =
      QueryEngine.planNodes(df)
    // vector engine: 8 rounds of add-batch + remove-two — the remove
    // path reuses the add path's compact discipline, so plan depth must
    // stay bounded and the final index must equal its surviving id set
    var veng = VectorEngine.build(SyntheticCorpus.vectors(spark, 100))
    var expected = (0L until 100L).toSet
    for (i <- 1 to 8) {
      val more = SyntheticCorpus.vectors(spark, 4, seed = 200 + i)
        .withColumn("vec_id", col("vec_id") + i * 1000)
      veng = veng.addVectors(more)
      expected ++= (0L until 4L).map(_ + i * 1000)
      val gone = Seq(i * 1000L, i * 1000L + 1)
      veng = veng.removeVectors(gone)
      expected --= gone.toSet
    }
    assert(planNodes(veng.codes) <= 3 * QueryEngine.CompactThreshold,
      s"codes plan grew to ${planNodes(veng.codes)} nodes")
    assert(veng.embs.select("id").collect().map(_.getLong(0)).toSet == expected)
    assert(veng.fused.count() == expected.size)
    // signature engine: same interleaving discipline
    val mp = graft.core.MinHashPipeline.Params(kShingle = 1)
    var eng = QueryEngine.build(SyntheticCorpus.docs(spark, 30), mp = mp)
    for (i <- 1 to 8) {
      val more = SyntheticCorpus.docs(spark, 4, seed = 300 + i)
        .withColumn("doc_id", col("doc_id") + i * 1000)
      eng = eng.addDocuments(more)
        .removeDocuments(Seq(i * 1000L).toDF("doc_id"))
    }
    assert(planNodes(eng.index) <= 3 * QueryEngine.CompactThreshold,
      s"index plan grew to ${planNodes(eng.index)} nodes")
    // answers match a from-scratch build over the surviving corpus
    val survivors = (1 to 8).foldLeft(SyntheticCorpus.docs(spark, 30)) { (acc, i) =>
      acc.unionByName(SyntheticCorpus.docs(spark, 4, seed = 300 + i)
        .withColumn("doc_id", col("doc_id") + i * 1000))
    }.filter(col("doc_id") % 1000 =!= 0 || col("doc_id") < 1000)
    val fresh = QueryEngine.build(survivors, mp = mp)
    val qSig = fresh.sigs.filter(col("doc_id") === 3).head().getSeq[Long](1).toArray
    assert(eng.query(qSig, 5) == fresh.query(qSig, 5))
  }

  test("addDocuments supersede-evicts the old engine's driver state") {
    import graft.api.QueryEngine
    import graft.sources.SyntheticCorpus
    val mp = MinHashPipeline.Params(kShingle = 1)
    var eng = QueryEngine.build(SyntheticCorpus.docs(spark, 50), mp = mp).warmUp()
    val qSig = eng.sigs.filter(col("doc_id") === 3).head().getSeq[Long](1).toArray
    val olds = scala.collection.mutable.ArrayBuffer.empty[QueryEngine]
    for (i <- 1 to 4) {
      olds += eng
      eng = eng.addDocuments(SyntheticCorpus.docs(spark, 5, seed = 200 + i)
        .withColumn("doc_id", col("doc_id") + i * 1000)).warmUp()
      // NO stale driver replica/stats/probe-cache for any superseded index
      // — the add evicted them, not a caller's close() courtesy
      olds.foreach(o => assert(!Lsh.hasDriverState(o.index),
        s"stale driver state after add $i"))
      // ...yet a superseded engine still answers through the bit-identical
      // fallback paths (distributed / probe-cache)
      val r = olds.last.query(qSig, 5)
      assert(r.head.id == 3 && r.head.score == 1.0)
    }
    val r = eng.query(qSig, 5)
    assert(r.head.id == 3 && r.head.score == 1.0)
    olds.foreach(_.close()); eng.close()
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

  test("capped SINGLE probe via driver stats (no replica) equals the cold plan") {
    // the querySignature branch for indexes that warmed their stats map
    // but are too big for a driver replica (>1M postings, <=1M buckets):
    // fold the band prefix from the map, keep the distributed probe
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val sigs = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = 3)).select("doc_id", "sig").cache()
    val index = Lsh.postings(sigs, "doc_id", "sig").cache()
    val qSig = sigs.filter(col("doc_id") === 7).head().getSeq[Long](1).toArray
    def run() = Lsh.querySignature(sigs, index, qSig, 5, maxCandidates = 200)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getSeq[Long](2))).toSeq
    val cold = run()
    assert(Lsh.warmDriverStats(index)) // stats ONLY — no warmDriverIndex
    val warm = run()
    assert(warm == cold)
    index.unpersist(); sigs.unpersist()
  }

  test("capped batch probe is identical before and after driver-stats warm-up") {
    // the warm path folds each query's band prefix on the driver and
    // injects a LocalRelation; the cold path runs the distributed
    // stats-join + in-plan fold — outputs must be bit-identical
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val sigs = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = 3)).select("doc_id", "sig").cache()
    val index = Lsh.postings(sigs, "doc_id", "sig").cache()
    val queries = sigs.filter(col("doc_id") < 25)
      .select(col("doc_id").as("query_id"), col("sig"))
    def run() = Lsh.queryBatch(sigs, index, queries, 5, maxCandidates = 200)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .sortBy(identity).toSeq
    val cold = run()
    assert(Lsh.warmDriverStats(index))
    val warm = run()
    assert(warm == cold)
    index.unpersist(); sigs.unpersist()
  }
}
