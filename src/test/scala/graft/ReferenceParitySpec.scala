package graft

import com.fasterxml.jackson.databind.ObjectMapper
import graft.core.{Lsh, MinHashPipeline}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** End-to-end parity against the reference's own dataset and query:
  * the 20 000-doc seed-42 synthetic corpus (synth_data.py __main__:
  * vocab=20, avg_words=40, k_shingle=1, num_perm=128) and the hardcoded
  * debug query vector #1025 (minhash_lsh.py:59-68, curl_query.sh).
  *
  * Expected values in reference_expected.json were produced by executing
  * the reference implementation itself. Two flavors:
  *  - signatures: must match bit-for-bit;
  *  - LSH top-5: compared under the engine's deterministic semantics
  *    (full band scan, ties by id) — the reference's `max_candidates=2000`
  *    early exit is a documented deviation (SURVEY §7.4); scoring of the
  *    reference's own early-exit result ids must still match exactly.
  */
class ReferenceParitySpec extends SparkSpec {

  private lazy val expected = {
    val p = getClass.getResourceAsStream("/reference_expected.json")
    new ObjectMapper().readTree(p)
  }
  private def longs(field: String): Seq[Long] =
    expected.get(field).elements().asScala.map(_.asLong()).toSeq
  private def doubles(field: String): Seq[Double] =
    expected.get(field).elements().asScala.map(_.asDouble()).toSeq

  private lazy val sigs = {
    val corpus = spark.read.parquet(
      getClass.getResource("/reference_corpus.parquet").getPath)
    MinHashPipeline.withSignature(corpus, "text",
      MinHashPipeline.Params(kShingle = 1, byWord = true))
      .select("doc_id", "sig").cache()
  }

  test("signatures match the reference bit-for-bit on its own corpus") {
    val got = sigs.filter(col("doc_id").isin(0, 1025))
      .orderBy("doc_id").collect()
    assert(got(0).getSeq[Long](1) == longs("sig_row0"))
    assert(got(1).getSeq[Long](1) == longs("query_sig"))
  }

  test("no-index fallback scan (negative-L2 over signatures) reproduces reference ranking") {
    // worker_tasks.py:170-181 fallback: score every row with quantify_score
    // (qed.py:65-73) and take the top — here as the brute-force cross plan.
    // Ranks compared, not raw scores: numpy sums the squares pairwise while
    // the kernel sums sequentially (both exact enough that the ~1e17-sized
    // score gaps dwarf the difference).
    import graft.operators.Ann
    val qSig = longs("query_sig").toArray
    val spark2 = spark
    import spark2.implicits._
    val q = Seq((1025L, qSig.toSeq)).toDF("vec_id", "sig")
    val base = sigs.select(col("doc_id").as("vec_id"), col("sig"))
    val got = Ann.bruteForceTopK(base, q, k = 5, graft.functions.GraftFunctions.neg_l2_long,
      idCol = "vec_id", vecCol = "sig")
      .orderBy("rank").collect().map(_.getLong(2)).toSeq
    assert(got == longs("fallback_top5_ids"))
  }

  test("LSH query for vector #1025 reproduces the reference result") {
    val qSig = longs("query_sig").toArray
    val index = Lsh.postings(sigs, "doc_id", "sig").cache()

    // candidate set size under full band scan + 5000 bucket cap
    val nCand = Lsh.candidates(index, Lsh.queryPostings(spark, qSig)).count()
    assert(nCand == expected.get("det_n_candidates").asLong())

    // deterministic top-5 (ties by id)
    val top = Lsh.querySignature(sigs, index, qSig, k = 5).collect()
    assert(top.map(_.getLong(0)).toSeq == longs("det_top5_ids"))
    assert(top.map(_.getDouble(1)).toSeq == doubles("det_top5_sims"))

    // the reference's own early-exit top-5 ids must score identically here
    val refIds = expected.get("ref_ids_sims").properties().asScala
      .map(e => e.getKey.toLong -> e.getValue.asDouble()).toMap
    val qLit = array(qSig.map(lit(_)).toIndexedSeq: _*)
    val scored = sigs.filter(col("doc_id").isin(refIds.keys.toSeq: _*))
      .select(col("doc_id"), est_jaccard(col("sig"), qLit).as("s"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    refIds.foreach { case (id, sim) => assert(scored(id) == sim, s"doc $id") }
  }
}
