package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-corpus preparation — the composition proof for the
  * operator library: the five standard pre-training stages chained so each
  * stage runs over the previous stage's SURVIVORS (a real pipeline, not
  * independent signals), with every document carrying its full audit trail
  * of stage flags.
  *
  * Stages (all existing operators, composed unchanged):
  *   0. ingest id-collapse — duplicate doc_ids (re-crawls, shard
  *                           overlaps) keep the lexicographically
  *                           smallest (text, lang) row, so every later
  *                           stage sees ids as identities (one hash agg)
  *   1. holdout split      — [[Sampling.split]] (stable id-hash 90/5/5);
  *                           the pipeline prepares the train split, the
  *                           test split is the decontamination target
  *   2. quality filter     — [[TextAnalysis.qualityFilter]] (Gopher rules)
  *   3. exact dedup        — min-id survivor per md5(text) group
  *   4. near-dup removal   — [[Dedup.nearSimHash]] pigeonhole pairs at
  *                           hamming <= budget; a doc is dropped iff a
  *                           SMALLER-id near-duplicate survives stage 3
  *                           (the deterministic greedy rule)
  *   5. decontamination    — [[Dedup.ngramDecontaminate]]: drop any train
  *                           doc sharing a w-token window with the test split
  *   6. temperature mix    — [[Sampling.temperatureMix]] quota ∝ sqrt(n)
  *                           per language over the final survivors
  *
  * Output, one row per train-split document (ordered by caller):
  * (doc_id, lang, q_keep, x_keep, n_keep, c_keep, rank, quota, selected) —
  * each *_keep is cumulative (a doc dropped at stage k is false from k on),
  * rank/quota are −1 for docs that never reach the mix (the reference's
  * padding convention).
  *
  * Scale shape: every stage is one of the library's scale-audited
  * operators (hash-projection split, shuffle-free quality projection,
  * one md5-keyed agg, pigeonhole equi-join, window-fingerprint semi-join,
  * two-phase bucket-prefix rank); the glue is id-keyed semi/left joins
  * that AQE plans as broadcast once survivors shrink. Nothing collects,
  * no whole-group window, no pairwise stage outside the pigeonhole
  * equi-join.
  */
object Pipeline {

  /** EAGER at stage boundaries (round 12): the returned frame is already
    * materialized (its plan is a flat LogicalRDD) and every intermediate
    * has been released. Uncached, each survivor set's subtree contained
    * the FULL chain of every earlier stage — the final audit join (and
    * any recursive consumer like stage k+1) re-evaluated stage 1's
    * aggregate and the SimHash join many times over; exchange reuse
    * recovers only bit-identical exchanges, and the measured 16M-doc
    * composition paid ~1200 s for what the stage sum prices at a
    * fraction of that. Stage-boundary persistence is also the 100 TB
    * shape: a production prep pipeline writes each stage's survivors to
    * storage so a failed stage restarts from the last boundary, not from
    * the crawl. Wide (text-carrying) checkpoints are released as soon as
    * their last consumer materializes, so at most ~two corpus-sized
    * copies coexist. */
  /** `decontamMaxSourceDocFreq` (0 = off) passes the boilerplate guard
    * through to stage 5's [[Dedup.ngramDecontaminate]] — real corpora
    * need it (see that operator's scaladoc and the d19 gate); the
    * default keeps the unguarded GPT-3-recipe semantics every existing
    * gate pins. */
  def prepareCorpus(docs: DataFrame, docsPerSqrtDoc: Double = 2.0,
                    hammingBudget: Int = 3, w: Int = 8,
                    decontamMaxSourceDocFreq: Int = 0): DataFrame = {
    import graft.api.QueryEngine.releaseFrame
    // stage 0: ingest id-collapse (struct min = lexicographic (text, lang)),
    // split label as a pure projection of the id — the assignment is a
    // deterministic function of doc_id, so joining split() back on the id
    // (a corpus-sized self-join) buys nothing
    val uniq = docs.groupBy("doc_id")
      .agg(min(struct(col("text"), col("lang"))).as("_s"))
      .select(col("doc_id"), col("_s.text").as("text"), col("_s.lang").as("lang"))
      .withColumn("split", Sampling.splitLabel(col("doc_id")))
      .localCheckpoint(true)
    val base = uniq.filter(col("split") === "train")
      .select("doc_id", "lang", "text")
    val testDocs = uniq.filter(col("split") === "test")
      .select("doc_id", "text")

    // stage 2: Gopher-rule quality filter
    val s1 = TextAnalysis.qualityFilter(base)
      .filter(col("fail_mask") === 0).select("doc_id")
      .localCheckpoint(true)
    val q1 = base.join(s1, Seq("doc_id"), "left_semi").localCheckpoint(true)

    // stage 3: exact dedup — min-id survivor per text hash
    val s2 = q1.join(
        q1.groupBy(md5(col("text")).as("_th")).agg(min(col("doc_id")).as("_mid")),
        md5(col("text")) === col("_th"))
      .filter(col("doc_id") === col("_mid")).select("doc_id")
      .localCheckpoint(true)
    val q2 = q1.join(s2, Seq("doc_id"), "left_semi").localCheckpoint(true)
    releaseFrame(q1)

    // stage 4: near-dup removal — drop the larger id of every pair
    val dominated = Dedup.nearSimHash(q2, hammingBudget)
      .select(col("b").as("doc_id")).distinct()
    val s3 = q2.select("doc_id").join(dominated, Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val q3 = q2.join(s3, Seq("doc_id"), "left_semi").localCheckpoint(true)
    releaseFrame(q2)

    // stage 5: decontamination against the held-out test split (the
    // window SOURCE is the test split; the docs being checked are the
    // stage-4 survivors)
    val s4 = Dedup.ngramDecontaminate(testDocs, q3, w,
        maxSourceDocFreq = decontamMaxSourceDocFreq)
      .filter(col("n_contaminated_windows") === 0).select("doc_id")
      .localCheckpoint(true)
    val q4 = q3.join(s4, Seq("doc_id"), "left_semi")

    // stage 6: temperature-flattened language mixing over the survivors
    val mix = Sampling.temperatureMix(
        q4.select("doc_id", "lang"), "lang", docsPerSqrtDoc)
      .select(col("doc_id"), col("rank"), col("quota"), col("selected"))
      .localCheckpoint(true)
    releaseFrame(q3)

    def flag(ids: DataFrame, name: String): DataFrame =
      ids.withColumn(name, lit(true))
    val out = base.select("doc_id", "lang")
      .join(flag(s1, "q_keep"), Seq("doc_id"), "left")
      .join(flag(s2, "x_keep"), Seq("doc_id"), "left")
      .join(flag(s3, "n_keep"), Seq("doc_id"), "left")
      .join(flag(s4, "c_keep"), Seq("doc_id"), "left")
      .join(mix, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
        coalesce(col("q_keep"), lit(false)).as("q_keep"),
        coalesce(col("x_keep"), lit(false)).as("x_keep"),
        coalesce(col("n_keep"), lit(false)).as("n_keep"),
        coalesce(col("c_keep"), lit(false)).as("c_keep"),
        coalesce(col("rank"), lit(-1L)).as("rank"),
        coalesce(col("quota"), lit(-1L)).as("quota"),
        coalesce(col("selected"), lit(false)).as("selected"))
      .localCheckpoint(true)
    Seq(uniq, s1, s2, s3, s4, mix).foreach(releaseFrame)
    out
  }
}
