package graft.operators

import graft.core.{Lsh, Shingling}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data deduplication operators over a documents table
  * (doc_id, text): exact, MinHash+LSH near-dup, SimHash, n-gram Jaccard.
  * All are single-shuffle group-bys or band-join candidate generation —
  * no O(N^2) stage ever materializes, so they scale to the 100 TB case.
  */
object Dedup {

  /** Exact duplicate groups by content hash: (text_hash, cnt, keep_id).
    * `keep_id` is the smallest doc_id (canonical survivor). */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_hash"))
      .agg(
        count(lit(1)).as("cnt"),
        min(col(idCol)).as("keep_id"))

  /** Near-duplicate candidate pairs via MinHash+LSH over word k-gram
    * shingles, scored with estimated Jaccard and thresholded.
    * Output: (a, b, score), a < b. */
  def nearMinHashLsh(docs: DataFrame, k: Int = 3, threshold: Double = 0.8,
                     idCol: String = "doc_id", textCol: String = "text",
                     lsh: Lsh.Params = Lsh.Params()): DataFrame = {
    val sigs = docs.select(
      col(idCol).cast("long").as(idCol),
      minhash_signature(shingle_hashes_md5(
        Shingling.shingles(col(textCol), k, byWord = true))).as("sig"))
    Lsh.similaritySelfJoin(sigs, idCol, "sig", threshold, lsh)
  }

  /** SimHash near-dup: 61-bit fingerprint per doc; near-dup pairs are found
    * by the public "split the fingerprint into hamming_budget+1 blocks —
    * any pair within budget shares at least one exact block" trick
    * (pigeonhole), so candidate generation is an equi-join, not a cross
    * join. Output: (a, b, hamming), a < b, hamming <= budget. */
  def nearSimHash(docs: DataFrame, hammingBudget: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val nBlocks = hammingBudget + 1
    val blockBits = 61 / nBlocks + (if (61 % nBlocks == 0) 0 else 1)
    val fp = docs.select(
      col(idCol).cast("long").as("id"),
      simhash61(shingle_hashes_md5(Shingling.tokens(col(textCol)))).as("fp"))
    val blocks = fp.select(
      col("id"), col("fp"),
      posexplode(transform(sequence(lit(0), lit(nBlocks - 1)),
        b => call_function("shiftright", col("fp"), (b * lit(blockBits)).cast("int"))
          .bitwiseAND(lit((1L << blockBits) - 1)))).as(Seq("block", "bkey")))
    val l = blocks.select(col("block"), col("bkey"), col("id").as("a"), col("fp").as("fp_a"))
    val r = blocks.select(col("block"), col("bkey"), col("id").as("b"), col("fp").as("fp_b"))
    l.join(r, Seq("block", "bkey"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= hammingBudget)
  }

  /** Exact n-gram Jaccard on shingle sets for candidate pairs produced by
    * the LSH index (true Jaccard, not the MinHash estimate): the
    * semantically-sound near-dup metric from SURVEY §4.3. */
  def ngramJaccard(docs: DataFrame, k: Int = 3, threshold: Double = 0.5,
                   idCol: String = "doc_id", textCol: String = "text",
                   lsh: Lsh.Params = Lsh.Params()): DataFrame = {
    val base = docs.select(
      col(idCol).cast("long").as(idCol),
      Shingling.shingles(col(textCol), k, byWord = true).as("shingles"))
    val sigs = base.withColumn("sig", minhash_signature(shingle_hashes_md5(col("shingles"))))
    ngramJaccardScored(base, Lsh.candidatePairs(Lsh.postings(sigs, idCol, "sig", lsh)),
      threshold, idCol)
  }

  /** Score candidate pairs (a, b) with true Jaccard over precomputed
    * shingle sets — lets callers with a cached shingle table / postings
    * index (the build-once artifacts) skip recomputing the pipeline. */
  def ngramJaccardScored(shingled: DataFrame, pairs: DataFrame, threshold: Double,
                         idCol: String = "doc_id"): DataFrame = {
    val sa = shingled.select(col(idCol).as("a"), col("shingles").as("sh_a"))
    val sb = shingled.select(col(idCol).as("b"), col("shingles").as("sh_b"))
    pairs.join(sa, "a").join(sb, "b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** INCREMENTAL dedup — classify an arriving batch against an EXISTING
    * corpus without re-deduplicating the corpus (the daily-crawl shape: a
    * 100 TB corpus is deduplicated once; every increment afterwards is
    * batch-vs-corpus). Status per batch doc, by precedence:
    * 'exact' (md5(text) already in the corpus), else 'near' (shares an
    * LSH band bucket with a corpus doc AND estimated Jaccard >= threshold
    * against some collided corpus doc), else 'new'.
    *
    * Scale shape: the corpus side is the STANDING capped postings index
    * (built once — callers with a saved index pass its signature table
    * and let `Lsh.postings` fold to the cached plan); the batch's band
    * keys are typically the small join side, the bucket cap bounds
    * candidates per bucket on both sides (the batch side is capped with
    * the SAME keep-smallest-ids rule so the oracle can replay the exact
    * candidate set), and scoring touches only collided pairs — never
    * batch x corpus. The exact tier is one hash semi-join.
    * Output: (id, status). */
  def incrementalStatus(corpusDocs: DataFrame, corpusSigs: DataFrame,
                        batchDocs: DataFrame, batchSigs: DataFrame,
                        threshold: Double = 0.5,
                        idCol: String = "doc_id", textCol: String = "text",
                        lsh: Lsh.Params = Lsh.Params()): DataFrame =
    incrementalStatusIndexed(
      corpusDocs.select(md5(col(textCol)).as("_h")),
      corpusSigs, Lsh.postings(corpusSigs, idCol, "sig", lsh),
      batchDocs, batchSigs, threshold, idCol, textCol, lsh)

  /** [[incrementalStatus]] against STANDING corpus artifacts — the form a
    * real increment runs: `corpusHashes` (one `_h` md5 column) and
    * `corpusIndex` (the capped postings table) are built/persisted once
    * when the corpus is deduplicated and only READ per increment, so the
    * per-batch cost is the batch's own signatures plus bounded probes —
    * never a corpus-sized rebuild (BenchDecadeLlm measures exactly this
    * split). */
  def incrementalStatusIndexed(corpusHashes: DataFrame, corpusSigs: DataFrame,
                               corpusIndex: DataFrame,
                               batchDocs: DataFrame, batchSigs: DataFrame,
                               threshold: Double = 0.5,
                               idCol: String = "doc_id", textCol: String = "text",
                               lsh: Lsh.Params = Lsh.Params()): DataFrame = {
    val bh = batchDocs.select(col(idCol).cast("long").as(idCol),
      md5(col(textCol)).as("_h"))
    // distinct: a duplicate batch id (two rows, either text matching)
    // must yield ONE id-level verdict, not multiply the final join
    val exactIds = bh.join(corpusHashes, Seq("_h"), "left_semi")
      .select(col(idCol)).distinct()
    val batchKeys = Lsh.postings(batchSigs, idCol, "sig", lsh)
      .withColumnRenamed("id", "_bid")
    val cand = corpusIndex
      .join(batchKeys, Seq("band", "key64", "key64b"))
      .select(col("_bid"), col("id").as("_cid")).distinct()
    val sb = batchSigs.select(col(idCol).cast("long").as("_bid"),
      col("sig").as("_sb"))
    val sc = corpusSigs.select(col(idCol).cast("long").as("_cid"),
      col("sig").as("_sc"))
    val nearIds = cand.join(sb, "_bid").join(sc, "_cid")
      .filter(est_jaccard(col("_sb"), col("_sc")) >= threshold)
      .select(col("_bid").as(idCol)).distinct()
    batchDocs.select(col(idCol).cast("long").as(idCol))
      .join(exactIds.withColumn("_e", lit(1)), Seq(idCol), "left")
      .join(nearIds.withColumn("_n", lit(1)), Seq(idCol), "left")
      .select(col(idCol),
        when(col("_e") === 1, "exact")
          .when(col("_n") === 1, "near")
          .otherwise("new").as("status"))
  }

  /** Transitive duplicate grouping: connected components over a near-dup
    * pair graph (a, b), labeling every member of a component with the
    * component's smallest doc id. This is the converged form of the
    * one-pass min-peer labeling (SURVEY §7.1 step 9): chains a–b, b–c all
    * label to a, so survivor selection is consistent across hops.
    *
    * Algorithm: iterative min-label propagation with pointer-jumping —
    * each round a node takes the min of its own label, its neighbors'
    * labels, AND its current label's label (path halving). Pointer-jumping
    * makes convergence O(log(diameter)) rounds instead of O(diameter);
    * each round is two shuffles (neighbor min + label lookup), both plain
    * hash aggregations/joins that AQE can skew-split — no single-task
    * stage anywhere. Lineage is truncated per round with an eager
    * localCheckpoint so the plan does not grow with iterations (at
    * cluster scale with dynamic executors, set a reliable
    * `spark.sparkContext.setCheckpointDir` and swap to `checkpoint`).
    *
    * Returns (doc, label); only nodes that appear in `pairs`. Iterations
    * stop at convergence (no label changed) or `maxIter` (a safety bound —
    * log2 of the largest plausible component diameter; 30 covers 2^30). */
  def connectedComponents(pairs: DataFrame, aCol: String = "a", bCol: String = "b",
                          maxIter: Int = 30,
                          onRound: (Int, Double) => Unit = null): DataFrame = {
    // every per-round checkpoint is stats-stripped: localCheckpoint
    // copies the child plan's ESTIMATED statistics onto its LogicalRDD,
    // and in an iterative join algorithm that estimate compounds ~20x
    // per round until JoinSelection's BigInteger size math dominates
    // wall-clock (planning hung for MINUTES by round ~8 on a
    // diameter-16k graph while the data stayed trivial). See
    // org.apache.spark.sql.graftbridge.CheckpointStats.
    def ckpt(df: DataFrame): DataFrame =
      org.apache.spark.sql.graftbridge.CheckpointStats.strip(df.localCheckpoint(true))
    val edges = ckpt(pairs.select(col(aCol).cast("long").as("src"), col(bCol).cast("long").as("dst"))
      .unionByName(pairs.select(col(bCol).cast("long").as("src"), col(aCol).cast("long").as("dst")))
      .distinct())
    var labels = ckpt(edges.select(col("src").as("doc")).distinct()
      .withColumn("label", col("doc")))
    // one min-label propagation + pointer-jump round, as a PLAN (no action)
    def step(l: DataFrame): DataFrame = {
      // min label among neighbors of each node
      val nbrMin = edges
        .join(l.select(col("doc").as("dst"), col("label").as("nbr_label")), "dst")
        .groupBy("src").agg(min("nbr_label").as("nbr_label"))
        .select(col("src").as("doc"), col("nbr_label"))
      // pointer jump: the label of my label
      val jump = l
        .join(l.select(col("doc").as("label"), col("label").as("jump_label")), "label")
        .select(col("doc"), col("jump_label"))
      l.join(nbrMin, Seq("doc"), "left")
        .join(jump, Seq("doc"), "left")
        .select(col("doc"),
          least(col("label"),
            coalesce(col("nbr_label"), col("label")),
            coalesce(col("jump_label"), col("label"))).as("label"))
    }
    var done = 0
    var converged = false
    // superseded round checkpoints are RELEASED as soon as the next
    // round materializes: localCheckpoint blocks are RDD-level (plain
    // unpersist no-ops on them — the releaseFrame contract), and leaving
    // 16+ corpus-sized round states in storage memory turned per-round
    // cost GC-spiky at 4M nodes (10-54 s swings on a quiet box)
    var prevCkpt: DataFrame = labels
    while (!converged && done < maxIter) {
      // Up to TWO propagation rounds compose into one materialization
      // (lineage depth stays bounded at 2 rounds; exactly maxIter rounds
      // run in total): driver actions per round were the dominant cost,
      // not the shuffles. The changed flag compares against the LAST
      // composed round's input (the intermediate state, not the
      // pre-materialization labels): if the final round moved nothing,
      // its input was already a fixed point — so a graph that converges
      // in round r is detected at the materialization containing r+1,
      // not one full cycle later. Propagation is monotone (labels only
      // decrease), so "no change in the last round" is exact. Catalyst
      // dedups the shared step subtree via exchange reuse.
      val rounds = math.min(2, maxIter - done)
      val t0 = System.nanoTime()
      val prevState = if (rounds == 2) step(labels) else labels
      val next = ckpt(step(prevState)
        .join(prevState.select(col("doc"), col("label").as("mid_label")), "doc")
        .select(col("doc"), col("label"), (col("label") =!= col("mid_label")).as("chg")))
      labels = next.select("doc", "label")
      converged = next.filter(col("chg")).limit(1).count() == 0L
      graft.api.QueryEngine.releaseFrame(prevCkpt)
      prevCkpt = next
      done += rounds
      // round observer (round 12): the O(log diameter) convergence claim
      // is measurable, not just asserted — BenchDecadeLlm records
      // (rounds completed, seconds) per materialization through this hook
      if (onRound != null) onRound(done, (System.nanoTime() - t0) / 1e9)
    }
    labels
  }

  /** Embedding near-dup: pairs with cosine >= threshold, candidates from
    * random-hyperplane LSH buckets (see [[Ann.rhpBucket]]) to avoid the
    * cross join at scale.
    *
    * Precondition: `idCol` values must be UNIQUE (the engines'
    * ids-must-not-collide contract) — the no-distinct plan below relies
    * on one bucket row per vector, so duplicate-id inputs would emit
    * duplicate (a, b) pairs; dedup ids upstream. */
  def nearEmbeddingCosine(embs: DataFrame, threshold: Double = 0.95,
                          planes: Int = 12, idCol: String = "vec_id",
                          vecCol: String = "embedding"): DataFrame = {
    val b = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .withColumn("bucket", Ann.rhpBucket(col("v"), planes))
    val l = b.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = b.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    // no distinct(): each vector has exactly ONE rhp bucket, so the bucket
    // equi-join cannot emit a duplicate (a, b) pair — unlike the multi-band
    // LSH / multi-block SimHash paths where the dedup is load-bearing
    l.join(r, "bucket").filter(col("a") < col("b"))
      .select(col("a"), col("b"), cosine_sim(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact n-gram decontamination (the GPT-3 appendix-C recipe, applied
    * at window granularity): a TEST document is contaminated where one of
    * its `w`-token windows appears verbatim in the TRAIN split. Output
    * one row per test doc: (idCol, n_contaminated_windows) — 0 = clean.
    * Complements the MinHash contamination audit (d09): this is the
    * exact-overlap form benchmarks actually specify, not a similarity
    * heuristic.
    *
    * Scale shape: both sides reduce to O(total tokens) (id, whash) rows
    * via the O(n) rolling kernel; train windows collapse to a distinct
    * fingerprint set (one hash agg) and the test side LEFT SEMI joins it
    * on the 61-bit fingerprint — hash-partitioned both sides, no
    * pairwise comparison, nothing collected.
    *
    * `maxSourceDocFreq` (0 = off) is the BOILERPLATE guard real corpora
    * need: a window that appears in MORE than this many distinct `train`
    * (window-source) docs is treated as boilerplate — license headers,
    * generated preamble, markup — and excluded from the contamination
    * fingerprint set, instead of nuking every doc that shares it. The
    * round-13 real-corpus run (49.7k Debian doc/man/python files,
    * BENCH_LOCAL_r13_realcorpus.json) measured the unguarded form
    * collapsing 79.5% of near-dedup survivors — license text straddles
    * any random split — with the guard at 2 rescuing +40% of them; the
    * published decontam recipes cap high-frequency n-grams for exactly
    * this reason. The extra cost is one count-distinct on the
    * already-shuffled source windows. */
  def ngramDecontaminate(train: DataFrame, test: DataFrame, w: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text",
                         maxSourceDocFreq: Int = 0): DataFrame = {
    def wins(df: DataFrame) = df.select(
      col(idCol),
      explode(window_fingerprints(
        shingle_hashes_md5(Shingling.tokens(lower(col(textCol)))), w)).as("whash"))
    val trainW =
      if (maxSourceDocFreq <= 0) wins(train).select("whash").distinct()
      else wins(train).groupBy("whash")
        .agg(countDistinct(col(idCol)).as("_nd"))
        .filter(col("_nd") <= maxSourceDocFreq)
        .select("whash")
    val hits = wins(test).join(trainW, Seq("whash"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_contaminated_windows"))
    test.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated_windows"), lit(0L)).as("n_contaminated_windows"))
  }

  /** Exact substring-duplicate signals (the "Deduplicating Training Data
    * Makes Language Models Better" shape, Lee et al. 2022): a length-`w`
    * token window whose rolling-hash fingerprint appears in >= 2 distinct
    * documents is a duplicated span. Output one row per document:
    * (doc_id, n_windows, n_dup_windows, dup_frac) — dup_frac is the
    * fraction of the document's windows that are corpus-duplicated, the
    * removal / trimming signal.
    *
    * Scale shape: the exploded window table is O(total tokens) rows of
    * (long, long) — never O(n*w) hash work (the kernel's rolling
    * recurrence) and never a pairwise comparison. Duplicate detection is
    * one hash aggregation keyed on the 61-bit fingerprint with map-side
    * partial aggregation (min/max doc_id stand in for a distinct-count:
    * a fingerprint spans >= 2 docs iff min != max — no count-distinct
    * expand), followed by a fingerprint-keyed equi-join back. At 100 TB
    * both sides shuffle-hash on the fingerprint; nothing collects. */
  def substringDupSignals(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val wins = docs.select(
      col(idCol),
      explode(window_fingerprints(
        shingle_hashes_md5(Shingling.tokens(lower(col(textCol)))), w)).as("whash"))
    // fingerprints present in >= 2 distinct docs (min != max avoids the
    // count-distinct expand; within-doc repeats don't count as corpus dups)
    val dup = wins.groupBy("whash")
      .agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("whash")
    val perDoc = wins.join(dup, Seq("whash"), "left_semi")
      .groupBy(idCol).agg(count(lit(1)).as("n_dup_windows"))
    docs.select(col(idCol),
      greatest(size(Shingling.tokens(lower(col(textCol)))) - (w - 1), lit(0))
        .cast("long").as("n_windows"))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol), col("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        when(col("n_windows") === 0, lit(0.0))
          .otherwise(col("n_dup_windows").cast("double") / col("n_windows").cast("double")))
  }

  /** Exact substring-duplicate REMOVAL (the operation Lee et al. 2022
    * actually perform, where [[substringDupSignals]] only measures): a
    * token is removed when ANY `w`-token window covering it appears in
    * >= 2 distinct documents; the surviving tokens are re-joined into
    * the cleaned text. Within-doc repeats don't trigger removal (same
    * cross-doc rule as the signals operator). Output: (idCol, n_toks,
    * n_removed, cleaned_text).
    *
    * Scale shape: same O(n) rolling-kernel reduction as d10 — windows
    * shrink to (id, pos, whash) rows, the dup set is one hash agg, and
    * coverage is a w-wide explode of only the DUP windows (a left-semi
    * join gates it, so clean corpora explode nothing). The text
    * rebuild is a per-doc sort of surviving (pos, token) pairs inside
    * one hash aggregation — grouped by doc, never a global sort. */
  def substringDupRemove(docs: DataFrame, w: Int = 8, idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    val base = tokensAndWindows(docs, w, idCol, textCol)
    val wins = base.select(col(idCol), posexplode(col("whs")).as(Seq("pos", "whash")))
    val dup = wins.groupBy("whash")
      .agg(min(col(idCol)).as("mn"), max(col(idCol)).as("mx"))
      .filter(col("mn") =!= col("mx"))
      .select("whash")
    removeCoveredWindows(base, wins.join(dup, Seq("whash"), "left_semi"),
      w, idCol)
  }

  /** Decontamination REMOVAL — the apply form of [[ngramDecontaminate]]
    * (as [[substringDupRemove]] is to the d10 signals): every TEST token
    * covered by a `w`-token window that appears verbatim anywhere in the
    * TRAIN split is dropped, and the surviving test text re-joined. This
    * is the scrub an eval set actually receives before use — flagging
    * (d11) tells you the damage; this removes it. Output rows are TEST
    * docs: (idCol, n_toks, n_removed, cleaned_text).
    *
    * Scale shape: train collapses to its distinct window-fingerprint set
    * (one hash agg); the test windows LEFT SEMI join it on the 61-bit
    * fingerprint and only the CONTAMINATED windows explode into
    * coverage — a clean test set pays one semi-join and nothing more. */
  def decontaminateRemove(train: DataFrame, test: DataFrame, w: Int = 8,
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame = {
    val trainw = tokensAndWindows(train, w, idCol, textCol)
      .select(explode(col("whs")).as("whash")).distinct()
    val base = tokensAndWindows(test, w, idCol, textCol)
    val wins = base.select(col(idCol), posexplode(col("whs")).as(Seq("pos", "whash")))
    removeCoveredWindows(base, wins.join(trainw, Seq("whash"), "left_semi"),
      w, idCol)
  }

  /** (idCol, toks, whs): original-case tokens plus the `w`-token rolling
    * fingerprints over their lowered twins — token positions align
    * because lowering never changes whitespace. */
  private def tokensAndWindows(docs: DataFrame, w: Int, idCol: String,
                               textCol: String): DataFrame =
    docs.select(col(idCol),
      Shingling.tokens(col(textCol)).as("toks"),
      window_fingerprints(
        shingle_hashes_md5(Shingling.tokens(lower(col(textCol)))), w).as("whs"))

  /** Shared rebuild: drop every token covered by one of the flagged
    * windows (start positions in `flagged`(idCol, pos)), re-join the
    * survivors per doc. The per-doc sort happens inside one hash
    * aggregation — grouped by doc, never global. */
  private def removeCoveredWindows(base: DataFrame, flagged: DataFrame,
                                   w: Int, idCol: String): DataFrame = {
    val covered = flagged
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("tpos"))
      .distinct()
    val kept = base
      .select(col(idCol), posexplode(col("toks")).as(Seq("tpos", "tok")))
      .join(covered, Seq(idCol, "tpos"), "left_anti")
      .groupBy(idCol)
      .agg(
        count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tpos"), col("tok")))),
          x => x.getField("tok")), " ").as("cleaned_text"))
    base.select(col(idCol), size(col("toks")).cast("long").as("n_toks"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_toks"),
        (col("n_toks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("cleaned_text"), lit("")).as("cleaned_text"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * deduplication inside trained k-means clusters of the embedding
    * space. Within each cluster, any pair with cosine >= threshold is a
    * semantic-duplicate pair; of each such neighborhood the survivor is
    * the vector FARTHEST from its cluster centroid (the paper's
    * keep-low-centroid-similarity rule — it preserves the diverse tail),
    * ties broken to the smaller id. Output: one row per input vector —
    * (id, centroid_id, n_dups, keep).
    *
    * Scale shape: candidate pairs are gated by the coarse assignment
    * (equi-join on centroid_id — expected cluster size n/k). The
    * within-cluster join is a SELF-join that must enumerate pairs, so a
    * hot cluster CANNOT be salted (both sides need every member;
    * cross-salt pairs would be silently dropped) — a pathological
    * cluster is O(|cluster|^2) pair rows. `maxClusterSize > 0` installs
    * the guard: a cluster over the cap contributes edges only among its
    * `maxClusterSize` smallest ids (deterministic keep-smallest-ids,
    * mirroring the LSH bucket cap in [[graft.core.Lsh.capBuckets]] and
    * the reference's bounded candidate generation); members beyond the
    * cap pass through un-deduplicated (keep=true, n_dups=0) — the
    * documented recall trade of any bounded candidate generator. The
    * over-cap cluster list is k-bounded (broadcasts), and member
    * selection is a partial+final top-k AGGREGATE (map-side combine
    * caps every task's state at `maxClusterSize` entries) — never a
    * whole-cluster sort pinned to one task. The drop rule is a pairwise
    * dominance test folded into ONE hash aggregation over the directed
    * pair edges (max over neighbors of "dominates me"), never an
    * iterative connected-components pass, and the centroid table rides
    * in as a broadcast.
    */
  def semanticDedup(embs: DataFrame, cents: DataFrame, assigned: DataFrame,
                    threshold: Double, idCol: String = "vec_id",
                    vecCol: String = "embedding",
                    maxClusterSize: Int = 0): DataFrame = {
    val base = embs.select(col(idCol).cast("long").as("id"), col(vecCol).as("v"))
      .join(assigned, "id")
      .join(broadcast(cents), "centroid_id")
      .select(col("id"), col("centroid_id"), col("v"),
        neg_l2_float(col("v"), col("cv")).as("cdist"))
    val participants =
      if (maxClusterSize <= 0) base
      else {
        import graft.functions.TopKByScore.top_k_by_score
        val over = base.groupBy("centroid_id")
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > maxClusterSize)
          .select("centroid_id")
        val small = base.join(broadcast(over), Seq("centroid_id"), "left_anti")
        // constant score -> the buffer's id-asc tie-break keeps the
        // maxClusterSize SMALLEST ids per over-cap cluster, bounded state
        val kept = base.join(broadcast(over), Seq("centroid_id"))
          .groupBy("centroid_id")
          .agg(top_k_by_score(lit(0d), col("id"), maxClusterSize).as("tk"))
          .select(col("centroid_id"), explode(col("tk").getField("id")).as("id"))
        val big = base.join(broadcast(kept), Seq("centroid_id", "id"))
        small.unionByName(big)
      }
    val l = participants.select(col("centroid_id"), col("id").as("a"),
      col("v").as("va"), col("cdist").as("da"))
    val r = participants.select(col("centroid_id"), col("id").as("b"),
      col("v").as("vb"), col("cdist").as("db"))
    // directed duplicate edges a -> b (each unordered pair appears twice,
    // once per direction, so one groupBy(a) sees every neighborhood)
    val edges = l.join(r, "centroid_id")
      .filter(col("a") =!= col("b"))
      .filter(cosine_sim(col("va"), col("vb")) >= threshold)
      .select(col("a"), col("da"), col("b"), col("db"))
    // farthest-from-centroid survives: negL2 is HIGHER when closer, so a
    // is dominated by any duplicate neighbor with a smaller negL2 (or an
    // equal one and a smaller id)
    val verdicts = edges.groupBy(col("a").as("id"))
      .agg(
        count(lit(1)).as("n_dups"),
        max(when(col("db") < col("da") ||
          (col("db") === col("da") && col("b") < col("a")), 1).otherwise(0))
          .as("dominated"))
    base.select(col("id"), col("centroid_id"))
      .join(verdicts, Seq("id"), "left")
      .select(col("id"), col("centroid_id"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        (coalesce(col("dominated"), lit(0)) === 0).as("keep"))
  }

  /** Survivor selection with a KEEP-BEST policy over transitive dup
    * clusters — what a production dedup actually ships (min-id survivors
    * are arbitrary; pipelines keep the best-quality copy per cluster,
    * e.g. the longest or highest-scoring one). `labels` is
    * [[connectedComponents]] output (doc, label); docs absent from it are
    * singletons and survive as their own cluster. `score` is any
    * orderable quality column of the doc row (length, a u08 classifier
    * score, ...) — kept in its NATIVE type (no silent integer
    * truncation of a fractional score); highest wins, ties to the
    * SMALLEST id so the choice is total and engine-independent.
    *
    * Scale shape: one left join against the (cluster-sized) label table,
    * one map-side-combined hash agg picking each cluster's argmax via
    * `max(struct(score, -id))` — never a per-cluster window sort (a
    * degenerate giant cluster costs one combiner slot per partition) —
    * and one hash join back on the cluster key.
    *
    * Output: (idCol, cluster, keep). */
  def keepBest(docs: DataFrame, labels: DataFrame, score: Column,
               idCol: String = "doc_id"): DataFrame = {
    val lab = labels.select(col("doc").cast("long").as(idCol),
      col("label").cast("long").as("_label"))
    val clustered = docs.select(col(idCol).cast("long").as(idCol),
        score.as("_score"))
      .join(lab, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("_label"), col(idCol)))
    val best = clustered.groupBy("cluster")
      .agg(max(struct(col("_score"), (-col(idCol)).as("_nid"))).as("_b"))
      .select(col("cluster").as("_cl"), (-col("_b._nid")).as("_bestId"))
    clustered.join(best, col("cluster") === col("_cl"))
      .select(col(idCol), col("cluster"),
        (col(idCol) === col("_bestId")).as("keep"))
  }
}
