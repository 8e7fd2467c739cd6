package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Byte-pair-encoding tokenizer training — the real thing, not the
  * regex proxy (TextAnalysis.subwordCount): greedy corpus-frequency
  * symbol merges (Sennrich et al. 2016) trained on the WORD-FREQUENCY
  * table, which is how production trainers scale — the corpus collapses
  * to its distinct vocabulary (one hash aggregation over the 100 TB
  * text; Heaps' law keeps the vocab in the millions), and every merge
  * round is a tiny aggregation over that vocab, never a corpus rescan.
  *
  * Determinism contract (shared verbatim with the SQL oracle):
  *   - a word's symbol string is " c1 c2 ... cn " (space-separated
  *     symbols with sentinel spaces; no end-of-word marker),
  *   - pair frequency = sum of word freqs containing the adjacent pair
  *     (counted once per adjacent position),
  *   - best pair = max count, ties to the lexicographically SMALLEST
  *     "a b" pair string,
  *   - a merge rewrites " a b " -> " ab " via plain leftmost
  *     non-overlapping string replace applied `repl` times — enough to
  *     reach the exhaustive-merge fixpoint for any word shorter than
  *     2^repl symbols, and a no-op after it; both engines' replace()
  *     resumes scanning AFTER the inserted text, so even mid-fixpoint
  *     states are identical.
  */
object Bpe {

  /** " c1 c2 ... cn " symbol string of a word (one regex pass). */
  def spacedSymbols(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** (word, freq) vocabulary of a corpus — THE scale step: everything
    * after this is vocab-sized. */
  def vocab(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.core.Shingling.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Adjacent-pair frequencies of the current symbol strings:
    * (pair "a b", cnt). */
  def pairCounts(words: DataFrame): DataFrame = {
    val t = filter(split(col("s"), " "), x => x =!= "")
    words.select(col("freq"), t.as("t"))
      .select(col("freq"), explode(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("pair"))
      .groupBy("pair").agg(sum("freq").as("cnt"))
  }

  /** Apply one merge (" a b " -> " ab ") `repl` times. */
  def applyMerge(s: Column, pair: String, repl: Int): Column = {
    val merged = " " + pair.replace(" ", "") + " "
    (0 until repl).foldLeft(s)((acc, _) =>
      replace(acc, lit(s" $pair "), lit(merged)))
  }

  /** Checkpointed-vocab partition bound: small enough that a round's
    * scheduler overhead stays negligible (the coalesce rationale holds
    * at 1 vs 200, not 1 vs 32), large enough that each round's
    * pair-explode map stage parallelizes — a 10M-word vocab at extreme
    * scale never serializes ~10^8 pair rows through ONE task, which is
    * exactly what a coalesce(1) checkpoint would do. */
  private val VocabPartitions = 32

  /** Eager round checkpoint at the bounded partition count (exposed so
    * BpeSpec can pin that no round serializes onto one task). */
  private[graft] def checkpointVocab(df: DataFrame): DataFrame =
    df.coalesce(VocabPartitions).localCheckpoint(true)

  /** Train `rounds` greedy merges over the corpus vocabulary. Returns
    * (round 1.., pair "a b", cnt) — the learned merge table, in order.
    * Driver-coordinated loop like the k-means trainer (Ann.kmeansTrain):
    * one tiny vocab-sized aggregation collected per round. */
  def trainMerges(docs: DataFrame, rounds: Int, textCol: String = "text",
                  repl: Int = 12): DataFrame = {
    val spark = docs.sparkSession
    var words = checkpointVocab(vocab(docs, textCol)
      .select(col("word"), col("freq"), spacedSymbols(col("word")).as("s")))
    val merges = Seq.newBuilder[(Int, String, Long)]
    var r = 1
    while (r <= rounds) {
      val top = pairCounts(words).orderBy(col("cnt").desc, col("pair")).limit(1)
        .collect()
      if (top.nonEmpty) {
        val pair = top(0).getString(0)
        merges += ((r, pair, top(0).getLong(1)))
        val next = checkpointVocab(
          words.withColumn("s", applyMerge(col("s"), pair, repl)))
        // the eager localCheckpoint above fully materialized `next`, so
        // the superseded round's blocks can go now — without this the
        // trainer holds rounds × vocab-sized RDD blocks until session end
        // (releaseFrame knows checkpoint-backed frames need RDD-level
        // unpersist, which Dataset.unpersist silently skips)
        graft.api.QueryEngine.releaseFrame(words)
        words = next
      }
      r += 1
    }
    import spark.implicits._
    merges.result().toDF("round", "pair", "cnt")
  }

  /** Tokenize text under a learned merge table: per word, replay the
    * merges in order (same replace contract), then count symbols.
    * Output: input + n_bpe_tokens. A pure projection — the 100 TB
    * application pass is shuffle-free; `mergeList` is a driver-held
    * array (vocab-trained, typically 10k-100k merges) compiled into the
    * expression. */
  def countBpeTokens(docs: DataFrame, mergePairs: Seq[String],
                     textCol: String = "text", repl: Int = 12): DataFrame = {
    // ONE codegen kernel holding the merge list as a driver-side array
    // (Kernels.bpeCountTokens) instead of a Column fold nesting
    // 12 x |merges| replace nodes: the fold's plan depth overflowed the
    // Column->Expression conversion stack at ~30 merges (round-12
    // real-corpus smoke) — a production merge list is thousands.
    // Semantically exact to the fold (spec-pinned against it).
    val toks = graft.core.Shingling.tokens(lower(col(textCol)))
    docs.withColumn("n_bpe_tokens",
      coalesce(graft.functions.GraftFunctions.bpe_count_tokens(toks, mergePairs, repl),
        lit(0)))
  }
}
