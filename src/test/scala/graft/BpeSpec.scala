package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("BPE merges match the hand-derived sequence on the classic corpus") {
    // low x3, lower, lowest
    val docs = Seq("low lower lowest", "low low").toDF("text")
    val merges = Bpe.trainMerges(docs, rounds = 4)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(merges.toSeq == Seq(
      (1, "l o", 5L),   // ties (l o)=(o w)=5 -> lexicographically smaller
      (2, "lo w", 5L),
      (3, "low e", 2L),
      (4, "lowe r", 1L) // ties at 1 -> "lowe r" < "lowe s" < "s t"
    ))
  }

  test("merge application reaches the exhaustive fixpoint through repeated replace") {
    val docs = Seq("aaaa").toDF("text")
    val merges = Bpe.trainMerges(docs, rounds = 2)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    // 3 adjacent (a,a) positions; after the merge the word is [aa][aa],
    // which requires replace to fire twice (resume-after-replacement
    // leaves " aa a a " after one pass)
    assert(merges.toSeq == Seq((1, "a a", 3L), (2, "aa aa", 1L)))
  }

  test("countBpeTokens replays the learned merges as a pure projection") {
    val docs = Seq("low lower lowest", "low low").toDF("text")
    val pairs = Bpe.trainMerges(docs, rounds = 3)
      .collect().map(_.getString(1)).toSeq // l o, lo w, low e
    val got = Bpe.countBpeTokens(docs, pairs)
      .select("n_bpe_tokens").collect().map(_.getInt(0)).toSeq
    // "low"->1 [low]; "lower"->2 [lowe r]; "lowest"->3 [lowe s t]
    assert(got == Seq(1 + 2 + 3, 1 + 1))
    val plan = Bpe.countBpeTokens(docs, pairs).queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), plan)
  }
}
