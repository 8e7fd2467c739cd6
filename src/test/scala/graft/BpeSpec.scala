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

  test("replace contract property: Spark applyMerge == JVM leftmost non-overlapping replace") {
    // The whole cross-engine determinism story rests on one semantic:
    // a merge is `repl` rounds of leftmost non-overlapping replace that
    // resumes scanning AFTER the inserted text — exactly what BOTH
    // java.lang.String.replace and DuckDB's replace() implement. Pin
    // Spark's Column replace to the JVM reference on adversarial
    // symbol strings: self-overlapping pairs ("a a" in runs of a),
    // interleavings, and words long enough that repl rounds stop SHORT
    // of the fixpoint — the mid-fixpoint state must match exactly too.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def refApply(s: String, pair: String, repl: Int): String = {
      val merged = " " + pair.replace(" ", "") + " "
      (0 until repl).foldLeft(s)((acc, _) => acc.replace(s" $pair ", merged))
    }
    val symGen = Gen.oneOf("a", "b", "ab", "aa", "c")
    val wordGen = for {
      n <- Gen.choose(1, 40)
      syms <- Gen.listOfN(n, symGen)
    } yield syms.mkString(" ", " ", " ")
    val pairGen = for {
      x <- symGen; y <- symGen
    } yield s"$x $y"
    val cases = (0 until 300).flatMap { i =>
      val p = Gen.Parameters.default
      for {
        w <- wordGen(p, Seed(100L + i))
        pr <- pairGen(p, Seed(900L + i))
        repl <- Gen.choose(1, 3).apply(p, Seed(1700L + i))
      } yield (w, pr, repl)
    }
    // adversarial fixed cases: an 8192-symbol self-overlapping run (one
    // pass leaves a mid-fixpoint mix of 'aa'/'a' whose exact layout is
    // pure resume-after-replacement semantics), the 4-symbol run whose
    // fixpoint needs a SECOND pass (repl=1 pins the mid-fixpoint state,
    // repl=2 the fixpoint), and odd-length runs
    val adversarial = Seq(
      (Array.fill(8192)("a").mkString(" ", " ", " "), "a a", 1),
      (Array.fill(8192)("a").mkString(" ", " ", " "), "a a", 12),
      (" a a a a ", "a a", 1),
      (" a a a a ", "a a", 2),
      (Array.fill(257)("b").mkString(" ", " ", " "), "b b", 2),
      (" a a a a a ", "a a", 1))
    val all = cases ++ adversarial
    val df = all.zipWithIndex
      .map { case ((w, _, _), i) => (i, w) }.toDF("id", "s")
    // one plan per distinct (pair, repl): group cases so the whole
    // property run stays a handful of Spark jobs
    all.zipWithIndex.groupBy { case ((_, pr, repl), _) => (pr, repl) }
      .foreach { case ((pr, repl), group) =>
        val ids = group.map(_._2)
        val got = df.filter(col("id").isin(ids: _*))
          .select(col("id"), Bpe.applyMerge(col("s"), pr, repl).as("out"))
          .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
        group.foreach { case ((w, _, _), i) =>
          assert(got(i) == refApply(w, pr, repl),
            s"pair='$pr' repl=$repl word=${w.take(60)}")
        }
      }
    // the explicit mid-fixpoint witness: one pass on 4 a's leaves
    // " aa a a " (resume-after-replacement skipped the second pair);
    // the second pass finishes — repl genuinely changes the output, so
    // the grouped cases above really did exercise mid-fixpoint states
    assert(refApply(" a a a a ", "a a", 1) == " aa a a ")
    assert(refApply(" a a a a ", "a a", 2) == " aa aa ")
  }

  test("round checkpoints keep a multi-task vocab — no round serializes the pair explode onto one core") {
    // a coalesce(1) checkpoint would make EVERY round's pairCounts map
    // stage a single task (at a 10M-word vocab that's ~10^8 pair rows
    // through one core per round); the bounded coalesce must preserve
    // parallelism whenever the upstream has it
    val wide = spark.range(0, 1000).selectExpr(
      "concat('w', id) AS word", "1L AS freq", "concat(' w ', id, ' ') AS s")
      .repartition(32)
    val ck = Bpe.checkpointVocab(wide)
    assert(ck.rdd.getNumPartitions > 1, s"got ${ck.rdd.getNumPartitions}")
    assert(ck.rdd.getNumPartitions <= 32)
    graft.api.QueryEngine.releaseFrame(ck)
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

  test("bpe_count_tokens kernel == the Column-fold construction, and survives big merge lists") {
    // the kernel replaced a fold that nested 12 x |merges| replace nodes
    // into one expression (stack overflow at ~30 merges, found by the
    // round-12 real-corpus smoke). Pin semantic equality against the
    // ORIGINAL construction on adversarial inputs — unicode incl. an
    // astral (surrogate-pair) code point, overlap chains, punctuation,
    // repeated merges — then pin that a production-sized list runs.
    val docs = Seq(
      "aaaa aaaaa aaaaaa",
      "low lower lowest",
      "café naïve 😀x😀",
      "a,b.c!!! ... (parens) [brackets]",
      "mixed CASE Mixed case",
      "").toDF("text")
    val pairs = Seq("a a", "aa aa", "l o", "lo w", ". .", "( p")
    def oldForm(textCol: String): org.apache.spark.sql.Column = {
      val toks = graft.core.Shingling.tokens(lower(col(textCol)))
      val perWord = transform(toks, w => {
        val merged = pairs.foldLeft(Bpe.spacedSymbols(w))(
          (acc, p) => Bpe.applyMerge(acc, p, 12))
        size(filter(split(merged, " "), x => x =!= ""))
      })
      coalesce(aggregate(perWord, lit(0), (a, x) => a + x), lit(0))
    }
    val both = docs
      .withColumn("old", oldForm("text"))
      .join(Bpe.countBpeTokens(docs, pairs), Seq("text"))
      .select("text", "old", "n_bpe_tokens").collect()
    both.foreach(r => assert(r.getInt(1) == r.getInt(2), r.getString(0)))
    // a big learned-style merge list: the old fold overflowed the
    // Column->Expression conversion stack here; the kernel must not
    val big = (0 until 500).map(i => s"x$i y$i")
    val n = Bpe.countBpeTokens(docs, big).agg(sum("n_bpe_tokens")).head().getLong(0)
    assert(n > 0)
  }
}
