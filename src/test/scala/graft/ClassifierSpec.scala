package graft

import graft.operators.Classifier
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned quality filter (u08): exact-integer fit invariants, the
  * prior-matched cutoff contract, the two-phase-rank == naive-window
  * equivalence, and the kernel's code-point discipline. */
class ClassifierSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(s"$testDataDir/documents.parquet")

  test("prior-matched cutoff keeps exactly nPos docs; the filter distills the rule") {
    val feat = Classifier.labeledFeatures(docs).cache()
    val model = Classifier.train(feat)
    val out = Classifier.scoreFilter(feat, model).cache()
    val kept = out.filter(col("keep")).count()
    assert(kept == model.nPos, s"kept $kept != quota ${model.nPos}")
    // distillation quality: the learned score must agree with the rule
    // label far above chance (sim'd 0.95 precision at this corpus; 0.85
    // is the drift alarm, not the target)
    val tp = out.filter(col("keep") && col("label") === 1).count()
    assert(tp.toDouble / kept >= 0.85, s"precision ${tp.toDouble / kept}")
    // both classes must exist or the gate corpus went degenerate
    assert(model.nPos > 0 && model.nPos < model.n)
    feat.unpersist(); out.unpersist()
  }

  test("two-phase bucket rank equals the naive single-window global rank") {
    val feat = Classifier.labeledFeatures(docs).cache()
    val model = Classifier.train(feat)
    val twoPhase = Classifier.scoreFilter(feat, model)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val score = (1 to Classifier.NumFeatures)
      .map(j => lit(model.w(j - 1)) * col(s"x$j")).reduce(_ + _)
    val naive = feat.withColumn("score", score)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), (col("rank") <= model.nPos).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(twoPhase == naive)
    feat.unpersist()
  }

  test("training sums are partitioning-invariant (exact integer arithmetic)") {
    val feat = Classifier.labeledFeatures(docs)
    val a = Classifier.train(feat)
    val b = Classifier.train(feat.repartition(17))
    assert(a.w.toSeq == b.w.toSeq && a.nPos == b.nPos && a.n == b.n)
  }

  test("textStats counts code points and raw-token stats") {
    import graft.functions.GraftFunctions.text_stats
    import spark.implicits._
    // astral plane char (2 UTF-16 units, 1 code point) + repeated token
    val r = Seq("ab ab cd 😀x, 'q'").toDF("text")
      .select(text_stats(col("text")).as("st")).head().getSeq[Long](0)
    val Seq(ntok, ndis, topcnt, nchars, letters, punct, sumlen) = r.toSeq
    assert(ntok == 5 && ndis == 4 && topcnt == 2)
    // "ab ab cd 😀x, 'q'" = 16 code points (emoji is ONE)
    assert(nchars == 16, s"nchars $nchars")
    assert(letters == 8) // a b a b c d x q
    assert(punct == 3) // comma + two apostrophes
    assert(sumlen == 2 + 2 + 2 + 3 + 3) // 😀x, is 3 code points
  }

  test("score filter plan: rank window partitions by bucket; no corpus-wide sort task") {
    val feat = Classifier.labeledFeatures(docs)
    val model = Classifier.train(feat)
    val out = Classifier.scoreFilter(feat, model)
    val p = out.queryExecution.executedPlan.toString
    val rn = p.indexOf("row_number()")
    assert(rn >= 0, p.take(3000))
    // the per-doc rank window must carry the score-bucket partition key
    val spec = p.substring(rn, math.min(p.length, rn + 300))
    assert(spec.contains("_bucket"), spec)
  }
}
