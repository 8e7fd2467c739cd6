package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {

  test("repetition signals match hand-computed values") {
    import spark.implicits._
    // "a b a b a": 5 tokens, 3 distinct 'a', 2 'b' -> distinct 2/5,
    // top token 3/5; bigrams: "a b","b a","a b","b a" -> top 2/4
    val docs = Seq(
      (0L, "a b a b a"),
      (1L, "x"),          // 1 token: no bigrams -> frac 0.0
      (2L, "  "),         // whitespace only: zero tokens -> all zeros
      (3L, "u v w")       // all distinct: ratios 1.0, 1/3, bigram 1/2
    ).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionSignals(docs).orderBy("doc_id").collect()
    assert(r(0).getLong(1) == 5L)
    assert(r(0).getDouble(2) == 2.0 / 5)
    assert(r(0).getDouble(3) == 3.0 / 5)
    assert(r(0).getDouble(4) == 2.0 / 4)
    assert(r(1).getLong(1) == 1L && r(1).getDouble(4) == 0.0)
    assert(r(2).getLong(1) == 0L && r(2).getDouble(2) == 0.0)
    assert(r(3).getDouble(2) == 1.0 && r(3).getDouble(3) == 1.0 / 3 &&
      r(3).getDouble(4) == 1.0 / 2)
  }

  test("repetition signals stay a shuffle-free projection") {
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val p = TextAnalysis.repetitionSignals(docs).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("* Project"), p.take(2000)) // '*' = inside WholeStageCodegen
  }
}
