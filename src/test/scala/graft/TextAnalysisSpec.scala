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

  test("PII redaction scrubs emails and phone runs, leaves clean text alone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      "write to bob.smith+x@corp.example.org today",
      "call +1 555 123 4567 now",
      "nothing sensitive here",
      "two hits: a@b.io and 555-123-9999")
      .toDF("text").select(TextAnalysis.redactPii(col("text")).as("r"))
      .collect().map(_.getString(0))
    assert(rows(0) == "write to <EMAIL> today")
    assert(rows(1) == "call <PHONE> now")
    assert(rows(2) == "nothing sensitive here")
    assert(rows(3) == "two hits: <EMAIL> and <PHONE>")
  }

  test("sequence packing: chunk boundaries respect cumulative token counts per bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
      .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tokens"))
    val packed = graft.operators.Sampling.packSequences(
      docs, col("n_tokens"), budget = 512, buckets = 8)
      .collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("seq_id")))
    // recompute the packing per bucket in plain Scala and compare
    packed.groupBy(_._1).foreach { case (b, rows) =>
      val inOrder = rows.sortBy { case (_, id, _, _) =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)
      }
      var cum = 0L
      inOrder.foreach { case (_, _, tok, seqId) =>
        assert(seqId == b.toLong * (1L << 32) + cum / 512, s"bucket $b")
        cum += tok
      }
    }
    // a document appears exactly once
    assert(packed.map(_._2).distinct.length == packed.length)
  }
}
