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

  test("BM25 matches the hand-computed formula on a tiny corpus") {
    import spark.implicits._
    // 3 docs; "cat" in 2 of them, twice in doc 0; dl = 3, 2, 4
    val docs = Seq(
      (0L, "cat cat dog"),
      (1L, "cat fish"),
      (2L, "bird bird bird bird")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(5)).toMap
    val n = 3.0; val avgdl = 9.0 / 3.0
    def exp(tf: Double, df: Double, dl: Double): Double =
      ((n - df + 0.5) / (df + 0.5)) *
        ((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl))))
    assert(got((0L, "cat")) == exp(2, 2, 3))
    assert(got((1L, "cat")) == exp(1, 2, 2))
    assert(got((2L, "bird")) == exp(4, 1, 4))
    // rarer term outscores the common one despite lower tf (idf dominates)
    assert(got((0L, "dog")) > got((0L, "cat")))
    // at equal df, more occurrences score higher
    assert(got((2L, "bird")) > got((1L, "fish")))
  }

  test("cluster-balanced sample caps every cluster and orders by stable id hash") {
    import spark.implicits._
    // cluster 1 has 50 members (skewed), cluster 2 has 3
    val assigned = ((0L until 50L).map(i => (i, 1L)) ++
      Seq((100L, 2L), (101L, 2L), (102L, 2L))).toDF("vec_id", "centroid_id")
    val got = graft.operators.Sampling
      .clusterBalancedSample(assigned, perCluster = 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byCluster = got.groupBy(_._1)
    assert(byCluster(1L).length == 10) // capped
    assert(byCluster(2L).length == 3)  // whole tail cluster kept
    // rank order = (md5-52-bit-prefix, id) ascending
    def h(id: Long): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13), 16)
    for ((_, rows) <- byCluster) {
      val sortedIds = rows.sortBy(_._2).map(_._3)
      assert(sortedIds.sortBy(id => (h(id), id)).toSeq == sortedIds.toSeq)
    }
    // membership is the hash-minimal subset, not arbitrary
    val kept1 = byCluster(1L).map(_._3).toSet
    val expect1 = (0L until 50L).sortBy(id => (h(id), id)).take(10).toSet
    assert(kept1 == expect1)
  }

  test("temperature mix: two-phase rank equals the single-window form, tail up-weighted") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // dominant group (400 docs) and tail group (25 docs)
    val docs = ((0L until 400L).map(i => (i, "big")) ++
      (400L until 425L).map(i => (i, "small"))).toDF("doc_id", "grp")
    val got = graft.operators.Sampling
      .temperatureMix(docs, "grp", docsPerSqrtDoc = 2.0)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))))
      .toMap
    // naive single-window reference: rank by (md5-52-bit prefix, id)
    def h(id: Long): BigInt = BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(13), 16)
    val w = Window.partitionBy("grp").orderBy(
      org.apache.spark.sql.functions.conv(
        substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
        .cast("decimal(38,0)"), col("doc_id"))
    val want = docs
      .withColumn("rank", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).map {
        case (id, g, rank) =>
          val n = if (g == "big") 400L else 25L
          val quota = math.floor(2.0 * math.sqrt(n.toDouble)).toLong
          id -> ((n, quota, rank, rank <= quota))
      }.toMap
    assert(got == want)
    // quotas: floor(2*sqrt(400)) = 40 of 400 (10%); floor(2*sqrt(25)) = 10
    // of 25 (40%) — the tail is up-weighted, both quotas bind
    assert(got.count { case (_, (_, _, _, sel)) => sel } == 50)
    val kept = got.values.groupBy(_._1).map { case (n, vs) => n -> vs.count(_._4) }
    assert(kept(400L) == 40 && kept(25L) == 10)
    // membership is the hash-minimal subset of each group
    val keptBig = got.collect { case (id, (400L, _, _, true)) => id }.toSet
    assert(keptBig == (0L until 400L).sortBy(id => (h(id), id)).take(40).toSet)
  }

  test("LM score: bitlen cross-entropy matches hand-computed bigram counts") {
    import spark.implicits._
    // bigrams — doc0: (a,b)x2, (b,a); doc1: (a,c); doc2: none (1 token)
    // LM: c2(a,b)=2, c2(b,a)=1, c2(a,c)=1; c1(a)=3, c1(b)=1
    // bits: (a,b) = bitlen(3)-bitlen(2) = 0; (b,a) = 0; (a,c) = 2-1 = 1
    val docs = Seq(
      (0L, "a b a b"),
      (1L, "a c"),
      (2L, "x")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.lmScore(docs).orderBy("doc_id").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r(0) == ((0L, 3L, 0L, 0.0)))   // fluent: repeated bigrams cost 0
    assert(r(1) == ((1L, 1L, 1L, 1.0)))   // rarer continuation costs bits
    assert(r(2) == ((2L, 0L, 0L, 0.0)))   // no bigrams
  }

  test("LM score plan: hash aggregations only — no window, no cartesian product") {
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val p = TextAnalysis.lmScore(docs).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!p.contains("Window"), p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("budget sample: two-phase prefix equals the single-window form, budget binds exactly") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // synthetic skewed groups: scores spread across buckets, duplicate
    // scores inside one bucket, one group entirely under budget, plus
    // the desc-order edge rows — NaN (sorts FIRST) and null (sorts LAST)
    val docs = ((0L until 200L).map { i =>
      val g = if (i % 4 == 0) "a" else if (i % 4 == 1) "b" else "a"
      val score = ((i * 37) % 101).toDouble / 101.0
      (i, g, Option(score), 10L + i % 7)
    } ++ Seq(
      (200L, "a", Option(Double.NaN), 11L),
      (201L, "b", Option.empty[Double], 12L),
      (202L, "a", Option.empty[Double], 13L)
    )).toDF("doc_id", "grp", "score", "n")
    val got = graft.operators.Sampling.budgetSample(
      docs, "grp", col("score"), col("n"), budget = 300L, resolution = 16)
      .collect().map(r => r.getLong(0) -> ((r.getLong(3), r.getBoolean(4)))).toMap
    // naive single-window reference
    val w = Window.partitionBy("grp").orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val want = docs.withColumn("cum", sum(col("n")).over(w))
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(4) <= 300L))).toMap
    assert(got == want)
    assert(got.values.exists(_._2) && got.values.exists(!_._2)) // budget binds
  }
}
