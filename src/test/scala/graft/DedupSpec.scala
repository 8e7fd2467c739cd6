package graft

import graft.operators.{Dedup, SkewAgg, TextAnalysis}
import org.apache.spark.sql.functions._

/** Dedup operators over corpora with planted duplicates, language-ID
  * sanity, and the salted skew aggregation. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  // planted corpus: 0/1 identical, 2 near-dup of 0 (one word changed),
  // 3 unrelated, 4/5 identical short docs
  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "same short doc"),
    (5L, "same short doc")
  ).toDF("doc_id", "text").cache()

  test("exact dedup groups identical texts, keeps smallest id") {
    val g = Dedup.exact(docs).filter(col("cnt") > 1)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(g == Set((2L, 0L), (2L, 4L))) // (cnt, keep_id)
  }

  test("MinHash-LSH near-dup finds identical pairs at score 1.0 and the near pair") {
    val pairs = Dedup.nearMinHashLsh(docs, k = 2, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val m = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(m((0L, 1L)) == 1.0)
    assert(m((4L, 5L)) == 1.0)
    assert(m.contains((0L, 2L)) && m((0L, 2L)) < 1.0 && m((0L, 2L)) >= 0.5)
    assert(!m.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("SimHash near-dup: identical docs at hamming 0, near-dup within budget") {
    val pairs = Dedup.nearSimHash(docs, hammingBudget = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) == 0)
    assert(pairs((4L, 5L)) == 0)
    assert(pairs.get((0L, 2L)).forall(_ > 0))
  }

  test("n-gram Jaccard: exact set similarity on LSH candidates") {
    val pairs = Dedup.ngramJaccard(docs, k = 2, threshold = 0.3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(pairs((0L, 1L)) == 1.0)
    // doc 2 differs in the last word: 8 of 9 bigrams shared => J = 8/10
    assert(pairs((0L, 2L)) == 0.8)
  }

  test("embedding cosine near-dup finds self-similar buckets") {
    val embs = spark.read.parquet(s"$testDataDir/embeddings.parquet")
    // duplicate a vector under a new id to plant a perfect pair
    val planted = embs.union(embs.filter(col("vec_id") === 0)
      .select(lit(100000L).as("vec_id"), col("embedding"), col("label")))
    val pairs = Dedup.nearEmbeddingCosine(planted, threshold = 0.999, planes = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((0L, 100000L)))
  }

  test("language-ID picks the stopword-dominant language") {
    val t = Seq(
      (1L, "the cat sat of the mat and it was a hat"),
      (2L, "el perro y la casa de que un gato no se"),
      (3L, "der hund und die katze in den garten von zu"),
      (4L, "xyz qwe rty")).toDF("doc_id", "text")
    val got = t.select(col("doc_id"), TextAnalysis.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en" && got(2L) == "es" && got(3L) == "de" && got(4L) == "und")
  }

  test("salted skew aggregation equals direct group-by exactly") {
    val events = spark.range(10000)
      .select(col("id"),
        (col("id") % 3).cast("string").as("k"),
        (col("id") % 97).cast("double").as("v"))
    val direct = events.groupBy("k")
      .agg(sum(col("v").cast("decimal(28,6)")).cast("double").as("sum_value"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = SkewAgg.saltedSumCount(events, "k", "v", "id", saltBuckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
  }

  test("bucketed postings table joins without shuffling the bucketed side") {
    val docs500 = spark.read.parquet(s"$testDataDir/documents.parquet")
    val eng = graft.api.QueryEngine.build(docs500,
      mp = graft.core.MinHashPipeline.Params(kShingle = 3))
    // warehouse dir is a static conf; the default ./spark-warehouse is
    // gitignored, so just use it — but clear any leftover location from a
    // previous JVM (the in-memory catalog won't know about it)
    spark.sql("DROP TABLE IF EXISTS graft_postings_b")
    val loc = new java.io.File("spark-warehouse/graft_postings_b")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    eng.saveBucketed("graft_postings_b", buckets = 8)
    val t = spark.table("graft_postings_b")
    val agg = t.groupBy("key64").agg(count(lit(1)).as("n"))
    val p = agg.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // bucketed on key64: aggregation by key64 needs no Exchange
    assert(!p.contains("Exchange"), p.take(2000))
    assert(t.count() == eng.index.count())
  }

  test("bucketed probe prunes buckets at the scan and matches the cached-index result") {
    val docs500 = spark.read.parquet(s"$testDataDir/documents.parquet")
    val eng = graft.api.QueryEngine.build(docs500,
      mp = graft.core.MinHashPipeline.Params(kShingle = 3))
    spark.sql("DROP TABLE IF EXISTS graft_postings_p")
    val loc = new java.io.File("spark-warehouse/graft_postings_p")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    eng.saveBucketed("graft_postings_p", buckets = 16)
    val t = spark.table("graft_postings_p")
    val qSig = eng.sigs.filter(col("doc_id") === 3).head().getSeq[Long](1).toArray
    val viaBucketed = graft.core.Lsh.querySignatureBucketed(eng.sigs, t, qSig, 5)
    // the probe's 32 key literals must reach the scan as bucket pruning:
    // the disk-resident index reads only matching bucket files, so probe
    // I/O stays flat as the index grows (the 100 TB probe path)
    val p = viaBucketed.queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
    assert(m.isDefined, p.take(3000))
    assert(m.get.group(1).toInt < m.get.group(2).toInt)
    val viaCached = graft.core.Lsh.querySignature(eng.sigs, eng.index, qSig, 5)
    assert(viaBucketed.collect().toSeq == viaCached.collect().toSeq)
  }

  test("bucketed BATCH probe prunes buckets and matches queryBatch, capped and uncapped") {
    val docs500 = spark.read.parquet(s"$testDataDir/documents.parquet")
    val eng = graft.api.QueryEngine.build(docs500,
      mp = graft.core.MinHashPipeline.Params(kShingle = 3))
    spark.sql("DROP TABLE IF EXISTS graft_postings_pb")
    val loc = new java.io.File("spark-warehouse/graft_postings_pb")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    // 3 queries x 32 bands = ≤96 distinct keys over 64 buckets: pruning
    // must select a strict subset (10 queries over 16 buckets covers all
    // 16 and proves nothing)
    eng.saveBucketed("graft_postings_pb", buckets = 64)
    val t = spark.table("graft_postings_pb")
    val queries = eng.sigs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"), col("sig"))
    for (cap <- Seq(0, 50)) {
      val viaBucketed = graft.core.Lsh.queryBatchBucketed(
        eng.sigs, t, queries, k = 5, maxCandidates = cap)
      // the batch's distinct key64 literals must engage bucket pruning —
      // candidate I/O bounded by the batch's buckets, not the index size
      val p = viaBucketed.queryExecution.executedPlan.toString
      val m = "SelectedBucketsCount: (\\d+) out of (\\d+)".r.findFirstMatchIn(p)
      assert(m.isDefined, p.take(3000))
      assert(m.get.group(1).toInt < m.get.group(2).toInt)
      val viaCached = graft.core.Lsh.queryBatch(
        eng.sigs, eng.index, queries, k = 5, maxCandidates = cap)
      val key = (r: org.apache.spark.sql.Row) =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(viaBucketed.collect().map(key).sortBy(identity).toSeq ==
        viaCached.collect().map(key).sortBy(identity).toSeq)
    }
  }

  test("bucketed postings self-join on key64 plans with no Exchange on either side") {
    val docs500 = spark.read.parquet(s"$testDataDir/documents.parquet")
    val eng = graft.api.QueryEngine.build(docs500,
      mp = graft.core.MinHashPipeline.Params(kShingle = 3))
    spark.sql("DROP TABLE IF EXISTS graft_postings_j")
    val loc = new java.io.File("spark-warehouse/graft_postings_j")
    if (loc.exists()) {
      import scala.reflect.io.Directory
      new Directory(loc).deleteRecursively()
    }
    eng.saveBucketed("graft_postings_j", buckets = 8)
    val t = spark.table("graft_postings_j")
    // force the non-broadcast path: the claim is that two co-bucketed
    // sides join with ZERO shuffles — the 100 TB repeated-similarity-join
    // co-location strategy (both sides partitioned by key64 on disk)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val l = t.select(col("key64"), col("id").as("a"))
      val r = t.select(col("key64"), col("id").as("b"))
      val j = l.join(r, "key64").filter(col("a") < col("b"))
      val p = j.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("Exchange"), p.take(3000))
      assert(p.contains("Join"), p.take(1000))
      assert(j.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("windowFingerprints O(n) recurrence equals folding each window directly") {
    import graft.core.Kernels
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    val hs = Array.fill(64)(math.abs(rnd.nextLong()) % graft.core.Mod61.Prime)
    for (w <- Seq(1, 3, 8, 64)) {
      val got = Kernels.windowFingerprints(new GenericArrayData(hs), w)
      assert(got.numElements() == 64 - w + 1)
      for (i <- 0 until got.numElements()) {
        val direct = Kernels.rollingFingerprint(
          new GenericArrayData(hs.slice(i, i + w)))
        assert(got.getLong(i) == direct, s"w=$w i=$i")
      }
    }
    // shorter than the window -> empty, not an error
    assert(Kernels.windowFingerprints(new GenericArrayData(hs.take(3)), 8)
      .numElements() == 0)
  }

  test("n-gram decontamination flags test docs sharing a train window, exact-only") {
    val train = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val test = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta different end"), // shares the 8-window prefix
      (11L, "totally unrelated words one two three four five six seven"),
      (12L, "alpha beta gamma delta epsilon zeta eta NOPE iota kappa") // 7-token overlap only -> clean
    ).toDF("doc_id", "text")
    val got = Dedup.ngramDecontaminate(train, test, w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(10L -> 1L, 11L -> 0L, 12L -> 0L))
  }

  test("decontamination boilerplate guard excludes high-frequency source windows") {
    val boiler = "license text alpha beta gamma delta epsilon zeta" // 8 tokens
    val train = Seq(
      // the boilerplate window appears in THREE distinct train docs
      (0L, s"$boiler one"),
      (1L, s"$boiler two"),
      (2L, s"$boiler three"),
      // a genuinely unique train window
      (3L, "unique content aa bb cc dd ee ff")
    ).toDF("doc_id", "text")
    val test = Seq(
      (10L, s"$boiler tail"),                    // shares only boilerplate
      (11L, "unique content aa bb cc dd ee ff"), // real contamination
      (12L, "nothing shared here at all one two three")
    ).toDF("doc_id", "text")
    val unguarded = Dedup.ngramDecontaminate(train, test, w = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unguarded(10L) >= 1L && unguarded(11L) == 1L && unguarded(12L) == 0L)
    val guarded = Dedup.ngramDecontaminate(train, test, w = 8, maxSourceDocFreq = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(guarded == Map(10L -> 0L, 11L -> 1L, 12L -> 0L),
      s"boilerplate (3 source docs > cap 2) must not count as contamination: $guarded")
  }

  test("substring-dup signals: identical docs fully duplicated, shared prefix detected, short docs zero") {
    val wide = Seq(
      // 0 and 1 identical (10 tokens -> 3 windows of 8, all duplicated)
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      // 2 shares only the first 8-token window with 0/1 (9th token differs)
      (2L, "alpha beta gamma delta epsilon zeta eta theta lambda mu"),
      // 3 unrelated, 4 too short for any window
      (3L, "one two three four five six seven eight nine ten"),
      (4L, "same short doc")
    ).toDF("doc_id", "text")
    val got = Dedup.substringDupSignals(wide, w = 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got(0L) == ((3L, 3L, 1.0)))
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 1L, 1.0 / 3.0))) // only the prefix window is shared
    assert(got(3L) == ((3L, 0L, 0.0)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("substring removal drops exactly the tokens covered by cross-doc dup windows") {
    val got = Dedup.substringDupRemove(docs, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // docs 0/1 identical, 10 tokens: all three 8-token windows are dups
    // -> every position covered -> fully removed
    assert(got(0L) == ((10L, 10L, "")))
    assert(got(1L) == ((10L, 10L, "")))
    // doc 2 differs from doc 0 only in the last token, so the windows
    // starting at 0 AND 1 both match doc 0 (neither sees position 9) ->
    // positions 0..8 covered, only the changed token survives
    assert(got(2L) == ((10L, 9L, "lambda")))
    // unrelated doc untouched; sub-window-length docs have no windows
    assert(got(3L) == ((10L, 0L, "one two three four five six seven eight nine ten")))
    assert(got(4L) == ((3L, 0L, "same short doc")))
    assert(got(5L) == ((3L, 0L, "same short doc")))
  }

  test("decontamination removal scrubs exactly the train-covered test tokens") {
    val train = docs.filter(col("doc_id") === 0L)
    val test = docs.filter(col("doc_id").isin(2L, 3L, 4L))
    val got = Dedup.decontaminateRemove(train, test, w = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // only test rows come back
    assert(got.keySet == Set(2L, 3L, 4L))
    // doc 2 shares the windows starting at 0 and 1 with train doc 0 ->
    // positions 0..8 scrubbed, the changed last token survives
    assert(got(2L) == ((10L, 9L, "lambda")))
    // clean test doc untouched; sub-window doc has no windows
    assert(got(3L) == ((10L, 0L, "one two three four five six seven eight nine ten")))
    assert(got(4L) == ((3L, 0L, "same short doc")))
  }

  test("SemDeDup keeps the farthest-from-centroid of each in-cluster duplicate set") {
    // cluster 0 centroid (1,0): ids 0/1/5 colinear (cosine 1), id 4 opposite;
    // cluster 1 centroid (0,1): ids 2/3 colinear
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)),  // dist 0 to c0 — dominated by 1 and 5
      (1L, Array(2.0f, 0.0f)),  // dist 1 — ties with 5, smaller id survives
      (5L, Array(2.0f, 0.0f)),  // dist 1 — dominated by 1 on the id tiebreak
      (4L, Array(-1.0f, 0.0f)), // cosine -1 with all of cluster 0 — no dups
      (2L, Array(0.0f, 0.5f)),  // dist 0.5 to c1 — dominated by 3
      (3L, Array(0.0f, 3.0f))   // dist 2 — survives
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)))
      .toDF("centroid_id", "cv")
    val assigned = Seq((0L, 0L), (1L, 0L), (5L, 0L), (4L, 0L), (2L, 1L), (3L, 1L))
      .toDF("id", "centroid_id")
    val got = Dedup.semanticDedup(embs, cents, assigned, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(0L) == ((2L, false)))
    assert(got(1L) == ((2L, true)))
    assert(got(5L) == ((2L, false)))
    assert(got(4L) == ((0L, true)))
    assert(got(2L) == ((1L, false)))
    assert(got(3L) == ((1L, true)))
  }

  test("SemDeDup cluster cap bounds pair enumeration to the smallest ids") {
    // one hot cluster of 6 colinear vectors; cap=3 -> only ids 0,1,2
    // enumerate pairs; 3,4,5 pass through keep=true/n_dups=0 (the
    // documented recall trade of the bounded candidate generator)
    val embs = (0L to 5L).map(i => (i, Array((i + 1).toFloat, 0.0f)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0f, 0.0f))).toDF("centroid_id", "cv")
    val assigned = (0L to 5L).map(i => (i, 0L)).toDF("id", "centroid_id")
    val got = Dedup.semanticDedup(embs, cents, assigned, threshold = 0.9,
      maxClusterSize = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(got.keySet == (0L to 5L).toSet) // every input row still emitted
    // among {0,1,2}: farthest from centroid (1,0) is id 2 (dist 2)
    assert(got(0L) == ((2L, false)))
    assert(got(1L) == ((2L, false)))
    assert(got(2L) == ((2L, true)))
    // beyond the cap: no candidates generated
    assert(got(3L) == ((0L, true)))
    assert(got(4L) == ((0L, true)))
    assert(got(5L) == ((0L, true)))
    // cap larger than every cluster -> identical to the uncapped run
    val capped = Dedup.semanticDedup(embs, cents, assigned, threshold = 0.9,
      maxClusterSize = 100).collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    val uncapped = Dedup.semanticDedup(embs, cents, assigned, threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(3))).toSet
    assert(capped == uncapped)
  }

  test("incremental dedup classifies a batch exact / near / new with precedence") {
    import graft.core.MinHashPipeline
    // corpus = planted docs 0..5; batch: 10 = copy of 0 (exact, and also a
    // near hit — exact must win), 11 = near-dup of 0 (one word changed),
    // 12 = unrelated fresh text
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta iota mu"),
      (12L, "completely different words about weather rain sun cloud wind storm")
    ).toDF("doc_id", "text")
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      MinHashPipeline.withSignature(df, "text",
        MinHashPipeline.Params(kShingle = 2)).select("doc_id", "sig")
    val got = Dedup.incrementalStatus(docs, sigsOf(docs), batch, sigsOf(batch),
      threshold = 0.5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(10L -> "exact", 11L -> "near", 12L -> "new"), got)
  }

  test("keepBest keeps the longest copy per transitive cluster, ties to smallest id") {
    val pairs = Dedup.nearMinHashLsh(docs, k = 2, threshold = 0.5)
      .select(col("a"), col("b"))
    val labels = Dedup.connectedComponents(pairs)
    val out = Dedup.keepBest(docs, labels, length(col("text")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // cluster {0,1,2} labels to 0; doc 2 ("...lambda") is one char longer
    // than the identical 0/1 — the best copy survives, not the min id
    assert(out(2L) == ((0L, true)), out)
    assert(!out(0L)._2 && !out(1L)._2)
    // cluster {4,5}: equal lengths -> tie to the smallest id
    assert(out(4L) == ((4L, true)) && out(5L) == ((4L, false)))
    // 3 is a singleton: its own cluster, survives
    assert(out(3L) == ((3L, true)))
  }
}
