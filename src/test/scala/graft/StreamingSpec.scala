package graft

import graft.core.{Lsh, MinHashPipeline}
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Streaming semantics: each streaming operator must agree with its batch
  * equivalent on the same data (micro-batch execution over MemoryStream). */
class StreamingSpec extends SparkSpec {
  import org.apache.spark.sql.SparkSession

  private def withQuery[T](q: org.apache.spark.sql.streaming.StreamingQuery)(f: => T): T =
    try { q.processAllAvailable(); f } finally q.stop()

  test("streaming MinHash signatures equal batch signatures") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq((0L, "a b c d e"), (1L, "x y z"), (2L, "a b a b"))
    val stream = MemoryStream[(Long, String)]
    stream.addData(docs: _*)
    val streamed = Streams.signatures(
      stream.toDF().toDF("doc_id", "text"), "text",
      MinHashPipeline.Params(kShingle = 2))
      .select("doc_id", "sig")
    val q = streamed.writeStream.format("memory").queryName("sigs_stream")
      .outputMode("append").start()
    withQuery(q) {
      val got = spark.table("sigs_stream").orderBy("doc_id").collect()
      val want = MinHashPipeline.withSignature(
        docs.toDF("doc_id", "text"), "text", MinHashPipeline.Params(kShingle = 2))
        .select("doc_id", "sig").orderBy("doc_id").collect()
      assert(got.map(_.getSeq[Long](1)).toSeq == want.map(_.getSeq[Long](1)).toSeq)
    }
  }

  test("watermarked sliding window agg matches the batch sliding groupBy") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(1, 5), "click", 1.0), (ts(1, 40), "click", 2.0), (ts(2, 10), "view", 3.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val agg = Streams.slidingCounts(stream.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("sliding_stream")
      .outputMode("complete").start()
    withQuery(q) {
      val got = spark.table("sliding_stream")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      // batch twin: every event in 4 overlapping 1h windows, 15-min slide
      val batch = rows.toDF("ts", "event_type", "value")
        .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
        .agg(count(org.apache.spark.sql.functions.lit(1)).as("n_events"))
        .select(col("w.start"), col("event_type"), col("n_events"))
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(got == batch, got.toString)
      // each event appears in exactly 4 windows
      assert(got.toSeq.map(_._3).sum == rows.length * 4)
    }
  }

  test("watermarked hourly window agg matches batch groupBy") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq(
      (ts(0, 5), "click", 1.0), (ts(0, 45), "click", 2.0),
      (ts(1, 10), "view", 3.0), (ts(1, 20), "click", 4.0), (ts(3, 0), "view", 5.0))
    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(rows: _*)
    val agg = Streams.hourlyCounts(stream.toDF().toDF("ts", "event_type", "value"))
    val q = agg.writeStream.format("memory").queryName("hourly_stream")
      .outputMode("complete").start()
    withQuery(q) {
      val got = spark.table("hourly_stream")
        .orderBy("hour_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(got.toSeq == Seq(
        (ts(0, 0), "click", 2L, 3.0),
        (ts(1, 0), "click", 1L, 4.0),
        (ts(1, 0), "view", 1L, 3.0),
        (ts(3, 0), "view", 1L, 5.0)))
    }
  }

  test("session windows split on gap") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val rows = Seq( // user 7: two sessions separated by > 30 min
      (ts(0, 0), 7L, 1.0), (ts(0, 10), 7L, 1.0), (ts(2, 0), 7L, 1.0),
      (ts(0, 5), 8L, 1.0))
    val stream = MemoryStream[(Timestamp, Long, Double)]
    stream.addData(rows: _*)
    val sess = Streams.sessionize(stream.toDF().toDF("ts", "user_id", "value"))
    val q = sess.writeStream.format("memory").queryName("sess_stream")
      .outputMode("complete").start()
    withQuery(q) {
      val got = spark.table("sess_stream").orderBy("user_id", "session_start")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(3)))
      assert(got.toSeq == Seq(
        (7L, ts(0, 0), 2L), (7L, ts(2, 0), 1L), (8L, ts(0, 5), 1L)))
    }
  }

  test("flatMapGroupsWithState dedups events per user across batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[Streams.Seen]
    val deduped = Streams.dedupEvents(stream.toDS())
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    stream.addData(Streams.Seen(1, 100), Streams.Seen(1, 101), Streams.Seen(2, 100))
    q.processAllAvailable()
    stream.addData(Streams.Seen(1, 100), Streams.Seen(1, 102)) // 100 is a dup
    q.processAllAvailable()
    try {
      val got = spark.table("dedup_stream").orderBy("userId", "eventId")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSeq == Seq((1L, 100L), (1L, 101L), (1L, 102L), (2L, 100L)))
    } finally q.stop()
  }

  test("transformWithState MapState ledger dedups per user across batches (RocksDB provider)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val provKey = "spark.sql.streaming.stateStore.providerClass"
    val prevProv = spark.conf.getOption(provKey)
    spark.conf.set(provKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[Streams.Seen]
      val deduped = Streams.dedupEventsTws(stream.toDS())
      val q = deduped.writeStream.format("memory").queryName("dedup_tws_stream")
        .outputMode("append").start()
      stream.addData(Streams.Seen(1, 100), Streams.Seen(1, 101), Streams.Seen(2, 100))
      q.processAllAvailable()
      // 100 dups within-key across batches; same eid on another key is fresh
      stream.addData(Streams.Seen(1, 100), Streams.Seen(1, 102), Streams.Seen(2, 101))
      q.processAllAvailable()
      try {
        val got = spark.table("dedup_tws_stream").orderBy("userId", "eventId")
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assert(got.toSeq ==
          Seq((1L, 100L), (1L, 101L), (1L, 102L), (2L, 100L), (2L, 101L)))
      } finally q.stop()
    } finally prevProv match {
      case Some(p) => spark.conf.set(provKey, p)
      case None => spark.conf.unset(provKey)
    }
  }

  test("foreachBatch LSH probe returns same top-k as batch query") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val sigs = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = 3)).select("doc_id", "sig").cache()
    val index = Lsh.postings(sigs, "doc_id", "sig").cache()
    val qSig = sigs.filter(col("doc_id") === 0).head().getSeq[Long](1).toArray

    val stream = MemoryStream[(Long, Seq[Long])]
    stream.addData((0L, qSig.toSeq))
    val results = scala.collection.mutable.ArrayBuffer[(Long, Int, Long)]()
    val q = Streams.probeStream(
      stream.toDF().toDF("query_id", "sig"), sigs, index, k = 5) { (df, _) =>
      results ++= df.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    }
    try { q.processAllAvailable() } finally q.stop()

    val want = Lsh.querySignature(sigs, index, qSig, k = 5)
      .collect().zipWithIndex.map { case (r, i) => (0L, i + 1, r.getLong(0)) }
    assert(results.sortBy(_._2).toSeq == want.toSeq)
  }

  test("built-in dropDuplicatesWithinWatermark dedups replayed event ids") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Long, Timestamp, Long)]
    stream.addData((1L, ts(0, 0), 100L), (1L, ts(0, 5), 100L), // replay of 100
      (1L, ts(0, 10), 101L), (2L, ts(0, 15), 100L)) // same id, other payload col is fine
    val deduped = Streams.dedupWithinWatermark(
      stream.toDF().toDF("user_id", "ts", "event_id"),
      keyCols = Seq("event_id"), delay = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("ddw_stream")
      .outputMode("append").start()
    withQuery(q) {
      q.processAllAvailable()
      // second micro-batch replays 100/101 within the watermark horizon
      // and introduces 102 — only the fresh key survives
      stream.addData((3L, ts(0, 20), 100L), (3L, ts(0, 21), 101L),
        (3L, ts(0, 22), 102L))
      q.processAllAvailable()
      val got = spark.table("ddw_stream")
        .collect().map(_.getLong(2)).sorted
      assert(got.toSeq == Seq(100L, 101L, 102L)) // one row per event_id survives
    }
  }

  test("LEFT OUTER interval join emits unmatched views once the watermark passes their horizon") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    // view 100 matched by click 200; view 101 has NO click in its hour
    views.addData((1L, ts(0, 10), 100L), (1L, ts(2, 0), 101L))
    clicks.addData((1L, ts(0, 40), 200L), (1L, ts(1, 30), 201L))
    val joined = Streams.intervalJoinOuter(
      views.toDF().toDF("user_id", "ts", "id"),
      clicks.toDF().toDF("user_id", "ts", "id"), "user_id")
    val q = joined.writeStream.format("memory").queryName("ijo_stream")
      .outputMode("append").start()
    withQuery(q) {
      // batch 1: only the matched pair can emit — 101's no-click verdict
      // is not yet provable (its horizon 03:00 is past the watermark)
      val b1 = spark.table("ijo_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(b1.toSet == Set((1L, 100L, 200L)), b1.toSeq.toString)
      // sentinel batch advances both watermarks past every horizon:
      // wm = 08:00 - 2h = 06:00 > 03:00, so the unmatched view flushes
      views.addData((888L, ts(8, 0), 900L))
      clicks.addData((888L, ts(8, 0), 901L))
      q.processAllAvailable()
      val b2 = spark.table("ijo_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3)))
      assert(b2.toSet == Set((1L, 100L, 200L), (1L, 101L, -1L)), b2.toSeq.toString)
    }
  }

  test("stream-stream interval join matches the batch range semantics") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    // views u1@00:10 and u1@02:00; clicks u1@00:40 (in 00:10's hour),
    // u1@01:30 (in neither window), u2@00:20 (other key)
    val views = MemoryStream[(Long, Timestamp, Long)]
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    views.addData((1L, ts(0, 10), 100L), (1L, ts(2, 0), 101L))
    clicks.addData((1L, ts(0, 40), 200L), (1L, ts(1, 30), 201L), (2L, ts(0, 20), 202L))
    val joined = Streams.intervalJoin(
      views.toDF().toDF("user_id", "ts", "id"),
      clicks.toDF().toDF("user_id", "ts", "id"), "user_id")
    val q = joined.writeStream.format("memory").queryName("ij_stream")
      .outputMode("append").start()
    withQuery(q) {
      val got = spark.table("ij_stream")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
      assert(got.toSeq == Seq((1L, 100L, 200L)))
    }
  }

  test("incremental dedup state: a batch's new docs become dups for later batches") {
    import spark.implicits._
    import graft.core.Shingling
    import graft.functions.GraftFunctions.{minhash_signature, shingle_hashes_md5}
    def sigsOf(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), minhash_signature(shingle_hashes_md5(
        Shingling.shingles(col("text"), 3, byWord = true))).as("sig"))
    val corpus = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val st = new Streams.IncrementalDedupState(corpus, sigsOf(corpus))
    val b1 = Seq(
      (10L, "totally different document about ducks rivers and reeds"),
      (11L, "alpha beta gamma delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val r1 = st.classify(b1).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r1 == Map(10L -> "new", 11L -> "exact"), r1)
    val b2 = Seq(
      (20L, "totally different document about ducks rivers and reeds"),
      (21L, "alpha beta gamma delta epsilon zeta eta theta"),
      (22L, "yet another unseen text about mountains and passes")).toDF("doc_id", "text")
    val r2 = st.classify(b2).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 20 duplicates batch 1's NEW doc — the verdict only evolved state
    // can produce; 21 still duplicates the original corpus; 22 is fresh
    assert(r2 == Map(20L -> "exact", 21L -> "exact", 22L -> "new"), r2)
  }
}
