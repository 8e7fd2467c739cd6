package graft

import graft.core.{Lsh, MinHashPipeline}
import graft.streaming.Streams
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** Watermark semantics (append mode): windows close and emit once the
  * watermark passes, and data later than the watermark is dropped.
  * Plus: LSH banding parameterization at the DataFrame level. */
class WatermarkSpec extends SparkSpec {

  test("append-mode windows emit on watermark advance and drop late data") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    def ts(h: Int, m: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val stream = MemoryStream[(Timestamp, String, Double)]
    val agg = Streams.hourlyCounts(
      stream.toDF().toDF("ts", "event_type", "value"), watermark = "30 minutes")
    val q = agg.writeStream.format("memory").queryName("wm_stream")
      .outputMode("append").start()
    try {
      // batch 1: events in hour 0; watermark still at hour 0 -> nothing emitted
      stream.addData((ts(0, 10), "a", 1.0), (ts(0, 20), "a", 2.0))
      q.processAllAvailable()
      assert(spark.table("wm_stream").count() == 0)
      // batch 2: event at 02:00 -> watermark advances to 01:30 -> hour-0
      // window closes and emits
      stream.addData((ts(2, 0), "a", 3.0))
      q.processAllAvailable()
      val emitted = spark.table("wm_stream")
        .collect().map(r => (r.getTimestamp(0), r.getLong(2), r.getDouble(3)))
      assert(emitted.toSeq == Seq((ts(0, 0), 2L, 3.0)))
      // batch 3: LATE event for hour 0 (before the 01:30 watermark) ->
      // dropped; closed window is not re-emitted or updated
      stream.addData((ts(0, 40), "a", 99.0))
      q.processAllAvailable()
      assert(spark.table("wm_stream").count() == 1)
    } finally q.stop()
  }

  test("LSH banding parameterization: fewer/wider bands produce a candidate subset") {
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val sigs = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = 3)).select("doc_id", "sig").cache()
    val pairs32 = Lsh.candidatePairs(
      Lsh.postings(sigs, "doc_id", "sig", Lsh.Params(bands = 32)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs16 = Lsh.candidatePairs(
      Lsh.postings(sigs, "doc_id", "sig", Lsh.Params(bands = 16)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs16.subsetOf(pairs32),
      s"16-band pairs must be a subset of 32-band pairs (${pairs16.size} vs ${pairs32.size})")
  }
}
