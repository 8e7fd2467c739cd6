package graft

import graft.operators.{Dedup, Pipeline, Sampling, TextAnalysis}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("corpus prep: flags cumulative, stages match direct operator calls, stages bind") {
    val docs = spark.read.parquet(s"$testDataDir/documents.parquet")
    val out = Pipeline.prepareCorpus(docs).collect().map { r =>
      (r.getLong(0), (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5), r.getLong(6), r.getLong(7), r.getBoolean(8)))
    }.toMap

    // flags are cumulative; rank/quota are -1 exactly for non-survivors;
    // selected is the mix decision
    out.values.foreach { case (q, x, n, c, rank, quota, sel) =>
      if (x) assert(q); if (n) assert(x); if (c) assert(n)
      assert((rank == -1L) == !c && (quota == -1L) == !c)
      assert(sel == (c && rank <= quota))
    }
    // the quality, near-dup, decontam, and mix stages all bind on the fixture
    assert(out.values.exists(!_._1))
    assert(out.values.exists(v => v._2 && !v._3))
    assert(out.values.exists(v => v._3 && !v._4))
    assert(out.values.exists(_._7) && out.values.exists(v => v._4 && !v._7))

    // stage 2 == the Gopher filter applied directly to the train split
    val train = docs.join(
      Sampling.split(docs).select("doc_id", "split"), "doc_id")
      .filter(col("split") === "train")
    val wantQ = TextAnalysis.qualityFilter(train).filter(col("fail_mask") === 0)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.collect { case (id, v) if v._1 => id }.toSet == wantQ)

    // stage 6 == temperatureMix applied directly to the c-survivors
    val cIds = out.collect { case (id, v) if v._4 => id }.toSet
    val wantSel = Sampling.temperatureMix(
        train.filter(col("doc_id").isin(cIds.toSeq: _*)).select("doc_id", "lang"),
        "lang", 2.0)
      .filter(col("selected")).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.collect { case (id, v) if v._7 => id }.toSet == wantSel)
  }

  test("corpus prep: exact-dedup stage keeps the min-id copy of a duplicated text") {
    import spark.implicits._
    // pick ids that land in the train split (bucket < 90 of the md5 split)
    def bucket(id: Long): Int = (BigInt(
      java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(16), 16) % 100).toInt
    val trainIds = (0L until 400L).filter(bucket(_) < 90)
    assert(trainIds.size >= 40)
    // distinct fluent texts that pass the Gopher filter, plus one
    // EXACT duplicate pair (the first two train ids share a text)
    def fluent(i: Long) = (0 until 20).map(j => s"tok${(i * 31 + j * 7) % 997}x$j")
      .mkString(" ")
    val docs = trainIds.zipWithIndex.map { case (id, i) =>
      val text = if (i == 1) fluent(trainIds.head) else fluent(id)
      (id, "en", text)
    }.toDF("doc_id", "lang", "text")
    val out = Pipeline.prepareCorpus(docs).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    val (dupA, dupB) = (trainIds.head, trainIds(1))
    assert(out(dupA) == ((true, true)))   // min id survives
    assert(out(dupB) == ((true, false)))  // its exact duplicate is dropped
    assert(out.count(!_._2._2) >= 1)
  }

  test("corpus prep: duplicate ingest ids collapse to the lexicographic-min row") {
    import spark.implicits._
    def fluent(seed: Long) = (0 until 20).map(j => s"w${(seed * 13 + j * 3) % 503}q$j")
      .mkString(" ")
    val docs = ((0L until 120L).map(id => (id, "en", fluent(id))) ++
      Seq((7L, "en", fluent(7).replace("q0", "q9")),  // dup id, different text
        (7L, "de", fluent(7))))                       // dup id AND dup text, other lang
      .toDF("doc_id", "lang", "text")
    val out = Pipeline.prepareCorpus(docs).collect()
    // exactly one output row per distinct train id — no join fan-out
    val ids = out.map(_.getLong(0))
    assert(ids.distinct.length == ids.length)
    // id 7's survivor is the minimum (text, lang) row
    val rows7 = Seq(("en", fluent(7)), ("de", fluent(7)),
      ("en", fluent(7).replace("q0", "q9")))
    val wantLang = rows7.map { case (l, t) => (t, l) }.min._2
    out.find(_.getLong(0) == 7L).foreach(r => assert(r.getString(1) == wantLang))
  }
}
