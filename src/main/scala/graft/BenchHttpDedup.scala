package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** HTTP-boundary load bench for `POST /dedup` (round 14): the dedup
  * family was the one engine surface without an HTTP row (`/query` and
  * `/vquery` exist, load-measured in round 12). A standing corpus is
  * built once; concurrent clients POST micro-batches at
  * [[graft.api.QueryService]]'s `/dedup` context and every response is
  * parsed and checked. Three scenarios on ONE stdout JSON line:
  *
  *  1. CLASSIFY-ONLY concurrency (`absorb:false`, read-only probes):
  *     expected answers are captured single-threaded first; any
  *     concurrent response differing is a lock-discipline bug (counted
  *     in `errors` — the zero-mismatch check).
  *  2. INGEST throughput (`absorb:true` fresh batches): absorbs
  *     SERIALIZE on the corpus lock by design (single-ingest-loop
  *     contract), so this measures the end-to-end micro-batch latency a
  *     crawler sees — batches/sec and docs/sec at the HTTP boundary.
  *  3. STATE EVOLUTION over HTTP: texts absorbed in scenario 2 are
  *     re-POSTed classify-only; every verdict must be `exact` (the
  *     round-trip proof that the HTTP path evolves the same standing
  *     state the in-process loop does).
  *
  * Run: `SPARK_GRAFT_DEDUP_DOCS=200000 sbt 'runMain graft.BenchHttpDedup'`
  * (or spark-submit with the packaged jar). */
object BenchHttpDedup {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DEDUP_DOCS", "200000").toLong
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.StandingCorpus
    import graft.sources.SyntheticCorpus

    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var errors = 0L

    val docs = SyntheticCorpus.docsLlm(spark, nDocs).localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("graft-httpdedup").toString
    val tB = System.nanoTime()
    val standing = StandingCorpus.build(docs, null, dir, threshold = 0.5,
      kShingle = 1)
    metrics("x_httpdedup_build_sec") = (System.nanoTime() - tB) / 1e9

    val engine = graft.api.QueryEngine.build(
      SyntheticCorpus.docs(spark, 1000)) // /query context needs an engine
    val server = graft.api.QueryService.serve(engine, None, Some(standing), 0)
    val port = server.getAddress.getPort
    try {
      def post(client: HttpClient, body: String): String = {
        val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/dedup"))
          .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
          .build()
        client.send(req, HttpResponse.BodyHandlers.ofString()).body()
      }
      def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
      def bodyOf(ds: Seq[(Long, String)], absorb: Boolean): String =
        ds.map { case (id, t) => s"""{"id":$id,"text":"${esc(t)}"}""" }
          .mkString("""{"docs":[""", ",", s"""],"absorb":$absorb}""")

      // ---- scenario 1: classify-only probes under concurrency ----
      val corpusTexts = docs.filter(col("doc_id") < 64)
        .orderBy("doc_id").collect().map(_.getString(1))
      val probeBodies = (0 until 32).map { i =>
        val base = nDocs * 10 + i.toLong * 100
        bodyOf(Seq(
          (base, corpusTexts(i)),                     // exact
          (base + 1, corpusTexts(i) + " zz" + i),     // near-ish
          (base + 2, s"fresh probe $i " + (0 until 24).map(w => s"pp$i-$w").mkString(" "))),
          absorb = false)
      }
      val warm = HttpClient.newHttpClient()
      val expected = probeBodies.map(b => b -> post(warm, b)).toMap
      expected.values.foreach { r =>
        if (!r.startsWith("""{"statuses":[""")) errors += 1
      }
      val concurrency = 8
      val totalReqs = 128
      val latencies = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
      val errCount = new java.util.concurrent.atomic.AtomicLong(0)
      val reqIdx = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
      val t0 = System.nanoTime()
      (0 until concurrency).map { _ =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            val client = HttpClient.newHttpClient()
            var i = reqIdx.getAndIncrement()
            while (i < totalReqs) {
              val b = probeBodies(i % probeBodies.length)
              val s0 = System.nanoTime()
              val resp = post(client, b)
              latencies.add(Long.box(System.nanoTime() - s0))
              if (resp != expected(b)) errCount.incrementAndGet()
              i = reqIdx.getAndIncrement()
            }
          }
        })
      }.foreach(_.get())
      val wallSec = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      val ls = latencies.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
      def pct(p: Double): Double = ls(math.min(ls.length - 1, (p * ls.length).toInt)) / 1e9
      metrics(s"x_httpdedup_classify_qps_c$concurrency") = ls.length / wallSec
      metrics(s"x_httpdedup_classify_p50_sec_c$concurrency") = pct(0.50)
      metrics(s"x_httpdedup_classify_p99_sec_c$concurrency") = pct(0.99)
      errors += errCount.get()
      counts("n_classify_reqs") = totalReqs.toLong

      // ---- scenario 2: absorb throughput at two batch sizes ----
      val freshPool = SyntheticCorpus.docsLlm(spark, nDocs + 4096L)
        .filter(col("doc_id") >= nDocs).orderBy("doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1))
      var cursor = 0
      val absorbed = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
      for (batchSize <- Seq(16, 128)) {
        val nBatches = 8
        val bodies = (0 until nBatches).map { _ =>
          val slice = freshPool.slice(cursor, cursor + batchSize).toSeq
          cursor += batchSize
          absorbed ++= slice
          bodyOf(slice.map { case (id, t) => (id * 10 + 7, t) }, absorb = true)
        }
        val c2 = 4
        val idx = new java.util.concurrent.atomic.AtomicInteger(0)
        val lat2 = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
        val pool2 = java.util.concurrent.Executors.newFixedThreadPool(c2)
        val ta = System.nanoTime()
        (0 until c2).map { _ =>
          pool2.submit(new Runnable {
            override def run(): Unit = {
              val client = HttpClient.newHttpClient()
              var i = idx.getAndIncrement()
              while (i < bodies.length) {
                val s0 = System.nanoTime()
                val resp = post(client, bodies(i))
                lat2.add(Long.box(System.nanoTime() - s0))
                if (!resp.startsWith("""{"statuses":[""")) errCount.incrementAndGet()
                i = idx.getAndIncrement()
              }
            }
          })
        }.foreach(_.get())
        val wall2 = (System.nanoTime() - ta) / 1e9
        pool2.shutdown()
        val l2 = lat2.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
        metrics(s"x_httpdedup_absorb_b${batchSize}_batches_per_sec") = nBatches / wall2
        metrics(s"x_httpdedup_absorb_b${batchSize}_docs_per_sec") =
          nBatches.toLong * batchSize / wall2
        metrics(s"x_httpdedup_absorb_b${batchSize}_p50_sec") =
          l2(l2.length / 2) / 1e9
        metrics(s"x_httpdedup_absorb_b${batchSize}_max_sec") = l2.last / 1e9
      }

      // ---- scenario 3: absorbed texts must round-trip as duplicates ----
      // (a text that classified 'new' was absorbed -> now 'exact'; one
      // that classified 'near'/'exact' was already a dup -> still is;
      // ANY 'new' verdict here means the HTTP path failed to evolve the
      // standing state)
      val recheck = absorbed.take(64).zipWithIndex
        .map { case ((_, t), i) => (nDocs * 100 + i.toLong, t) }.toSeq
      val resp3 = post(warm, bodyOf(recheck, absorb = false))
      val nNew = """"status":"new"""".r.findAllIn(resp3).length
      val nExact = """"status":"exact"""".r.findAllIn(resp3).length
      counts("n_roundtrip_docs") = recheck.length.toLong
      counts("n_roundtrip_exact") = nExact.toLong
      counts("n_roundtrip_new") = nNew.toLong
      errors += nNew
    } finally {
      server.stop(0)
      engine.close()
    }

    counts("errors") = errors
    counts("n_docs") = nDocs
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(jmap(Seq(
      "metric" -> "\"http_dedup\"",
      "value" -> f6(metrics.getOrElse("x_httpdedup_classify_p50_sec_c8", -1.0)),
      "unit" -> "\"sec\"",
      "queries" -> jmap(metrics.toSeq.map { case (k, v) => k -> f6(v) }),
      "counts" -> jmap(counts.toSeq.map { case (k, v) => k -> v.toString }))))
    System.out.flush()
    spark.stop()
  }
}
