package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** HTTP-boundary load bench (round 12): N concurrent clients POSTing
  * mixed hot/cold signature probes at [[graft.api.QueryService]], the
  * reference's own measurement boundary (its published 162.65 qps is
  * HTTP-side, results_synthetic.csv:4). Reports qps + p50/p99 per
  * (corpus, concurrency) scenario on ONE stdout JSON line.
  *
  * Two serving tiers are exercised:
  *  - 20k docs — under the driver-replica bound: every probe is the
  *    zero-Spark-job in-process path; this is the row comparable to the
  *    reference's published number (same corpus scale, same boundary).
  *  - 200k docs — above the replica bound: hot keys serve from the LRU
  *    probe cache, cold keys pay their bucket-fetch jobs — the
  *    concurrency test of the cache's monitor discipline (snapshot under
  *    the lock, fetch outside it; Lsh.scala queryProbeCached), which was
  *    previously only reasoned about and spec'd, never load-measured.
  *  - 4M docs optionally (SPARK_GRAFT_HTTP_BIG=1) — the bucketed-disk
  *    cold tier behind the same cache.
  *
  * Mix: 80% of requests cycle a 20-key hot set (warmed before timing);
  * 20% draw from a never-probed cold pool, each key used once — so cold
  * misses keep arriving throughout the run instead of only at the start.
  * Every response is parsed; hot responses are compared against
  * single-threaded expected answers (a mismatch under concurrency is a
  * monitor bug, counted in `errors`). */
object BenchHttp {
  def main(args: Array[String]): Unit = {
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
    import graft.api.QueryEngine
    import graft.sources.SyntheticCorpus
    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var errors = 0L

    def runScenario(tag: String, eng: QueryEngine, nDocs: Long,
                    concurrency: Int, totalReqs: Int): Unit = {
      val server = graft.api.QueryService.serve(eng, 0)
      val port = server.getAddress.getPort
      try {
        val hotIds = (5L until 25L).toArray
        val sigOf = eng.sigs.filter(col("doc_id") < 25)
          .orderBy("doc_id").collect()
          .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
        // cold pool: never probed before or during warmup; each id used
        // at most once across ALL clients
        val coldPool = eng.sigs
          .filter(col("doc_id") >= 1000 && col("doc_id") < 1000 + totalReqs.toLong)
          .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
        val coldIds = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
        coldPool.keys.toSeq.sorted.foreach(id => coldIds.add(Long.box(id)))
        def body(sig: Array[Long]): String =
          s"""{"vector":[${sig.mkString(",")}],"k":5}"""
        def post(client: HttpClient, sig: Array[Long]): String = {
          val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/query"))
            .POST(HttpRequest.BodyPublishers.ofString(body(sig), StandardCharsets.UTF_8))
            .build()
          client.send(req, HttpResponse.BodyHandlers.ofString()).body()
        }
        // warm the hot set + capture expected answers single-threaded
        val warmClient = HttpClient.newHttpClient()
        val expected = hotIds.map(i => i -> post(warmClient, sigOf(i))).toMap
        val latencies = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
        val errCount = new java.util.concurrent.atomic.AtomicLong(0)
        val reqIdx = new java.util.concurrent.atomic.AtomicInteger(0)
        val pool = java.util.concurrent.Executors.newFixedThreadPool(concurrency)
        val t0 = System.nanoTime()
        val futures = (0 until concurrency).map { _ =>
          pool.submit(new Runnable {
            override def run(): Unit = {
              val client = HttpClient.newHttpClient()
              var i = reqIdx.getAndIncrement()
              while (i < totalReqs) {
                val isCold = i % 5 == 4 // 20% cold
                val coldId: java.lang.Long = if (isCold) coldIds.poll() else null
                val (sig, exp) =
                  if (coldId != null) (coldPool(coldId.longValue()), None)
                  else {
                    val h = hotIds(i % hotIds.length); (sigOf(h), Some(expected(h)))
                  }
                val s0 = System.nanoTime()
                val resp = post(client, sig)
                latencies.add(Long.box(System.nanoTime() - s0))
                if (!resp.startsWith("""{"candidates":[""")) errCount.incrementAndGet()
                exp.foreach { e => if (resp != e) errCount.incrementAndGet() }
                i = reqIdx.getAndIncrement()
              }
            }
          })
        }
        futures.foreach(_.get())
        val wallSec = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        val ls = latencies.toArray(Array.empty[java.lang.Long]).map(_.longValue()).sorted
        def pct(p: Double): Double = ls(math.min(ls.length - 1,
          (p * ls.length).toInt)) / 1e9
        metrics(s"x_http_qps_${tag}_c$concurrency") = ls.length / wallSec
        metrics(s"x_http_p50_sec_${tag}_c$concurrency") = pct(0.50)
        metrics(s"x_http_p99_sec_${tag}_c$concurrency") = pct(0.99)
        errors += errCount.get()
      } finally server.stop(0)
    }

    // ---- 20k docs: the reference-comparable replica tier ----
    val eng20k = QueryEngine.build(SyntheticCorpus.docs(spark, 20000),
      mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
    for (c <- Seq(1, 8, 32))
      runScenario("20kdocs", eng20k, 20000, c, totalReqs = if (c == 1) 500 else 2000)
    eng20k.close()
    // ---- 200k docs: the LRU probe-cache tier under concurrency ----
    val eng200k = QueryEngine.build(SyntheticCorpus.docs(spark, 200000),
      mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
    for (c <- Seq(8, 32))
      runScenario("200kdocs", eng200k, 200000, c, totalReqs = 1000)
    eng200k.close()
    // ---- 4M docs (optional): bucketed-disk cold tier ----
    if (sys.env.get("SPARK_GRAFT_HTTP_BIG").contains("1")) {
      val eng4m = QueryEngine.build(SyntheticCorpus.docs(spark, 4000000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      val table = "graft_http_bucketed_4m"
      spark.sql(s"DROP TABLE IF EXISTS $table")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
      eng4m.saveBucketed(table, buckets = 64)
      eng4m.serveFromBucketed(table)
      for (c <- Seq(8, 32))
        runScenario("4mdocs", eng4m, 4000000, c, totalReqs = 1000)
      eng4m.close()
    }

    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val line = metrics.toSeq
      .map { case (k, v) => "\"" + k + "\":" + f6(v) }
      .mkString(
        s"""{"metric":"http_load","reference_qps":162.65,"errors":$errors,"queries":{""",
        ",", "}}")
    println(line)
    System.out.flush()
    spark.stop()
    if (errors > 0) {
      System.err.println(s"[bench-http] $errors bad/mismatched responses under load")
      sys.exit(2)
    }
  }
}
