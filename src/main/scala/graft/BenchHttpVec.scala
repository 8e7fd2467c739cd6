package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** HTTP-boundary load bench for the VECTOR probe path (round 12 — the
  * `/vquery` twin of [[BenchHttp]]): N concurrent clients POST mixed
  * 80/20 hot/cold float-vector probes at the served `ivfpq` tier. Two
  * corpus scales:
  *
  *  - 20k vectors — every inverted list resident after warmup; the
  *    in-process sub-ms probe class, comparable to the LSH replica tier.
  *  - 4M vectors, c64 — the probe-cache tier: the driver scoring term
  *    (nprobe × 62.5k-row lists) dominates, and never-seen cold probes
  *    keep arriving throughout, each paying a pruned fetch job.
  *
  * Every hot response is compared against its single-threaded answer —
  * a mismatch under concurrency is a list-cache monitor bug, counted in
  * `errors` (exit 2). One stdout JSON line of qps + p50/p99 rows. */
object BenchHttpVec {
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
    import graft.api.{QueryEngine, QueryService, VectorEngine}
    import graft.sources.SyntheticCorpus
    val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    var errors = 0L
    // /vquery rides on the same server as /query; a tiny LSH engine
    // fills the required signature context without carrying load
    val lshEng = QueryEngine.build(SyntheticCorpus.docs(spark, 1000),
      mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()

    def runScenario(tag: String, eng: VectorEngine, nVecs: Long,
                    concurrency: Int, totalReqs: Int): Unit = {
      val server = QueryService.serve(lshEng, Some(eng), 0)
      val port = server.getAddress.getPort
      try {
        val all = SyntheticCorpus.vectors(spark, nVecs)
        def vecsOf(lo: Long, hi: Long): Map[Long, Array[Float]] = all
          .filter(col("vec_id") >= lo && col("vec_id") < hi)
          .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
        val hotIds = (5L until 17L).toArray
        val hotVec = vecsOf(5L, 17L)
        val coldPool = vecsOf(1000L, 1000L + totalReqs.toLong)
        val coldIds = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
        coldPool.keys.toSeq.sorted.foreach(id => coldIds.add(Long.box(id)))
        def body(v: Array[Float]): String =
          s"""{"vector":[${v.mkString(",")}],"k":5,"nprobe":3}"""
        def post(client: HttpClient, v: Array[Float]): String = {
          val req = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/vquery"))
            .POST(HttpRequest.BodyPublishers.ofString(body(v), StandardCharsets.UTF_8))
            .build()
          client.send(req, HttpResponse.BodyHandlers.ofString()).body()
        }
        val warmClient = HttpClient.newHttpClient()
        val expected = hotIds.map(i => i -> post(warmClient, hotVec(i))).toMap
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
                val (v, exp) =
                  if (coldId != null) (coldPool(coldId.longValue()), None)
                  else {
                    val h = hotIds(i % hotIds.length); (hotVec(h), Some(expected(h)))
                  }
                val s0 = System.nanoTime()
                val resp = post(client, v)
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
        metrics(s"x_http_vec_qps_${tag}_c$concurrency") = ls.length / wallSec
        metrics(s"x_http_vec_p50_sec_${tag}_c$concurrency") = pct(0.50)
        metrics(s"x_http_vec_p99_sec_${tag}_c$concurrency") = pct(0.99)
        errors += errCount.get()
      } finally server.stop(0)
    }

    // ---- 20k vectors: the fully-resident in-process tier ----
    val eng20k = VectorEngine.build(SyntheticCorpus.vectors(spark, 20000),
      nCents = 8).warmUp().warmServing()
    for (c <- Seq(1, 8, 32))
      runScenario("20kvecs", eng20k, 20000, c, totalReqs = if (c == 1) 500 else 2000)
    eng20k.close()
    // ---- 4M vectors, c64: the list-cache tier under concurrency ----
    val eng4m = VectorEngine.build(SyntheticCorpus.vectors(spark, 4000000),
      nCents = 64).warmUp().warmServing()
    for (c <- Seq(8, 32))
      runScenario("4mvecs_c64", eng4m, 4000000, c, totalReqs = 1000)
    eng4m.close()

    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    val line = metrics.toSeq
      .map { case (k, v) => "\"" + k + "\":" + f6(v) }
      .mkString(
        s"""{"metric":"http_vec_load","errors":$errors,"queries":{""",
        ",", "}}")
    println(line)
    System.out.flush()
    spark.stop()
    if (errors > 0) {
      System.err.println(s"[bench-http-vec] $errors bad/mismatched responses under load")
      sys.exit(2)
    }
  }
}
