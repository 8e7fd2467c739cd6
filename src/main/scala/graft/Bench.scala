package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line for the driver.
  *
  * Two passes: a warmup pass materializes the shared signature/postings
  * caches and compiles codegen (the reference times its LSH queries with a
  * prebuilt index too — results_synthetic.csv measures query-only), then
  * the timed pass measures steady-state per-query wall time. The
  * `x_`-prefixed entries report reference-comparable probe numbers at the
  * reference's own scale (20 000 docs, prebuilt index, k=5) plus a 10x
  * scale point (200k) for the flat-probe-cost / linear-build evidence.
  *
  * TIMING METHODOLOGY: probes are the MEDIAN of 3 timed runs after one
  * warmup run (5 runs when the spread exceeds 3x — round 7; r4-r6 used
  * min-of-3, which hid both noise AND real degradation), and probes run
  * BEFORE the catalog pass; catalog queries are min-of-2 (round 5).
  * BENCH_r01-r03 were single-sample with probes last — cross-round
  * comparisons against those files carry ±2-3x noise on sub-second
  * entries. Stdout carries a compact line (probe metrics only — the
  * driver's tail capture is ~3 KB); target/bench_result.json carries the
  * complete result including catalog per-query times and sample arrays.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_MASTER=local-cluster[3,4,6144] runs the same bench
    // against REAL executor JVMs (standalone master + workers in-process,
    // forked executors — real serialization and locality boundaries, the
    // sandbox proxy for the reference's 3-worker docker deployment);
    // executors resolve this build via extraClassPath. Requires
    // SPARK_HOME + SPARK_SCALA_VERSION=2.13 in the environment.
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val spark = SparkSession.builder()
      .master(master)
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // local[32] with a large heap: let AQE broadcast dimension-sized
      // sides up to 64 MB (e.g. the 20 MB signature table at the
      // reference-comparable 20k-doc probe scale) instead of shuffling
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val probesOnly = args.contains("--probes-only") // dev loop: skip catalog
    // --headline-only: the reference-scale 20k section only (the
    // BENCH_CLUSTER configuration — the scale decades are single-box
    // evidence; the cluster run's job is gates + headline probes through
    // real executor JVMs, not re-measuring the decades on 12 cores)
    val headlineOnly = args.contains("--headline-only")
    // probes FIRST: the reference-comparable latency numbers are measured
    // in a fresh JVM, before the catalog pass fills the heap with cached
    // plans/broadcasts whose GC pressure would tax them (observed 2-3x
    // on the batch-1000 probe when run last)
    val (probeMetrics, probeSamples, degradedProbes, contendedSections) =
      computeProbeMetrics(spark, headlineOnly)
    // warmup: build caches + codegen
    if (!probesOnly) SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, sfDir).count() catch { case _: Throwable => () }
    }
    // min-of-2 per catalog query: a single sample on a shared box folds
    // GC/JIT pauses into the number (observed 2.9x spread on a trivial
    // sub-second group-by between rounds); the min is the reproducible
    // steady-state cost, which is what round-over-round diffs should see
    val results =
      if (probesOnly) Map.empty[String, Double]
      else SparkEntry.queries.map { case (name, fn) =>
        name -> (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
          (System.nanoTime() - t0) / 1e9
        }.min
      }
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    // round-over-round regression guard: compare this run's probe medians
    // against the newest committed BENCH_r*.json (r6's instability was
    // caught by a human diffing two artifacts; the harness now flags it
    // itself). Probes only — catalog entries are min-of-2 and noisier.
    val curForRatios = probeMetrics ++
      (if (results.nonEmpty) Map("catalog_total_sec" -> total) else Map.empty)
    // trusted = certified multi-sample medians only (>=3 samples, not
    // degraded) + the 135-query catalog total; single-sample build/cold
    // rows and refused-certification probes can't raise the red flag
    val trustedForFlags = probeSamples.collect {
      case (k, vs) if vs.size >= 3 && !degradedProbes.contains(k) => k
    }.toSet ++ (if (results.nonEmpty) Set("catalog_total_sec") else Set.empty[String])
    val (ratios, regressions, prevArtifact) =
      ratiosVsPrev(curForRatios, Some(trustedForFlags))
    // STDOUT gets a COMPACT line: the driver's capture keeps only the last
    // ~2 KB of output. Three rounds running the full line (77 catalog
    // entries + samples) overflowed that window, and round 10's "probe
    // metrics only" line (~2.3 KB once the 4M decade landed) overflowed it
    // AGAIN, leaving parsed:null in BENCH_r{4,5,6,10}.json. The compact
    // line now carries ONLY the judged headline: the reference-comparable
    // 20k-scale probes (the BASELINE.md rows), the catalog total, and the
    // health flags — budgeted at <= 1.5 KB and asserted by the post-write
    // self-check below. Every other probe (the 200k/1M/4M decades, vec
    // builds, samples, ratios) lives in target/bench_result.json, the
    // artifact of record.
    def jarr(ss: Seq[String]): String = ss.map("\"" + _ + "\"").mkString("[", ",", "]")
    val headline = Seq(
      "x_index_build_sec_20kdocs",
      "x_lsh_single_query_avg_sec_20kdocs",
      "x_lsh_batch100_queries_sec_20kdocs",
      "x_lsh_batch1000_queries_sec_20kdocs",
      "x_lsh_served_batch100_avg_sec_20kdocs",
      "x_brute_batch100_queries_sec_20kdocs",
      "x_lsh_bucketed_batch100_sec_20kdocs",
      "x_vec_build_sec_20kvecs",
      "x_vec_exact_batch100_sec_20kvecs",
      "x_vec_ivfpq_batch100_sec_20kvecs",
      "x_vec_single_query_avg_sec_20kvecs")
    // the >=3x flag list rides in the compact line (usually empty) so a
    // regression is visible in BENCH_r{N} itself, not only the detail
    // file. Flag lists are size-capped BY BYTES, not item count: counts
    // stay exact in the _n fields and full lists live in the detail
    // file, while the line itself shrinks its lists until it fits the
    // tail budget — 8 long probe keys per list could otherwise push an
    // honest-but-flag-heavy run over the very budget the self-check
    // enforces (exit 2 on a healthy bench).
    def shortLineWith(listCap: Int): String = jmap(Seq(
      "metric" -> "\"total\"", "value" -> f6(total), "unit" -> "\"sec\"",
      "queries" -> jmap(
        (headline.flatMap(k => probeMetrics.get(k).map(k -> _)) ++
          Seq("catalog_total_sec" -> total))
          .map { case (k, v) => k -> f6(v) }),
      "sf" -> ("\"" + sfDir + "\""),
      "regressions_3x_n" -> regressions.size.toString,
      "regressions_3x" -> jarr(regressions.take(listCap)),
      // self-describing contention refusal (round 9): probes whose sample
      // spread never settled under 3x across retry batches — a non-empty
      // list means the medians above are NOT trustworthy and the run
      // should be repeated on a quiet box before being judged
      "degraded" -> (if (degradedProbes.nonEmpty) "true" else "false"),
      "degraded_n" -> degradedProbes.size.toString,
      "degraded_probes" -> jarr(degradedProbes.take(listCap)),
      // sections whose boundary contention canary drifted >= 2x off the
      // run's baseline (round 10's 1M window read 1.5-2.9x its quiet-box
      // twins with no flag anywhere) — probes inside a listed section are
      // suspect and the quiet-box twin artifact is the number of record
      "contended_sections" -> jarr(contendedSections.take(listCap)),
      "detail" -> "\"target/bench_result.json\""))
    val shortLine = (8 to 0 by -2).view.map(shortLineWith)
      .find(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
        <= ArtifactSelfCheck.ShortLineMaxBytes)
      .getOrElse(shortLineWith(0))
    val fullLine = jmap(Seq(
      "metric" -> "\"total\"", "value" -> f6(total), "unit" -> "\"sec\"",
      "queries" -> jmap((results ++ probeMetrics).map { case (k, v) => k -> f6(v) }),
      "sf" -> ("\"" + sfDir + "\""),
      "prev_artifact" -> ("\"" + prevArtifact + "\""),
      "ratios_vs_prev" -> jmap(ratios.toSeq.sortBy(_._1)
        .map { case (k, v) => k -> f6(v) }),
      "regressions_3x" -> jarr(regressions),
      "degraded" -> (if (degradedProbes.nonEmpty) "true" else "false"),
      "degraded_probes" -> jarr(degradedProbes),
      "contended_sections" -> jarr(contendedSections),
      // every timed probe sample (not just the reported median):
      // round-over-round diffs can then separate box noise (spread across
      // samples) from a plan regression (all samples moved) without a rerun
      "samples" -> jmap(probeSamples.map { case (k, vs) =>
        k -> vs.map(f6).mkString("[", ",", "]")
      })))
    // detail file FIRST, compact stdout line LAST: the driver's capture
    // keeps the tail of stdout, so nothing may print after the line
    var selfCheckError: Option[String] = None
    try {
      val out = java.nio.file.Paths.get("target", "bench_result.json")
      java.nio.file.Files.createDirectories(out.getParent)
      java.nio.file.Files.write(out,
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // post-write self-check (round 11): re-READ the detail file and
      // validate both emitted artifacts — r9 lost CORRECTNESS and r10
      // lost BENCH to silent emit-time failures; a broken artifact must
      // turn the run red, not record a hole
      val written = new String(java.nio.file.Files.readAllBytes(out),
        java.nio.charset.StandardCharsets.UTF_8)
      // an empty probe map means computeProbeMetrics swallowed a failure
      // (the first local-cluster run shipped a probe-less artifact with
      // rc 0 because expectedProbeKeys was trivially 0) — that IS the
      // probes-vanished class this check exists for
      selfCheckError =
        (if (probeMetrics.isEmpty) Some("no probe metrics recorded") else None)
          .orElse(ArtifactSelfCheck.checkBench(shortLine, written, probeMetrics.size))
    } catch { case e: Throwable =>
      selfCheckError = Some(s"could not write/re-read target/bench_result.json: $e")
    }
    println(shortLine)
    System.out.flush()
    spark.stop()
    selfCheckError.foreach { msg =>
      System.err.println(s"[bench] ARTIFACT SELF-CHECK FAILED: $msg")
      sys.exit(2)
    }
  }

  /** Per-probe current/previous ratios against the newest committed
    * BENCH_r{N}.json in the working directory, plus the keys whose median
    * moved >=3x (a real plan regression at that threshold — box noise on
    * warmed medians measured well under it) and the artifact name used.
    * The prior artifact embeds its metrics both in the driver's `parsed`
    * block and the stdout tail, so a tolerant "key":number pull is enough
    * — no JSON parser ships in the main sources. Never throws: a missing
    * or unreadable artifact yields empty maps (first round, fresh
    * checkout, driver-relocated cwd). */
  def ratiosVsPrev(cur: Map[String, Double],
                   trustedKeys: Option[Set[String]] = None,
                   dir: String = "."): (Map[String, Double], Seq[String], String) =
    try {
      // the driver artifact (BENCH_r{N}) now carries only the headline
      // keys in its compact line, so the committed quiet-twin detail
      // artifacts (BENCH_LOCAL_r{N}*.json) of the SAME newest round are
      // merged in — the guard keeps full key coverage across rounds.
      // Later files win on key conflicts; the sort is the TUPLE
      // (isDriverArtifact, name) so the multiple same-round detail files
      // merge in stable name order (listFiles() order is unspecified —
      // sorting on the boolean alone left the detail-vs-detail winner
      // nondeterministic across machines) with the driver artifact last,
      // so its headline numbers stay the numbers of record.
      val all = Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .filter(_.getName.matches("BENCH(_LOCAL)?_r\\d+[A-Za-z0-9_]*\\.json"))
      if (all.isEmpty) (Map.empty, Nil, "")
      else {
        def round(f: java.io.File): Int = "\\d+".r.findFirstIn(f.getName).get.toInt
        val maxRound = all.map(round).max
        val prevs = all.filter(round(_) == maxRound)
          .sortBy(f => (f.getName.startsWith("BENCH_r"), f.getName))
        val kv = "\"((?:x_[a-z0-9_]+)|catalog_total_sec)\"\\s*:\\s*([0-9][0-9.eE+-]*)".r
        val prevMap = prevs.foldLeft(Map.empty[String, Double]) { (acc, f) =>
          val text = new String(java.nio.file.Files.readAllBytes(f.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          // a detail artifact embeds ITS OWN ratios_vs_prev map whose
          // "key":ratio pairs alias the metric keys — scanning past that
          // marker read ratios as seconds and flagged 13 phantom >=3x
          // regressions (build rows "141x slower" vs a 0.72 RATIO). Only
          // the text before the first ratios/samples section carries
          // metric values.
          val cut = Seq(text.indexOf("\"ratios_vs_prev\""), text.indexOf("\"samples\""))
            .filter(_ >= 0)
          val scanText = if (cut.isEmpty) text else text.substring(0, cut.min)
          acc ++ kv.findAllMatchIn(scanText).map(m => m.group(1) -> m.group(2).toDouble)
        }
        val ratios = cur.flatMap { case (k, v) =>
          prevMap.get(k).filter(_ > 0.0).map(p => k -> v / p)
        }
        // The >=3x flag list carries only TRUSTED keys: rows whose current
        // value is a certified multi-sample median (when the caller
        // supplies the set). BENCH_r11 flagged two phantoms — a
        // single-sample build row and a sub-second probe — measured on a
        // contended box; SURVEY §6.1's own rules say single-sample rows
        // can't carry a claim either way, so they don't get to flag a
        // regression either. The full ratios map still records every key
        // for the reader; only the red flag is gated.
        val flagged = ratios.filter(_._2 >= 3.0).keys.toSeq.sorted
        val trusted = trustedKeys match {
          case Some(t) => flagged.filter(t.contains)
          case None => flagged
        }
        (ratios, trusted, prevs.map(_.getName).mkString("+"))
      }
    } catch { case _: Throwable => (Map.empty, Nil, "") }

  /** Reference-comparable probe metrics (BASELINE.md: 20 000 docs,
    * prebuilt index, k=5, max_candidates=2000): steady-state single-vector
    * latency, batch-of-100 LSH throughput through one plan, and the
    * batch-of-100 brute-force counterpart (the reference's headline
    * relative result is brute-vs-LSH shape — results_synthetic.csv).
    * Returns (median metrics, all timed samples per probe). */
  def computeProbeMetrics(spark: SparkSession, headlineOnly: Boolean = false)
      : (Map[String, Double], Map[String, Seq[Double]], Seq[String], Seq[String]) = {
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val degraded = scala.collection.mutable.LinkedHashSet.empty[String]
    // Cross-section contention canary (round 10's committed artifact
    // carried a 1M section whose probes read 1.5-2.9x their quiet-box
    // twins — certifiedMedian refuses WITHIN-probe spread but cannot see
    // uniform cross-section box load). A fixed, cache-free, pure-CPU job
    // (64M-row xxhash fold — no I/O, no caches, no skew) runs at every
    // scale-section boundary; a boundary whose canary reads >= 2x the
    // run's baseline marks the adjacent sections contended, and the
    // section list rides the compact stdout line so a poisoned window is
    // visible in BENCH_r{N} itself.
    def canaryOnce(): Double = {
      val t0 = System.nanoTime()
      // the % bounds the summands so 64M of them cannot overflow a long
      // under ANSI mode (sum of raw xxhash64 longs did, killing every
      // probe in the first local-cluster run)
      spark.range(1L << 26).selectExpr("sum(xxhash64(id) % 65536) AS h").collect()
      (System.nanoTime() - t0) / 1e9
    }
    val contended = scala.collection.mutable.LinkedHashSet.empty[String]
    var canaryBase = Double.NaN
    var prevBoundaryHot = false
    def canaryAt(boundary: String): Unit = {
      // min of 2: the first sample at a boundary absorbs post-section GC
      // catch-up (the first full run false-flagged two quiet sections on
      // single samples reading 2.2x while the sections' own probes were
      // normal); steady external load still shows in both samples
      val c1 = canaryOnce(); val c2 = canaryOnce()
      val c = math.min(c1, c2)
      samples(s"canary_$boundary") = Seq(c1, c2)
      val hot = !canaryBase.isNaN && c / canaryBase >= 2.0
      // a section is contended when EITHER of its boundary canaries ran
      // hot — load at the start poisons early probes, load at the end
      // poisons late ones; two point samples bound the window honestly
      if (hot || prevBoundaryHot) contended += boundary
      prevBoundaryHot = hot
    }
    // scale-section boundary: drop cached plans AND give the ContextCleaner
    // a GC cycle so the previous section's dropped broadcasts/RDD blocks
    // are actually released — without it their weak refs survive into the
    // next section and its probes pay the eviction/GC cost; then sample
    // the contention canary with the caches quiet
    def quiesce(endedSection: String): Unit = {
      spark.catalog.clearCache(); System.gc()
      canaryAt(endedSection)
    }
    try {
      import graft.api.QueryEngine
      import graft.sources.SyntheticCorpus
      import org.apache.spark.sql.functions._
      // drop the sf-dir query caches: CacheManager compares every new plan
      // against every cached plan, and the big cached pipelines add
      // planning latency to the small probes
      spark.catalog.clearCache()
      // canary baseline: median of 3 on the fresh, quiet JVM (the first
      // sample also JIT-warms the canary plan so boundary samples compare
      // steady-state against steady-state)
      canaryBase = { val cs = Seq(canaryOnce(), canaryOnce(), canaryOnce()).sorted; cs(1) }
      samples("canary_baseline") = Seq(canaryBase)
      // index-build throughput: raw docs -> signatures -> postings ->
      // warmed caches + bucket stats, end to end (the reference's offline
      // build_local_lsh_init step; FAISS's baseline row pays its build
      // inside the query timing — results_synthetic.csv:3). A small
      // throwaway build first so the timed one measures build throughput,
      // not cold-JVM JIT/codegen compilation.
      QueryEngine.build(
        SyntheticCorpus.docs(spark, 1000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      spark.catalog.clearCache()
      val tB = System.nanoTime()
      val eng = QueryEngine.build(
        SyntheticCorpus.docs(spark, 20000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      val buildSec = (System.nanoTime() - tB) / 1e9
      val someSigs = eng.sigs.filter(col("doc_id") < 110)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      // steady-state timing: after one warmup run, take the MEDIAN of
      // three timed runs. The min (used through r6) hides box noise but
      // also hides real degradation; the median of warmed runs is robust
      // to one GC/JIT outlier in either direction. A batch whose samples
      // spread more than 3x is NOT certified — certifiedMedian retries
      // with fresh batches, and a probe that never settles lands in
      // `degraded` (committed BENCH_r08 shipped contention-poisoned
      // medians with spreads up to 8x and certified them anyway; now a
      // noisy artifact refuses quietly certifying itself). Every sample
      // is recorded (the `samples` map) so a reader can tell noise from
      // regression without a rerun. `minSamples` > 3 for contested
      // probes (the r7 c64-vs-c8 claim was judged unresolvable from
      // 3-sample medians in a ±25% box).
      def medianOf(key: String, minSamples: Int = 3)(run: () => Unit): Double = {
        run() // warmup
        def sample(): Double = {
          val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
        }
        // between retry batches: give a contending ContextCleaner/GC
        // cycle a chance to drain before re-sampling
        val (med, all, isDegraded) =
          certifiedMedian(minSamples, betweenBatches = () => System.gc())(sample)
        if (isDegraded) degraded += key
        samples(key) = all
        med
      }
      // samples for the per-query keys are per-query (loop time / n),
      // matching the metric's unit
      def perQueryAvg(key: String, n: Int)(run: () => Unit): Double = {
        val m = medianOf(key)(run) / n.toDouble
        samples(key) = samples(key).map(_ / n.toDouble)
        m
      }
      def singleProbeAvg(key: String)(run: () => Unit): Double =
        perQueryAvg(key, 20)(run)
      val singleAvg = singleProbeAvg("x_lsh_single_query_avg_sec_20kdocs")(() =>
        (5L until 25L).foreach(i => eng.query(someSigs(i), 5)))
      // batches through ONE plan (the Spark-native shape), with the
      // reference's max_candidates=2000 cap — the same cap the reference
      // benchmark runs under (minhash_lsh.py:95-96), and the single-probe
      // path above already applies
      def qDf(n: Int) = eng.sigs.filter(col("doc_id") < n)
        .select(col("doc_id").as("query_id"), col("sig"))
      def lshBatch(n: Int): Long =
        graft.core.Lsh.queryBatch(eng.sigs, eng.index, qDf(n), k = 5,
          maxCandidates = 2000).count()
      val batch100 = medianOf("x_lsh_batch100_queries_sec_20kdocs")(() => lshBatch(100))
      // batch of 1000: at 100 queries fixed plan overhead still dominates;
      // 1000 queries through one plan shows the amortized throughput a
      // large-scale user cares about
      val batch1000 = medianOf("x_lsh_batch1000_queries_sec_20kdocs")(() => lshBatch(1000))
      // SERVED batch of 100: the same 100 probes answered from the warmed
      // driver replica (QueryEngine.queryMany — zero Spark jobs per
      // probe). This is the apples-to-apples row against the reference's
      // published 6.148 ms/query: benchmark_runner.py times a host-side
      // loop over query vectors against the prebuilt in-memory index,
      // which is exactly this tier's shape — the distributed batch rows
      // above additionally pay Spark's per-job floor that the reference
      // never pays at 20k scale. Same k and max_candidates cap.
      val served100Queries: Seq[(Long, Array[Long])] =
        (0L until 100L).map(i => i -> someSigs(i))
      val servedBatch100 =
        perQueryAvg("x_lsh_served_batch100_avg_sec_20kdocs", 100)(() =>
          eng.queryMany(served100Queries, 5))
      // brute-force batch of 100: the reference's no-index fallback scan —
      // negative L2 over SIGNATURES (benchmark_runner.py:109-117), i.e.
      // the reference's own brute-force metric (12.98 ms/query numpy scan
      // at the same 20k scale). Deliberately NOT est-Jaccard: this row
      // compares scan-vs-index cost against the reference's scan, not the
      // two ranking semantics against each other.
      import graft.functions.TopKByScore.top_k_by_score
      def bruteBatch(): Long = {
        val cs = eng.sigs.select(col("doc_id").as("id"), col("sig").as("sig_c"))
        cs.crossJoin(broadcast(qDf(100).select(col("query_id"), col("sig").as("sig_q"))))
          .select(col("query_id"), col("id"),
            graft.functions.GraftFunctions.neg_l2_long(col("sig_c"), col("sig_q")).as("score"))
          .groupBy("query_id")
          .agg(top_k_by_score(col("score"), col("id"), 5).as("topk"))
          .count()
      }
      val brute100 = medianOf("x_brute_batch100_queries_sec_20kdocs")(() => bruteBatch())
      // vector-search probes at the same 20k scale: the VectorEngine
      // lifecycle — build (coarse k-means + inverted lists + PQ
      // codebooks/codes), exact cosine batch-100, and the compressed
      // coarse-pruned IVF-PQ batch-100 (the 100 TB query shape)
      val tV = System.nanoTime()
      val veng = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 20000)).warmUp()
      val vecBuild = (System.nanoTime() - tV) / 1e9
      val vq = veng.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      def vecBatch(mode: String): Long = veng.topK(vq, k = 5, mode = mode).count()
      val vecExact = medianOf("x_vec_exact_batch100_sec_20kvecs")(() => vecBatch("exact"))
      val vecIvfpq = medianOf("x_vec_ivfpq_batch100_sec_20kvecs")(() => vecBatch("ivfpq"))
      // the refine stage on top of ivfpq: same shortlist depth the a15
      // gate pins (4k = 20), exact float re-score of only the shortlist
      val vecIvfpqRerank =
        medianOf("x_vec_ivfpq_rerank_batch100_sec_20kvecs")(() => vecBatch("ivfpq_rerank"))
      // served single-vector ivfpq probe (round 11): driver-resident
      // models + LRU inverted lists — the vector-side twin of the LSH
      // single-probe tiers; hot repeats run zero Spark jobs
      veng.warmServing()
      val someVecs = veng.embs.filter(col("id") < 30)
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val vecSingle = singleProbeAvg("x_vec_single_query_avg_sec_20kvecs")(() =>
        (5L until 25L).foreach(i => veng.query(someVecs(i), 5)))
      // ---- the 10x scale point (200k docs / 200k vectors) ----
      // The 100 TB design evidence the plan-shape arguments rest on:
      // batch-probe cost must stay ~flat as the corpus grows 10x (the
      // max_candidates cap bounds per-query scored rows regardless of
      // index size) while index build scales ~linearly with rows. Same
      // generators, same probe plans, same min-of-3 timing as the 20k
      // reference-scale probes above.
      veng.close()
      // disk-resident probe with bucket pruning: the same batch against
      // the SAVED bucketed postings table — candidate I/O bounded by the
      // batch's buckets, not the index size (the 100 TB probe path; the
      // cached-index probe above scans the whole in-memory index instead)
      def bucketedBatch(e: graft.api.QueryEngine, table: String, key: String): Double = {
        spark.sql(s"DROP TABLE IF EXISTS $table")
        // a previous JVM's warehouse dir survives the in-memory catalog —
        // remove the orphaned location or saveAsTable refuses the name
        val loc = new java.io.File(
          spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
        if (loc.exists()) {
          import scala.reflect.io.Directory
          new Directory(loc).deleteRecursively()
        }
        e.saveBucketed(table, buckets = 64)
        val t = spark.table(table)
        val qs = e.sigs.filter(col("doc_id") < 100)
          .select(col("doc_id").as("query_id"), col("sig"))
        medianOf(key)(() => graft.core.Lsh.queryBatchBucketed(
          e.sigs, t, qs, k = 5, maxCandidates = 2000).count())
      }
      val bucketed100At20k = bucketedBatch(eng, "graft_bench_bucketed_20k",
        "x_lsh_bucketed_batch100_sec_20kdocs")
      if (headlineOnly) {
        eng.close()
        quiesce("20kdocs")
        return (Map(
          "x_index_build_sec_20kdocs" -> buildSec,
          "x_lsh_single_query_avg_sec_20kdocs" -> singleAvg,
          "x_lsh_batch100_queries_sec_20kdocs" -> batch100,
          "x_lsh_batch1000_queries_sec_20kdocs" -> batch1000,
          "x_lsh_served_batch100_avg_sec_20kdocs" -> servedBatch100,
          "x_brute_batch100_queries_sec_20kdocs" -> brute100,
          "x_vec_build_sec_20kvecs" -> vecBuild,
          "x_vec_exact_batch100_sec_20kvecs" -> vecExact,
          "x_vec_ivfpq_batch100_sec_20kvecs" -> vecIvfpq,
          "x_vec_ivfpq_rerank_batch100_sec_20kvecs" -> vecIvfpqRerank,
          "x_vec_single_query_avg_sec_20kvecs" -> vecSingle,
          "x_lsh_bucketed_batch100_sec_20kdocs" -> bucketed100At20k),
          samples.toMap, degraded.toSeq, contended.toSeq)
      }
      quiesce("20kdocs")
      val tB2 = System.nanoTime()
      val eng200 = QueryEngine.build(
        SyntheticCorpus.docs(spark, 200000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      val buildSec200 = (System.nanoTime() - tB2) / 1e9
      def qDf200(n: Int) = eng200.sigs.filter(col("doc_id") < n)
        .select(col("doc_id").as("query_id"), col("sig"))
      def lshBatch200(n: Int): Long =
        graft.core.Lsh.queryBatch(eng200.sigs, eng200.index, qDf200(n), k = 5,
          maxCandidates = 2000).count()
      val batch100At200k = medianOf("x_lsh_batch100_queries_sec_200kdocs")(() => lshBatch200(100))
      val bucketed100At200k = bucketedBatch(eng200, "graft_bench_bucketed_200k",
        "x_lsh_bucketed_batch100_sec_200kdocs")
      // single-probe latency ABOVE the driver-replica threshold (6.4M
      // postings > 1M): served through the LRU probe cache — the cold
      // probe pays one bucket-fetch job, the warmed repeats are
      // in-process (minOf3's warmup run populates the cache, so this
      // measures the steady-state hot-key serving latency; the cold cost
      // is the distributed plan's, unchanged)
      val someSigs200 = eng200.sigs.filter(col("doc_id") < 30)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val singleAvg200 = singleProbeAvg("x_lsh_single_query_avg_sec_200kdocs")(() =>
        (5L until 25L).foreach(i => eng200.query(someSigs200(i), 5)))
      // COLD probe-cache latency: 20 never-probed queries, one pass — the
      // bucket-fetch + signature-fetch job cost a miss pays (the honest
      // counterpart of the hot number above; single sample by nature)
      val coldSigs200 = eng200.sigs
        .filter(col("doc_id") >= 100 && col("doc_id") < 120)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val tCold = System.nanoTime()
      coldSigs200.keys.toSeq.sorted.foreach(i => eng200.query(coldSigs200(i), 5))
      val singleCold200 = (System.nanoTime() - tCold) / 1e9 / 20.0
      val tV2 = System.nanoTime()
      val veng200 = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 200000)).warmUp()
      val vecBuild200 = (System.nanoTime() - tV2) / 1e9
      val vq200 = veng200.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val vecIvfpq200 = medianOf("x_vec_ivfpq_batch100_sec_200kvecs")(() =>
        veng200.topK(vq200, k = 5, mode = "ivfpq").count())
      val vecIvfpqRerank200 = medianOf("x_vec_ivfpq_rerank_batch100_sec_200kvecs")(() =>
        veng200.topK(vq200, k = 5, mode = "ivfpq_rerank").count())
      // the contrast row: the exact scan pays the full 10x corpus growth
      // while the coarse-pruned compressed path above stays ~flat
      val vecExact200 = medianOf("x_vec_exact_batch100_sec_200kvecs")(() =>
        veng200.topK(vq200, k = 5, mode = "exact").count())
      // ---- the 100x decade (1M docs / 1M vectors), headliners only ----
      // One more decade for the four build/probe headliners: the 20k->200k
      // point showed the cost curves' shape; 200k->1M catches anything that
      // was hiding under fixed overhead (e.g. the cached-index scan term
      // in LSH batch growth). Probes must stay ~flat; builds ~linear.
      eng200.close(); veng200.close()
      quiesce("200kdocs")
      val tB3 = System.nanoTime()
      val eng1m = QueryEngine.build(
        SyntheticCorpus.docs(spark, 1000000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      val buildSec1m = (System.nanoTime() - tB3) / 1e9
      val bucketed100At1m = bucketedBatch(eng1m, "graft_bench_bucketed_1m",
        "x_lsh_bucketed_batch100_sec_1mdocs")
      // cached-index batch at 1M completes the 3-decade matrix for the
      // in-memory probe path (20k/200k rows exist above): the cap bounds
      // scored rows, so residual growth is the cached-index scan term
      def qDf1m(n: Int) = eng1m.sigs.filter(col("doc_id") < n)
        .select(col("doc_id").as("query_id"), col("sig"))
      val batch100At1m = medianOf("x_lsh_batch100_queries_sec_1mdocs")(() =>
        graft.core.Lsh.queryBatch(eng1m.sigs, eng1m.index, qDf1m(100), k = 5,
          maxCandidates = 2000).count())
      // hot single-probe latency two decades above the replica threshold
      // (32M postings): the LRU probe-cache serving path must stay flat
      val someSigs1m = eng1m.sigs.filter(col("doc_id") < 30)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val singleAvg1m = singleProbeAvg("x_lsh_single_query_avg_sec_1mdocs")(() =>
        (5L until 25L).foreach(i => eng1m.query(someSigs1m(i), 5)))
      eng1m.close()
      quiesce("1mdocs")
      // ---- the 4M docs decade: fourth point of the flat-probe claim ----
      // The vectors side already measures 4M; the docs side stopped at 1M.
      // One more 4x step for the three probe paths whose cost must NOT
      // carry a corpus-size term: capped cached-index batch, bucketed
      // disk batch (candidate I/O bounded by the batch's buckets), and
      // the LRU-probe-cache hot single (128M postings, two decades above
      // the driver-replica bound). Build stays the linear contrast row.
      val tB4 = System.nanoTime()
      val eng4md = QueryEngine.build(
        SyntheticCorpus.docs(spark, 4000000),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1)).warmUp()
      val buildSec4m = (System.nanoTime() - tB4) / 1e9
      val bucketed100At4m = bucketedBatch(eng4md, "graft_bench_bucketed_4m",
        "x_lsh_bucketed_batch100_sec_4mdocs")
      def qDf4m(n: Int) = eng4md.sigs.filter(col("doc_id") < n)
        .select(col("doc_id").as("query_id"), col("sig"))
      val batch100At4m = medianOf("x_lsh_batch100_queries_sec_4mdocs")(() =>
        graft.core.Lsh.queryBatch(eng4md.sigs, eng4md.index, qDf4m(100), k = 5,
          maxCandidates = 2000).count())
      // single-probe serving at 4M (two decades above the replica bound).
      // Round 10 shipped ONE row here that silently mixed tiers: the
      // untrimmed per-miss fetch thrashed the bounded probe cache, so
      // every "hot" repeat was really a cold whole-index fetch
      // (87-298 ms vs 4-6 ms at <=1M). With the cap-prefix-trimmed fetch
      // the 20-probe working set fits residency and the hot row measures
      // actual in-process serving; the COLD row (never-probed queries,
      // one pass) pays its bucket fetches against the SAVED bucketed
      // table — bucket-pruned I/O, the honest 100 TB cold tier — which
      // serveFromBucketed wires as the miss path.
      eng4md.serveFromBucketed("graft_bench_bucketed_4m")
      val someSigs4m = eng4md.sigs.filter(col("doc_id") < 30)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val singleAvg4m = singleProbeAvg("x_lsh_single_query_avg_sec_4mdocs")(() =>
        (5L until 25L).foreach(i => eng4md.query(someSigs4m(i), 5)))
      val coldSigs4m = eng4md.sigs
        .filter(col("doc_id") >= 100 && col("doc_id") < 120)
        .orderBy("doc_id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
      val tCold4m = System.nanoTime()
      coldSigs4m.keys.toSeq.sorted.foreach(i => eng4md.query(coldSigs4m(i), 5))
      val singleCold4m = (System.nanoTime() - tCold4m) / 1e9 / 20.0
      samples("x_lsh_single_query_cold_avg_sec_4mdocs") = Seq(singleCold4m)
      eng4md.close()
      quiesce("4mdocs")
      val tV3 = System.nanoTime()
      val veng1m = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 1000000)).warmUp()
      val vecBuild1m = (System.nanoTime() - tV3) / 1e9
      val vq1m = veng1m.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val vecIvfpq1m = medianOf("x_vec_ivfpq_batch100_sec_1mvecs", minSamples = 5)(() =>
        veng1m.topK(vq1m, k = 5, mode = "ivfpq").count())
      // the rerank-vs-exact crossover row: at 20k the exact scan is
      // trivially cheap and refine overhead dominates; at 1M the exact
      // scan pays the full corpus (6.4 G multiplies per batch) while
      // rerank re-scores only O(queries x shortlist) floats on top of the
      // flat compressed probe — the scale where the FAISS refine stage
      // earns its keep
      val vecRerank1m = medianOf("x_vec_ivfpq_rerank_batch100_sec_1mvecs")(() =>
        veng1m.topK(vq1m, k = 5, mode = "ivfpq_rerank").count())
      val vecExact1m = medianOf("x_vec_exact_batch100_sec_1mvecs")(() =>
        veng1m.topK(vq1m, k = 5, mode = "exact").count())
      veng1m.close()
      quiesce("1mvecs")
      // the FAISS sizing lever: scored codes per IVF-PQ query are the
      // nprobe/nCents corpus fraction, so a fixed nCents=8 index scans
      // 37.5% of any corpus — flat probes at scale need nCents to grow
      // (~sqrt(n)). The same 1M corpus under nCents=64 measures the
      // lever: scored codes drop 8x while build stays tractable
      // (assignment is one broadcast codegen pass either way). At this
      // scale wall-clock moves less than 8x because fixed plan overhead
      // dominates the probe — itself evidence the data term is small.
      val tV4 = System.nanoTime()
      val veng1mC = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 1000000), nCents = 64).warmUp()
      val vecBuild1mC = (System.nanoTime() - tV4) / 1e9
      val vq1mC = veng1mC.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val vecIvfpq1mC = medianOf("x_vec_ivfpq_batch100_sec_1mvecs_c64", minSamples = 5)(() =>
        veng1mC.topK(vq1mC, k = 5, mode = "ivfpq").count())
      veng1mC.close()
      quiesce("1mvecs_c64")
      // ---- the 4M decade: the compressed-path crossover evidence ----
      // The engine's own 100 TB default is ivfpq/ivfpq_rerank, yet through
      // 1M the EXACT scan won every measured scale — fixed plan overhead
      // dominated the compressed probe while the exact data term was
      // still cheap (0.88 s at 1M). One more 4x step makes the terms
      // visible: the exact batch pays the full 1 GB float corpus per
      // scan, the coarse-pruned ADC batch scans nprobe/nCents of
      // 16x-smaller codes. Both centroid sizings run — the fixed c8
      // index (37.5% of codes scanned, the sizing that stops scaling)
      // and c64 (4.7% scanned, the ~sqrt(n) serving sizing) — so the
      // crossover AND the sizing lever are measured on the same corpus.
      val tV5 = System.nanoTime()
      val veng4m = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 4000000)).warmUp()
      val vecBuild4m = (System.nanoTime() - tV5) / 1e9
      val vq4m = veng4m.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val vecExact4m = medianOf("x_vec_exact_batch100_sec_4mvecs")(() =>
        veng4m.topK(vq4m, k = 5, mode = "exact").count())
      val vecIvfpq4m = medianOf("x_vec_ivfpq_batch100_sec_4mvecs")(() =>
        veng4m.topK(vq4m, k = 5, mode = "ivfpq").count())
      val vecRerank4m = medianOf("x_vec_ivfpq_rerank_batch100_sec_4mvecs")(() =>
        veng4m.topK(vq4m, k = 5, mode = "ivfpq_rerank").count())
      veng4m.close()
      quiesce("4mvecs")
      val tV6 = System.nanoTime()
      val veng4mC = graft.api.VectorEngine.build(
        graft.sources.SyntheticCorpus.vectors(spark, 4000000), nCents = 64).warmUp()
      val vecBuild4mC = (System.nanoTime() - tV6) / 1e9
      val vq4mC = veng4mC.embs.filter(col("id") < 100)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
      val vecIvfpq4mC = medianOf("x_vec_ivfpq_batch100_sec_4mvecs_c64")(() =>
        veng4mC.topK(vq4mC, k = 5, mode = "ivfpq").count())
      val vecRerank4mC = medianOf("x_vec_ivfpq_rerank_batch100_sec_4mvecs_c64")(() =>
        veng4mC.topK(vq4mC, k = 5, mode = "ivfpq_rerank").count())
      // served single-vector probe at 4M/c64: hot (resident inverted
      // lists, zero jobs) and cold (never-probed vectors, one pruned
      // fetch per new centroid set) — mirrors the 4M docs-side split
      veng4mC.warmServing()
      val someVecs4m = veng4mC.embs.filter(col("id") < 30)
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val vecSingle4m = singleProbeAvg("x_vec_single_query_avg_sec_4mvecs_c64")(() =>
        (5L until 25L).foreach(i => veng4mC.query(someVecs4m(i), 5)))
      val coldVecs4m = veng4mC.embs.filter(col("id") >= 100 && col("id") < 120)
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      val tVCold = System.nanoTime()
      coldVecs4m.keys.toSeq.sorted.foreach(i => veng4mC.query(coldVecs4m(i), 5))
      val vecSingleCold4m = (System.nanoTime() - tVCold) / 1e9 / 20.0
      samples("x_vec_single_query_cold_avg_sec_4mvecs_c64") = Seq(vecSingleCold4m)
      // drop the probe engines' cached pipelines: the catalog pass that
      // follows must not pay CacheManager plan-compares and memory
      // pressure against them (mirror of the clearCache() on entry)
      veng4mC.close()
      quiesce("4mvecs_c64")
      (Map(
        "x_index_build_sec_20kdocs" -> buildSec,
        "x_lsh_single_query_avg_sec_20kdocs" -> singleAvg,
        "x_lsh_batch100_queries_sec_20kdocs" -> batch100,
        "x_lsh_batch1000_queries_sec_20kdocs" -> batch1000,
        "x_lsh_served_batch100_avg_sec_20kdocs" -> servedBatch100,
        "x_brute_batch100_queries_sec_20kdocs" -> brute100,
        "x_vec_build_sec_20kvecs" -> vecBuild,
        "x_vec_exact_batch100_sec_20kvecs" -> vecExact,
        "x_vec_ivfpq_batch100_sec_20kvecs" -> vecIvfpq,
        "x_vec_ivfpq_rerank_batch100_sec_20kvecs" -> vecIvfpqRerank,
        "x_vec_single_query_avg_sec_20kvecs" -> vecSingle,
        "x_index_build_sec_200kdocs" -> buildSec200,
        "x_lsh_batch100_queries_sec_200kdocs" -> batch100At200k,
        "x_lsh_single_query_avg_sec_200kdocs" -> singleAvg200,
        "x_lsh_single_query_cold_avg_sec_200kdocs" -> singleCold200,
        "x_lsh_bucketed_batch100_sec_20kdocs" -> bucketed100At20k,
        "x_lsh_bucketed_batch100_sec_200kdocs" -> bucketed100At200k,
        "x_vec_build_sec_200kvecs" -> vecBuild200,
        "x_vec_exact_batch100_sec_200kvecs" -> vecExact200,
        "x_vec_ivfpq_batch100_sec_200kvecs" -> vecIvfpq200,
        "x_vec_ivfpq_rerank_batch100_sec_200kvecs" -> vecIvfpqRerank200,
        "x_index_build_sec_1mdocs" -> buildSec1m,
        "x_lsh_bucketed_batch100_sec_1mdocs" -> bucketed100At1m,
        "x_lsh_batch100_queries_sec_1mdocs" -> batch100At1m,
        "x_lsh_single_query_avg_sec_1mdocs" -> singleAvg1m,
        "x_index_build_sec_4mdocs" -> buildSec4m,
        "x_lsh_bucketed_batch100_sec_4mdocs" -> bucketed100At4m,
        "x_lsh_batch100_queries_sec_4mdocs" -> batch100At4m,
        "x_lsh_single_query_avg_sec_4mdocs" -> singleAvg4m,
        "x_lsh_single_query_cold_avg_sec_4mdocs" -> singleCold4m,
        "x_vec_build_sec_1mvecs" -> vecBuild1m,
        "x_vec_ivfpq_batch100_sec_1mvecs" -> vecIvfpq1m,
        "x_vec_ivfpq_rerank_batch100_sec_1mvecs" -> vecRerank1m,
        "x_vec_exact_batch100_sec_1mvecs" -> vecExact1m,
        "x_vec_build_sec_1mvecs_c64" -> vecBuild1mC,
        "x_vec_ivfpq_batch100_sec_1mvecs_c64" -> vecIvfpq1mC,
        "x_vec_build_sec_4mvecs" -> vecBuild4m,
        "x_vec_exact_batch100_sec_4mvecs" -> vecExact4m,
        "x_vec_ivfpq_batch100_sec_4mvecs" -> vecIvfpq4m,
        "x_vec_ivfpq_rerank_batch100_sec_4mvecs" -> vecRerank4m,
        "x_vec_build_sec_4mvecs_c64" -> vecBuild4mC,
        "x_vec_ivfpq_batch100_sec_4mvecs_c64" -> vecIvfpq4mC,
        "x_vec_ivfpq_rerank_batch100_sec_4mvecs_c64" -> vecRerank4mC,
        "x_vec_single_query_avg_sec_4mvecs_c64" -> vecSingle4m,
        "x_vec_single_query_cold_avg_sec_4mvecs_c64" -> vecSingleCold4m),
        samples.toMap, degraded.toSeq, contended.toSeq)
    } catch { case e: Throwable =>
      // never sink the whole bench line, but say WHY the probes vanished
      System.err.println(s"[bench] probe metrics failed: $e")
      e.printStackTrace()
      (Map.empty[String, Double], samples.toMap, degraded.toSeq, contended.toSeq)
    }
  }

  /** Contention-refusal timing core (round 9, testable in isolation):
    * sample a batch of `minSamples`; if the batch's max/min spread
    * exceeds `spreadLimit` the batch is NOT certified — run
    * `betweenBatches` (GC drain in production) and take a fresh batch,
    * up to `maxRetries` times. Returns (median, allSamplesTaken,
    * degraded): a clean batch's median is the certified number; when
    * every batch stays noisy, `degraded=true` and the median is taken
    * over ALL samples (most robust basis available) — the caller must
    * surface the flag so the artifact self-describes as untrustworthy
    * instead of shipping a poisoned median as if it were clean. */
  def certifiedMedian(minSamples: Int, maxRetries: Int = 2,
                      spreadLimit: Double = 3.0,
                      betweenBatches: () => Unit = () => ())
                     (sample: () => Double): (Double, Seq[Double], Boolean) = {
    def batch(): Seq[Double] = (1 to minSamples).map(_ => sample())
    def noisy(ss: Seq[Double]): Boolean = ss.max / ss.min > spreadLimit
    def med(ss: Seq[Double]): Double = { val s = ss.sorted; s(s.length / 2) }
    var ss = batch()
    var all = ss
    var batchMedians = Seq(med(ss))
    var retries = 0
    while (noisy(ss) && retries < maxRetries) {
      betweenBatches()
      ss = batch(); all = all ++ ss; batchMedians :+= med(ss); retries += 1
    }
    // a within-batch-clean retry can still sit in a WRONG regime: if the
    // box slid into steady contention between batches, the retry batch
    // reads uniformly slow (tiny spread) while an earlier batch proved
    // the plan runs 3x+ faster — certifying that median ships exactly
    // the poisoned number this function exists to refuse. Cross-batch
    // check on per-batch MEDIANS (not the raw min: a single spurious
    // fast outlier inside a refused batch must not permanently block an
    // honest retry from certifying): the final batch certifies only when
    // its median stays within the spread limit of the fastest batch
    // median observed.
    val degraded = noisy(ss) || med(ss) / batchMedians.min > spreadLimit
    val basis = (if (degraded) all else ss).sorted
    (basis(basis.length / 2), all, degraded)
  }
}
