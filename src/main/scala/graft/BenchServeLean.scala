package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-phase lean-serving decade evidence (round 12 — the 16M hot-tier
  * answer): r11 measured 16M-doc hot singles at 5-7 ms medians but with
  * a 5-55 ms spread under the 96 GiB-heap GC pressure a corpus-sized
  * cached index forces in local mode (the row shipped `degraded:true`).
  * The serving-shard conclusion (SURVEY §6.1): a serving process should
  * hold ONLY bounded caches and fetch cold state bucket-pruned from
  * disk. This main measures exactly that split:
  *
  *  - phase 1 (build box, big heap): build the index, write the
  *    [[graft.api.QueryEngine.saveServing]] layout (bucketed postings +
  *    bucketed signatures + params as external tables), exit.
  *  - phase 2 (SERVING process, MODEST heap — run with
  *    SPARK_DRIVER_MEM=16g in a FRESH JVM): `openServing` re-registers
  *    the tables from their own files, probes route through the LRU
  *    probe cache with every miss-path job bucket-pruned, and the hot /
  *    cold single-probe rows are measured with the standard
  *    certified-median discipline. Nothing corpus-sized is ever cached,
  *    so the hot row runs in a GC regime the driver actually controls.
  *
  * Phase is auto-detected: a complete layout on disk selects phase 2.
  * `SPARK_GRAFT_DECADE_DOCS` sizes the corpus (default 16M). */
object BenchServeLean {
  def main(args: Array[String]): Unit = {
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DECADE_DOCS", "16000000").toLong
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
    val tag = if (nDocs % 1000000 == 0) s"${nDocs / 1000000}mdocs" else s"${nDocs}docs"
    val dir = new java.io.File(s"target/serve_lean_$tag").getAbsolutePath
    val prefix = s"graft_lean_$tag"
    val complete = new java.io.File(s"$dir/params").exists() &&
      new java.io.File(s"$dir/postings").exists() &&
      new java.io.File(s"$dir/sigs").exists()

    if (!complete) {
      // ---- phase 1: build + save the serving layout, then exit ----
      val tB = System.nanoTime()
      val eng = QueryEngine.build(SyntheticCorpus.docs(spark, nDocs),
        mp = graft.core.MinHashPipeline.Params(kShingle = 1))
      eng.saveServing(dir, prefix, buckets = 64)
      val sec = (System.nanoTime() - tB) / 1e9
      eng.close()
      val buildJson =
        s"""{"metric":"serve_lean_build","n_docs":$nDocs,"build_save_sec":$sec,"dir":"$dir"}"""
      // persist the phase-1 record beside the layout so phase 2 embeds it
      // (ONE JSON document per artifact, not concatenated phase lines)
      val w = new java.io.FileWriter(new java.io.File(dir, "build_phase.json"))
      try w.write(buildJson) finally w.close()
      println(buildJson)
      System.out.flush()
      spark.stop()
      return
    }

    // ---- phase 2: lean serving in THIS (modest-heap) JVM ----
    val samples = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    val degraded = scala.collection.mutable.LinkedHashSet.empty[String]
    val eng = QueryEngine.openServing(spark, dir, prefix)
    val someSigs = eng.sigs.filter(col("doc_id") < 30)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val hotKey = s"x_lsh_single_query_avg_sec_${tag}_lean"
    def medianOf(key: String)(run: () => Unit): Double = {
      run()
      def sample(): Double = {
        val t0 = System.nanoTime(); run(); (System.nanoTime() - t0) / 1e9
      }
      val (med, all, isDegraded) =
        Bench.certifiedMedian(3, betweenBatches = () => System.gc())(sample)
      if (isDegraded) degraded += key
      samples(key) = all
      med
    }
    val hot = medianOf(hotKey)(() =>
      (5L until 25L).foreach(i => eng.query(someSigs(i), 5))) / 20.0
    samples(hotKey) = samples(hotKey).map(_ / 20.0)
    val coldSigs = eng.sigs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    val tCold = System.nanoTime()
    coldSigs.keys.toSeq.sorted.foreach(i => eng.query(coldSigs(i), 5))
    val cold = (System.nanoTime() - tCold) / 1e9 / 20.0
    samples(s"x_lsh_single_query_cold_avg_sec_${tag}_lean") = Seq(cold)
    val heapMb = (Runtime.getRuntime.totalMemory() / (1 << 20))
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val buildPhase = {
      val f = new java.io.File(dir, "build_phase.json")
      if (!f.exists()) "null"
      else {
        val src = scala.io.Source.fromFile(f)
        try src.mkString.trim finally src.close()
      }
    }
    println(jmap(Seq(
      "metric" -> "\"serve_lean\"", "n_docs" -> nDocs.toString,
      "jvm_heap_mb" -> heapMb.toString,
      "build_phase" -> buildPhase,
      "queries" -> jmap(Seq(
        hotKey -> f6(hot),
        s"x_lsh_single_query_cold_avg_sec_${tag}_lean" -> f6(cold))),
      "degraded" -> (if (degraded.nonEmpty) "true" else "false"),
      "degraded_probes" -> degraded.map("\"" + _ + "\"").mkString("[", ",", "]"),
      "samples" -> jmap(samples.map { case (k, vs) =>
        k -> vs.map(f6).mkString("[", ",", "]")
      }))))
    System.out.flush()
    spark.stop()
  }
}
