package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Real-corpus SCALE run (round 13): the full corpus→loader-ready chain
  * (p01 six-stage prep → BPE train/tokenize → u03 packing → u10 epoch
  * shuffle into shards, i.e. p01→p02→p03) over EVERY piece of real text
  * in this container, with per-stage wall times recorded beside the
  * synthetic decade.
  *
  * Scope honesty: this box has no multi-GB public corpus and no network
  * egress; the harvest below (Debian /usr/share/doc trees, the full
  * decompressed man-page corpus, the Python standard library and
  * site-packages sources) is a few hundred MB across tens of thousands
  * of real files — a ~100x scale-up over the 663-doc RealCorpusSmoke,
  * with all the real-world pathologies the synthetic tables lack
  * (boilerplate license duplicates, troff markup, code-as-text, control
  * characters, empty and huge files, mixed languages).
  *
  * Checks are the smoke's structural invariants plus the round-13
  * observation target: how hard the decontamination stage collapses
  * survivors when boilerplate windows straddle the train/test split
  * (the r12 smoke saw 193→18 on 663 docs) — recorded explicitly so the
  * boilerplate-robust decontam variant has a measured motivation.
  *
  * Run: `SPARK_DRIVER_MEM=48g sbt -batch 'runMain graft.RealCorpusScale'`.
  * Emits ONE JSON line on stdout.
  */
object RealCorpusScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // many tiny real files: one task per ~4 MB keeps 32 cores busy
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.files.openCostInBytes", "16384")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def timed[T](key: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      timings(key) = sec
      System.err.println(f"[real-scale] $key%-24s $sec%9.2f s")
      r
    }

    // ---- harvest: one document per FILE (real boundaries). wholetext +
    // Hadoop's extension codecs decompress the .gz man/doc files inline.
    def filesAsDocs(path: String, glob: String): DataFrame =
      if (!new java.io.File(path).exists())
        spark.emptyDataFrame.select(lit("").as("f"), lit("").as("text")).limit(0)
      else spark.read
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        // real file trees contain unreadable entries (perl man pages have
        // ':' in their names, which Hadoop paths cannot address; some doc
        // files are truncated gzip) — skip them instead of failing the
        // harvest, exactly what a production crawl reader does
        .option("ignoreCorruptFiles", "true")
        .option("wholetext", "true").text(path)
        .select(input_file_name().as("f"), col("value").as("text"))
    val sources = Seq(
      ("doc", filesAsDocs("/usr/share/doc", "*")),
      ("man", filesAsDocs("/usr/share/man", "*.gz")),
      ("py_stdlib", filesAsDocs("/usr/lib/python3.11", "*.py")),
      ("pyenv", filesAsDocs("/root/.pyenv", "*.py")),
      ("perl", filesAsDocs("/usr/share/perl5", "*.pm")))
    val raw = timed("harvest") {
      val unioned = sources.map { case (src, df) =>
        df.withColumn("source", lit(src))
      }.reduce(_.unionByName(_))
        // binary leftovers (JFIF/GIF images shipped inside doc trees read
        // as mojibake, where Spark's byte-based length() and the JVM's
        // codepoint count legitimately disagree on invalid UTF-8) and
        // empty files: require >64 chars AND <5% control/replacement
        // characters — the binary filter every production text ingest
        // runs before tokenization
        .filter(length(col("text")) > 64)
        .filter((length(col("text")) -
          length(regexp_replace(col("text"),
            "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\uFFFD]", ""))) * 20
          < length(col("text")))
        .withColumn("doc_id",
          // a content+path hash id is stable across runs/partitionings
          pmod(xxhash64(col("f")), lit(1L << 40)))
        // xxhash64 collisions across ~100k files are ~1e-5 likely; keep
        // one deterministic winner so downstream ids are unique
        .groupBy("doc_id")
        .agg(min(struct(col("f"), col("text"), col("source"))).as("_s"))
        .select(col("doc_id"), col("_s.f").as("f"),
          col("_s.text").as("text"), col("_s.source").as("source"))
        .localCheckpoint(true)
      unioned
    }
    counts("n_files") = raw.count()
    counts("n_bytes") = raw.agg(sum(length(col("text")))).head().getLong(0)
    counts.foreach { case (k, v) => System.err.println(s"[real-scale] $k=$v") }

    // ---- lang-ID from the engine's own heuristic (real pipelines are
    // not handed a lang column) ----
    val docs = timed("lang_id") {
      graft.operators.TextAnalysis.analyze(raw.select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("lang_pred").as("lang"))
        .join(raw.select("doc_id", "text"), "doc_id")
        .select("doc_id", "text", "lang")
        .localCheckpoint(true)
    }
    counts("n_langs") = docs.select("lang").distinct().count()

    // ---- p01: six-stage prep ----
    val prepped = timed("p01_prepare") {
      graft.operators.Pipeline.prepareCorpus(docs).localCheckpoint(true)
    }
    val stages = prepped.agg(
      count(lit(1)).as("rows"),
      sum(when(col("q_keep"), 1L).otherwise(0L)).as("after_quality"),
      sum(when(col("x_keep"), 1L).otherwise(0L)).as("after_exact"),
      sum(when(col("n_keep"), 1L).otherwise(0L)).as("after_near"),
      sum(when(col("c_keep"), 1L).otherwise(0L)).as("after_decontam"),
      sum(when(col("selected"), 1L).otherwise(0L)).as("selected")).head()
    val stageCounts = (0 until 6).map(stages.getLong)
    Seq("rows", "after_quality", "after_exact", "after_near",
      "after_decontam", "selected").zip(stageCounts)
      .foreach { case (k, v) => counts(s"p01_$k") = v }
    require(stageCounts.sliding(2).forall(p => p(1) <= p(0)),
      s"stage survivors must be non-increasing: $stageCounts")
    // the round-13 observation target: decontam survivor ratio
    val decontamDrop =
      if (stageCounts(3) == 0) 0.0
      else 1.0 - stageCounts(4).toDouble / stageCounts(3).toDouble
    System.err.println(f"[real-scale] p01 stages ${stageCounts.mkString(" -> ")} " +
      f"(decontam drops ${decontamDrop * 100}%.1f%% of near-dedup survivors)")

    // ---- the GUARDED twin: boilerplate windows (present in >2 distinct
    // test-split docs) excluded from the contamination fingerprints (the
    // d19 semantics) — the before/after pair that motivates the guard ----
    val preppedG = timed("p01_prepare_guarded") {
      graft.operators.Pipeline.prepareCorpus(docs,
        decontamMaxSourceDocFreq = 2).localCheckpoint(true)
    }
    val gStages = preppedG.agg(
      sum(when(col("c_keep"), 1L).otherwise(0L)).as("after_decontam"),
      sum(when(col("selected"), 1L).otherwise(0L)).as("selected")).head()
    counts("p01g_after_decontam") = gStages.getLong(0)
    counts("p01g_selected") = gStages.getLong(1)
    val decontamDropG =
      if (stageCounts(3) == 0) 0.0
      else 1.0 - gStages.getLong(0).toDouble / stageCounts(3).toDouble
    System.err.println(f"[real-scale] guarded decontam drops " +
      f"${decontamDropG * 100}%.1f%% (vs ${decontamDrop * 100}%.1f%% unguarded)")

    // ---- p02: BPE train + tokenize + pack over the survivors ----
    val survivors = prepped.filter(col("selected")).select("doc_id")
      .join(docs, "doc_id").select("doc_id", "text")
      .localCheckpoint(true)
    counts("n_survivors") = survivors.count()
    val mergePairs = timed("p02_bpe_train") {
      graft.operators.Bpe.trainMerges(survivors, rounds = 30)
        .orderBy("round").collect().map(_.getString(1)).toSeq
    }
    require(mergePairs.nonEmpty, "BPE training learned no merges on real text")
    val toks = timed("p02_tokenize") {
      graft.operators.Bpe.countBpeTokens(survivors, mergePairs)
        .select(col("doc_id"), col("text"),
          col("n_bpe_tokens").cast("long").as("n_tokens"))
        .localCheckpoint(true)
    }
    // "non-empty" must mean HAS A TOKEN: SQL trim() strips only spaces,
    // so a real file of newlines/tabs (doc trees have them) would be
    // flagged as a zero-token anomaly when zero is the right answer
    val badToks = toks
      .filter(length(regexp_replace(col("text"), "\\s+", "")) > 0 &&
        (col("n_tokens") <= 0 || col("n_tokens") > length(col("text"))))
      .localCheckpoint(true)
    counts("n_bad_token_counts") = badToks.count()
    if (counts("n_bad_token_counts") > 0)
      badToks.select(col("doc_id"), length(col("text")).as("len"),
          col("n_tokens"), substring(col("text"), 1, 60).as("head"))
        .limit(5).collect()
        .foreach(r => System.err.println(
          s"[real-scale] BAD doc=${r.get(0)} len=${r.get(1)} " +
            s"n_tokens=${r.get(2)} head=${
              r.getString(3).map(c => if (c < 32) '?' else c)}"))
    require(counts("n_bad_token_counts") == 0, "insane BPE token counts")
    counts("n_bpe_tokens") = toks.agg(sum("n_tokens")).head().getLong(0)
    val packed = timed("p02_pack") {
      graft.operators.Sampling.packSequences(
        toks.select("doc_id", "n_tokens"), col("n_tokens"),
        budget = 2048, buckets = 32).localCheckpoint(true)
    }
    counts("n_packed_rows") = packed.count()
    counts("n_seqs") = packed.select("bucket", "seq_id").distinct().count()
    require(counts("n_packed_rows") == counts("n_survivors"),
      "packing must cover exactly the survivors")

    // ---- p03: deterministic epoch shuffle of the packed sequences ----
    val sharded = timed("p03_shuffle_shards") {
      val seqs = packed.select(
        (col("bucket").cast("long") * 1000000L + col("seq_id")).as("doc_id"))
        .distinct()
      val out = graft.operators.Sampling.shuffleShards(seqs, nShards = 64)
      out.agg(sum("pos")).head().getLong(0) // force every row
      out
    }
    counts("n_shards") = sharded.select("shard").distinct().count()

    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def f6(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    println(jmap(Seq(
      "metric" -> "\"real_corpus_scale\"",
      "queries" -> jmap(timings.map { case (k, v) => s"x_real_${k}_sec" -> f6(v) }),
      "counts" -> jmap(counts.map { case (k, v) => k -> v.toString }),
      "decontam_drop_frac" -> f6(decontamDrop),
      "decontam_drop_frac_guarded" -> f6(decontamDropG),
      "ok" -> "true")))
    System.out.flush()
    spark.stop()
  }
}
