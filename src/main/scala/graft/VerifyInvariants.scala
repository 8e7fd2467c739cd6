package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Invariant-based sf1.0 verification for the gates whose DuckDB oracles
  * are intractable at that scale (round-13 item: "sf1.0 coverage must not
  * be bounded by the oracle's recursive-CTE cost"):
  *
  *  1. **Connected components on the capstress fixture** — the reach-CTE
  *     oracle is clique-quadratic on the 5,500-doc one-text block. Here
  *     d05's labels are checked in Spark against
  *     (a) EDGE CONSISTENCY: every near-dup pair gets one label;
  *     (b) LABEL MINIMALITY: label(n) <= n, and every label is a member
  *         of its own label group with label(label) == label (so labels
  *         are real component members, not fabricated ids);
  *     (c) an INDEPENDENTLY SHUFFLED RECOMPUTATION: the same algorithm
  *         over reversed, re-partitioned edges (different round
  *         trajectory, different partitioning) must produce identical
  *         labels — a nondeterminism-or-order bug cannot survive both.
  *  2. **Streaming incremental dedup (s14) at sf1.0** — the two-round
  *     DuckDB replay ran 1181 s at this scale. Here the streaming state's
  *     verdicts (trickle path, partition-pruned StandingCorpus) are
  *     checked against the BULK scan path
  *     (Dedup.incrementalStatusIndexed) — two genuinely different plans
  *     over the same standing state must agree on every status, for both
  *     micro-batches with state evolution between them.
  *
  * Usage: `sbt 'runMain graft.VerifyInvariants <sfDir>'` where sfDir is
  * a make_sf1.py output (use the --capstress variant for check 1 to make
  * the bucket cap bind). Emits one JSON line; exit 1 on any violation.
  */
object VerifyInvariants {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1.0_capstress")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val counts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var failed = false
    def check(name: String)(violations: => Long): Unit = {
      val t0 = System.nanoTime()
      val v = violations
      val sec = (System.nanoTime() - t0) / 1e9
      counts(s"${name}_violations") = v
      results(name) = if (v == 0) "pass" else "FAIL"
      if (v != 0) failed = true
      System.err.println(f"[invariants] $name%-28s ${results(name)} ($v violations, $sec%.1f s)")
    }

    // ---- 1. d05 connected components on the capstress near-dup graph ----
    val pairs = {
      val q = SparkEntry.queries("o10_est_jaccard_pairs")
      // the same candidate-pair chain the d05 gate consumes (md5 sigs ->
      // capped LSH postings -> candidate pairs -> est-Jaccard >= 0.9)
      q(spark, sfDir).filter(col("score") >= 0.9)
        .select(col("a"), col("b")).localCheckpoint(true)
    }
    counts("n_pairs") = pairs.count()
    val labels = graft.operators.Dedup.connectedComponents(pairs)
      .localCheckpoint(true)
    counts("n_labeled") = labels.count()

    check("cc_edge_consistency") {
      val la = labels.select(col("doc").as("a"), col("label").as("label_a"))
      val lb = labels.select(col("doc").as("b"), col("label").as("label_b"))
      pairs.join(la, "a").join(lb, "b")
        .filter(col("label_a") =!= col("label_b")).count()
    }
    check("cc_label_minimality") {
      labels.filter(col("label") > col("doc")).count()
    }
    check("cc_label_is_member_root") {
      // every label must be a labeled node whose own label is itself
      val roots = labels.filter(col("label") === col("doc"))
        .select(col("doc").as("root"))
      labels.select(col("label").as("root")).distinct()
        .join(roots, Seq("root"), "left_anti").count()
    }
    check("cc_shuffled_recompute_equal") {
      // reversed edge direction + different partitioning -> a different
      // per-round trajectory; converged labels must be identical
      val shuffled = pairs.select(col("b").as("a"), col("a").as("b"))
        .repartition(7, col("b"))
      val labels2 = graft.operators.Dedup.connectedComponents(shuffled)
      labels.join(labels2.withColumnRenamed("label", "label2"), Seq("doc"), "full")
        .filter(col("label").isNull || col("label2").isNull ||
          col("label") =!= col("label2")).count()
    }

    // ---- 2. s14 streaming state vs the bulk path at this scale ----
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.functions.GraftFunctions.{minhash_signature, shingle_hashes_md5}
    val sigsAll = docs.select(col("doc_id"),
      minhash_signature(shingle_hashes_md5(
        graft.core.Shingling.shingles(col("text"), 3, byWord = true))).as("sig"))
      .localCheckpoint(true)
    val corpusDocs = docs.filter(col("doc_id") % 10 < 6)
    val corpusSigs = sigsAll.filter(col("doc_id") % 10 < 6)
    // EVERY batch id is re-keyed ABOVE the standing corpus max: the
    // append-under-cap == re-cap equivalence the stream-vs-bulk check
    // relies on holds exactly when batch ids are monotone vs standing
    // ids — interleaved ids would make the two paths legitimately
    // diverge once a probed bucket crosses maxBucketSize (round-13
    // advice; the equality previously held only because no bucket
    // happened to cross the cap at fixture occupancy).
    val b1 = docs.filter(col("doc_id") % 10 === 7)
      .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 3)
        .select((col("doc_id") + 10000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    val b2 = docs.filter(col("doc_id") % 10 === 9)
      .select((col("doc_id") + 15000000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 10 === 7)
        .select((col("doc_id") + 20000000L).as("doc_id"), col("text")))
      .localCheckpoint(true)
    val state = new graft.streaming.Streams.IncrementalDedupState(
      corpusDocs, corpusSigs, threshold = 0.5)
    // force the partition-pruned TRICKLE path even for these sf1.0-sized
    // batches — the point is stream(trickle) vs bulk, two different plans
    state.standing.trickleMaxDocs = 10000000L
    val st1 = state.classify(b1)
    val st2 = state.classify(b2)
    counts("n_s14_b1") = st1.count()
    counts("n_s14_b2") = st2.count()

    // bulk twins: round 1 vs the standing corpus; round 2 vs the grown
    // corpus (standing + b1's new docs), postings RE-CAPPED over the
    // grown sig table — the equivalence contract for monotone-vs-standing
    // ids that the oracle replays at gate scale
    def signed(b: DataFrame): DataFrame =
      b.select(col("doc_id"),
        minhash_signature(shingle_hashes_md5(
          graft.core.Shingling.shingles(col("text"), 3, byWord = true))).as("sig"))
    val bulk1 = graft.operators.Dedup.incrementalStatus(
      corpusDocs, corpusSigs, b1, signed(b1), threshold = 0.5)
      .localCheckpoint(true)
    val new1 = b1.join(bulk1.filter(col("status") === "new"),
      Seq("doc_id"), "left_semi")
    val grownDocs = corpusDocs.select(col("doc_id"), col("text"))
      .unionByName(new1).localCheckpoint(true)
    val grownSigs = corpusSigs.unionByName(signed(new1)).localCheckpoint(true)
    val bulk2 = graft.operators.Dedup.incrementalStatus(
      grownDocs, grownSigs, b2, signed(b2), threshold = 0.5)

    check("s14_round1_stream_eq_bulk") {
      st1.withColumnRenamed("status", "s_stream")
        .join(bulk1.withColumnRenamed("status", "s_bulk"), Seq("doc_id"), "full")
        .filter(col("s_stream").isNull || col("s_bulk").isNull ||
          col("s_stream") =!= col("s_bulk")).count()
    }
    check("s14_round2_stream_eq_bulk") {
      st2.withColumnRenamed("status", "s_stream")
        .join(bulk2.withColumnRenamed("status", "s_bulk"), Seq("doc_id"), "full")
        .filter(col("s_stream").isNull || col("s_bulk").isNull ||
          col("s_stream") =!= col("s_bulk")).count()
    }

    def jmap(m: Iterable[(String, String)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    println(jmap(Seq(
      "metric" -> "\"sf1_invariants\"", "sf_dir" -> ("\"" + sfDir + "\""),
      "checks" -> jmap(results.map { case (k, v) => k -> ("\"" + v + "\"") }),
      "counts" -> jmap(counts.map { case (k, v) => k -> v.toString }),
      "all_pass" -> (!failed).toString)))
    System.out.flush()
    spark.stop()
    if (failed) sys.exit(1)
  }
}
