package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Real-corpus smoke (round 12 stretch): run the full corpus→packed-
  * tokens pipeline (p01 → BPE → u03 packing, the p02 composition) over
  * REAL text already present in this container — Debian package docs
  * (`/usr/share/doc/STAR/copyright`, plain text with real unicode,
  * addresses, license legalese) and Python standard-library sources
  * (real English prose in comments/docstrings mixed with code) — to
  * catch fixture-shaped assumptions the synthetic corpora cannot:
  * degenerate "languages" (code), control characters, very long lines,
  * empty files, markup.
  *
  * This is a SMOKE, not a gate: no DuckDB twin (the corpus is
  * machine-local), so the checks are structural invariants that must
  * hold on ANY corpus:
  *  - the pipeline completes with no exceptions over every stage;
  *  - stage survivors are monotonically non-increasing;
  *  - every packed sequence's tokens trace to a selected survivor and
  *    packing covers EXACTLY the selected survivors;
  *  - BPE tokenization round-trips lengths sanely (tokens > 0 for
  *    non-empty survivor texts, each doc's token count <= its char count);
  *  - dedup finds the duplicates real doc trees actually contain
  *    (Debian copyright boilerplate — expect a nonzero exact-dup rate).
  * Divergences found here get filed as gates on the synthetic tables.
  */
object RealCorpusSmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // one document per FILE: real doc boundaries, real heterogeneity
    def filesAsDocs(path: String, glob: String): org.apache.spark.sql.DataFrame =
      spark.read.option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true").text(path)
        .select(input_file_name().as("f"), col("value"))
        .groupBy("f").agg(concat_ws("\n", collect_list(col("value"))).as("text"))
    val copyrights = filesAsDocs("/usr/share/doc", "copyright")
    val pysrc = filesAsDocs(
      "/root/.pyenv/versions/3.11.7/lib/python3.11/email", "*.py")
      .unionByName(filesAsDocs(
        "/root/.pyenv/versions/3.11.7/lib/python3.11/json", "*.py"))
    val raw = copyrights.unionByName(pysrc)
      .withColumn("doc_id",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("f"))).cast("long"))
    // language from the engine's own lang-ID — real pipelines do not get
    // a lang column for free; code files land wherever the n-gram
    // heuristic puts them (that heterogeneity is the point)
    val docs = graft.operators.TextAnalysis.analyze(
        raw.select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("lang_pred").as("lang"))
      .join(raw.select("doc_id", "text"), "doc_id")
      .select("doc_id", "text", "lang")
      .localCheckpoint(true)
    val nDocs = docs.count()
    val nLangs = docs.select("lang").distinct().count()
    println(s"[smoke] corpus: $nDocs real docs, $nLangs predicted langs")

    // ---- p01: six-stage prep ----
    val prepped = graft.operators.Pipeline.prepareCorpus(docs)
      .localCheckpoint(true)
    val stages = prepped.agg(
      count(lit(1)).as("train_rows"),
      sum(when(col("q_keep"), 1L).otherwise(0L)).as("after_quality"),
      sum(when(col("x_keep"), 1L).otherwise(0L)).as("after_exact"),
      sum(when(col("n_keep"), 1L).otherwise(0L)).as("after_near"),
      sum(when(col("c_keep"), 1L).otherwise(0L)).as("after_decontam"),
      sum(when(col("selected"), 1L).otherwise(0L)).as("selected")).head()
    val counts = (0 until 6).map(stages.getLong)
    println(s"[smoke] p01 stages: ${counts.mkString(" -> ")}")
    require(counts.sliding(2).forall(p => p(1) <= p(0)),
      s"stage survivors must be non-increasing: $counts")
    // Debian copyright trees carry REAL boilerplate duplicates: the exact
    // dedup stage must drop something (q -> x strictly decreases) unless
    // quality already removed everything
    require(counts(1) == 0 || counts(2) < counts(1) || nDocs < 100,
      "expected real duplicate boilerplate to be found by exact dedup")

    // ---- BPE + packing over the selected survivors (the p02 shape) ----
    val survivors = prepped.filter(col("selected")).select("doc_id")
      .join(docs, "doc_id").select("doc_id", "text")
      .localCheckpoint(true)
    val nSel = survivors.count()
    val mergePairs = graft.operators.Bpe.trainMerges(survivors, rounds = 30)
      .orderBy("round").collect().map(_.getString(1)).toSeq
    require(mergePairs.nonEmpty, "BPE training learned no merges on real text")
    val toks = graft.operators.Bpe.countBpeTokens(survivors, mergePairs)
      .select(col("doc_id"), col("text"), col("n_bpe_tokens").as("n_tokens"))
      .localCheckpoint(true)
    val bad = toks
      .filter(length(trim(col("text"))) > 0 &&
        (col("n_tokens") <= 0 || col("n_tokens") > length(col("text"))))
      .count()
    require(bad == 0, s"$bad docs with insane token counts")
    val packed = graft.operators.Sampling.packSequences(
      toks.select("doc_id", "n_tokens"), col("n_tokens"))
    val nPacked = packed.count()
    val nSeqs = packed.select("seq_id").distinct().count()
    require(nPacked == nSel,
      s"packing must cover exactly the survivors: $nPacked != $nSel")
    val totToks = toks.agg(sum("n_tokens")).head().getLong(0)
    println(s"[smoke] p02: $nSel survivors, $totToks BPE tokens, " +
      s"$nSeqs packed sequences")
    println(s"""{"metric":"real_corpus_smoke","docs":$nDocs,"langs":$nLangs,""" +
      s""""stages":[${counts.mkString(",")}],"survivors":$nSel,""" +
      s""""bpe_tokens":$totToks,"packed_seqs":$nSeqs,"ok":true}""")
    System.out.flush()
    spark.stop()
  }
}
