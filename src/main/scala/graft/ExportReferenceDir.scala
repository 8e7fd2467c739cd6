package graft

import graft.core.MinHashPipeline
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CLI: export a corpus as the reference's complete `data/` directory
  * (docs.pkl / ids.pkl / shingles.pkl / sigs.npy / minhash_meta.pkl —
  * the five files synth_data.py writes and benchmark_runner.py /
  * index_builder.py load). The reference's own tooling runs unmodified
  * on the result.
  *
  * Usage: runMain graft.ExportReferenceDir <sfDir> <outDir>
  */
object ExportReferenceDir {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // the REFERENCE-faithful signature family (SHA-1 + uint64-wrap
    // kernel, bit-for-bit vs its MinHash.batch_signature — o05/goldens),
    // at build_and_save_minhash_signatures' defaults (k=3, by_word,
    // seed 42): the exported sigs.npy is byte-comparable to what the
    // reference itself would have written for the same corpus
    val shingled = MinHashPipeline.withSignature(docs, "text",
      MinHashPipeline.Params(kShingle = SparkEntry.K, byWord = true))
    // hist_edges.npy: the QED service's startup artifact
    // (query_service.py:54-59), per-dim np.histogram edges over the
    // signature matrix — histogramEdges is bit-exact to numpy's linspace
    val edges = graft.core.Qed.histogramEdges(
      shingled.select(col("doc_id"), col("sig")), "sig", unsigned = true)
    graft.sources.ReferenceDir.save(
      docs, shingled.select(col("doc_id"), col("sig")),
      shingled.select(col("doc_id"), col("shingles")), outDir,
      edges = Some(edges))
    println(s"[export] wrote reference data/ directory to $outDir")
    spark.stop()
  }
}
