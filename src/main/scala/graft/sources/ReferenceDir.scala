package graft.sources

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Export/import of the reference's COMPLETE artifact directory — the
  * five files its pipeline writes and its loaders read back
  * (synth_data.py:10-13,113-117,148-157; benchmark_runner.py:28-31;
  * index_builder.py:28):
  *
  *   - `docs.pkl`          list[str]       raw corpus, positional
  *   - `ids.pkl`           list[str]       `doc_{i:06d}`, positional
  *   - `shingles.pkl`      list[set[str]]  per-doc shingle sets
  *   - `sigs.npy`          (N, num_perm) uint64 C-order
  *   - `minhash_meta.pkl`  flat dict       num_perm/k_shingle/by_word/seed
  *
  * `save` emits a directory CPython's `pickle.load` + `np.load` read
  * verbatim — a user can point the reference's own benchmark_runner at
  * an engine-exported corpus; `load` is the reverse boundary for a user
  * holding the reference's actual `data/` output.
  *
  * Scale note: the pickle members are driver-sized BY THE REFERENCE'S
  * OWN CONTRACT (its loaders materialize each full list in one Python
  * process), so the collects here are bounded by construction — this is
  * a format boundary for reference-sized artifacts, not a corpus-scale
  * data path. Corpus-scale interchange stays parquet / sharded `.npy`
  * ([[Npy.saveLongShards]]); `sigs.npy` is written through the same
  * distributed writer and only coalesced to the single file `np.save`
  * produces.
  */
object ReferenceDir {

  val DefaultMeta: Map[String, Any] = Map(
    "num_perm" -> 128L, "k_shingle" -> 3L, "by_word" -> true, "seed" -> 42L)

  /** Write the reference's full `data/` directory.
    *
    * @param docs     (doc_id: Long, text: String)
    * @param sigs     (doc_id: Long, sig: Array[Long]) — num_perm wide
    * @param shingles (doc_id: Long, shingles: Seq[String])
    * @param edges    optional (dim: Long, edges: Array[Double]) — written
    *                 as `hist_edges.npy` (the (D, n_bins+1) float64 array
    *                 query_service.py:54-59 loads at startup; build it
    *                 with [[graft.core.Qed.histogramEdges]], which is
    *                 bit-exact to np.histogram's linspace edges)
    */
  def save(docs: DataFrame, sigs: DataFrame, shingles: DataFrame,
           outDir: String, meta: Map[String, Any] = DefaultMeta,
           edges: Option[DataFrame] = None): Unit = {
    new java.io.File(outDir).mkdirs()
    val d = docs.select(col("doc_id").cast("long"), col("text"))
      .orderBy("doc_id").collect()
    Pickle.writeStringList(s"$outDir/ids.pkl",
      d.toSeq.map(r => f"doc_${r.getLong(0)}%06d"))
    Pickle.writeStringList(s"$outDir/docs.pkl", d.toSeq.map(_.getString(1)))
    val sh = shingles.select(col("doc_id").cast("long"), col("shingles"))
      .orderBy("doc_id").collect()
    Pickle.writeStringSetList(s"$outDir/shingles.pkl",
      sh.toSeq.map(_.getSeq[String](1).toSet))
    Pickle.writeStringMap(s"$outDir/minhash_meta.pkl", meta)
    // sigs.npy: np.save writes ONE C-order file; reuse the distributed
    // shard writer at shards=1 and give the artifact its reference name
    val tmp = java.nio.file.Files.createTempDirectory("graft_refdir_sigs")
    Npy.saveLongShards(sigs, "doc_id", "sig", tmp.toString, shards = 1)
    java.nio.file.Files.move(tmp.resolve("shard_00000.npy"),
      java.nio.file.Paths.get(s"$outDir/sigs.npy"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    java.nio.file.Files.deleteIfExists(tmp)
    edges.foreach { e =>
      val t = java.nio.file.Files.createTempDirectory("graft_refdir_edges")
      Npy.saveDoubleShards(e, "dim", "edges", t.toString, shards = 1)
      java.nio.file.Files.move(t.resolve("shard_00000.npy"),
        java.nio.file.Paths.get(s"$outDir/hist_edges.npy"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.deleteIfExists(t)
    }
    ()
  }

  /** The directory read back as DataFrames. `row_idx` is the positional
    * id space the reference's files share (ids.pkl is positional —
    * benchmark_runner.py:175). Shingle sets come back as sorted arrays
    * (column-type-stable; set semantics live in the values). */
  case class Loaded(docs: DataFrame, sigs: DataFrame, shingles: DataFrame,
                    meta: Map[String, Any], edges: Option[DataFrame])

  def load(spark: SparkSession, dir: String): Loaded = {
    import spark.implicits._
    val ids = Pickle.readStringList(s"$dir/ids.pkl")
    val texts = Pickle.readStringList(s"$dir/docs.pkl")
    require(ids.length == texts.length,
      s"ids.pkl (${ids.length}) and docs.pkl (${texts.length}) disagree")
    val docs = ids.zip(texts).zipWithIndex
      .map { case ((id, t), r) => (r.toLong, id, t) }
      .toDF("row_idx", "ref_id", "text")
    val shingles = Pickle.readStringSetList(s"$dir/shingles.pkl").zipWithIndex
      .map { case (s, r) => (r.toLong, s.toSeq.sorted) }
      .toDF("row_idx", "shingles")
    // each member is addressed by its exact filename — sigs.npy is int64,
    // hist_edges.npy float64, so neither reader may glob the whole dir
    val edges =
      if (new java.io.File(s"$dir/hist_edges.npy").exists())
        Some(Npy.readDoubleShards(spark, s"$dir/hist_edges.npy")
          .select(col("row_idx").as("dim"), col("vec").as("edges")))
      else None
    Loaded(docs, Npy.readLongShards(spark, s"$dir/sigs.npy"), shingles,
      Pickle.readStringMap(s"$dir/minhash_meta.pkl"), edges)
  }
}
