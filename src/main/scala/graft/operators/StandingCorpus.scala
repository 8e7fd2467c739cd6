package graft.operators

import graft.core.{Lsh, Shingling}
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Disk-resident STANDING-CORPUS dedup artifacts with partition-pruned
  * trickle probes and append-under-cap ingest — the piece that makes
  * incremental dedup (d16) and its streaming form (s14) actually
  * incremental at a 100 TB standing corpus.
  *
  * The one-shot [[Dedup.incrementalStatusIndexed]] is the right BULK
  * shape (one scan of the standing artifacts per large increment), but a
  * trickle ingest — a few hundred docs per micro-batch against a
  * 16M+ doc corpus — must not pay a corpus-sized scan per batch. Here
  * the three standing tables are laid out as hash-partitioned parquet
  * (`_pb = hash(key) mod P`, P sized so partitions stay ~fixed-row) and
  * every probe first computes the batch's own `_pb` set (a tiny Spark
  * job over the batch), then reads ONLY those partitions:
  *
  *  - `hashes/`   (_h)                   partitioned by md5-prefix mod P
  *  - `sigs/`     (doc_id, sig)          partitioned by xxhash64(doc_id) mod P
  *  - `index/`    (id, band, key64, key64b) partitioned by key64 mod P
  *
  * Per-batch I/O is therefore bounded by (batch keys) x (rows per
  * partition) — independent of the standing corpus size once P exceeds
  * the batch's key count — instead of a full scan that grows linearly
  * with the corpus (measured 6/26/104 s per increment at 1M/4M/16M for
  * the scan form). Batches larger than `trickleMaxDocs` fall back to
  * the bulk scan path, which is cheaper per-doc at that size; both paths
  * return IDENTICAL verdicts (pruning only removes rows that cannot
  * join; StandingCorpusSpec pins equality).
  *
  * Ingest is APPEND-UNDER-CAP, the production discipline SURVEY §2.2
  * names (and [[graft.api.QueryEngine.addDocuments]] applies): a new
  * doc's postings are admitted only while their bucket holds fewer than
  * `maxBucketSize` standing entries — the standing index is never
  * re-capped. With monotonically increasing doc ids (arrival order =
  * id order, the contract of every gate fixture) this is bit-identical
  * to re-resolving keep-smallest-ids over the grown corpus, because a
  * bucket's cap-smallest ids are exactly its earliest arrivals; with
  * out-of-order ids an over-cap bucket may keep arrival-order instead
  * of id-order members (the documented production trade).
  *
  * Appends land in bounded in-memory DELTAS (per-batch localCheckpoints
  * — O(batch) each, never a re-copy of the standing state); probes union
  * base + deltas; when `compactEveryBatches` deltas accumulate, they are
  * folded into a new base VERSION on disk (LSM-style major compaction,
  * amortized O(corpus / compactEveryBatches) per batch).
  *
  * Signature family: md5-hashed word k-shingles (K=3 by default), the
  * oracle-replayable family every dedup gate uses.
  *
  * Not thread-safe; call from a single ingest loop (Structured Streaming
  * serializes micro-batches per query).
  */
object StandingCorpus {

  /** Standing-table metadata persisted beside the versioned data dirs. */
  final case class Meta(version: Int, nDocs: Long, pHash: Int, pSig: Int,
                        pIdx: Int, kShingle: Int, byWord: Boolean,
                        bands: Int, numPerm: Int, maxBucketSize: Int,
                        threshold: Double) {
    def lsh: Lsh.Params = Lsh.Params(bands, numPerm, maxBucketSize)
  }

  /** Rows-per-partition targets: partitions stay small enough that a
    * trickle probe's touched-partition I/O is bounded by the BATCH's key
    * count (a 128-doc batch emits 4096 band keys; with 8192 postings per
    * partition the index probe reads ≤ 4096 x 8192 rows no matter how
    * large the standing corpus grows), and few enough that directory
    * listing stays sane (≤ MaxParts dirs per table; above MaxParts x
    * perPart rows the per-probe cost degrades gracefully back toward
    * linear). Signature partitions are row-few because sig rows are fat
    * (128 longs each). */
  private[operators] val HashRowsPerPart = 8192L
  private[operators] val SigRowsPerPart = 512L
  private[operators] val IdxRowsPerPart = 8192L
  private val MinParts = 16
  private val MaxParts = 65536

  private[operators] def partsFor(rows: Long, perPart: Long): Int = {
    var p = MinParts
    while (p < MaxParts && p.toLong * perPart < rows) p *= 2
    p
  }

  /** The partition-bucket expressions — MUST match between build and
    * probe (both sides evaluate them in Spark, never on the driver). */
  private def pbHash(h: org.apache.spark.sql.Column, p: Int) =
    pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(p.toLong)).cast("int")
  private def pbSig(id: org.apache.spark.sql.Column, p: Int) =
    pmod(xxhash64(id), lit(p.toLong)).cast("int")
  private def pbIdx(key64: org.apache.spark.sql.Column, p: Int) =
    pmod(key64, lit(p.toLong)).cast("int")

  /** Sign (id, text) rows with the md5 shingle family. */
  def sign(docs: DataFrame, meta: Meta, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as(idCol),
      minhash_signature(shingle_hashes_md5(
        Shingling.shingles(col(textCol), meta.kShingle, byWord = meta.byWord))).as("sig"))

  private def writePartitioned(df: DataFrame, pbCol: org.apache.spark.sql.Column,
                               nParts: Int, path: String): Unit = {
    // repartition ON the bucket column so every partition dir is written
    // by exactly one task -> one file per dir; task count bounded below
    // nParts so tiny-partition task overhead stays sane
    val withPb = df.withColumn("_pb", pbCol)
    val tasks = math.max(32, math.min(nParts, 2048))
    withPb.repartition(tasks, col("_pb"))
      .write.mode("overwrite").partitionBy("_pb").parquet(path)
  }

  /** Build the standing artifacts from a deduplicated corpus. `sigs` may
    * be precomputed (id, sig) — pass null to sign `docs` here. One
    * O(corpus) pass, paid once; every increment afterwards reads only
    * its own buckets. */
  def build(docs: DataFrame, sigs: DataFrame, dir: String,
            threshold: Double = 0.5, idCol: String = "doc_id",
            textCol: String = "text", kShingle: Int = 3, byWord: Boolean = true,
            lsh: Lsh.Params = Lsh.Params()): StandingCorpus = {
    val spark = docs.sparkSession
    val nDocs = docs.count()
    val meta = Meta(1, nDocs,
      partsFor(nDocs, HashRowsPerPart), partsFor(nDocs, SigRowsPerPart),
      partsFor(nDocs * lsh.bands, IdxRowsPerPart),
      kShingle, byWord, lsh.bands, lsh.numPerm, lsh.maxBucketSize, threshold)
    val s = Option(sigs).getOrElse(sign(docs, meta, idCol, textCol))
      .select(col(idCol).cast("long").as("doc_id"), col("sig"))
    val v = s"$dir/v1"
    writePartitioned(docs.select(md5(col(textCol)).as("_h")),
      pbHash(col("_h"), meta.pHash), meta.pHash, s"$v/hashes")
    writePartitioned(s, pbSig(col("doc_id"), meta.pSig), meta.pSig, s"$v/sigs")
    // sign from the WRITTEN sig table so the (expensive) signature
    // projection is not recomputed for the postings pass
    val sWritten = spark.read.parquet(s"$v/sigs").drop("_pb")
    writePartitioned(Lsh.postings(sWritten, "doc_id", "sig", lsh),
      pbIdx(col("key64"), meta.pIdx), meta.pIdx, s"$v/index")
    writeMeta(dir, meta)
    new StandingCorpus(spark, dir, meta)
  }

  /** Open standing artifacts previously written by [[build]] (or left by
    * a [[StandingCorpus.compact]]) — the serving-start path: no corpus
    * pass, just the meta read and lazy partitioned-table handles. */
  def open(spark: SparkSession, dir: String): StandingCorpus =
    new StandingCorpus(spark, dir, readMeta(dir))

  private def metaFile(dir: String) = new java.io.File(dir, "meta.json")

  private[operators] def writeMeta(dir: String, m: Meta): Unit = {
    val json =
      s"""{"version":${m.version},"nDocs":${m.nDocs},"pHash":${m.pHash},"pSig":${m.pSig},
         |"pIdx":${m.pIdx},"kShingle":${m.kShingle},"byWord":${m.byWord},
         |"bands":${m.bands},"numPerm":${m.numPerm},"maxBucketSize":${m.maxBucketSize},
         |"threshold":${m.threshold}}""".stripMargin.replace("\n", "")
    val f = metaFile(dir)
    f.getParentFile.mkdirs()
    val w = new java.io.FileWriter(f)
    try w.write(json) finally w.close()
  }

  private[operators] def readMeta(dir: String): Meta = {
    val src = scala.io.Source.fromFile(metaFile(dir))
    val json = try src.mkString finally src.close()
    def field(name: String): String = {
      val m = s""""$name":([^,}]+)""".r.findFirstMatchIn(json)
      m.getOrElse(sys.error(s"missing $name in ${metaFile(dir)}")).group(1)
    }
    Meta(field("version").toInt, field("nDocs").toLong, field("pHash").toInt,
      field("pSig").toInt, field("pIdx").toInt, field("kShingle").toInt,
      field("byWord").toBoolean, field("bands").toInt, field("numPerm").toInt,
      field("maxBucketSize").toInt, field("threshold").toDouble)
  }
}

final class StandingCorpus private (val spark: SparkSession, val dir: String,
                                    private var meta: StandingCorpus.Meta) {
  import StandingCorpus._

  /** Batches above this size classify via the bulk scan path (one
    * standing scan beats thousands of pruned partition reads there). */
  var trickleMaxDocs: Long = 4096L
  /** Fold deltas into a new on-disk base version after this many
    * absorbed batches. */
  var compactEveryBatches: Int = 64

  private def ckpt(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftbridge.CheckpointStats.strip(df.localCheckpoint(true))

  private var version = meta.version
  private def vdir = s"$dir/v$version"
  private var baseHashes = spark.read.parquet(s"$vdir/hashes")
  private var baseSigs = spark.read.parquet(s"$vdir/sigs")
  private var baseIndex = spark.read.parquet(s"$vdir/index")

  // per-batch checkpointed increments (each O(batch)); probes union them
  private val deltaHashes = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val deltaSigs = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private val deltaIndex = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
  private var deltaBatches = 0

  def currentMeta: Meta = meta
  def currentVersion: Int = version

  private def unionAll(base: DataFrame, deltas: Seq[DataFrame]): DataFrame =
    deltas.foldLeft(base)(_.unionByName(_))

  /** Standing frames for the BULK path (full, unpruned). */
  private[graft] def fullHashes: DataFrame =
    unionAll(baseHashes.select("_h"), deltaHashes.toSeq)
  private[graft] def fullSigs: DataFrame =
    unionAll(baseSigs.select("doc_id", "sig"), deltaSigs.toSeq)
  private[graft] def fullIndex: DataFrame =
    unionAll(baseIndex.select("id", "band", "key64", "key64b"), deltaIndex.toSeq)

  /** Pruned standing hash rows for a batch: read only the partitions the
    * batch's own md5 values can land in. */
  /** Collect a distinct partition-bucket set, dropping null buckets: a
    * null text hashes to a null bucket, and the matching standing rows
    * are definitionally absent (standing keys are never null), so the
    * row must fall through to 'new' exactly as the bulk path classifies
    * it — not NPE the probe. */
  private def collectPbs(df: DataFrame): Seq[Int] =
    df.distinct().collect().iterator
      .filterNot(_.isNullAt(0)).map(_.getInt(0)).toSeq

  private[graft] def prunedHashes(batchHashes: DataFrame): DataFrame = {
    val pbs = collectPbs(batchHashes.select(pbHashCol(col("_h")).as("_pb")))
    unionAll(baseHashes.filter(col("_pb").isin(pbs: _*)).select("_h"),
      deltaHashes.toSeq)
  }

  /** Pruned standing postings for a batch's band keys. */
  private[graft] def prunedIndex(batchKeys: DataFrame): DataFrame = {
    val pbs = collectPbs(batchKeys.select(pbIdxCol(col("key64")).as("_pb")))
    unionAll(baseIndex.filter(col("_pb").isin(pbs: _*))
      .select("id", "band", "key64", "key64b"), deltaIndex.toSeq)
  }

  /** Pruned standing signatures for a candidate-id frame. */
  private[graft] def prunedSigs(candIds: DataFrame): DataFrame = {
    val pbs = collectPbs(candIds.select(pbSigCol(candIds.columns.head).as("_pb")))
    unionAll(baseSigs.filter(col("_pb").isin(pbs: _*)).select("doc_id", "sig"),
      deltaSigs.toSeq)
  }

  private def pbHashCol(h: org.apache.spark.sql.Column) =
    pmod(conv(substring(h, 1, 15), 16, 10).cast("long"), lit(meta.pHash.toLong)).cast("int")
  private def pbSigCol(idColName: String) =
    pmod(xxhash64(col(idColName)), lit(meta.pSig.toLong)).cast("int")
  private def pbIdxCol(k: org.apache.spark.sql.Column) =
    pmod(k, lit(meta.pIdx.toLong)).cast("int")

  /** Classify one batch of (idCol, textCol) docs against the standing
    * corpus: 'exact' / 'near' / 'new' per id, bit-identical to
    * [[Dedup.incrementalStatusIndexed]] over the same standing state.
    * Small batches run the partition-pruned trickle path; larger ones
    * the bulk scan. Returns a MATERIALIZED (id, status) frame (safe to
    * hold across later absorbs). */
  def classify(batchDocs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val b = ckpt(batchDocs.select(col(idCol).cast("long").as(idCol),
      col(textCol).as(textCol)))
    val batchSigs = ckpt(sign(b, meta, idCol, textCol))
    ckpt(classifyPlan(b, batchSigs, idCol, textCol))
  }

  /** The classify plan (unmaterialized — spec hooks inspect its scans).
    * `b` and `batchSigs` should be materialized batch-sized frames. */
  private[graft] def classifyPlan(b: DataFrame, batchSigs: DataFrame,
                                  idCol: String, textCol: String): DataFrame = {
    val n = b.count()
    if (n > trickleMaxDocs)
      Dedup.incrementalStatusIndexed(fullHashes, fullSigs, fullIndex,
        b, batchSigs, meta.threshold, idCol, textCol, meta.lsh)
    else {
      // TRICKLE path — the same joins as incrementalStatusIndexed, each
      // against a pruned standing read. Distinct id-level verdicts (a
      // duplicate batch id must yield ONE row per input row, not a
      // multiplied join).
      val bh = b.select(col(idCol), md5(col(textCol)).as("_h"))
      val exactIds = bh.join(prunedHashes(bh.select("_h")), Seq("_h"), "left_semi")
        .select(col(idCol)).distinct()
      val batchKeys = ckpt(Lsh.postings(batchSigs, idCol, "sig", meta.lsh)
        .withColumnRenamed("id", "_bid"))
      val cand = ckpt(prunedIndex(batchKeys)
        .join(batchKeys, Seq("band", "key64", "key64b"))
        .select(col("_bid"), col("id").as("_cid")).distinct())
      val sb = batchSigs.select(col(idCol).as("_bid"), col("sig").as("_sb"))
      val sc = prunedSigs(cand.select("_cid"))
        .select(col("doc_id").as("_cid"), col("sig").as("_sc"))
      val nearIds = cand.join(sb, "_bid").join(sc, "_cid")
        .filter(est_jaccard(col("_sb"), col("_sc")) >= meta.threshold)
        .select(col("_bid").as(idCol)).distinct()
      b.select(col(idCol))
        .join(exactIds.withColumn("_e", lit(1)), Seq(idCol), "left")
        .join(nearIds.withColumn("_n", lit(1)), Seq(idCol), "left")
        .select(col(idCol),
          when(col("_e") === 1, "exact")
            .when(col("_n") === 1, "near")
            .otherwise("new").as("status"))
    }
  }

  /** Absorb a classified batch: its 'new' docs join the standing corpus
    * (hashes, signatures, and postings APPENDED UNDER THE CAP), so a
    * later batch repeating them classifies as a duplicate. `statuses` is
    * [[classify]]'s output for this batch. Per-batch cost is O(batch):
    * only the increments are checkpointed, never the standing state. */
  def absorb(batchDocs: DataFrame, statuses: DataFrame,
             idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val newIds = statuses.filter(col("status") === "new").select(col(idCol))
    val newDocs = batchDocs.select(col(idCol).cast("long").as(idCol),
        col(textCol).as(textCol))
      .join(newIds, Seq(idCol), "left_semi")
    val newSigs = ckpt(sign(newDocs, meta, idCol, textCol))
    val nNew = newSigs.count()
    if (nNew > 0) {
      deltaHashes += ckpt(newDocs.select(md5(col(textCol)).as("_h")))
      deltaSigs += ckpt(newSigs.select(col(idCol).as("doc_id"), col("sig")))
      // append-under-cap: count each touched bucket ONCE (pruned standing
      // read + deltas), admit the batch's smallest-id postings while the
      // bucket stays under maxBucketSize. postings() already keeps the
      // batch's own smallest ids, so standing-count + in-batch rank is
      // the grown bucket's occupancy for monotone ids.
      val newKeys = ckpt(Lsh.postings(newSigs, idCol, "sig", meta.lsh))
      val admitted =
        // maxBucketSize <= 0 means UNCAPPED (Lsh.capBuckets' no-op
        // contract): every new posting is admitted — the cap filter
        // below would otherwise drop them all.
        if (meta.maxBucketSize <= 0) newKeys.select("id", "band", "key64", "key64b")
        else {
          val keys = Seq("band", "key64", "key64b")
          val standCnt = prunedIndex(newKeys)
            .join(broadcast(newKeys.select(keys.map(col): _*).distinct()), keys)
            .groupBy(keys.map(col): _*).agg(count(lit(1)).as("_cnt"))
          val w = Window.partitionBy(keys.map(col): _*).orderBy(col("id"))
          newKeys
            .withColumn("_rn", row_number().over(w))
            .join(broadcast(standCnt), keys, "left")
            .filter(coalesce(col("_cnt"), lit(0L)) + col("_rn") <= meta.maxBucketSize)
            .select("id", "band", "key64", "key64b")
        }
      deltaIndex += ckpt(admitted)
      meta = meta.copy(nDocs = meta.nDocs + nNew)
    }
    deltaBatches += 1
    if (deltaBatches >= compactEveryBatches) compact()
  }

  /** [[classify]] + [[absorb]] in one call — the streaming micro-batch
    * step. Returns the materialized statuses. */
  def classifyAbsorb(batchDocs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val st = classify(batchDocs, idCol, textCol)
    absorb(batchDocs, st, idCol, textCol)
    st
  }

  /** Major compaction: fold the deltas into a NEW on-disk base version
    * (partition counts re-sized to the grown corpus), refresh the meta,
    * and drop the in-memory increments. Amortized over
    * `compactEveryBatches` absorbs. The previous version dir is removed
    * after the new one is fully written. */
  def compact(): Unit = {
    // nothing to fold: all-duplicate batches accumulate deltaBatches but
    // no deltas — an O(corpus) rewrite would change nothing, so just
    // reset the batch counter (a dup-heavy stream must not pay a full
    // three-table rewrite every compactEveryBatches batches)
    if (deltaHashes.isEmpty && deltaSigs.isEmpty && deltaIndex.isEmpty) {
      deltaBatches = 0
      return
    }
    val grown = meta.copy(
      version = version + 1,
      pHash = partsFor(meta.nDocs, HashRowsPerPart),
      pSig = partsFor(meta.nDocs, SigRowsPerPart),
      pIdx = partsFor(meta.nDocs * meta.bands, IdxRowsPerPart))
    val nv = s"$dir/v${grown.version}"
    writePartitioned(fullHashes,
      pmod(conv(substring(col("_h"), 1, 15), 16, 10).cast("long"),
        lit(grown.pHash.toLong)).cast("int"), grown.pHash, s"$nv/hashes")
    writePartitioned(fullSigs,
      pmod(xxhash64(col("doc_id")), lit(grown.pSig.toLong)).cast("int"),
      grown.pSig, s"$nv/sigs")
    writePartitioned(fullIndex,
      pmod(col("key64"), lit(grown.pIdx.toLong)).cast("int"),
      grown.pIdx, s"$nv/index")
    writeMeta(dir, grown)
    val old = vdir
    meta = grown
    version = grown.version
    baseHashes = spark.read.parquet(s"$vdir/hashes")
    baseSigs = spark.read.parquet(s"$vdir/sigs")
    baseIndex = spark.read.parquet(s"$vdir/index")
    deltaHashes.clear(); deltaSigs.clear(); deltaIndex.clear()
    deltaBatches = 0
    deleteRecursively(new java.io.File(old))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
