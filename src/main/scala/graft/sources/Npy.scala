package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.io.{BufferedOutputStream, DataOutputStream, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Reader/writer for the reference's on-disk shard format: 2-D `.npy`
  * arrays, C-order, one file per shard (`split_and_save`,
  * index_builder.py:22-36; `sigs.npy` from synth_data.py:148-157 is
  * shape (N, num_perm) uint64).
  *
  * Scale shape: the shard FILE is the reference's own parallelism unit
  * (shard_size=100000 rows ~ 100 MB), so reading via Spark's binaryFile
  * source — one row per shard, decoded on the executor that holds it —
  * preserves the distribution story; only the fixed 128-byte headers are
  * touched on the driver (to assign each shard its global row-offset
  * base). Writing reverses it: one `.npy` per partition, written
  * executor-side, with range partitioning keeping global id order across
  * the lexicographic shard filenames. */
object Npy {

  private val Magic: Array[Byte] = "\u0093NUMPY".getBytes(StandardCharsets.ISO_8859_1)

  /** A shard directory or one explicit `.npy` file. */
  private def npyGlob(path: String): String =
    if (path.endsWith(".npy")) path else s"$path/*.npy"

  private case class Header(descr: String, rows: Int, cols: Int, dataOffset: Int)

  /** Per-shard headers, read DRIVER-SIDE via FileSystem.open + a 256-byte
    * positioned read, keyed by shard filename in lexicographic order (the
    * reference's implicit id-space order). Through round 10 this pass ran
    * as a binaryFile scan + substring(content,1,256) + collect — the
    * substring pruned what reached the driver, but every executor still
    * materialized the FULL shard bytes to produce `content`: a complete
    * extra read of the dataset before the real decode pass. The shard
    * LISTING is driver-held work either way (the reference enumerates the
    * same directory), so 256 bytes x shard-count of driver I/O replaces a
    * full cluster pass — at 100 TB of shards, the difference between one
    * read and two. */
  private def headersByName(spark: SparkSession, path: String): Seq[(String, Header)] = {
    val hconf = spark.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(path)
    val fs = base.getFileSystem(hconf)
    val statuses =
      if (path.endsWith(".npy")) Seq(fs.getFileStatus(base))
      else fs.listStatus(base).toSeq
        .filter(s => s.isFile && s.getPath.getName.endsWith(".npy"))
    statuses.sortBy(_.getPath.getName).map { st =>
      val in = fs.open(st.getPath)
      try {
        val n = math.min(256L, st.getLen).toInt
        val buf = new Array[Byte](n)
        in.readFully(0L, buf, 0, n)
        st.getPath.getName -> parseHeader(buf)
      } finally in.close()
    }
  }

  /** Filename key for the executor-side base lookup: binaryFile's `path`
    * column is a URI string, the header map is keyed by shard filename. */
  private def fileName(uri: String): String = uri.substring(uri.lastIndexOf('/') + 1)

  /** Parse a v1/v2 .npy header from the first bytes of the file. */
  private def parseHeader(bytes: Array[Byte]): Header = {
    require(bytes.length > 10 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a .npy file (bad magic)")
    val major = bytes(6)
    val (headerLen, dictStart) =
      if (major == 1) {
        val bb = ByteBuffer.wrap(bytes, 8, 2).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getShort.toInt & 0xffff, 10)
      } else {
        val bb = ByteBuffer.wrap(bytes, 8, 4).order(ByteOrder.LITTLE_ENDIAN)
        (bb.getInt, 12)
      }
    val dict = new String(bytes, dictStart, headerLen, StandardCharsets.ISO_8859_1)
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(dict)
      .getOrElse(sys.error(s"no descr in npy header: $dict")).group(1)
    val fortran = "'fortran_order':\\s*(True|False)".r.findFirstMatchIn(dict)
      .map(_.group(1)).getOrElse("False")
    require(fortran == "False", "fortran_order arrays not supported (the reference writes C-order)")
    val shape = "'shape':\\s*\\((\\d+)\\s*,\\s*(\\d+)\\s*,?\\s*\\)".r.findFirstMatchIn(dict)
      .getOrElse(sys.error(s"only 2-D .npy supported (reference shards are (N, D)): $dict"))
    Header(descr, shape.group(1).toInt, shape.group(2).toInt, dictStart + headerLen)
  }

  /** Read a directory of 2-D int64/uint64 `.npy` shards as
    * (row_idx: Long, sig: Array[Long]). `row_idx` is the global row
    * index across shards in lexicographic filename order — the
    * reference's implicit id space (ids.pkl is positional). u64 values
    * land in the same Long bit pattern the engine's signature kernels
    * use (signatures are mod 2^61-1, well inside). */
  def readLongShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(npyGlob(path))
      .select("path", "content")
    // global row-offset base per shard from driver-side 256-byte header
    // reads (one positioned read per shard — never a cluster pass)
    val heads = headersByName(spark, path)
    val bases = heads.scanLeft(0L) { case (acc, (_, h)) => acc + h.rows }
    val baseOf = heads.map(_._1).zip(bases).toMap
    val baseB = spark.sparkContext.broadcast(baseOf)
    files.as[(String, Array[Byte])].flatMap { case (p, content) =>
      val h = parseHeader(content)
      require(h.descr == "<u8" || h.descr == "<i8",
        s"expected 64-bit integer shards, got ${h.descr}")
      val bb = ByteBuffer.wrap(content, h.dataOffset, h.rows * h.cols * 8)
        .order(ByteOrder.LITTLE_ENDIAN)
      val base = baseB.value(fileName(p))
      (0 until h.rows).iterator.map { r =>
        val row = new Array[Long](h.cols)
        var c = 0
        while (c < h.cols) { row(c) = bb.getLong((h.dataOffset + (r.toLong * h.cols + c) * 8).toInt); c += 1 }
        (base + r, row)
      }
    }.toDF("row_idx", "sig")
  }

  /** Read a directory of 2-D float64 `.npy` shards as
    * (row_idx: Long, vec: Array[Double]) — the dtype of the reference's
    * `hist_edges.npy` (query_service.py:54-59). Same global row-order
    * contract as [[readLongShards]]. */
  def readDoubleShards(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val files = spark.read.format("binaryFile").load(npyGlob(path))
      .select("path", "content")
    val heads = headersByName(spark, path)
    val bases = heads.scanLeft(0L) { case (acc, (_, h)) => acc + h.rows }
    val baseOf = heads.map(_._1).zip(bases).toMap
    val baseB = spark.sparkContext.broadcast(baseOf)
    files.as[(String, Array[Byte])].flatMap { case (p, content) =>
      val h = parseHeader(content)
      require(h.descr == "<f8", s"expected float64 shards, got ${h.descr}")
      val bb = ByteBuffer.wrap(content).order(ByteOrder.LITTLE_ENDIAN)
      val base = baseB.value(fileName(p))
      (0 until h.rows).iterator.map { r =>
        val row = new Array[Double](h.cols)
        var c = 0
        while (c < h.cols) { row(c) = bb.getDouble((h.dataOffset + (r.toLong * h.cols + c) * 8).toInt); c += 1 }
        (base + r, row)
      }
    }.toDF("row_idx", "vec")
  }

  /** [[saveLongShards]] for float64 vectors — writes '<f8' shards. */
  def saveDoubleShards(df: DataFrame, idCol: String, vecCol: String,
                       dir: String, shards: Int = 4): Unit = {
    new java.io.File(dir).mkdirs()
    df.select(col(idCol).cast("long"), col(vecCol))
      .repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(idCol)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.map(r => r.getSeq[Double](1).toArray).toArray
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          writeNpyFile(f"$dir/shard_$pid%05d.npy", "<f8", rows.length, rows(0).length) {
            (bb, r) => rows(r).foreach(v => bb.putDouble(v))
          }
        }
      }
  }

  /** Write one 2-D C-order v1 `.npy` file; `fillRow(bb, r)` appends row
    * r's `cols` 8-byte values to the little-endian buffer. */
  private def writeNpyFile(path: String, descr: String, rows: Int, cols: Int)
                          (fillRow: (ByteBuffer, Int) => Unit): Unit = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': ($rows, $cols), }"
    // v1 header padded with spaces to 64-byte alignment, '\n'-terminated
    val unpadded = 10 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val headerStr = dict + (" " * pad) + "\n"
    val out = new DataOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try {
      out.write(Magic)
      out.write(1); out.write(0)
      out.write(headerStr.length & 0xff)
      out.write((headerStr.length >> 8) & 0xff)
      out.write(headerStr.getBytes(StandardCharsets.ISO_8859_1))
      val bb = ByteBuffer.allocate(cols * 8).order(ByteOrder.LITTLE_ENDIAN)
      var r = 0
      while (r < rows) {
        bb.clear()
        fillRow(bb, r)
        out.write(bb.array())
        r += 1
      }
    } finally out.close()
  }

  /** Write (idCol, vecCol: Array[Long]) as `.npy` shards under `dir`:
    * range-partitioned on id into `shards` files (shard_00000.npy ...),
    * C-order '<u8', one file per partition written on its executor —
    * the engine's form of the reference's `split_and_save`. All rows of
    * one shard must share the vector width. */
  def saveLongShards(df: DataFrame, idCol: String, vecCol: String,
                     dir: String, shards: Int = 4): Unit = {
    new java.io.File(dir).mkdirs()
    df.select(col(idCol).cast("long"), col(vecCol))
      .repartitionByRange(shards, col(idCol))
      .sortWithinPartitions(idCol)
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        val rows = it.map(r => r.getSeq[Long](1).toArray).toArray
        if (rows.nonEmpty) {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          writeNpyFile(f"$dir/shard_$pid%05d.npy", "<u8", rows.length, rows(0).length) {
            (bb, r) => rows(r).foreach(v => bb.putLong(v))
          }
        }
      }
  }
}
