package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

/** Multimodal columns for a training-data pipeline: image/audio/video
  * payloads travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as partition-batched
  * transforms (the Scala analog of `mapInPandas`: one iterator pass per
  * partition, schema declared up front).
  *
  * No media codecs exist in this environment, so the byte-level decode is
  * a clearly-marked deterministic STUB (`stubDecode`) — the Spark-side
  * contract (schema, batching, partitioning, null handling) is real and
  * tested; swapping `stubDecode` for a JNI/codec call is the only change
  * needed for production.
  */
object Multimodal {

  /** Typed metadata carried next to every payload. */
  val metaType: StructType = StructType(Seq(
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),       // image | audio | video
    StructField("payload", BinaryType),
    StructField("meta", metaType)))

  /** Deterministic synthetic media table derived from ids — payload bytes
    * are a seeded xorshift stream, so every test re-derives identical
    * fixtures without codecs or external files. */
  def synthesize(spark: SparkSession, n: Int, bytesPerItem: Int = 256): DataFrame = {
    val rows = (0 until n).map { i =>
      val kind = Seq("image", "audio", "video")(i % 3)
      val payload = deterministicBytes(i.toLong, bytesPerItem)
      val meta = kind match {
        case "image" => Row("image/png", 32 + i % 64, 32 + (i * 7) % 64, null, null)
        case "audio" => Row("audio/wav", null, null, 8000 + 100 * (i % 5), null)
        case _       => Row("video/mp4", 64, 64, null, 8 + i % 16)
      }
      Row(i.toLong, kind, payload, meta)
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), mediaSchema)
  }

  private implicit class SeqOps[T](s: Seq[T]) {
    def asJavaList: java.util.List[T] = {
      val l = new java.util.ArrayList[T](s.size)
      s.foreach(l.add)
      l
    }
  }

  /** Seeded xorshift64* byte stream (public-domain PRNG construction). */
  def deterministicBytes(seed: Long, n: Int): Array[Byte] = {
    val out = new Array[Byte](n)
    var x = seed * 2685821657736338717L + 1442695040888963407L
    var i = 0
    while (i < n) {
      x ^= x >>> 12; x ^= x << 25; x ^= x >>> 27
      out(i) = (x * 2685821657736338717L >>> 56).toByte
      i += 1
    }
    out
  }

  /** STUB decode: a real implementation would run an image/audio codec
    * here. This deterministic stand-in hashes fixed-stride byte windows
    * into a `dim`-float feature vector — byte-level plumbing (offsets,
    * batch loop, output shape) shaped like a real extractor. */
  def stubDecode(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    if (payload == null || payload.isEmpty) return out
    var d = 0
    while (d < dim) {
      var acc = 1469598103934665603L // FNV offset basis
      var i = d
      while (i < payload.length) {
        acc = (acc ^ (payload(i) & 0xffL)) * 1099511628211L // FNV prime
        i += dim
      }
      // map to [-1, 1) deterministically
      out(d) = ((acc >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0).toFloat
      d += 1
    }
    out
  }

  /** Partition-batched feature extraction: (media_id, features float[dim]).
    * One pass per partition, no shuffle; nulls yield zero vectors. */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(r.getLong(0), stubDecode(payload, dim).toSeq)
        }
      }(enc)
  }

  /** Resize stub for images: updates meta dims, re-derives payload bytes
    * proportionally (slice). Non-images pass through unchanged. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame =
    media.withColumn("meta",
      when(col("kind") === "image",
        struct(col("meta.mime"), lit(w).as("width"), lit(h).as("height"),
          col("meta.sample_rate"), col("meta.n_frames")))
        .otherwise(col("meta")))
      .withColumn("payload",
        when(col("kind") === "image",
          expr(s"substring(payload, 1, int(least(cast($w as bigint) * $h, length(payload))))"))
          .otherwise(col("payload")))

  /** Partition-batched payload summary — (media_id, kind, n_frames,
    * payload_len, payload_sum): the byte-exact observable a transform gate
    * pins (unsigned byte sum is order-insensitive integer arithmetic, so
    * an SQL oracle reproduces it without re-deriving byte ORDER). Same
    * iterator-per-partition shape as [[extractFeatures]]. */
  def payloadStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType),
      StructField("n_frames", IntegerType),
      StructField("payload_len", IntegerType, nullable = false),
      StructField("payload_sum", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("kind"), col("meta.n_frames").as("n_frames"),
        col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload =
            if (r.isNullAt(3)) Array.empty[Byte] else r.getAs[Array[Byte]](3)
          var s = 0L
          var i = 0
          while (i < payload.length) { s += payload(i) & 0xff; i += 1 }
          Row(r.getLong(0), r.getString(1),
            if (r.isNullAt(2)) null else r.getInt(2), payload.length, s)
        }
      }(enc)
  }

  /** Audio analysis at the codec boundary: per fixed-size chunk of the
    * (stub-decoded) waveform bytes, the integer chunk energy — sum of
    * unsigned byte values. A real PCM decoder slots into the same
    * partition-batched iterator; non-audio rows are filtered out BEFORE
    * decode (predicate pushdown reaches the scan, the codec never runs
    * on images/videos). Output (media_id, chunk, energy) — one row per
    * chunk, exploded inside the partition pass, no shuffle. */
  def audioChunkEnergy(media: DataFrame, chunkBytes: Int = 32): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("chunk", IntegerType, nullable = false),
      StructField("energy", LongType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload =
            if (r.isNullAt(1)) Array.empty[Byte] else r.getAs[Array[Byte]](1)
          payload.grouped(chunkBytes).zipWithIndex.map { case (cs, i) =>
            var s = 0L
            var j = 0
            while (j < cs.length) { s += cs(j) & 0xff; j += 1 }
            Row(id, i, s)
          }
        }
      }(enc)
  }

  /** Frame sampling stub for videos: keep every `stride`-th frame's byte
    * window (payload length / n_frames bytes per frame) by concatenating
    * the kept windows; n_frames updated accordingly. Non-videos pass
    * through unchanged. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val frames = col("meta.n_frames")
    val frameBytes = (length(col("payload")) / frames).cast("int")
    val keptIdx = sequence(lit(0), frames - 1, lit(stride))
    val kept = aggregate(
      keptIdx,
      lit(Array.empty[Byte]),
      (acc, f) => concat(acc,
        call_function("substring", col("payload"),
          (f * frameBytes + 1).cast("int"), frameBytes)))
    val isVideo = col("kind") === "video" && frames.isNotNull && frames > 0
    // payload first: its expressions read the ORIGINAL meta.n_frames
    media
      .withColumn("payload", when(isVideo, kept).otherwise(col("payload")))
      .withColumn("meta",
        when(isVideo,
          struct(col("meta.mime"), col("meta.width"), col("meta.height"),
            col("meta.sample_rate"), size(keptIdx).as("n_frames")))
          .otherwise(col("meta")))
  }
}
