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
  * The IMAGE and AUDIO paths run REAL codecs: PNG payloads are decoded,
  * resampled and re-encoded with `javax.imageio`, and WAV payloads are
  * container-parsed and PCM-decoded with `javax.sound.sampled` (both in
  * the JVM — zero external dependencies), behind the same
  * partition-batched boundary. VIDEO byte-level decode remains a
  * clearly-marked deterministic STUB (`stubDecode`) — no video codec
  * ships in this environment — with the Spark-side contract (schema,
  * batching, partitioning, null handling) real and tested; swapping
  * `stubDecode` for a JNI/codec call is the only change needed for
  * production there.
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
      Seq("image", "audio", "video")(i % 3) match {
        case "image" => Row(i.toLong, "image", deterministicBytes(i.toLong, bytesPerItem),
          Row("image/png", 32 + i % 64, 32 + (i * 7) % 64, null, null))
        case "audio" => stubAudioRow(i, bytesPerItem)
        case _       => stubVideoRow(i, bytesPerItem)
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), mediaSchema)
  }

  // per-kind fixture row builders shared by synthesize/synthesizeMixed/
  // synthesizePngImages — ONE source of truth for each fixture's payload
  // and meta, so the m01 gate fixture and the spec fixtures cannot drift
  private def pngImageRow(i: Int): Row = {
    val (w, h) = fixtureDims(i.toLong)
    val px = Array.tabulate(h, w)((y, x) => fixturePixel(i.toLong, x, y))
    Row(i.toLong, "image", encodeGrayPng(px), Row("image/png", w, h, null, null))
  }
  private def stubAudioRow(i: Int, bytesPerItem: Int): Row =
    Row(i.toLong, "audio", deterministicBytes(i.toLong, bytesPerItem),
      Row("audio/wav", null, null, 8000 + 100 * (i % 5), null))
  private def stubVideoRow(i: Int, bytesPerItem: Int): Row =
    Row(i.toLong, "video", deterministicBytes(i.toLong, bytesPerItem),
      Row("video/mp4", 64, 64, null, 8 + i % 16))
  private def wavAudioRow(i: Int, sampleRate: Int = 8000): Row = {
    val samples = Array.tabulate(fixtureSampleCount(i.toLong))(j => fixtureSample(i.toLong, j))
    Row(i.toLong, "audio", encodePcmWav(samples, sampleRate),
      Row("audio/wav", null, null, sampleRate, null))
  }
  private def gifVideoRow(i: Int): Row = {
    val id = i.toLong
    val (w, h) = fixtureVideoDims(id)
    val nf = fixtureFrameCount(id)
    val frames = Array.tabulate(nf)(f =>
      Array.tabulate(h, w)((y, x) => fixtureFramePixel(id, f, x, y)))
    Row(id, "video", encodeGrayGif(frames), Row("image/gif", w, h, null, nf))
  }

  /** ALL-REAL mixed media table (kind = id mod 3, like [[synthesize]]):
    * image rows are real PNGs, audio rows real WAV containers, video
    * rows real animated GIFs — every payload decodable by its JDK codec,
    * every decoded observable reproducible from its fixture formula.
    * The production shape of a heterogeneous media column, and the m06
    * gate fixture. */
  def synthesizeRealMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      Seq("image", "audio", "video")(i % 3) match {
        case "image" => pngImageRow(i)
        case "audio" => wavAudioRow(i)
        case _       => gifVideoRow(i)
      }
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
    * One pass per partition, no shuffle; nulls yield zero vectors.
    *
    * PNG payloads are REALLY decoded (`javax.imageio`, on executors) and
    * the feature fold runs over the decoded row-major grayscale PIXELS —
    * the shape of a real extractor: codec first, features over samples,
    * never over container bytes. Payloads no JDK codec claims (and
    * corrupt PNGs) keep the documented byte-level stub fold. */
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
          val img =
            if (!isPng(payload)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          val basis = if (img != null) grayPixelBytes(img) else payload
          Row(r.getLong(0), stubDecode(basis, dim).toSeq)
        }
      }(enc)
  }

  /** Row-major band-0 samples of a decoded image as bytes — the decoded
    * basis the feature fold runs over for real image payloads. */
  private def grayPixelBytes(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val raster = img.getRaster
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0).toByte; x += 1 }
      y += 1
    }
    out
  }

  /** The 8-byte PNG signature. */
  private def isPng(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 8 &&
      payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N' &&
      payload(3) == 'G' && payload(4) == 0x0d && payload(5) == 0x0a &&
      payload(6) == 0x1a && payload(7) == 0x0a

  /** Grayscale pixel value used by the deterministic PNG fixtures AND the
    * SQL oracle: a position hash every engine can evaluate. */
  def fixturePixel(id: Long, x: Int, y: Int): Int =
    ((id * 31 + x.toLong * 7 + y.toLong * 13) % 256).toInt

  /** Fixture image dims for [[synthesizePngImages]] (small enough that
    * 100 driver-side encodes are negligible, varied enough to exercise
    * non-square resizes). */
  def fixtureDims(id: Long): (Int, Int) =
    (16 + (id % 16).toInt, 16 + ((id * 3) % 16).toInt)

  /** Encode an 8-bit grayscale image as PNG via `javax.imageio` (in the
    * JVM — no external codec dependency). */
  def encodeGrayPng(pixels: Array[Array[Int]]): Array[Byte] = {
    val h = pixels.length
    val w = if (h == 0) 0 else pixels(0).length
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pixels(y)(x)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic REAL-PNG media table: every row is an image whose
    * payload is an actual `javax.imageio`-encoded grayscale PNG with
    * pixel(x, y) = [[fixturePixel]] — a formula a SQL oracle reproduces
    * without running a codec, while the Spark side runs the real
    * decode/encode path. */
  def synthesizePngImages(spark: SparkSession, n: Int): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row]((0 until n).map(pngImageRow).asJavaList),
      mediaSchema)

  /** [[synthesizePngImages]] with PLANTED duplicate families: content is
    * keyed by `media_id % family`, so ids i, i+family, i+2·family carry
    * byte-identical images under distinct ids — the image near-dup gate
    * fixture (every re-encode of the same pixels is the same PNG because
    * the encoder is deterministic). */
  def synthesizePngImagesDup(spark: SparkSession, n: Int, family: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val cid = (i % family).toLong
      val (w, h) = fixtureDims(cid)
      val px = Array.tabulate(h, w)((y, x) => fixturePixel(cid, x, y))
      Row(i.toLong, "image", encodeGrayPng(px), Row("image/png", w, h, null, null))
    }
    spark.createDataFrame(new java.util.ArrayList[Row](rows.asJavaList), mediaSchema)
  }

  /** Perceptual average-hash over REALLY DECODED pixels — the image twin
    * of the text dedup family: the image is pooled onto an 8×8 cell grid
    * (cell of (x, y) is (x·8 div w, y·8 div h) — exact integer mapping,
    * no resampling kernel to replicate), and bit (cy·8+cx) is 1 iff the
    * cell's mean exceeds the image mean, compared by integer
    * cross-multiplication (cellSum·totalCnt > totalSum·cellCnt) so the
    * hash is EXACT integer arithmetic end-to-end and an SQL oracle can
    * re-derive it from the fixture pixel formula. Emitted as a 64-char
    * '0'/'1' string (a 64-bit value with bit 63 live would overflow a
    * signed SQL BIGINT). Non-PNG / corrupt payloads yield null. */
  def imageAHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", StringType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "image")
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img =
            if (!isPng(payload)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img == null) Row(r.getLong(0), null)
          else {
            val w = img.getWidth; val h = img.getHeight
            val raster = img.getRaster
            val cs = new Array[Long](64); val cc = new Array[Long](64)
            var y = 0
            while (y < h) {
              val cy = y * 8 / h
              var x = 0
              while (x < w) {
                val idx = cy * 8 + x * 8 / w
                cs(idx) += raster.getSample(x, y, 0); cc(idx) += 1
                x += 1
              }
              y += 1
            }
            var ts = 0L; var tc = 0L
            var i = 0
            while (i < 64) { ts += cs(i); tc += cc(i); i += 1 }
            val sb = new java.lang.StringBuilder(64)
            i = 0
            while (i < 64) {
              sb.append(if (cs(i) * tc > ts * cc(i)) '1' else '0'); i += 1
            }
            Row(r.getLong(0), sb.toString)
          }
        }
      }(enc)
  }

  /** Image dedup by perceptual hash: [[imageAHash]] + one hash agg —
    * (media_id, ahash, group_min, n_same); byte-identical images MUST
    * share a group (hash of identical pixels is identical), near-dups
    * collide when their pooled means agree. Same scale shape as d01:
    * decode is partition-batched, grouping is one map-side-combined agg
    * on the 64-bit-equivalent key — no pairwise comparisons.
    *
    * Undecodable images (non-PNG / corrupt payloads, where
    * [[imageAHash]] yields a null hash) are NOT dropped: they surface
    * with null ahash/group_min/n_same (left join — a null key never
    * equi-matches), so a bad payload is an explicit null verdict row
    * rather than a silent row-count shrink. */
  def imageDedup(media: DataFrame): DataFrame = {
    val hashed = imageAHash(media)
    val groups = hashed.filter(col("ahash").isNotNull).groupBy("ahash")
      .agg(min(col("media_id")).as("group_min"),
        count(lit(1)).as("n_same"))
    hashed.join(groups, Seq("ahash"), "left")
      .select(col("media_id"), col("ahash"), col("group_min"), col("n_same"))
  }

  /** Mixed-kind media table matching [[synthesize]]'s id→kind layout
    * (kind = id mod 3), but image rows carry REAL `javax.imageio`-encoded
    * PNGs with the [[fixturePixel]] formula pixels at [[fixtureDims]] —
    * so a pipeline over it exercises the real image codec path AND the
    * byte-stub path for the codec-less kinds in one table (the m01 gate
    * fixture). Audio/video rows keep the xorshift payloads. */
  def synthesizeMixed(spark: SparkSession, n: Int, bytesPerItem: Int = 256): DataFrame = {
    val rows = (0 until n).map { i =>
      Seq("image", "audio", "video")(i % 3) match {
        case "image" => pngImageRow(i)
        case "audio" => stubAudioRow(i, bytesPerItem)
        case _       => stubVideoRow(i, bytesPerItem)
      }
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), mediaSchema)
  }

  /** Image resize at the codec boundary: PNG payloads are REALLY decoded
    * (`javax.imageio`), nearest-neighbor resampled to (w, h) — target
    * pixel (x, y) reads source pixel (x*srcW/w, y*srcH/h), integer floor —
    * and re-encoded as 8-bit grayscale PNG (non-gray sources read raster
    * band 0). Non-PNG image payloads keep the documented stub behavior
    * (bytes re-sliced to the w*h budget — the pre-codec contract, still
    * exercised for payloads no codec claims); non-images pass through
    * unchanged. Runs in the same partition-batched `mapPartitions` shape
    * as [[extractFeatures]] — one iterator pass, no shuffle, codec calls
    * never on the driver. */
  def resizeImages(media: DataFrame, w: Int, h: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(media.schema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val kind = if (r.isNullAt(kindIdx)) null else r.getString(kindIdx)
        if (kind != "image") r
        else {
          val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
          val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
          // corrupt-but-PNG-signed payloads fall through to the stub
          // byte-slice contract instead of failing the task (decode
          // returns null or throws on truncated containers)
          val img0 =
            if (!isPng(payload)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          val newPayload =
            if (img0 != null) {
              val img = img0
              val srcW = img.getWidth; val srcH = img.getHeight
              val srcRaster = img.getRaster
              val px = Array.tabulate(h, w)((y, x) =>
                srcRaster.getSample(x * srcW / w, y * srcH / h, 0))
              encodeGrayPng(px)
            } else if (payload != null) {
              // stub fallback: first min(w*h, len) bytes
              payload.take(math.min(w.toLong * h, payload.length.toLong).toInt)
            } else null
          val newMeta =
            if (meta == null) null
            else Row(meta.get(0), w, h, meta.get(3), meta.get(4))
          val vals = r.toSeq.toArray
          vals(payloadIdx) = newPayload
          vals(metaIdx) = newMeta
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Decoded-image observables for the gate side of the real-codec path:
    * (media_id, width, height, pixel_sum) from actually decoding each PNG
    * payload — the oracle recomputes the same sums from the fixture pixel
    * formula, so a codec/resample bug breaks the hash. Non-PNG payloads
    * yield null dims (no codec claims them). Same partition-batched
    * shape; decode runs on executors. */
  def decodeImageStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "image")
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val img0 =
            if (!isPng(payload)) null
            else try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case _: Exception => null }
          if (img0 == null) Row(r.getLong(0), null, null, null)
          else {
            val img = img0
            val raster = img.getRaster
            var s = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { s += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            Row(r.getLong(0), img.getWidth, img.getHeight, s)
          }
        }
      }(enc)
  }

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

  /** The 12-byte RIFF/WAVE container signature (the audio twin of
    * [[isPng]]). */
  private def isWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' &&
      payload(8) == 'W' && payload(9) == 'A' && payload(10) == 'V' &&
      payload(11) == 'E'

  /** Encode 8-bit unsigned PCM mono samples into a REAL WAV container
    * via the JDK's `javax.sound.sampled` (RIFF header + fmt + data
    * chunks — no external codec dependency). */
  def encodePcmWav(samples: Array[Int], sampleRate: Int = 8000): Array[Byte] = {
    import javax.sound.sampled._
    val bytes = new Array[Byte](samples.length)
    var i = 0
    while (i < samples.length) { bytes(i) = (samples(i) & 0xff).toByte; i += 1 }
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED,
      sampleRate.toFloat, 8, 1, 1, sampleRate.toFloat, false)
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  /** REAL audio decode: parse the WAV container with the JDK codec
    * (header walk, fmt chunk, data chunk extraction all inside
    * `AudioSystem`) and return the waveform as unsigned 8-bit PCM
    * sample values. */
  def decodeWavSamples(payload: Array[Byte]): Array[Int] = {
    val ais = javax.sound.sampled.AudioSystem
      .getAudioInputStream(new java.io.ByteArrayInputStream(payload))
    try {
      val data = ais.readAllBytes()
      val out = new Array[Int](data.length)
      var i = 0
      while (i < data.length) { out(i) = data(i) & 0xff; i += 1 }
      out
    } finally ais.close()
  }

  /** Sample value of the deterministic WAV fixtures AND the SQL oracle —
    * a position formula every engine can evaluate (the audio analog of
    * [[fixturePixel]]). */
  def fixtureSample(id: Long, i: Int): Int =
    ((id * 17 + i.toLong * 11) % 256).toInt

  /** Waveform length for [[synthesizeWavAudio]] — varied so chunk counts
    * differ per row, bounded so 100 driver-side encodes are negligible. */
  def fixtureSampleCount(id: Long): Int = 160 + (id % 32).toInt * 8

  /** Deterministic REAL-WAV media table: every row is an audio item whose
    * payload is an actual `javax.sound.sampled`-encoded 8-bit PCM mono
    * WAV with sample(i) = [[fixtureSample]] — a formula a SQL oracle
    * reproduces without running a codec, while the Spark side runs the
    * real container parse + decode (the audio twin of
    * [[synthesizePngImages]]). */
  def synthesizeWavAudio(spark: SparkSession, n: Int, sampleRate: Int = 8000): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row]((0 until n).map(wavAudioRow(_, sampleRate)).asJavaList),
      mediaSchema)

  /** Audio analysis at the codec boundary: per fixed-size chunk of the
    * decoded waveform, the integer chunk energy — sum of unsigned sample
    * values. WAV payloads are REALLY decoded (`javax.sound.sampled`
    * parses the container and extracts the PCM data chunk); non-WAV
    * audio payloads keep the documented stub behavior (raw payload bytes
    * as the waveform — the pre-codec contract, still exercised for
    * payloads no codec claims). Non-audio rows are filtered out BEFORE
    * decode (predicate pushdown reaches the scan, the codec never runs
    * on images/videos). Output (media_id, chunk, energy) — one row per
    * chunk of `chunkSamples` samples, exploded inside the partition
    * pass, no shuffle. */
  def audioChunkEnergy(media: DataFrame, chunkSamples: Int = 32): DataFrame = {
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
          val samples: Array[Int] =
            // a TRUNCATED/corrupt container that still carries the RIFF
            // magic must degrade to the stub path, not fail the task 4x
            // and kill a 100 TB job on one bad row
            (if (isWav(payload))
              try Some(decodeWavSamples(payload)) catch { case _: Exception => None }
            else None).getOrElse {
              // stub fallback: raw bytes as the waveform
              val out = new Array[Int](payload.length)
              var i = 0
              while (i < payload.length) { out(i) = payload(i) & 0xff; i += 1 }
              out
            }
          samples.grouped(chunkSamples).zipWithIndex.map { case (cs, i) =>
            var s = 0L
            var j = 0
            while (j < cs.length) { s += cs(j); j += 1 }
            Row(id, i, s)
          }
        }
      }(enc)
  }

  /** The 4-byte GIF signature ("GIF8...") — the video-container twin of
    * [[isPng]]/[[isWav]] (animated GIF is the one multi-frame container
    * the JDK can both read and write without external codecs). */
  private def isGif(payload: Array[Byte]): Boolean =
    payload != null && payload.length >= 4 &&
      payload(0) == 'G' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == '8'

  /** Identity 256-gray palette: GIF stores pixels as palette indices, so
    * encoding TYPE_BYTE_INDEXED frames under this palette makes the
    * pixel-value round-trip exact (index i <-> gray i). */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Encode 8-bit grayscale frames as a REAL animated GIF via
    * `javax.imageio`'s sequence writer (one global 256-gray palette,
    * lossless — no external codec dependency). */
  def encodeGrayGif(frames: Array[Array[Array[Int]]]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach { px =>
        val h = px.length
        val w = if (h == 0) 0 else px(0).length
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
        val raster = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { raster.setSample(x, y, 0, px(y)(x)); x += 1 }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    baos.toByteArray
  }

  /** REAL video decode: parse the GIF container and return every frame's
    * gray pixel matrix (via getRGB — palette-indexed frames resolve
    * through their color model, so the values are codec-derived, not raw
    * buffer reads). */
  def decodeGifFrames(payload: Array[Byte]): Array[Array[Array[Int]]] = {
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    try {
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      Array.tabulate(n) { f =>
        val img = reader.read(f)
        Array.tabulate(img.getHeight, img.getWidth)((y, x) => img.getRGB(x, y) & 0xff)
      }
    } finally {
      reader.dispose()
      iis.close()
    }
  }

  /** Frame pixel of the deterministic GIF fixtures AND the SQL oracle —
    * the video analog of [[fixturePixel]]/[[fixtureSample]]. */
  def fixtureFramePixel(id: Long, f: Int, x: Int, y: Int): Int =
    ((id * 31 + f.toLong * 19 + x.toLong * 7 + y.toLong * 13) % 256).toInt

  /** Fixture video geometry: small varied dims and 4-9 frames so stride
    * sampling produces different kept counts per row. */
  def fixtureVideoDims(id: Long): (Int, Int) = (8 + (id % 8).toInt, 8 + ((id * 3) % 8).toInt)
  def fixtureFrameCount(id: Long): Int = 4 + (id % 6).toInt

  /** Deterministic REAL-GIF media table: every row is a video whose
    * payload is an actual `javax.imageio`-encoded animated GIF with
    * pixel(f, x, y) = [[fixtureFramePixel]] — a formula a SQL oracle
    * reproduces without running a codec, while the Spark side runs the
    * real multi-frame container parse (the video twin of
    * [[synthesizePngImages]]/[[synthesizeWavAudio]]). */
  def synthesizeGifVideos(spark: SparkSession, n: Int): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList[Row]((0 until n).map(gifVideoRow).asJavaList),
      mediaSchema)

  /** Frame sampling at the codec boundary — the REAL-codec twin of
    * [[sampleFrames]]: GIF video payloads are decoded (`javax.imageio`
    * multi-frame read), every `stride`-th frame kept, and the kept frames
    * re-encoded as an animated GIF; meta.n_frames updated. Non-GIF video
    * payloads keep the stub byte-window behavior inline (the pre-codec
    * contract for containers no codec claims); non-videos pass through.
    * Same partition-batched `mapPartitions` shape as [[resizeImages]] —
    * codec calls never on the driver, no shuffle. */
  def sampleGifFrames(media: DataFrame, stride: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(media.schema)
    val kindIdx = media.schema.fieldIndex("kind")
    val payloadIdx = media.schema.fieldIndex("payload")
    val metaIdx = media.schema.fieldIndex("meta")
    media.mapPartitions { rows =>
      rows.map { r =>
        val kind = if (r.isNullAt(kindIdx)) null else r.getString(kindIdx)
        val payload = if (r.isNullAt(payloadIdx)) null else r.getAs[Array[Byte]](payloadIdx)
        // corrupt-but-GIF8-signed payloads pass through unchanged (the
        // non-GIF contract) instead of failing the task — one bad row
        // must not kill the job
        val decoded =
          if (kind != "video" || !isGif(payload)) None
          else try Some(decodeGifFrames(payload)) catch { case _: Exception => None }
        if (decoded.isEmpty) r
        else {
          val frames = decoded.get
          val kept = frames.indices.collect { case f if f % stride == 0 => frames(f) }.toArray
          val meta = if (r.isNullAt(metaIdx)) null else r.getStruct(metaIdx)
          val newMeta =
            if (meta == null) null
            else Row(meta.get(0), meta.get(1), meta.get(2), meta.get(3), kept.length)
          val vals = r.toSeq.toArray
          vals(payloadIdx) = encodeGrayGif(kept)
          vals(metaIdx) = newMeta
          Row.fromSeq(vals.toIndexedSeq)
        }
      }
    }(enc)
  }

  /** Decoded-video observables for the gate side of the real-codec path:
    * (media_id, frame, width, height, pixel_sum) from actually decoding
    * every GIF frame — the oracle recomputes the sums from the fixture
    * formula, so a container/frame-selection/palette bug breaks the hash
    * (the video twin of [[decodeImageStats]]). Non-GIF payloads yield one
    * null-dims row. */
  def decodeVideoStats(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("pixel_sum", LongType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.filter(col("kind") === "video")
      .select("media_id", "payload")
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          val decoded =
            if (!isGif(payload)) None
            else try Some(decodeGifFrames(payload)) catch { case _: Exception => None }
          if (decoded.isEmpty) Iterator.single(Row(id, null, null, null, null))
          else decoded.get.iterator.zipWithIndex.map { case (px, f) =>
            val h = px.length
            val w = if (h == 0) 0 else px(0).length
            var s = 0L
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) { s += px(y)(x); x += 1 }
              y += 1
            }
            Row(id, f, w, h, s)
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
