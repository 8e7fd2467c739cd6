package graft

import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, determinism, batch shape, stub transforms. */
class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.synthesize(spark, n = 30).cache()

  test("synthesized media has the declared schema and deterministic payloads") {
    assert(media.schema == Multimodal.mediaSchema)
    val p1 = media.filter(col("media_id") === 5).head().getAs[Array[Byte]]("payload")
    val p2 = Multimodal.deterministicBytes(5L, 256)
    assert(p1.toSeq == p2.toSeq)
    assert(media.select("kind").distinct().count() == 3)
  }

  test("feature extraction is partition-batched, deterministic, fixed-dim") {
    val f = Multimodal.extractFeatures(media.repartition(4), dim = 16)
    val rows = f.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.getSeq[Float](1).length == 16))
    // deterministic regardless of partitioning
    val f2 = Multimodal.extractFeatures(media.repartition(2), dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach(r => assert(f2(r.getLong(0)) == r.getSeq[Float](1)))
    // matches the scalar stub directly
    val id0 = Multimodal.stubDecode(Multimodal.deterministicBytes(0L, 256), 16)
    assert(f2(0L) == id0.toSeq)
  }

  test("PNG payloads extract features from DECODED pixels, not container bytes") {
    // real-codec path: the feature fold's basis must be the decoded
    // row-major grayscale raster (the fixture pixel formula), never the
    // PNG container bytes — pin id 3 (w=19, h=25) against the scalar
    // stub over formula pixels
    val pngs = Multimodal.synthesizePngImages(spark, n = 9)
    val out = Multimodal.extractFeatures(pngs.repartition(3), dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    (0 until 9).foreach { i =>
      val (w, h) = Multimodal.fixtureDims(i.toLong)
      val px = Array.tabulate(h * w)(p =>
        Multimodal.fixturePixel(i.toLong, p % w, p / w).toByte)
      assert(out(i.toLong) == Multimodal.stubDecode(px, 16).toSeq, s"id $i")
      // and the container bytes would NOT produce these features
      val container = pngs.filter(col("media_id") === i).head()
        .getAs[Array[Byte]]("payload")
      assert(out(i.toLong) != Multimodal.stubDecode(container, 16).toSeq, s"id $i")
    }
    // mixed table: image rows decode, audio/video rows keep the byte stub
    val mixed = Multimodal.synthesizeMixed(spark, n = 6)
    val mout = Multimodal.extractFeatures(mixed, dim = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(mout(1L) ==
      Multimodal.stubDecode(Multimodal.deterministicBytes(1L, 256), 16).toSeq)
    val (w0, h0) = Multimodal.fixtureDims(0L)
    val px0 = Array.tabulate(h0 * w0)(p =>
      Multimodal.fixturePixel(0L, p % w0, p / w0).toByte)
    assert(mout(0L) == Multimodal.stubDecode(px0, 16).toSeq)
  }

  test("null payload yields zero vector (null handling contract)") {
    import spark.implicits._
    val withNull = spark.createDataFrame(
      java.util.List.of(
        org.apache.spark.sql.Row(99L, "image", null, null)),
      Multimodal.mediaSchema)
    val out = Multimodal.extractFeatures(withNull, dim = 8).head()
    assert(out.getSeq[Float](1) == Seq.fill(8)(0.0f))
  }

  test("resize updates image meta and truncates payload; audio untouched") {
    val resized = Multimodal.resizeImages(media, 8, 8)
    val img = resized.filter(col("kind") === "image").head()
    val meta = img.getStruct(3)
    assert(meta.getInt(1) == 8 && meta.getInt(2) == 8)
    assert(img.getAs[Array[Byte]]("payload").length == 64)
    val audioBefore = media.filter(col("kind") === "audio").head().getAs[Array[Byte]]("payload")
    val audioAfter = resized.filter(col("kind") === "audio").head().getAs[Array[Byte]]("payload")
    assert(audioBefore.toSeq == audioAfter.toSeq)
  }

  test("real PNG codec: decode -> nearest-neighbor resize -> encode round-trip") {
    val pngs = Multimodal.synthesizePngImages(spark, n = 12)
    // the payloads are REAL PNGs (magic bytes + ImageIO-decodable)
    val raw = pngs.orderBy("media_id").collect()
    assert(raw.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      p.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte)
    })
    // source decode reproduces the fixture pixel formula
    val srcStats = Multimodal.decodeImageStats(pngs)
      .orderBy("media_id").collect()
    srcStats.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = Multimodal.fixtureDims(id)
      assert(r.getInt(1) == w && r.getInt(2) == h, s"id=$id dims")
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield Multimodal.fixturePixel(id, x, y).toLong).sum
      assert(r.getLong(3) == want, s"id=$id src pixel_sum")
    }
    // resized decode matches the nearest-neighbor formula (executor-side
    // codec, partition-invariant)
    val resized = Multimodal.decodeImageStats(
      Multimodal.resizeImages(pngs.repartition(3), 7, 9))
      .orderBy("media_id").collect()
    resized.foreach { r =>
      val id = r.getLong(0)
      val (sw, sh) = Multimodal.fixtureDims(id)
      assert(r.getInt(1) == 7 && r.getInt(2) == 9, s"id=$id resized dims")
      val want = (for (y <- 0 until 9; x <- 0 until 7)
        yield Multimodal.fixturePixel(id, x * sw / 7, y * sh / 9).toLong).sum
      assert(r.getLong(3) == want, s"id=$id resized pixel_sum")
    }
  }

  test("real WAV codec: container round-trip and decoded chunk energies") {
    // payloads are REAL RIFF/WAVE containers (magic + JDK-decodable)...
    val wavs = Multimodal.synthesizeWavAudio(spark, n = 12)
    val raw = wavs.orderBy("media_id").collect()
    assert(raw.forall { r =>
      val p = r.getAs[Array[Byte]]("payload")
      p.take(4).map(_.toChar).mkString == "RIFF" &&
        p.slice(8, 12).map(_.toChar).mkString == "WAVE"
    })
    // ...whose decode recovers EXACTLY the fixture samples (the header is
    // really stripped: payload is strictly longer than the waveform)
    raw.foreach { r =>
      val id = r.getLong(0)
      val p = r.getAs[Array[Byte]]("payload")
      val samples = Multimodal.decodeWavSamples(p)
      val want = (0 until Multimodal.fixtureSampleCount(id))
        .map(j => Multimodal.fixtureSample(id, j))
      assert(samples.toSeq == want, s"id=$id")
      assert(p.length > samples.length, s"id=$id: no container overhead?")
    }
    // chunk energies equal the formula-side fold, through executors
    val got = Multimodal.audioChunkEnergy(wavs.repartition(3), chunkSamples = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val want = (0 until 12).flatMap { id =>
      (0 until Multimodal.fixtureSampleCount(id.toLong)).map(j =>
        (id.toLong, j / 32) -> Multimodal.fixtureSample(id.toLong, j).toLong)
    }.groupMapReduce(_._1)(_._2)(_ + _)
    assert(got == want)
    // non-WAV audio payloads keep the documented stub byte-sum behavior
    val stub = Multimodal.audioChunkEnergy(media, chunkSamples = 32)
      .filter(col("media_id") === 1).orderBy("chunk")
      .collect().map(_.getLong(2)).toSeq
    val bytes = Multimodal.deterministicBytes(1L, 256)
    val wantStub = bytes.grouped(32).map(_.map(b => (b & 0xff).toLong).sum).toSeq
    assert(stub == wantStub)
  }

  test("frame sampling keeps every stride-th frame window") {
    val sampled = Multimodal.sampleFrames(media, stride = 2)
    val vid = media.filter(col("kind") === "video").orderBy("media_id").head()
    val out = sampled.filter(col("kind") === "video").orderBy("media_id").head()
    val nf = vid.getStruct(3).getInt(4)
    val kept = out.getStruct(3).getInt(4)
    assert(kept == (nf + 1) / 2)
    val frameBytes = vid.getAs[Array[Byte]]("payload").length / nf
    assert(out.getAs[Array[Byte]]("payload").length == kept * frameBytes)
    // first frame window preserved byte-for-byte
    assert(out.getAs[Array[Byte]]("payload").take(frameBytes).toSeq ==
      vid.getAs[Array[Byte]]("payload").take(frameBytes).toSeq)
  }

  test("corrupt-but-signed payloads degrade to the stub path, never fail the task") {
    import org.apache.spark.sql.Row
    // valid magic bytes, truncated containers
    val badWav = "RIFF1234WAVE".getBytes("US-ASCII")
    val badGif = "GIF89a junk".getBytes("US-ASCII")
    val badPng = Array[Byte](0x89.toByte, 'P', 'I' /* corrupted */, 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      Multimodal.encodeGrayPng(Array.tabulate(4, 4)((y, x) => x + y)).take(8)
    val truncPng = Multimodal.encodeGrayPng(Array.tabulate(4, 4)((y, x) => x + y)).take(12)
    val rows = Seq(
      Row(0L, "audio", badWav, Row("audio/wav", null, null, 8000, null)),
      Row(1L, "video", badGif, Row("image/gif", 4, 4, null, 2)),
      Row(2L, "image", truncPng, Row("image/png", 4, 4, null, null)))
    import scala.jdk.CollectionConverters._
    val media = spark.createDataFrame(rows.asJava, Multimodal.mediaSchema)
    // audio: stub raw-byte waveform (12 bytes -> one chunk)
    val energies = Multimodal.audioChunkEnergy(media, chunkSamples = 32).collect()
    assert(energies.length == 1 && energies(0).getLong(2) ==
      badWav.map(b => (b & 0xff).toLong).sum)
    // video: passes through unchanged; stats emit the null-dims row
    val sampled = Multimodal.sampleGifFrames(media, stride = 2)
      .filter(col("media_id") === 1).head()
    assert(sampled.getAs[Array[Byte]]("payload").toSeq == badGif.toSeq)
    val vstats = Multimodal.decodeVideoStats(media).collect()
    assert(vstats.length == 1 && vstats(0).isNullAt(1))
    // image: resize falls back to the byte-slice stub; stats null dims
    val resized = Multimodal.resizeImages(media, w = 2, h = 2)
      .filter(col("media_id") === 2).head()
    assert(resized.getAs[Array[Byte]]("payload").length <= 4)
    val istats = Multimodal.decodeImageStats(media).collect()
    assert(istats.length == 1 && istats(0).isNullAt(1))
  }

  test("animated GIF round-trip is pixel-exact and frame sampling decodes/selects/re-encodes") {
    // codec round-trip: encode N formula frames, decode, compare exactly
    val frames = Array.tabulate(5)(f =>
      Array.tabulate(10, 9)((y, x) => Multimodal.fixtureFramePixel(3L, f, x, y)))
    val rt = Multimodal.decodeGifFrames(Multimodal.encodeGrayGif(frames))
    assert(rt.length == 5)
    for (f <- 0 until 5)
      assert(rt(f).map(_.toSeq).toSeq == frames(f).map(_.toSeq).toSeq, s"frame $f")

    // the distributed path: real container fixtures through executors
    val vids = Multimodal.synthesizeGifVideos(spark, n = 12).repartition(3)
    val sampled = Multimodal.sampleGifFrames(vids, stride = 3)
    val got = Multimodal.decodeVideoStats(sampled)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getInt(2), r.getInt(3), r.getLong(4))).toMap
    val want = (0 until 12).flatMap { i =>
      val id = i.toLong
      val (w, h) = Multimodal.fixtureVideoDims(id)
      (0 until Multimodal.fixtureFrameCount(id)).filter(_ % 3 == 0).zipWithIndex
        .map { case (srcF, outF) =>
          val s = (for (y <- 0 until h; x <- 0 until w)
            yield Multimodal.fixtureFramePixel(id, srcF, x, y).toLong).sum
          (id, outF) -> ((w, h, s))
        }
    }.toMap
    assert(got == want)
    // meta.n_frames tracks the kept count
    val nf = sampled.select(col("media_id"), col("meta.n_frames")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    for (i <- 0 until 12)
      assert(nf(i.toLong) == (Multimodal.fixtureFrameCount(i.toLong) + 2) / 3)
  }

  test("image aHash dedup groups byte-identical images across ids") {
    val media = Multimodal.synthesizePngImagesDup(spark, n = 30, family = 10)
    val out = Multimodal.imageDedup(media).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 30)
    for (i <- 0 until 30) {
      val (hash, groupMin, nSame) = out(i.toLong)
      assert(hash != null && hash.length == 64 && hash.forall(c => c == '0' || c == '1'))
      // identical pixels MUST hash identically: i, i+10, i+20 share a group
      assert(hash == out((i % 10).toLong)._1)
      assert(groupMin <= (i % 10).toLong)
      assert(nSame >= 3) // at least the three planted copies
    }
  }
}
