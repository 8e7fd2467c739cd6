package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Sketch invariants the integer gate tables can't express: estimator
  * accuracy, shard-merge equivalence, CMS over-estimate bound, Bloom
  * no-false-negatives. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val values =
    (0 until 2000).map(i => s"v${i % 700}").toDF("v").cache()

  test("HLL registers: estimate lands near the true cardinality and sharded merge equals one-shot") {
    val regs = Sketches.hllRegisters(values, "v", p = 8)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val est = Sketches.hllEstimate(regs, p = 8)
    assert(math.abs(est - 700.0) / 700.0 < 0.2, s"estimate $est") // ~6.5% expected at p=8
    // merge property: registers of two shards max-merge to the one-shot table
    val a = Sketches.hllRegisters(values.filter(length(col("v")) % 2 === 0), "v", p = 8)
    val b = Sketches.hllRegisters(values.filter(length(col("v")) % 2 === 1), "v", p = 8)
    val merged = Sketches.hllMerge(a, b)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(merged == regs)
  }

  test("estimator integer inputs fully determine the estimates (k06 contract)") {
    val m = 256
    // small corpus: MUST take the linear-counting branch
    val small = (1 to 10).map(i => s"v$i").toDF("v")
    val regsDf = Sketches.hllRegisters(small, "v", p = 8)
    val regs = regsDf.collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val in = Sketches.hllEstimatorInputs(regsDf, p = 8).head()
    assert(in.getAs[Int]("m_registers") == m)
    assert(in.getAs[Int]("nonzero_registers") == regs.size)
    assert(in.getAs[Int]("zero_registers") == m - regs.size)
    // denom_num / 2^53 reproduces hllEstimate's harmonic-mean denominator
    val denom = in.getAs[Long]("denom_num")
    val sum = (0 until m).map(r => math.pow(2.0, -regs.getOrElse(r, 0))).sum
    assert(math.abs(denom.toDouble / (1L << 53).toDouble - sum) < 1e-12)
    // the branch selector matches the branch hllEstimate actually takes
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / sum
    val takesLinear = raw <= 2.5 * m && regs.size < m
    assert(in.getAs[Int]("linear_branch") == (if (takesLinear) 1 else 0))
    assert(in.getAs[Int]("linear_branch") == 1) // 10 values << 2.5m
    // large corpus: raw branch (all registers occupied at 20k distinct)
    val big = (1 to 20000).map(i => s"w$i").toDF("v")
    val bigIn = Sketches.hllEstimatorInputs(
      Sketches.hllRegisters(big, "v", p = 8), p = 8).head()
    assert(bigIn.getAs[Int]("linear_branch") == 0)
    assert(bigIn.getAs[Int]("zero_registers") == 0)
    // KMV: size + k-th minimum are the whole estimator input
    val sk = Sketches.kmvSketch(big, "v", k = 64)
    val kin = Sketches.kmvEstimatorInputs(sk).head()
    val hs = sk.collect().map(_.getLong(0)).toSeq
    assert(kin.getAs[Int]("kmv_size") == 64)
    assert(kin.getAs[Long]("kmv_kth_min") == hs.max)
    assert(Sketches.kmvEstimate(hs) ==
      63.0 / (kin.getAs[Long]("kmv_kth_min").toDouble / (1L << 60).toDouble))
    // below-k corpus: sketch IS the value set, estimate exact
    val skSmall = Sketches.kmvSketch(small, "v", k = 64)
    val kinSmall = Sketches.kmvEstimatorInputs(skSmall).head()
    assert(kinSmall.getAs[Int]("kmv_size") == 10)
  }

  test("count-min: point query min-over-rows is >= true frequency, exact for most keys") {
    val cells = Sketches.countMinSketch(values, "v", d = 4, w = 64)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // true frequency of v0: ids 0, 700, 1400 -> 3
    val v0 = lit("v0")
    val cols = (0 until 4).map { i =>
      values.sparkSession.range(1)
        .select((Sketches.hash60Salted(v0, i) % 64).cast("int")).head().getInt(0)
    }
    val estimate = cols.zipWithIndex.map { case (c, i) => cells((i, c)) }.min
    assert(estimate >= 3L)
    // sketch total mass per row = number of values
    for (row <- 0 until 4)
      assert(cells.collect { case ((r, _), n) if r == row => n }.sum == 2000L)
    // merge property: cell-wise sum of two shard sketches = one-shot
    val sa = Sketches.countMinSketch(values.filter(length(col("v")) % 2 === 0), "v", d = 4, w = 64)
    val sb = Sketches.countMinSketch(values.filter(length(col("v")) % 2 === 1), "v", d = 4, w = 64)
    val mergedCells = Sketches.cmsMerge(sa, sb)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(mergedCells == cells)
    // a value absent from the corpus still gets a row, and an untouched
    // cell counts as 0 (left-join + coalesce contract) — expected value
    // recomputed exactly from the sketch cells
    val w2 = 4096
    val sketch = Sketches.countMinSketch(values, "v", d = 4, w = w2)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    def cellOf(s: String, i: Int): Int = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:$s".getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.take(15), 16) % w2).toInt
    }
    val probe = "definitely-not-in-corpus"
    val expect = (0 until 4).map(i => sketch.getOrElse((i, cellOf(probe, i)), 0L)).min
    val est = Sketches.cmsPointEstimates(
      Seq(probe).toDF("v"), "v",
      graft.operators.Sketches.countMinSketch(values, "v", d = 4, w = w2),
      d = 4, w = w2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est(probe) == expect)
  }

  test("KMV sketch: estimate near truth, exact below k, sharded merge equals one-shot") {
    val one = Sketches.kmvSketch(values, "v", k = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(one.length == 64 && one == one.sorted)
    val est = Sketches.kmvEstimate(one, k = 64)
    assert(math.abs(est - 700.0) / 700.0 < 0.35, s"estimate $est") // ~12.5% expected at k=64
    // below-k input: the sketch IS the distinct hash set (exact)
    val small = values.filter(col("v").isin("v1", "v2", "v3"))
    val smallSketch = Sketches.kmvSketch(small, "v", k = 64)
      .collect().map(_.getLong(0)).toSeq
    assert(smallSketch.length == 3)
    assert(Sketches.kmvEstimate(smallSketch, 64) == 3.0)
    // merge: union two shard sketches, re-take k smallest -> one-shot sketch
    val a = Sketches.kmvSketch(values.filter(length(col("v")) % 2 === 0), "v", 64)
    val b = Sketches.kmvSketch(values.filter(length(col("v")) % 2 === 1), "v", 64)
    val merged = Sketches.kmvMerge(64, a, b)
      .collect().map(_.getLong(0)).toSeq
    assert(merged == one)
  }

  test("bloom filter: no false negatives; absent keys mostly rejected") {
    val bits = Sketches.bloomBits(values, "v", k = 5, m = 1024)
      .collect().map(_.getInt(0)).toSet
    val members = (0 until 700).map(i => s"v$i")
    val absent = (0 until 700).map(i => s"absent$i")
    val probe = (members ++ absent).toDF("v")
      .select(col("v"), Sketches.bloomMightContain(bits, col("v")).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(probe(_)), "false negative")
    val fp = absent.count(probe(_))
    // 700 keys * 5 hashes in 1024 bits -> high load; still expect SOME rejection
    assert(fp < 700, s"bloom rejected nothing ($fp/700 false positives)")
  }
}
