package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Probabilistic sketches — the canonical 100 TB summarization primitives
  * (cardinality without a distinct, heavy hitters without a full
  * group-by, membership prefilters for join pruning). Unlike the usual
  * RNG-seeded implementations, every hash here is the engine's stable
  * md5 family, so the SKETCH CONTENT itself is deterministic and
  * cross-engine checkable: the driver gates pin the registers / cells /
  * bit sets as integer tables, not just the final estimates (estimates
  * involve float transcendentals whose libm rounding differs between
  * runtimes — see TextAnalysis.tfidf for the same policy).
  *
  * Scale shape: each sketch is one projection + one hash aggregation
  * whose KEY SPACE IS THE SKETCH SIZE (256 registers / d*w cells /
  * m bits), so map-side partial aggregation compresses every partition's
  * contribution to the sketch size before the shuffle — the shuffle
  * volume is O(partitions x sketch), independent of the 100 TB input.
  * Sketches from disjoint shards union by the same aggregation (max /
  * sum / bit-or), which is exactly how they merge across a cluster.
  */
object Sketches {

  /** Stable 60-bit hash of a string column: first 15 md5 hex digits as an
    * unsigned integer. 60 bits keeps the value exact in a signed Long AND
    * in the SQL twin (('0x' || substr(md5(x), 1, 15))::UBIGINT). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("decimal(38,0)").cast("long")

  /** Salted variant for the i-th hash function of a multi-hash sketch:
    * md5(i || ':' || x) — independent-enough salts from one stable
    * family, reproducible in SQL verbatim. */
  def hash60Salted(c: Column, i: Int): Column =
    hash60(concat(lit(i.toString), lit(":"), c))

  /** HyperLogLog register table over a string column: 2^p registers,
    * (register, max_rho). Register = hash % 2^p; the remaining 60-p bits
    * are the rho stream: rho = (trailing zeros of w) + 1, computed with
    * pure integer ops — bit_count((w & -w) - 1) + 1 — so both engines
    * agree bit-for-bit (no log2, whose libm rounding is not portable).
    * w = 0 (all 60-p bits zero) caps at rho = 60-p+1, the standard
    * saturation. The registers ARE the sketch: shards merge by max, and
    * any estimator (raw harmonic mean, bias-corrected HLL++) reads them
    * driver-side — see [[hllEstimate]]. */
  def hllRegisters(df: DataFrame, valueCol: String, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val h = hash60(col(valueCol))
    // integer ops only: % / shiftright (Column./ is double division, and
    // a 60-bit value is not exactly representable in a double)
    df.select((h % m).cast("int").as("register"), shiftright(h, p).as("w"))
      .select(col("register"),
        when(col("w") === 0, lit(maxRho))
          .otherwise(bit_count(expr("(w & -w) - 1")) + 1).cast("int").as("rho"))
      .groupBy("register").agg(max(col("rho")).as("max_rho"))
  }

  /** Driver-side raw-HLL cardinality estimate from a collected register
    * table (m fixed-size rows): alpha_m * m^2 / sum(2^-reg), with the
    * deterministic small-range linear-counting correction. Not a gated
    * value (float transcendentals) — the gate pins [[hllRegisters]]. */
  def hllEstimate(registers: Map[Int, Int], p: Int = 8): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    // sort for a deterministic summation order
    val sum = (0 until m).map(r => math.pow(2.0, -registers.getOrElse(r, 0))).sum
    val raw = alpha * m * m / sum
    val zeros = m - registers.count { case (_, v) => v > 0 }
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else raw
  }

  /** The HLL estimator's INTEGER inputs as a one-row gated table
    * (round 9 — estimator correctness without libm in the oracle): the
    * raw estimate is alpha_m * m^2 / (denom_num / 2^maxRho), where
    * denom_num = sum over ALL m registers of 2^(maxRho - rho) (empty
    * registers contribute 2^maxRho) is an EXACT integer — it and the
    * zero-register count fully determine [[hllEstimate]] up to one
    * final float expression. `linear_branch` pins which estimator branch
    * fires, computed with +,-,*,/ on IEEE doubles in a fixed tree (the
    * one float allowance of the oracle policy). maxRho = 53 at p = 8,
    * so denom_num <= m * 2^53 = 2^61 — exact in a signed BIGINT. */
  def hllEstimatorInputs(registers: DataFrame, p: Int = 8): DataFrame = {
    val m = 1 << p
    val maxRho = 60 - p + 1
    val mD = m.toDouble
    val pow2MaxRho = 1L << maxRho
    val agg = registers.agg(
      count(lit(1)).cast("int").as("nonzero_registers"),
      sum(expr(s"shiftleft(cast(1 as bigint), $maxRho - max_rho)")).as("occ_num"))
    val zeros = (lit(m) - col("nonzero_registers")).cast("int")
    val denom = (col("occ_num") +
      (lit(m).cast("long") - col("nonzero_registers")) * lit(pow2MaxRho)).cast("long")
    // the branch comparison: alpha, raw in the SAME expression tree the
    // SQL twin writes — division-only float math, bit-identical IEEE
    val alpha = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(mD))
    val raw = alpha * lit(mD) * lit(mD) / (denom.cast("double") / lit(pow2MaxRho.toDouble))
    agg.select(
      lit(m).as("m_registers"),
      col("nonzero_registers"),
      zeros.as("zero_registers"),
      denom.as("denom_num"),
      when(raw <= lit(2.5) * lit(mD) && zeros > 0, 1).otherwise(0)
        .cast("int").as("linear_branch"))
  }

  /** The KMV estimator's integer inputs: sketch size and the k-th
    * smallest hash (= max over the k-row sketch) — [[kmvEstimate]] is a
    * pure function of these two values. */
  def kmvEstimatorInputs(sketch: DataFrame): DataFrame =
    sketch.agg(count(lit(1)).cast("int").as("kmv_size"),
      max(col("h")).as("kmv_kth_min"))

  /** Count-min sketch over a string column: `d` salted hash rows x `w`
    * columns, cell = count of values hashing there. Output (row, cell,
    * cnt) — only touched cells (absent = 0). Point estimate of a value's
    * frequency = min over its d cells (always an over-estimate). */
  def countMinSketch(df: DataFrame, valueCol: String, d: Int = 4, w: Int = 64): DataFrame =
    df.select((0 until d).map(i =>
        (hash60Salted(col(valueCol), i) % w).cast("int").as(s"c$i")): _*)
      .select(posexplode(array((0 until d).map(i => col(s"c$i")): _*))
        .as(Seq("row", "cell")))
      .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))

  /** Count-min point estimates for a set of values against a built
    * sketch: est(v) = min over the d rows of v's cell counts — always
    * >= the true frequency. The sketch side is broadcast-sized (d*w
    * rows), so estimating any number of candidate values is a
    * broadcast join + one min-agg, never a second corpus pass. */
  def cmsPointEstimates(values: DataFrame, valueCol: String, cells: DataFrame,
                        d: Int = 4, w: Int = 64): DataFrame =
    values.select(col(valueCol)).distinct()
      .select(col(valueCol), posexplode(array((0 until d).map(i =>
        (hash60Salted(col(valueCol), i) % w).cast("int")): _*))
        .as(Seq("row", "cell")))
      // LEFT join + coalesce-0: a cell absent from the sparse table means
      // NO value hashed there — the estimate must clamp to 0, and a value
      // entirely absent from the corpus must still get a row (est 0),
      // not silently vanish through an inner join
      .join(broadcast(cells), Seq("row", "cell"), "left")
      .select(col(valueCol), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .groupBy(valueCol).agg(min("cnt").as("cms_est"))

  /** Bloom filter bit set over a string column: `k` salted hashes into
    * `m` bits; output the distinct set bit positions (bit,). The m-bit
    * vector these rows define is the filter; shards merge by union
    * (bit-or). Join pruning at 100 TB: broadcast the bit set of the
    * small side's keys, prefilter the big scan with
    * [[bloomMightContain]] before the shuffle. */
  def bloomBits(df: DataFrame, valueCol: String, k: Int = 5, m: Int = 1024): DataFrame =
    df.select(explode(array((0 until k).map(i =>
        (hash60Salted(col(valueCol), i) % m).cast("int")): _*)).as("bit"))
      .distinct()

  /** KMV (k-minimum-values) distinct-count sketch: the k smallest
    * distinct 60-bit hashes of the column. Plans as hash-distinct +
    * TakeOrderedAndProject (per-partition partial top-k, driver merge of
    * k rows — never a global sort). Shards merge by unioning sketches
    * and re-taking the k smallest; the estimator reads the k-th value
    * ([[kmvEstimate]]). Unlike HLL it also supports set operations
    * (intersection estimates via the Jaccard of sketch sets). */
  def kmvSketch(df: DataFrame, valueCol: String, k: Int = 64): DataFrame =
    df.select(hash60(col(valueCol)).as("h")).distinct()
      .orderBy("h").limit(k)

  /** HLL shard merge: register-wise max. Equals the registers one pass
    * over the concatenated shards builds (max distributes over union). */
  def hllMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("register").agg(max(col("max_rho")).as("max_rho"))

  /** Count-min shard merge: cell-wise sum (counts are additive). */
  def cmsMerge(sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _)
      .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))

  /** KMV shard merge — THE property that makes the sketch distributed:
    * union the shards' minima sets, dedup, keep the k smallest. Exactly
    * equals the sketch a single pass over the concatenated shards would
    * build (min-k distributes over union), so per-partition / per-day /
    * per-shard sketches roll up without ever re-reading the data. */
  def kmvMerge(k: Int, sketches: DataFrame*): DataFrame =
    sketches.reduce(_ unionByName _).distinct().orderBy("h").limit(k)

  /** Driver-side KMV estimate: (k-1) / fraction-of-hash-space covered by
    * the k-th smallest value. Exact count when fewer than k distinct
    * values exist (the sketch IS the value set then). */
  def kmvEstimate(hashes: Seq[Long], k: Int = 64): Double =
    if (hashes.length < k) hashes.length.toDouble
    else (k - 1).toDouble / (hashes.max.toDouble / (1L << 60).toDouble)

  /** Membership predicate against a driver-collected bit set (the
    * broadcast-prefilter side of [[bloomBits]]): true iff ALL k bit
    * positions of the value are set. No false negatives by
    * construction; false-positive rate ~ (set_bits/m)^k. */
  def bloomMightContain(bits: Set[Int], valueCol: Column, k: Int = 5, m: Int = 1024): Column =
    (0 until k).map { i =>
      (hash60Salted(valueCol, i) % m).cast("int").isInCollection(bits)
    }.reduce(_ && _)
}
