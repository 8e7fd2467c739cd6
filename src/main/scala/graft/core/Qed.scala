package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Quantization / Edge Determination (QED) — per-dimension equi-width
  * histograms, query-dependent bin windows, the conjunctive bin-window
  * predicate, and the quantization (negative-L2) score
  * (reference: app/src/qed.py — O13-O16 in SURVEY §2).
  *
  * Faithful to the reference's semantics (equi-width bins between the
  * per-dimension min and max, last bin right-inclusive like np.histogram),
  * implemented as one explode + two hash aggregations. The (D, n_bins+1)
  * edge matrix is tiny (e.g. 64×257 doubles) and is collected / broadcast
  * exactly like the reference ships `edges` to workers
  * (query_service.py:54-59) — at 100 TB the explode-aggregate is the only
  * data-sized stage and it is map-side-combinable.
  */
object Qed {
  /** long->double treating the long as uint64 (numpy's view of the
    * signature matrix): Guava's round-to-odd trick — fold the dropped
    * low bit into the shifted value as a sticky bit, then double — is
    * CORRECTLY rounded, unlike `conv(v) + 2^64` (double rounding). */
  private def asDouble(v: Column, unsigned: Boolean): Column =
    if (!unsigned) v.cast("double")
    else when(v >= 0, v.cast("double"))
      .otherwise(shiftrightunsigned(v, 1).bitwiseOR(v.bitwiseAND(lit(1L)))
        .cast("double") * lit(2.0))

  /** (vec_id, embedding) -> exploded (dim 0-based, v double). `unsigned`
    * converts 64-bit integer components as uint64 (the dtype of
    * sigs.npy); conversion is monotone over the unsigned order, so
    * min/max downstream equal numpy's unsigned min/max converted. */
  def explodeDims(df: DataFrame, vecCol: String, unsigned: Boolean = false): DataFrame =
    df.select(posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("dim"), asDouble(col("v"), unsigned).as("v"))

  /** Per-dimension (dim, lo, hi) bounds (the histogram range). */
  def dimBounds(df: DataFrame, vecCol: String, unsigned: Boolean = false): DataFrame =
    explodeDims(df, vecCol, unsigned).groupBy("dim")
      .agg(min("v").as("lo"), max("v").as("hi"))

  /** Bucket index of `v` within [lo, hi] split into nBins equi-width bins;
    * matches np.histogram assignment (last bin inclusive; degenerate
    * lo==hi range puts everything in bin 0). */
  def bucketOf(v: Column, lo: Column, hi: Column, nBins: Int): Column =
    when(hi === lo, lit(0)).otherwise(
      least(floor((v - lo) * lit(nBins) / (hi - lo)), lit(nBins - 1)).cast("int"))

  /** O13: per-dimension histogram counts (dim, bucket, cnt) over an
    * embedding column. Empty buckets are omitted (sparse form). */
  def histogram(df: DataFrame, vecCol: String, nBins: Int = 256): DataFrame = {
    val bounds = dimBounds(df, vecCol)
    explodeDims(df, vecCol)
      .join(broadcast(bounds), "dim")
      .withColumn("bucket", bucketOf(col("v"), col("lo"), col("hi"), nBins))
      .groupBy("dim", "bucket").agg(count(lit(1)).as("cnt"))
  }

  /** O13 edges: per-dimension bin boundary array (dim, edges[n_bins+1]) —
    * the engine-side equivalent of `hist_edges.npy` (qed.py:18-36).
    * Bit-exact to `np.histogram`'s edges: numpy computes
    * `linspace(lo, hi, n+1)` as `i * step + lo` with ONE precomputed
    * `step = (hi-lo)/n`, then forces the last edge to `hi` — the same
    * IEEE expression tree here (and in the io09 oracle), so the exported
    * artifact is byte-comparable to what the reference's offline step
    * would have written. */
  def histogramEdges(df: DataFrame, vecCol: String, nBins: Int = 256,
                     unsigned: Boolean = false): DataFrame = {
    // np.histogram._get_outer_edges widens a degenerate (lo==hi) range
    // to +/-0.5 before linspace
    val lo = when(col("hi") === col("lo"), col("lo") - lit(0.5)).otherwise(col("lo"))
    val hi = when(col("hi") === col("lo"), col("hi") + lit(0.5)).otherwise(col("hi"))
    dimBounds(df, vecCol, unsigned).select(
      col("dim"),
      transform(sequence(lit(0), lit(nBins)),
        i => when(i === nBins, hi).otherwise(
          lo + i.cast("double") * ((hi - lo) / lit(nBins).cast("double"))))
        .as("edges"))
  }

  /** O14: query-dependent bin windows, driver-side like the reference
    * (qed.py:38-52): per dim, the query's bin widened by
    * r = max(1, int(p_fraction*n_bins)) and clamped. `edges(d)` is the
    * ascending boundary array for dimension d. */
  def queryDependentBins(query: Array[Double], edges: Array[Array[Double]],
                         pFraction: Double = 0.02): Array[(Int, Int)] = {
    val nBins = edges(0).length - 1
    val r = math.max(1, (pFraction * nBins).toInt)
    query.indices.map { d =>
      // np.searchsorted(edges, qv, side='right') - 1
      val e = edges(d)
      var idx = java.util.Arrays.binarySearch(e, query(d))
      if (idx >= 0) { // rightmost equal element
        while (idx + 1 < e.length && e(idx + 1) == query(d)) idx += 1
      } else idx = -idx - 2
      val lo = math.max(0, idx - r)
      val hi = math.min(nBins - 1, idx + r)
      (lo, hi)
    }.toArray
  }

  /** O15: conjunctive bin-window predicate — true iff every dimension's
    * bucket falls inside its [lo, hi] window (qed.py:54-63). `windows` are
    * the (lo, hi) pairs from [[queryDependentBins]]; `bounds` the collected
    * per-dim (lo, hi) value ranges used for bucketing. One codegen kernel
    * expression (a D-term AND chain makes Catalyst constraint propagation
    * quadratic and dominated planning time at D=64). */
  def passesBins(vec: Column, bounds: Array[(Double, Double)],
                 windows: Array[(Int, Int)], nBins: Int = 256): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.QedBinFilter(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec),
        bounds.map(_._1), bounds.map(_._2),
        windows.map(_._1), windows.map(_._2), nBins))

  /** Reference-faithful variant of [[passesBins]] over the REAL edge
    * matrix (searchsorted bins — point_passes_bins, qed.py:54-63,
    * including its max-value-excluded quirk): the predicate the
    * reference's `/query` scatter-gather applies on workers. `edges` is
    * the collected (D, nBins+1) matrix, broadcast into the codegen
    * kernel like the reference ships `edges` to every worker. */
  def passesBinsEdges(vec: Column, edges: Array[Array[Double]],
                      windows: Array[(Int, Int)], nBins: Int = 256): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.QedEdgeFilter(
        org.apache.spark.sql.graftbridge.Bridge.expression(vec),
        edges.flatten, windows.map(_._1), windows.map(_._2), nBins))
}
