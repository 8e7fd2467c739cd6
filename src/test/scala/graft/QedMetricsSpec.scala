package graft

import graft.core.Qed
import graft.operators.Metrics
import org.apache.spark.sql.functions._

/** Unit tests for QED (O13-O15) and the metric aggregations (O25-O27),
  * including the reference's searchsorted bin-window semantics
  * (qed.py:38-52). */
class QedMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("queryDependentBins reproduces np.searchsorted(side='right')-1 + widen + clamp") {
    // edges: 2 dims x 5 edges (4 bins); p_fraction widen r = max(1, int(0.02*4)) = 1
    val edges = Array(
      Array(0.0, 1.0, 2.0, 3.0, 4.0),
      Array(10.0, 20.0, 30.0, 40.0, 50.0))
    // query exactly on an edge -> right side: bin = index of edge
    val w1 = Qed.queryDependentBins(Array(2.0, 25.0), edges)
    assert(w1.toSeq == Seq((1, 3), (0, 2))) // bin 2±1 ; bin 1±1
    // below range -> searchsorted 0 - 1 = -1, widen + clamp to [0, ..]
    val w2 = Qed.queryDependentBins(Array(-5.0, 55.0), edges)
    assert(w2.toSeq == Seq((0, 0), (3, 3)))
    // duplicate edges: rightmost equal wins
    val dup = Array(Array(0.0, 1.0, 1.0, 2.0, 3.0))
    assert(Qed.queryDependentBins(Array(1.0), dup).head == (1, 3))
  }

  test("passesBinsEdges is searchsorted-faithful, incl. the max-value exclusion quirk") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val edges = Array(0.0, 1.0, 2.0, 3.0, 4.0) // one dim, 4 bins
    def passes(v: Long, wlo: Int, whi: Int): Boolean =
      graft.core.Kernels.passesBinsEdges(
        new GenericArrayData(Array[Any](v)), edges, Array(wlo), Array(whi), 4)
    assert(passes(0L, 0, 3))   // == first edge -> bin 0
    assert(passes(3L, 3, 3))   // == inner edge -> right side -> bin 3
    assert(!passes(3L, 0, 2))
    // the reference's quirk (point_passes_bins, qed.py:59): a point equal
    // to the per-dim max lands in bin nBins and NO window can include it
    assert(!passes(4L, 0, 3))
  }

  test("histogram counts sum to N per dimension and respect np-style last bin") {
    val df = Seq((0L, Seq(0.0f, 1.0f)), (1L, Seq(0.5f, 1.0f)), (2L, Seq(1.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val h = Qed.histogram(df, "embedding", nBins = 2).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // dim 0: lo=0 hi=1, buckets: 0.0->0, 0.5->1 (floor(0.5*2)=1), 1.0->last bin (1)
    assert(h((0, 0)) == 1L && h((0, 1)) == 2L)
    // dim 1: degenerate lo==hi -> all bucket 0
    assert(h((1, 0)) == 3L)
  }

  test("metrics summary reproduces the reference formulas") {
    val pred = Seq((1L, Seq(10L, 11L, 12L)), (2L, Seq(20L, 21L, 22L)))
      .toDF("query_id", "ids")
    val truth = Seq((1L, Seq(10L, 11L, 99L)), (2L, Seq(98L, 99L, 97L)))
      .toDF("query_id", "ids")
    val m = Metrics.summary(pred, truth, k = 3).head()
    // recall: (2 + 0) / (2*3) = 1/3 ; precision: (2/3 + 0)/2 = 1/3
    assert(m.getDouble(0) == 1.0 / 3.0)
    assert(m.getDouble(1) == (2.0 / 3.0 + 0.0) / 2)
    // mrr: q1 first hit at rank 1 -> 1.0 ; q2 none -> 0 ; mean 0.5
    assert(m.getDouble(2) == 0.5)
  }

  test("per-query metrics handle no-hit null first_hit_rank") {
    val pred = Seq((1L, Seq(5L, 6L))).toDF("query_id", "ids")
    val truth = Seq((1L, Seq(7L, 8L))).toDF("query_id", "ids")
    val r = Metrics.perQuery(pred, truth).head()
    assert(r.getInt(1) == 2 && r.getInt(2) == 0 && r.isNullAt(3))
  }
}
