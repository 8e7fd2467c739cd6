package graft

import graft.operators.MllibBaseline
import org.apache.spark.ml.feature.MinHashLSH
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._

/** Pins the MLlib MinHashLSH baseline's oracle contract: the a18 gate's
  * DuckDB twin re-derives MLlib's minhashes from coefficients replicated
  * by [[MllibBaseline.replicateCoefficients]] — so the replication must
  * equal what a REAL fitted model uses, recovered here algebraically from
  * its transform output (hash of index-set {i} is ((1+i)*a + b) mod P, so
  * two probe vectors solve (a, b) per table). If a Spark upgrade changes
  * the fit draw, this trips before the correctness gate does. */
class MllibBaselineSpec extends SparkSpec {
  import spark.implicits._

  private val P = MllibBaseline.HashPrime.toLong

  test("replicateCoefficients matches a fitted model's actual hash coefficients") {
    val dim = MllibBaseline.Dim
    val df = Seq(
      (0L, Vectors.sparse(dim, Array(0), Array(1.0))),
      (1L, Vectors.sparse(dim, Array(1), Array(1.0)))
    ).toDF("id", "features")
    val model = new MinHashLSH().setNumHashTables(16).setSeed(42L)
      .setInputCol("features").setOutputCol("hashes").fit(df)
    val rows = model.transform(df).select("id", "hashes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Vector](1).map(_(0).toLong)).toMap
    val h0 = rows(0L) // ((1+0)*a + b) mod P = (a + b) mod P
    val h1 = rows(1L) // ((1+1)*a + b) mod P = (2a + b) mod P
    val solved = h0.indices.map { t =>
      val a = ((h1(t) - h0(t)) % P + P) % P
      val b = ((h0(t) - a) % P + P) % P
      (a.toInt, b.toInt)
    }
    assert(solved == MllibBaseline.replicateCoefficients(42L, 16).toSeq)
  }

  test("replicateUnitVectors matches a fitted BRP model's actual hashes") {
    // the model's randUnitVectors are private[ml]; recover the contract
    // observationally — replicated vectors must reproduce every
    // transform hash at a bucket length fine enough (1e-9) that any
    // drift in the gaussian draw order, the normalize form, or the dot
    // accumulation order would flip floor() immediately
    val dim = 64
    val rnd = new scala.util.Random(7)
    val data = (0 until 200).map { i =>
      (i.toLong, Vectors.dense(Array.fill(dim)(rnd.nextGaussian() * 3)))
    }
    val df = spark.createDataFrame(data).toDF("id", "features")
    val bl = 1e-9
    val model = new org.apache.spark.ml.feature.BucketedRandomProjectionLSH()
      .setNumHashTables(16).setSeed(42L).setBucketLength(bl)
      .setInputCol("features").setOutputCol("hashes").fit(df)
    val actual = model.transform(df).select("id", "hashes").collect()
      .map(r => r.getLong(0) -> r.getSeq[Vector](1).map(_(0)).toArray).toMap
    val uvs = MllibBaseline.replicateUnitVectors(42L, 16, dim)
    def seqDot(x: Array[Double], y: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < x.length) { s += x(i) * y(i); i += 1 }
      s
    }
    data.foreach { case (id, v) =>
      val mine = uvs.map(uv => math.floor(seqDot(v.toArray, uv) / bl))
      assert(mine.sameElements(actual(id)), s"id=$id")
    }
  }

  test("mllibBrpTopK ranks self first and prunes distant vectors") {
    // 0 and 1 are near-identical unit vectors, 2 is near-orthogonal:
    // each query's top hit is itself (distance 0), the near-dup ranks
    // second, and doc 2 can only reach 0/1's lists via a rare 16-table
    // bucket coincidence at this bucket length
    def unit(seedv: Array[Double]): Seq[Float] = {
      val n = math.sqrt(seedv.map(x => x * x).sum)
      seedv.map(x => (x / n).toFloat).toSeq
    }
    val base = Array.tabulate(64)(i => math.sin(i + 1.0))
    val nearDup = base.zipWithIndex.map { case (x, i) => x + (if (i == 0) 0.01 else 0.0) }
    val ortho = Array.tabulate(64)(i => math.cos(3.0 * i + 0.5))
    val embs = Seq(
      (0L, unit(base)), (1L, unit(nearDup)), (2L, unit(ortho))
    ).toDF("vec_id", "embedding")
    val got = MllibBaseline.mllibBrpTopK(embs, embs, k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byQ(0L).head == 0L && byQ(1L).head == 1L && byQ(2L).head == 2L)
    assert(byQ(0L).take(2).toSeq == Seq(0L, 1L))
  }

  test("mllibTopK ranks self first and stays within the candidate contract") {
    // three docs: 0 and 1 share most indices (near-dups), 2 is disjoint —
    // each query's top hit must be itself (distance 0), and the near-dup
    // must outrank the disjoint doc (which can only appear via a hash
    // collision, filtered by the library's dist < 1.0 threshold)
    val idx = Seq(
      (0L, Seq(10, 20, 30, 40)),
      (1L, Seq(10, 20, 30, 50)),
      (2L, Seq(1000, 2000, 3000, 4000))
    ).toDF("doc_id", "idx")
    val got = MllibBaseline.mllibTopK(idx, idx, k = 3)
      .orderBy("query_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = got.groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(byQ(0L).head == 0L && byQ(1L).head == 1L && byQ(2L).head == 2L)
    assert(byQ(0L).take(2).toSeq == Seq(0L, 1L)) // near-dup second, never doc 2
    assert(!byQ(2L).contains(0L) && !byQ(2L).contains(1L))
  }
}
