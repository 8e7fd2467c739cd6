package graft

import graft.core.{Kernels, Mod61}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5): the MinHash equality fraction is
  * an unbiased Jaccard estimator, banding candidate monotonicity, top-k
  * buffer invariants, and kernel algebra. Driver-side over the raw kernels
  * (no Spark jobs) so hundreds of cases run in seconds. Uses seeded
  * ScalaCheck generators for reproducibility. */
class MinHashPropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int, seed: Long = 7L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def sig(tokens: Set[String]): Array[Long] = {
    val hashes = tokens.toArray.map(t => Mod61.sha1Mod61(t.getBytes("UTF-8")))
    Kernels.minhashSignatureRef(new GenericArrayData(hashes)).toLongArray()
  }

  private def estJ(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length

  private val tokenGen = Gen.choose(0, 49).map(i => s"tok$i")
  private val setGen: Gen[Set[String]] =
    Gen.containerOf[Set, String](tokenGen).suchThat(_.nonEmpty)
  private val pairGen = Gen.zip(setGen, setGen)

  test("estimated Jaccard tracks true Jaccard (near-unbiased, 128 perms)") {
    var sumErr = 0.0
    val pairs = samples(pairGen, 80)
    pairs.foreach { case (a, b) =>
      val trueJ = a.intersect(b).size.toDouble / a.union(b).size.toDouble
      val est = estJ(sig(a), sig(b))
      val sigma = math.sqrt(trueJ * (1 - trueJ) / 128.0)
      assert(math.abs(est - trueJ) <= math.max(4.5 * sigma, 0.06),
        s"est=$est true=$trueJ a=$a b=$b")
      sumErr += est - trueJ
    }
    assert(math.abs(sumErr / pairs.size) < 0.02,
      s"bias ${sumErr / pairs.size} over ${pairs.size} pairs")
  }

  test("identical sets -> identical signatures; est-Jaccard 1.0") {
    samples(setGen, 30).foreach(a => assert(estJ(sig(a), sig(a)) == 1.0))
  }

  test("banding monotonicity: a 16-band candidate is always a 32-band candidate") {
    samples(pairGen, 80).foreach { case (a, b) =>
      val (sa, sb) = (sig(a), sig(b))
      def sharesBand(rows: Int): Boolean =
        (0 until 128 / rows).exists { band =>
          (0 until rows).forall(r => sa(band * rows + r) == sb(band * rows + r))
        }
      if (sharesBand(8)) assert(sharesBand(4))
    }
  }

  test("signature values always in [0, p]") {
    samples(setGen, 30).foreach(a =>
      assert(sig(a).forall(v => v >= 0 && v <= Mod61.Prime)))
  }

  test("TopKBuffer: size bound, ordering, merge == bulk == sorted-truncate spec") {
    val listGen = Gen.listOf(Gen.zip(Gen.choose(0.0, 1.0), Gen.choose(0L, 30L)))
    samples(Gen.zip(listGen, listGen), 100).foreach { case (xs, ys) =>
      val k = 5
      val bulk = new graft.functions.TopKBuffer(k)
      (xs ++ ys).foreach { case (s, i) => bulk.add(s, i) }
      val m1 = new graft.functions.TopKBuffer(k)
      val m2 = new graft.functions.TopKBuffer(k)
      xs.foreach { case (s, i) => m1.add(s, i) }
      ys.foreach { case (s, i) => m2.add(s, i) }
      m1.mergeFrom(m2)
      assert(m1.sorted.toSeq == bulk.sorted.toSeq)
      assert(bulk.size <= k)
      val want = (xs ++ ys).sortBy { case (s, i) => (-s, i) }.take(k)
      assert(bulk.sorted.toSeq == want)
    }
  }

  test("rolling fingerprint is sensitive to any single-element change") {
    val listGen = Gen.nonEmptyListOf(Gen.choose(0L, Mod61.Prime - 1))
    samples(listGen, 60).foreach { hs =>
      val fp = Kernels.rollingFingerprint(new GenericArrayData(hs.toArray))
      val mutated = hs.updated(0, (hs.head + 1) % Mod61.Prime)
      assert(fp != Kernels.rollingFingerprint(new GenericArrayData(mutated.toArray)))
    }
  }
}
