package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** The deterministic epoch shuffle (u10): permutation correctness, exact
  * equivalence of the two-phase bucket rank to the naive single-window
  * rank, and seed-sensitivity (a different seed is a different epoch). */
class ShuffleShardsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val ids = (0L until 500L).toDF("doc_id").cache()

  test("shuffleShards partitions the ids and numbers each shard 1..n") {
    val out = Sampling.shuffleShards(ids, nShards = 4).collect()
    assert(out.length == 500)
    assert(out.map(_.getLong(0)).toSet == (0L until 500L).toSet)
    out.groupBy(_.getInt(1)).foreach { case (shard, rows) =>
      assert(0 <= shard && shard < 4)
      val ps = rows.map(_.getLong(2)).sorted.toSeq
      assert(ps == (1L to rows.length).toSeq, s"shard $shard positions: $ps")
    }
  }

  test("two-phase rank equals the single-window rank; another seed permutes") {
    import org.apache.spark.sql.expressions.Window
    val out = Sampling.shuffleShards(ids, nShards = 4, seed = 7L)
      .orderBy("doc_id").collect().toSeq
    val naive = ids
      .withColumn("_key", md5(concat(lit("7:"), col("doc_id").cast("string"))))
      .withColumn("shard",
        (conv(substring(col("_key"), 17, 8), 16, 10).cast("long") % 4).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy(col("_key"), col("doc_id"))).cast("long"))
      .select("doc_id", "shard", "pos")
      .orderBy("doc_id").collect().toSeq
    assert(out == naive)
    val other = Sampling.shuffleShards(ids, nShards = 4, seed = 8L)
      .orderBy("doc_id").collect().toSeq
    assert(out != other)
  }
}
