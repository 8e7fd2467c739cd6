package graft.core

import graft.functions.GraftFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus -> signature pipeline (reference offline index build,
  * SURVEY §3.2): shingle (O2) -> stable hash (O3) -> MinHash signature
  * (O4/O5). One narrow, fully codegen'd projection — no shuffle.
  */
object MinHashPipeline {
  /** Reference defaults (synth_data.py:178-188): k=1 word shingles,
    * 128 perms, seed 42. */
  case class Params(kShingle: Int = 1, byWord: Boolean = true)

  def withShingles(df: DataFrame, textCol: String, p: Params = Params()): DataFrame =
    df.withColumn("shingles", Shingling.shingles(col(textCol), p.kShingle, p.byWord))

  def withSignature(df: DataFrame, textCol: String, p: Params = Params()): DataFrame =
    withShingles(df, textCol, p)
      .withColumn("sig", minhash_signature_ref(shingle_hashes(col("shingles"))))
}
