package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-handling aggregation: two-phase salted aggregate for group-bys on
  * heavily skewed keys (a handful of giant groups). Phase 1 spreads each
  * key over `saltBuckets` sub-groups (random-free: salt = pmod(hash of a
  * uniquifier column), deterministic); phase 2 merges sub-aggregates.
  * Results are identical to the direct group-by; the win at scale is that
  * no single reducer receives a whole giant group in phase 1.
  */
object SkewAgg {

  /** Salted exact sum + count per key. `uniqueCol` must be a column that
    * distributes rows uniformly (an id); aggregates stay in exact DECIMAL
    * until the final merge so salting cannot change the result. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     uniqueCol: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt", pmod(xxhash64(col(uniqueCol)), lit(saltBuckets)))
    salted
      .groupBy(col(keyCol), col("_salt"))
      .agg(
        sum(col(valueCol).cast("decimal(28,6)")).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(
        sum(col("_psum")).cast("double").as("sum_value"),
        sum(col("_pcnt")).as("n"))
  }
}
