package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => ClassicDataset}
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into `private[sql]` Dataset construction (the standard Spark
  * extension-package technique) for ONE surgical purpose: stripping the
  * `originStats` a `localCheckpoint` copies onto its [[LogicalRDD]].
  *
  * Why: `Dataset.checkpoint` propagates the CHILD PLAN'S ESTIMATED
  * statistics into the checkpointed leaf (`LogicalRDD(..., originStats =
  * Some(...))`). In an iterative algorithm that checkpoints each round
  * (connected components), round k's estimate is a size-only PRODUCT over
  * a join tree whose leaves are round k-1's checkpoints — so the carried
  * `sizeInBytes` multiplies ~20x per round. The BigInteger grows to
  * billions of bits within ~8 rounds and `JoinSelection`'s
  * `canBroadcastBySize` spends MINUTES in Toom-Cook multiplication:
  * planning hangs while the data (16M rows) is trivial. Dropping the
  * origin stats makes the leaf fall back to the bounded
  * `defaultSizeInBytes`, ending the compounding; the checkpointed RDD
  * itself is reused untouched (no recompute, no extra conversion).
  *
  * Scale note: losing the propagated estimate only costs the optimizer a
  * broadcast opportunity on frames we already know are corpus-sized —
  * the conservative default is the correct planning input for them. */
object CheckpointStats {

  /** `ck` must be a just-checkpointed DataFrame (its logical plan is a
    * [[LogicalRDD]]); returns the same data with origin stats and
    * constraints dropped. Any other plan is returned unchanged. */
  def strip(ck: DataFrame): DataFrame = {
    val ds = ck.asInstanceOf[ClassicDataset[org.apache.spark.sql.Row]]
    ds.logicalPlan match {
      case lr: LogicalRDD =>
        val clean = LogicalRDD(
          lr.output, lr.rdd, lr.outputPartitioning, lr.outputOrdering,
          lr.isStreaming, lr.stream)(ds.sparkSession, None, None)
        ClassicDataset.ofRows(ds.sparkSession, clean)
      case _ => ck
    }
  }
}
