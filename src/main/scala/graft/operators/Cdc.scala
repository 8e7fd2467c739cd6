package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Change-data-capture primitives — how a 100 TB training corpus is kept
  * current without rewriting it from scratch: apply an upsert/delete
  * change set to a base snapshot (one key-keyed join), and compact a
  * change log to its latest row per key (one aggregation, not a window).
  */
object Cdc {

  /** Apply a change set to a base snapshot (the MERGE INTO shape, as a
    * plain join so it runs on any table format):
    *   - change op == `deleteOp` -> row removed,
    *   - any other op (update / insert) -> the change row's values win,
    *   - keys without a change -> base row unchanged.
    * `changes` must carry `keyCol`, `opCol`, and the same value columns
    * as `base`; one change row per key (dedupe upstream with
    * [[keepLatest]] — CDC logs compact to exactly this shape).
    *
    * Scale shape: ONE full-outer hash join on the key — the base scans
    * once, shuffled by key hash (or co-located if both sides are
    * bucketed by key); a small change set broadcasts (AQE decides), so
    * the common trickle-update case never shuffles the 100 TB side. */
  def applyChanges(base: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String = "op", deleteOp: String = "D"): DataFrame = {
    val valueCols = base.columns.filter(_ != keyCol)
    val b = base.select(col(keyCol).as("_bk"),
      struct(valueCols.map(col): _*).as("_bv"))
    val c = changes.select(col(keyCol).as("_ck"), col(opCol).as("_op"),
      struct(valueCols.map(col): _*).as("_cv"))
    b.join(c, col("_bk") === col("_ck"), "full_outer")
      .filter(col("_op").isNull || col("_op") =!= deleteOp)
      .select(
        coalesce(col("_ck"), col("_bk")).as(keyCol) +:
          valueCols.map(v =>
            when(col("_op").isNotNull, col(s"_cv.$v"))
              .otherwise(col(s"_bv.$v")).as(v)): _*)
  }

  /** Compact a change log to the latest row per key: every non-key
    * column via max_by over the (ordering, tiebreak) pair — ONE hash
    * aggregation with map-side partial merge, never a per-key window
    * sort (the window form shuffles and sorts the full log; this folds
    * each partition to one candidate per key first). `tiebreakCol` must
    * be unique per (key, ordering) to make the result deterministic
    * (an event id serves). */
  def keepLatest(log: DataFrame, keyCol: String, orderCol: String,
                 tiebreakCol: String): DataFrame = {
    val ord = struct(col(orderCol), col(tiebreakCol))
    val valueCols = log.columns.filter(_ != keyCol)
    log.groupBy(keyCol)
      .agg(max_by(col(valueCols.head), ord).as(valueCols.head),
        valueCols.tail.map(v => max_by(col(v), ord).as(v)): _*)
  }
}
