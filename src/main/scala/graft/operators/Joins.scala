package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference has no analog for (SURVEY §2.1 notes the
  * reference's only joins are hash lookups in disguise): a backward as-of
  * join and a banded range join. Both are expressed so the only wide
  * exchange is a single hash partition on the join key — never an
  * inequality join, which Spark would plan as a broadcast-nested-loop
  * (an all-pairs 100 TB scale-killer).
  */
object Joins {

  /** Backward as-of join: each left row is joined to the LATEST right row
    * of the same key with `right.ts <= left.ts` (strict `<` when
    * `allowEqual = false`); the right payload columns come back null when
    * no such row exists (LEFT ASOF semantics).
    *
    * Implementation is the union-window ("piecewise merge") pattern: tag
    * both sides, union them, and let one window per key — ordered by
    * (ts, side) so a right row sorts before an equal-ts left row exactly
    * when `allowEqual` — carry the last non-null right payload forward
    * onto each left row. One shuffle on the key; the window's running
    * `last` needs O(1) state per row, so a key's partition streams. This
    * is the plan a native as-of engine (kdb, QuestDB) executes, with AQE
    * handling key skew.
    *
    * Duplicate right rows per (keys, ts) are resolved DETERMINISTICALLY
    * when `dedupRight` (the default): the max payload struct (field-order
    * comparison) wins — the same max-by aggregation both engines compute
    * identically, instead of a union-order tie-break that would vary run
    * to run. Pass `dedupRight = false` when the right side is already
    * unique per (keys, ts) — it skips the extra aggregation exchange —
    * or when a payload column is unorderable (e.g. a map, which the
    * max-struct aggregation rejects at analysis).
    *
    * Output: every left column, plus each payload column as
    * `$prefix$name` (nullable).
    */
  def asofBackward(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tsCol: String, payload: Seq[String],
                   prefix: String = "asof_",
                   allowEqual: Boolean = true,
                   dedupRight: Boolean = true): DataFrame = {
    val keyCols = keys.map(col)
    val rStruct = struct(payload.map(col): _*)
    // side ordering within an equal timestamp: right=0 before left=1 when
    // the match is inclusive; right=2 after left when strict
    val rightSide = if (allowEqual) 0 else 2
    val rKeyed = right.select(
      keyCols :+ col(tsCol).cast("long").as("_ts") :+ rStruct.as("_r0"): _*)
    val rUnique =
      if (!dedupRight) rKeyed.select(keyCols :+ col("_ts") :+ col("_r0").as("_r"): _*)
      else rKeyed
        // one partial+final hash agg on (keys, ts): unique inputs pass
        // through untouched; duplicate (keys, ts) rows collapse to the max
        // payload struct so the winner is data-determined, not order-determined
        .groupBy(keyCols :+ col("_ts"): _*)
        .agg(max(col("_r0")).as("_r"))
    val r2 = rUnique
      .select(keyCols :+ col("_ts") :+ lit(rightSide).as("_side") :+ col("_r"): _*)
    val l2 = left
      .withColumn("_l", struct(left.columns.map(col): _*))
      .select(
        keyCols :+ col(tsCol).cast("long").as("_ts") :+
          lit(1).as("_side") :+ col("_l"): _*)
    val w = Window.partitionBy(keyCols: _*)
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val merged = r2.unionByName(l2, allowMissingColumns = true)
      .withColumn("_match", last(col("_r"), ignoreNulls = true).over(w))
    val leftCols = left.columns.map(n => col("_l").getField(n).as(n))
    val matchCols = payload.map(n => col("_match").getField(n).as(prefix + n))
    merged.filter(col("_side") === 1).select(leftCols ++ matchCols: _*)
  }

  /** Banded range-count join: for each left row, the count of right rows
    * of the same key with `left.ts < right.ts <= left.ts + windowLen`
    * ("events in the following hour"). Timestamps are non-negative
    * integers (e.g. epoch micros).
    *
    * A left row's range spans at most two windowLen-sized time bands, so
    * the left side explodes to ≤2 (key, band) probes and the join is a
    * hash equi-join on (key, band) plus an exact residual filter — the
    * banded-join rewrite every scalable range-join engine applies. Rows
    * with no match keep count 0 via a final left join of the (small,
    * one-row-per-left-id) count table back onto the left.
    *
    * Output: every left column plus `n_matches` (long).
    */
  def rangeCountJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftIdCol: String, tsCol: String,
                     windowLen: Long): DataFrame = {
    val keyCols = keys.map(col)
    val lb = left.select(
      col(leftIdCol).as("_lid") +: col(tsCol).cast("long").as("_lts") +: keyCols: _*)
      .withColumn("_band", explode(array(
        expr(s"_lts div ${windowLen}L"),
        expr(s"_lts div ${windowLen}L") + 1)))
    val rb = right.select(col(tsCol).cast("long").as("_rts") +: keyCols: _*)
      .withColumn("_band", expr(s"_rts div ${windowLen}L"))
    val counts = lb.join(rb, keys :+ "_band")
      .filter(col("_rts") > col("_lts") && col("_rts") <= col("_lts") + windowLen)
      .groupBy("_lid").agg(count(lit(1)).as("n_matches"))
    left.join(counts, left(leftIdCol) === counts("_lid"), "left")
      .drop("_lid")
      .withColumn("n_matches", coalesce(col("n_matches"), lit(0L)))
  }
}
