package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

/** As-of and banded range joins: semantics against a hand-computed oracle
  * on a tiny frame, plus plan-shape checks (no nested-loop join). */
class JoinsSpec extends SparkSpec {

  private def trades = {
    import spark.implicits._
    // (key, ts, trade_id)
    Seq(("a", 10L, 1L), ("a", 20L, 2L), ("a", 30L, 3L),
        ("b", 15L, 4L), ("c", 5L, 5L))
      .toDF("sym", "ts", "trade_id")
  }

  private def quotes = {
    import spark.implicits._
    // (key, ts, px)
    Seq(("a", 5L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0),
        ("b", 16L, 4.0))
      .toDF("sym", "ts", "px")
  }

  test("asofBackward picks the latest right row at-or-before each left ts") {
    val got = Joins.asofBackward(trades, quotes, Seq("sym"), "ts",
      payload = Seq("px"), prefix = "q_")
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3))))
    assert(got.toSeq == Seq(
      1L -> Some(1.0), // a@10 -> quote a@5
      2L -> Some(2.0), // a@20 -> quote a@20 (inclusive)
      3L -> Some(3.0), // a@30 -> quote a@25
      4L -> None,      // b@15: only quote is b@16, after
      5L -> None))     // c: no quotes at all
  }

  test("asofBackward strict (<) skips the equal-ts right row") {
    val got = Joins.asofBackward(trades, quotes, Seq("sym"), "ts",
      payload = Seq("px"), prefix = "q_", allowEqual = false)
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(2), Option(r.get(3))))
    assert(got(1) == (2L -> Some(1.0))) // a@20 now matches a@5, not a@20
  }

  test("asofBackward plans one shuffle on the key and no nested loop") {
    val plan = Joins.asofBackward(trades, quotes, Seq("sym"), "ts",
      payload = Seq("px")).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("rangeCountJoin counts right rows in (ts, ts+w] per key") {
    // w=10: a@10 -> a@20 (1); a@20 -> a@25 (1); a@30 -> none; b@15 -> b@16
    val got = Joins.rangeCountJoin(trades, quotes, Seq("sym"),
      leftIdCol = "trade_id", tsCol = "ts", windowLen = 10L)
      .orderBy("trade_id")
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }

  test("rangeCountJoin window straddling a band boundary still matches") {
    import spark.implicits._
    // left at ts=9, right at ts=11: bands differ (0 vs 1) but 11 in (9, 19]
    val l = Seq(("k", 9L, 1L)).toDF("sym", "ts", "id")
    val r = Seq(("k", 11L)).toDF("sym", "ts")
    val got = Joins.rangeCountJoin(l, r, Seq("sym"), "id", "ts", 10L)
      .collect().map(r2 => r2.getLong(3))
    assert(got.toSeq == Seq(1L))
  }

  test("rangeCountJoin is a hash equi-join, never a nested loop") {
    val plan = Joins.rangeCountJoin(trades, quotes, Seq("sym"),
      "trade_id", "ts", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }
}
