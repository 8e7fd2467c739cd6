package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("applyChanges: update wins, delete removes, insert appears, untouched rows pass through") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "x")
    val changes = Seq(
      (2L, "U", "b2", 22.0), // update
      (3L, "D", "", 0.0),    // delete
      (9L, "I", "new", 90.0) // insert
    ).toDF("k", "op", "s", "x")
    val got = Cdc.applyChanges(base, changes, "k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "new", 90.0)))
  }

  test("keepLatest picks the max-(order, tiebreak) row per key in ONE aggregate, no window") {
    val log = Seq(
      (1L, 10L, 100L, "v1"), (1L, 20L, 101L, "v2"), (1L, 20L, 99L, "v3"),
      (2L, 5L, 50L, "w1")
    ).toDF("k", "ts", "id", "v")
    val out = Cdc.keepLatest(log, "k", "ts", "id")
    val got = out.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(got(1L) == ((20L, 101L, "v2"))) // ts ties break by larger id
    assert(got(2L) == ((5L, 50L, "w1")))
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), plan)
    // partial+final hash aggregation (map-side combine before the shuffle)
    assert(plan.contains("Aggregate"), plan)
    assert(out.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.length == 1)
  }
}
