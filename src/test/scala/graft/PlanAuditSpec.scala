package graft

import org.apache.spark.sql.execution.ExplainMode

/** Safety net over the whole query catalog: no query may plan a
  * non-broadcast cartesian product (the scale killer). BroadcastNestedLoop
  * over an explicitly-broadcast tiny side (brute-force oracles) is fine.
  */
class PlanAuditSpec extends SparkSpec {
  test("no catalog query plans a CartesianProduct") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val p = fn(spark, testDataDir).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
    }
  }
}
