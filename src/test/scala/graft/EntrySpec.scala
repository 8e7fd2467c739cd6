package graft

/** Smoke: the flagship entry query returns rows, and the query/oracle
  * catalogs stay consistent (the driver joins them by key and compares
  * column names — SURVEY/builder contract). */
class EntrySpec extends SparkSpec {
  test("entry() returns top-5 similar docs with expected schema") {
    val out = SparkEntry.entry(spark).collect()
    assert(out.nonEmpty && out.length <= 5)
    val first = out.head
    // doc 0 queried with its own signature must match itself with score 1.0
    assert(first.getLong(0) == 0L, "self-match should rank first")
    assert(first.getDouble(1) == 1.0)
    assert(first.getSeq[Long](2).length == 10, "vector_preview is 10 slots")
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
    // and the reverse: every catalog query carries its DuckDB twin — a
    // gate without an oracle silently downgrades to a rows-only check
    // at the driver, which is exactly the drift this pin prevents
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracleSql: $unoracled")
  }

  test("all queries run at sf0.001 and return rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, testDataDir).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
